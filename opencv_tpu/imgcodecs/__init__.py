from .io import imread, imwrite, imdecode, imencode, \
    imreadmulti, imwritemulti, imcount, imdecodemulti, imencodemulti, IMREAD_ANYDEPTH, IMREAD_ANYCOLOR, \
    IMREAD_COLOR, IMREAD_GRAYSCALE, IMREAD_UNCHANGED  # noqa: F401
