from .io import imread, imwrite, imdecode, imencode, \
    IMREAD_COLOR, IMREAD_GRAYSCALE, IMREAD_UNCHANGED  # noqa: F401
