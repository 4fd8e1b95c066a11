from .io import (  # noqa: F401
    imread, imwrite, imdecode, imencode,
    imreadmulti, imwritemulti, imcount, imdecodemulti, imencodemulti,
    haveImageReader, haveImageWriter, Animation, imreadanimation,
    imwriteanimation, imdecodeanimation, imencodeanimation,
    imreadWithMetadata, imwriteWithMetadata, imdecodeWithMetadata,
    imencodeWithMetadata, IMREAD_ANYDEPTH, IMREAD_ANYCOLOR,
    IMREAD_COLOR, IMREAD_GRAYSCALE, IMREAD_UNCHANGED,
)
