from . import (  # noqa: F401
    color,
    deriv,
    filter,
    integral,
    morph,
    pyramids,
    resize,
    thresh,
    warp,
)
