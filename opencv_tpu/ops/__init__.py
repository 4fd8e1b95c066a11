from . import color, filter, resize, warp  # noqa: F401
