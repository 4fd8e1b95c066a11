from .fused_preproc import (  # noqa: F401
    gauss5_down2_u8, gauss5_down2_u8_db, fused_gray_gauss5_down2,
)
from . import sepfilter  # noqa: F401  (registers dispatch kernels)
from .sepfilter import sep_filter_u8  # noqa: F401
