from .fused_preproc import (  # noqa: F401
    gauss5_down2_u8, gauss5_down2_u8_db, fused_gray_gauss5_down2,
)
