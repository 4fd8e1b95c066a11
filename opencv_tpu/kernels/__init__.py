from .fused_preproc import gauss5_down2_u8, fused_gray_gauss5_down2  # noqa: F401
