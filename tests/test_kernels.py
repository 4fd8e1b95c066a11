"""Pallas kernels (interpret mode on CPU) vs composed ops / cv2."""

import numpy as np

from common import cv2, assert_exact

from opencv_tpu.kernels import fused_gray_gauss5_down2


def test_fused_gray_gauss_down2_bitexact():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 192, 256, 3), np.uint8)
    out = np.asarray(fused_gray_gauss5_down2(imgs, 0.0, interpret=True))
    for i in range(2):
        g = cv2.cvtColor(imgs[i], cv2.COLOR_BGR2GRAY)
        b = cv2.GaussianBlur(g, (5, 5), 0)
        r = cv2.resize(b, (128, 96), interpolation=cv2.INTER_AREA)
        assert_exact(out[i], r, f"img {i}")


def test_fused_sigma_nonzero():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (1, 128, 256, 3), np.uint8)
    out = np.asarray(fused_gray_gauss5_down2(imgs, 1.5, interpret=True))
    g = cv2.cvtColor(imgs[0], cv2.COLOR_BGR2GRAY)
    b = cv2.GaussianBlur(g, (5, 5), 1.5)
    r = cv2.resize(b, (128, 64), interpolation=cv2.INTER_AREA)
    assert_exact(out[0], r)


def test_sep_filter_u8_bitexact():
    """Generic separable Pallas kernel: all 5 borders, C=1/3, k=3..31."""
    from opencv_tpu.kernels.sepfilter import sep_filter_u8
    from opencv_tpu.ops.filter import (gaussian_kernel_bitexact,
                                       gaussian_kernel_fixedpoint_ed)
    import opencv_tpu.constants as K

    rng = np.random.default_rng(2)
    cases = [
        (100, 150, 1, 5, 0.0, K.BORDER_REFLECT_101),
        (64, 200, 3, 5, 1.5, K.BORDER_REPLICATE),
        (130, 257, 1, 9, 2.0, K.BORDER_CONSTANT),
        (33, 65, 3, 3, 0.8, K.BORDER_WRAP),
        (128, 130, 1, 31, 5.0, K.BORDER_REFLECT),
    ]
    for (H, W, C, ks, sigma, border) in cases:
        x = rng.integers(0, 256, (2, H, W, C), np.uint8)
        kf = gaussian_kernel_bitexact(ks, sigma)
        kq = gaussian_kernel_fixedpoint_ed(kf, 8)
        out = np.asarray(sep_filter_u8(x, tuple(kq), tuple(kq), 16,
                                       border=border, interpret=True))
        for i in range(2):
            ref = cv2.GaussianBlur(x[i] if C > 1 else x[i, :, :, 0],
                                   (ks, ks), sigma, borderType=border)
            got = out[i] if C > 1 else out[i, :, :, 0]
            assert_exact(got, ref, f"{H}x{W}x{C} k={ks} border={border}")


def test_sep_filter_int_sobel_box():
    """Generalized MAC kernel: integer taps → i16 out (Sobel) and
    all-ones taps + float normalize (boxFilter)."""
    import jax.numpy as jnp
    from opencv_tpu.kernels.sepfilter import sep_filter_int
    import opencv_tpu.constants as K

    rng = np.random.default_rng(4)
    x = rng.integers(0, 256, (2, 70, 90, 1), np.uint8)

    out = np.asarray(sep_filter_int(x, (-1, 0, 1), (1, 2, 1), shift=0,
                                    out_dtype=jnp.int16, interpret=True))
    for i in range(2):
        ref = cv2.Sobel(x[i, :, :, 0], cv2.CV_16S, 1, 0)
        assert_exact(out[i, :, :, 0], ref, f"sobel img {i}")

    for k, border in ((3, K.BORDER_REFLECT_101), (9, K.BORDER_REPLICATE)):
        out = np.asarray(sep_filter_int(
            x, (1,) * k, (1,) * k, shift=0, scale=1.0 / (k * k),
            out_dtype=jnp.uint8, border=border, interpret=True))
        for i in range(2):
            ref = cv2.boxFilter(x[i, :, :, 0], -1, (k, k),
                                borderType=border)
            assert_exact(out[i, :, :, 0], ref, f"box k={k} img {i}")


def test_pyr_down_kernel():
    from opencv_tpu.kernels.sepfilter import pyr_down_u8

    rng = np.random.default_rng(6)
    for C, (H, W) in ((1, (40, 52)), (1, (41, 53)), (3, (37, 45))):
        x = rng.integers(0, 256, (2, H, W, C), np.uint8)
        out = np.asarray(pyr_down_u8(x, interpret=True))
        for i in range(2):
            ref = cv2.pyrDown(x[i] if C > 1 else x[i, :, :, 0])
            got = out[i] if C > 1 else out[i, :, :, 0]
            assert_exact(got, ref, f"pyrDown C={C} {H}x{W}")


def test_dispatch_force_mode_new_ops():
    """Force mode routes Sobel/boxFilter/erode/dilate/pyrDown through the
    Pallas kernels — must stay bit-exact with the XLA tier and cv2."""
    import os
    import opencv_tpu as tcv

    rng = np.random.default_rng(7)
    x = rng.integers(0, 256, (50, 70), np.uint8)

    def run_all():
        return {
            "sobel": np.asarray(tcv.Sobel(x, tcv.CV_16S, 1, 0)),
            "box": np.asarray(tcv.blur(x, (5, 5))),
            "erode": np.asarray(tcv.erode(x, np.ones((5, 5), np.uint8))),
            "dilate": np.asarray(tcv.dilate(x, np.ones((3, 3), np.uint8),
                                            iterations=2)),
            "pyr": np.asarray(tcv.pyrDown(x)),
        }

    old = os.environ.get("OPENCV_TPU_PALLAS")
    try:
        os.environ["OPENCV_TPU_PALLAS"] = "force"
        got = run_all()
        os.environ["OPENCV_TPU_PALLAS"] = "0"
        ref = run_all()
    finally:
        if old is None:
            os.environ.pop("OPENCV_TPU_PALLAS", None)
        else:
            os.environ["OPENCV_TPU_PALLAS"] = old
    for k in got:
        assert_exact(got[k], ref[k], f"force vs xla: {k}")
    assert_exact(got["sobel"], cv2.Sobel(x, cv2.CV_16S, 1, 0), "cv2 sobel")
    assert_exact(got["box"], cv2.blur(x, (5, 5)), "cv2 blur")
    assert_exact(got["erode"], cv2.erode(x, np.ones((5, 5), np.uint8)),
                 "cv2 erode")
    assert_exact(got["dilate"], cv2.dilate(x, np.ones((3, 3), np.uint8),
                                           iterations=2), "cv2 dilate")
    assert_exact(got["pyr"], cv2.pyrDown(x), "cv2 pyrDown")


def test_dispatch_registry_force_mode():
    """OPENCV_TPU_PALLAS=force routes GaussianBlur through the Pallas
    kernel (interpret mode) — must stay bit-exact with the XLA tier."""
    import os
    import opencv_tpu as tcv

    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, (60, 90), np.uint8)
    old = os.environ.get("OPENCV_TPU_PALLAS")
    try:
        os.environ["OPENCV_TPU_PALLAS"] = "force"
        got = np.asarray(tcv.GaussianBlur(x, (5, 5), 1.2))
        os.environ["OPENCV_TPU_PALLAS"] = "0"
        ref = np.asarray(tcv.GaussianBlur(x, (5, 5), 1.2))
    finally:
        if old is None:
            os.environ.pop("OPENCV_TPU_PALLAS", None)
        else:
            os.environ["OPENCV_TPU_PALLAS"] = old
    assert_exact(got, ref, "dispatch force vs xla")
    assert_exact(got, cv2.GaussianBlur(x, (5, 5), 1.2), "vs cv2")


def test_fused_preprocess_public_api():
    """The fused preprocess kernel is a public fast path
    (tcv.fusedPreprocessGrayBlurDown2) — bit-exact with the composed
    cv2 chain."""
    import opencv_tpu as tcv

    rng = np.random.default_rng(9)
    imgs = rng.integers(0, 256, (2, 64, 96, 3), np.uint8)
    out = np.asarray(tcv.fusedPreprocessGrayBlurDown2(imgs, 1.1,
                                                      interpret=True))
    for i in range(2):
        g = cv2.cvtColor(imgs[i], cv2.COLOR_BGR2GRAY)
        b = cv2.GaussianBlur(g, (5, 5), 1.1)
        r = cv2.resize(b, (48, 32), interpolation=cv2.INTER_AREA)
        assert_exact(out[i], r, f"img {i}")
