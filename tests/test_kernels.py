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
