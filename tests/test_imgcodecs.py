"""imread/imwrite round-trips and cv2 interop."""

import os
import numpy as np
import pytest

from common import cv2, rand_img, assert_exact

import opencv_tpu as tcv


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rand_img(rng, 32, 40, 3)
    p = str(tmp_path / "x.png")
    assert tcv.imwrite(p, img)
    back = tcv.imread(p)
    assert_exact(back, img)
    # cv2 can read our PNG and vice versa
    ref = cv2.imread(p)
    assert_exact(ref, img, "cv2 reads ours")
    p2 = str(tmp_path / "y.png")
    cv2.imwrite(p2, img)
    ours = tcv.imread(p2)
    assert_exact(ours, img, "we read cv2's")


def test_png_gray16(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 65536, (16, 20), np.uint16)
    p = str(tmp_path / "g16.png")
    tcv.imwrite(p, img)
    back = tcv.imread(p, tcv.IMREAD_UNCHANGED)
    assert_exact(back, img)


def test_bmp_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    img = rand_img(rng, 21, 33, 3)
    p = str(tmp_path / "x.bmp")
    tcv.imwrite(p, img)
    assert_exact(tcv.imread(p), img)
    ref = cv2.imread(p)
    assert_exact(ref, img)


def test_ppm_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    img = rand_img(rng, 15, 17, 3)
    p = str(tmp_path / "x.ppm")
    tcv.imwrite(p, img)
    assert_exact(tcv.imread(p), img)
    assert_exact(cv2.imread(p), img)


def test_imread_grayscale_flag(tmp_path):
    rng = np.random.default_rng(4)
    img = rand_img(rng, 16, 16, 3)
    p = str(tmp_path / "x.png")
    tcv.imwrite(p, img)
    g = tcv.imread(p, tcv.IMREAD_GRAYSCALE)
    assert g.ndim == 2


def test_missing_file():
    assert tcv.imread("/nonexistent/file.png") is None
