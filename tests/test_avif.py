"""AVIF codec vs the wheel (reference: grfmt_avif.cpp, a libavif
adapter — ours adapts the same libavif build, so decodes are
bit-identical)."""

import os

import numpy as np
import pytest

from common import cv2, assert_exact

import opencv_tpu as tcv
from opencv_tpu.imgcodecs.avif import have_avif

pytestmark = pytest.mark.skipif(not have_avif(),
                                reason="no avif plugin in this image")

RNG = np.random.default_rng(0)


def _wheel_writes(tmp_path, img, params=None):
    p = str(tmp_path / "w.avif")
    assert cv2.imwrite(p, img, params or [])
    return p


def test_decode_wheel_file_bit_identical(tmp_path):
    img = RNG.integers(0, 255, (40, 56, 3), np.uint8)
    p = _wheel_writes(tmp_path, img)
    ours = tcv.imread(p, tcv.IMREAD_UNCHANGED)
    ref = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    assert_exact(ours, ref)


def test_decode_wheel_lossless(tmp_path):
    img = RNG.integers(0, 255, (24, 20, 3), np.uint8)
    p = _wheel_writes(tmp_path, img, [cv2.IMWRITE_AVIF_QUALITY, 100])
    ours = tcv.imread(p, tcv.IMREAD_UNCHANGED)
    assert_exact(ours, img)


def test_encode_wheel_reads_q100(tmp_path):
    """Color q100 is EXACTLY lossless: direct-libavif path with
    MC=identity + 4:4:4, the same construction grfmt_avif.cpp uses
    (the PIL plugin alone can't express identity MC).  Falls back to
    ±2 near-lossless only when the native library is absent."""
    from opencv_tpu.imgcodecs.avif import _native_lib
    img = RNG.integers(0, 255, (24, 20, 3), np.uint8)
    p = str(tmp_path / "o.avif")
    assert tcv.imwrite(p, img, [tcv.IMWRITE_AVIF_QUALITY, 100])
    back = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    assert back.shape == img.shape
    if _native_lib() is not None:
        assert np.array_equal(back, img)          # exactly lossless
        assert np.array_equal(tcv.imread(p, -1), img)  # our decode too
    else:
        assert np.abs(back.astype(int) - img.astype(int)).max() <= 2


def test_encode_q100_bgra_lossless(tmp_path):
    from opencv_tpu.imgcodecs.avif import _native_lib
    if _native_lib() is None:
        import pytest
        pytest.skip("system libavif absent")
    img = RNG.integers(0, 255, (16, 18, 4), np.uint8)
    p = str(tmp_path / "a.avif")
    assert tcv.imwrite(p, img, [tcv.IMWRITE_AVIF_QUALITY, 100])
    back = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    assert back.shape == img.shape and np.array_equal(back, img)


def test_encode_lossy_roundtrip_quality(tmp_path):
    img = cv2.GaussianBlur(
        RNG.integers(0, 255, (48, 64, 3), np.uint8), (9, 9), 3)
    p = str(tmp_path / "o90.avif")
    assert tcv.imwrite(p, img, [tcv.IMWRITE_AVIF_QUALITY, 90])
    back = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    assert back is not None and back.shape == img.shape
    d = np.abs(back.astype(int) - img.astype(int))
    assert d.mean() < 6, d.mean()
    # and our decode of our own file equals the wheel's decode of it
    ours = tcv.imread(p, tcv.IMREAD_UNCHANGED)
    assert_exact(ours, back)


def test_have_image_reader(tmp_path):
    img = RNG.integers(0, 255, (8, 8, 3), np.uint8)
    p = _wheel_writes(tmp_path, img)
    assert tcv.haveImageReader(p)


def test_encode_gray_q100_exactly_lossless(tmp_path):
    """Grayscale q100 is EXACTLY lossless (YUV400 carries no color
    matrix, so the identity-MC gap does not apply); the wheel reads the
    file back byte-identically."""
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (40, 56), np.uint8)
    ok, buf = tcv.imencode(".avif", img,
                           [tcv.IMWRITE_AVIF_QUALITY, 100])
    assert ok
    ours = tcv.imdecode(buf, tcv.IMREAD_GRAYSCALE)
    assert np.array_equal(np.asarray(ours), img)
    p = str(tmp_path / "g100.avif")
    open(p, "wb").write(bytes(buf))
    ref = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
    assert ref is not None and np.array_equal(ref, img)
