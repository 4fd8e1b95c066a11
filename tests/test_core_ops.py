"""Core arithmetic / stats / LUT ops vs cv2."""

import numpy as np
import pytest

from common import cv2, rand_img, assert_exact, assert_near

import opencv_tpu as tcv


def _imgs(seed=0, dtype=np.uint8):
    rng = np.random.default_rng(seed)
    a = rand_img(rng, 24, 32, 3, dtype)
    b = rand_img(rng, 24, 32, 3, dtype)
    return a, b


def test_add_sub():
    a, b = _imgs()
    assert_exact(np.asarray(tcv.add(a, b)), cv2.add(a, b))
    assert_exact(np.asarray(tcv.subtract(a, b)), cv2.subtract(a, b))
    assert_exact(np.asarray(tcv.absdiff(a, b)), cv2.absdiff(a, b))


def test_multiply_divide():
    a, b = _imgs(1)
    assert_near(np.asarray(tcv.multiply(a, b, scale=1 / 255.0)),
                cv2.multiply(a, b, scale=1 / 255.0), atol=1)
    assert_near(np.asarray(tcv.divide(a, b, scale=8.0)),
                cv2.divide(a, b, scale=8.0), atol=1)


def test_add_weighted():
    a, b = _imgs(2)
    assert_near(np.asarray(tcv.addWeighted(a, 0.3, b, 0.6, 10.0)),
                cv2.addWeighted(a, 0.3, b, 0.6, 10.0), atol=1)


def test_bitwise():
    a, b = _imgs(3)
    for name in ["bitwise_and", "bitwise_or", "bitwise_xor"]:
        assert_exact(np.asarray(getattr(tcv, name)(a, b)),
                     getattr(cv2, name)(a, b), name)
    assert_exact(np.asarray(tcv.bitwise_not(a)), cv2.bitwise_not(a))


def test_min_max_compare():
    a, b = _imgs(4)
    assert_exact(np.asarray(tcv.min(a, b)), cv2.min(a, b))
    assert_exact(np.asarray(tcv.max(a, b)), cv2.max(a, b))
    g1 = cv2.cvtColor(a, cv2.COLOR_BGR2GRAY)
    g2 = cv2.cvtColor(b, cv2.COLOR_BGR2GRAY)
    for op in range(6):
        assert_exact(np.asarray(tcv.compare(g1, g2, op)),
                     cv2.compare(g1, g2, op), f"cmp {op}")


def test_in_range():
    a, _ = _imgs(5)
    ref = cv2.inRange(a, (10, 20, 30), (200, 210, 220))
    ours = np.asarray(tcv.inRange(a, (10, 20, 30), (200, 210, 220)))
    assert_exact(ours, ref)


def test_lut():
    a, _ = _imgs(6)
    rng = np.random.default_rng(7)
    lut = rng.integers(0, 256, 256, dtype=np.uint8)
    assert_exact(np.asarray(tcv.LUT(a, lut)), cv2.LUT(a, lut))


def test_convert_scale_abs():
    a, _ = _imgs(8)
    assert_near(np.asarray(tcv.convertScaleAbs(a, alpha=1.5, beta=-20)),
                cv2.convertScaleAbs(a, alpha=1.5, beta=-20), atol=1)


def test_normalize_minmax():
    a, _ = _imgs(9)
    g = cv2.cvtColor(a, cv2.COLOR_BGR2GRAY)
    ref = cv2.normalize(g, None, 0, 255, cv2.NORM_MINMAX)
    ours = np.asarray(tcv.normalize(g, None, 0, 255, tcv.NORM_MINMAX))
    assert_near(ours, ref, atol=1)


def test_split_merge_flip_rotate_transpose():
    a, _ = _imgs(10)
    chans = tcv.split(a)
    assert len(chans) == 3
    assert_exact(np.asarray(chans[1]), cv2.split(a)[1])
    assert_exact(np.asarray(tcv.merge(chans)), a)
    for code in (0, 1, -1):
        assert_exact(np.asarray(tcv.flip(a, code)), cv2.flip(a, code), f"flip{code}")
    for code in (tcv.ROTATE_90_CLOCKWISE, tcv.ROTATE_180,
                 tcv.ROTATE_90_COUNTERCLOCKWISE):
        assert_exact(np.asarray(tcv.rotate(a, code)), cv2.rotate(a, code),
                     f"rot{code}")
    g = cv2.cvtColor(a, cv2.COLOR_BGR2GRAY)
    assert_exact(np.asarray(tcv.transpose(g)), cv2.transpose(g))


def test_min_max_loc_mean_norm():
    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, (31, 37), np.uint8)
    rmin, rmax, rminloc, rmaxloc = cv2.minMaxLoc(g)
    omin, omax, ominloc, omaxloc = tcv.minMaxLoc(g)
    assert (rmin, rmax) == (omin, omax)
    assert rminloc == ominloc and rmaxloc == omaxloc
    assert_near(np.asarray(tcv.mean(g)), np.asarray(cv2.mean(g)), atol=1e-3)
    for nt in (tcv.NORM_L1, tcv.NORM_L2, tcv.NORM_INF):
        assert abs(tcv.norm(g, nt) - cv2.norm(g, nt)) < max(1.0, cv2.norm(g, nt) * 1e-5)
    assert tcv.countNonZero(g) == cv2.countNonZero(g)


def test_mean_std_dev():
    a, _ = _imgs(12)
    rmu, rsd = cv2.meanStdDev(a)
    omu, osd = tcv.meanStdDev(a)
    assert_near(omu, rmu, atol=1e-2)
    assert_near(osd, rsd, atol=1e-2)


def test_cart_polar():
    rng = np.random.default_rng(13)
    x = rng.normal(0, 10, (16, 16)).astype(np.float32)
    y = rng.normal(0, 10, (16, 16)).astype(np.float32)
    rm, ra = cv2.cartToPolar(x, y)
    om, oa = tcv.cartToPolar(x, y)
    assert_near(np.asarray(om), rm, atol=1e-3)
    # phase is coarse in the reference (atan2 LUT approx) — tolerance
    da = np.abs(np.asarray(oa) - ra)
    da = np.minimum(da, 2 * np.pi - da)
    assert da.max() < 1e-2


def test_dft_idft():
    rng = np.random.default_rng(14)
    x = rng.random((16, 24)).astype(np.float32)
    ref = cv2.dft(x, flags=cv2.DFT_COMPLEX_OUTPUT)
    ours = np.asarray(tcv.dft(x, flags=tcv.DFT_COMPLEX_OUTPUT))
    assert_near(ours, ref, atol=1e-3)
    back = np.asarray(tcv.idft(ours, flags=tcv.DFT_SCALE | tcv.DFT_REAL_OUTPUT))
    assert_near(back, x, atol=1e-5)


def test_dct():
    rng = np.random.default_rng(15)
    x = rng.random((16, 16)).astype(np.float32)
    ref = cv2.dct(x)
    ours = np.asarray(tcv.dct(x))
    assert_near(ours, ref, atol=1e-4)
    assert_near(np.asarray(tcv.idct(ours)), x, atol=1e-5)


def test_optimal_dft_size():
    for n in [1, 7, 13, 100, 255, 256, 1000]:
        assert tcv.getOptimalDFTSize(n) == cv2.getOptimalDFTSize(n)


def test_gabor_kernel():
    ref = cv2.getGaborKernel((21, 21), 4.0, 0.5, 10.0, 0.5, 1.0)
    ours = tcv.getGaborKernel((21, 21), 4.0, 0.5, 10.0, 0.5, 1.0)
    assert_near(ours, ref, atol=1e-10)


def test_mul_spectrums():
    rng = np.random.default_rng(16)
    a = rng.random((8, 8, 2)).astype(np.float32)
    b = rng.random((8, 8, 2)).astype(np.float32)
    ref = cv2.mulSpectrums(a, b, 0)
    ours = np.asarray(tcv.mulSpectrums(a, b, 0))
    assert_near(ours, ref, atol=1e-5)
    ref = cv2.mulSpectrums(a, b, 0, conjB=True)
    ours = np.asarray(tcv.mulSpectrums(a, b, 0, conjB=True))
    assert_near(ours, ref, atol=1e-5)


def test_accumulate():
    rng = np.random.default_rng(17)
    src = rand_img(rng, 16, 16, 1)
    dst = rng.random((16, 16)).astype(np.float32) * 10
    ref = dst.copy(); cv2.accumulate(src, ref)
    ours = np.asarray(tcv.accumulate(src, dst))
    assert_near(ours, ref, atol=1e-4)
    ref = dst.copy(); cv2.accumulateWeighted(src, ref, 0.3)
    ours = np.asarray(tcv.accumulateWeighted(src, dst, 0.3))
    assert_near(ours, ref, atol=1e-4)
