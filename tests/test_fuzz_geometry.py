"""Seeded randomized parity fuzz for the perf-rewritten geometry paths:
resize phase decomposition, warp patch gathers, border pads.  Each case
compares against the cv2 wheel; sizes include primes and near-equal
shapes to stress the phase planner's head/tail fallbacks."""

import numpy as np
import pytest

from common import cv2, assert_exact, assert_near

import opencv_tpu as tcv

RNG = np.random.default_rng(1234)

SIZES = [(37, 53), (64, 48), (101, 67), (128, 128), (33, 256)]
DSTS = [(17, 29), (74, 106), (100, 100), (53, 37), (256, 31)]


@pytest.mark.parametrize("i", range(10))
def test_fuzz_resize_linear_u8(i):
    (h, w) = SIZES[i % len(SIZES)]
    (dw, dh) = DSTS[(i * 3 + 1) % len(DSTS)]
    img = RNG.integers(0, 256, (h, w, 3), np.uint8)
    ref = cv2.resize(img, (dw, dh), interpolation=cv2.INTER_LINEAR)
    ours = np.asarray(tcv.resize(img, (dw, dh),
                                 interpolation=tcv.INTER_LINEAR))
    assert_exact(ours, ref, f"resize {h}x{w}->{dw}x{dh}")


@pytest.mark.parametrize("i", range(8))
def test_fuzz_resize_modes(i):
    interp = [cv2.INTER_NEAREST, cv2.INTER_AREA, cv2.INTER_CUBIC,
              cv2.INTER_LANCZOS4][i % 4]
    (h, w) = SIZES[(i * 2) % len(SIZES)]
    (dw, dh) = DSTS[(i * 5 + 2) % len(DSTS)]
    img = RNG.integers(0, 256, (h, w), np.uint8)
    ref = cv2.resize(img, (dw, dh), interpolation=interp)
    ours = np.asarray(tcv.resize(img, (dw, dh), interpolation=interp))
    if interp == cv2.INTER_NEAREST:
        assert_exact(ours, ref, f"nn {h}x{w}->{dw}x{dh}")
    else:
        assert_near(ours, ref, atol=1, msg=f"i{interp} {h}x{w}->{dw}x{dh}")


@pytest.mark.parametrize("i", range(8))
def test_fuzz_warp_affine(i):
    borders = [cv2.BORDER_CONSTANT, cv2.BORDER_REPLICATE,
               cv2.BORDER_REFLECT, cv2.BORDER_REFLECT_101]
    b = borders[i % 4]
    h, w = SIZES[(i * 3) % len(SIZES)]
    ang = float(RNG.uniform(-170, 170))
    sc = float(RNG.uniform(0.4, 2.2))
    tx, ty = RNG.uniform(-10, 10, 2)
    M = cv2.getRotationMatrix2D((w / 2 + tx, h / 2 + ty), ang, sc)
    img = RNG.integers(0, 256, (h, w, 3), np.uint8)
    dsz = (int(w * 1.2), int(h * 0.8))
    ref = cv2.warpAffine(img, M, dsz, borderMode=b, borderValue=(7, 8, 9))
    ours = np.asarray(tcv.warpAffine(img, M, dsz, borderMode=b,
                                     borderValue=(7, 8, 9)))
    d = np.abs(ours.astype(int) - ref.astype(int))
    assert d.max() <= 1, f"warp b={b} ang={ang:.1f} sc={sc:.2f} max={d.max()}"
    assert np.count_nonzero(d) <= d.size // 500


@pytest.mark.parametrize("i", range(6))
def test_fuzz_remap_float_maps(i):
    borders = [cv2.BORDER_CONSTANT, cv2.BORDER_REPLICATE,
               cv2.BORDER_REFLECT_101]
    b = borders[i % 3]
    h, w = 45, 61
    dh, dw = 39, 71
    img = RNG.integers(0, 256, (h, w, 3), np.uint8)
    ys, xs = np.mgrid[0:dh, 0:dw].astype(np.float32)
    mapx = (xs * RNG.uniform(0.7, 1.3) + RNG.uniform(-8, 8)
            + 2 * np.sin(ys * 0.21)).astype(np.float32)
    mapy = (ys * RNG.uniform(0.7, 1.3) + RNG.uniform(-8, 8)
            + 3 * np.cos(xs * 0.17)).astype(np.float32)
    ref = cv2.remap(img, mapx, mapy, cv2.INTER_LINEAR, borderMode=b)
    ours = np.asarray(tcv.remap(img, mapx, mapy, tcv.INTER_LINEAR,
                                borderMode=b))
    assert_near(ours, ref, atol=1, msg=f"remap b={b}")


@pytest.mark.parametrize("i", range(6))
def test_fuzz_copy_make_border(i):
    borders = [cv2.BORDER_CONSTANT, cv2.BORDER_REPLICATE,
               cv2.BORDER_REFLECT, cv2.BORDER_WRAP,
               cv2.BORDER_REFLECT_101]
    b = borders[i % 5]
    h, w = SIZES[i % len(SIZES)]
    t, bo, l, r = RNG.integers(0, min(h, w) - 1, 4)
    img = RNG.integers(0, 256, (h, w), np.uint8)
    ref = cv2.copyMakeBorder(img, t, bo, l, r, b, value=9)
    ours = np.asarray(tcv.copyMakeBorder(img, int(t), int(bo), int(l),
                                         int(r), b, value=9))
    assert_exact(ours, ref, f"border b={b} pads={t},{bo},{l},{r}")
