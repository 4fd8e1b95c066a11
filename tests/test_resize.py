"""resize vs cv2 across all interpolation modes.

Tolerance contracts from the reference's own strict suite
(imgproc/test/test_imgwarp_strict.cpp:231-243): 1.0 for linear/cubic/
lanczos, 2.0 for area; NN and the *_EXACT modes plus u8 INTER_LINEAR are
bit-exact.
"""

import numpy as np
import pytest

from common import cv2, rand_img, assert_exact, assert_near

import opencv_tpu as tcv

SIZES = [((640, 480), (320, 240)), ((320, 240), (640, 480)),
         ((97, 61), (53, 41)), ((53, 41), (97, 61)),
         ((64, 64), (32, 32)), ((33, 27), (99, 81))]


def _run(img, dsize, interp):
    ref = cv2.resize(img, dsize, interpolation=interp)
    ours = np.asarray(tcv.resize(img, dsize, interpolation=interp))
    return ours, ref


@pytest.mark.parametrize("src,dst", SIZES)
@pytest.mark.parametrize("cn", [1, 3])
def test_nearest_u8(src, dst, cn):
    rng = np.random.default_rng(0)
    img = rand_img(rng, src[1], src[0], cn)
    ours, ref = _run(img, dst, cv2.INTER_NEAREST)
    assert_exact(ours, ref, f"{src}->{dst}")


@pytest.mark.parametrize("src,dst", SIZES)
def test_nearest_exact_u8(src, dst):
    rng = np.random.default_rng(1)
    img = rand_img(rng, src[1], src[0], 3)
    ours, ref = _run(img, dst, cv2.INTER_NEAREST_EXACT)
    assert_exact(ours, ref, f"{src}->{dst}")


@pytest.mark.parametrize("src,dst", SIZES)
@pytest.mark.parametrize("cn", [1, 3, 4])
def test_linear_u8_bitexact(src, dst, cn):
    rng = np.random.default_rng(2)
    img = rand_img(rng, src[1], src[0], cn)
    ours, ref = _run(img, dst, cv2.INTER_LINEAR)
    assert_exact(ours, ref, f"{src}->{dst} cn={cn}")


@pytest.mark.parametrize("src,dst", SIZES)
def test_linear_exact_u8_bitexact(src, dst):
    rng = np.random.default_rng(3)
    img = rand_img(rng, src[1], src[0], 3)
    ours, ref = _run(img, dst, cv2.INTER_LINEAR_EXACT)
    assert_exact(ours, ref, f"{src}->{dst}")


@pytest.mark.parametrize("src,dst", SIZES)
def test_linear_f32(src, dst):
    rng = np.random.default_rng(4)
    img = rng.random((src[1], src[0], 3), dtype=np.float32)
    ours, ref = _run(img, dst, cv2.INTER_LINEAR)
    assert_near(ours, ref, atol=1e-4, msg=f"{src}->{dst}")


@pytest.mark.parametrize("src,dst", SIZES)
def test_linear_u16(src, dst):
    rng = np.random.default_rng(5)
    img = rand_img(rng, src[1], src[0], 3, np.uint16)
    ours, ref = _run(img, dst, cv2.INTER_LINEAR)
    assert_near(ours, ref, atol=1, msg=f"{src}->{dst}")


@pytest.mark.parametrize("src,dst", SIZES)
def test_cubic_u8(src, dst):
    rng = np.random.default_rng(6)
    img = rand_img(rng, src[1], src[0], 3)
    ours, ref = _run(img, dst, cv2.INTER_CUBIC)
    assert_near(ours, ref, atol=1, msg=f"{src}->{dst}")


@pytest.mark.parametrize("src,dst", SIZES)
def test_lanczos_u8(src, dst):
    rng = np.random.default_rng(7)
    img = rand_img(rng, src[1], src[0], 3)
    ours, ref = _run(img, dst, cv2.INTER_LANCZOS4)
    assert_near(ours, ref, atol=1, msg=f"{src}->{dst}")


@pytest.mark.parametrize("src,dst,exact2x2", [
    ((640, 480), (320, 240), True),   # 2x2 fast
    ((96, 48), (32, 16), False),      # 3x3 fast
    ((100, 80), (40, 32), False),     # 2.5 fractional
    ((97, 61), (53, 41), False),      # fractional
])
def test_area_u8(src, dst, exact2x2):
    rng = np.random.default_rng(8)
    img = rand_img(rng, src[1], src[0], 3)
    ours, ref = _run(img, dst, cv2.INTER_AREA)
    assert_near(ours, ref, atol=1, msg=f"{src}->{dst}")


def test_area_upscale_u8():
    rng = np.random.default_rng(9)
    img = rand_img(rng, 40, 50, 3)
    ours, ref = _run(img, (100, 75), cv2.INTER_AREA)
    assert_exact(ours, ref, "area upscale == bilinear area coords")


def test_linear_2x2_reroute():
    # 2x2 INTER_LINEAR downscale is silently rerouted to AREA fast
    rng = np.random.default_rng(10)
    img = rand_img(rng, 64, 64, 3)
    ours, ref = _run(img, (32, 32), cv2.INTER_LINEAR)
    assert_near(ours, ref, atol=1)


def test_fx_fy():
    rng = np.random.default_rng(11)
    img = rand_img(rng, 48, 64, 3)
    ref = cv2.resize(img, None, fx=0.5, fy=0.25, interpolation=cv2.INTER_NEAREST)
    ours = np.asarray(tcv.resize(img, None, fx=0.5, fy=0.25,
                                 interpolation=tcv.INTER_NEAREST))
    assert_exact(ours, ref)


def test_batched():
    rng = np.random.default_rng(12)
    batch = rng.integers(0, 256, size=(3, 40, 60, 3), dtype=np.uint8)
    out = np.asarray(tcv.resize(batch, (30, 20)))
    assert out.shape == (3, 20, 30, 3)
    for i in range(3):
        ref = cv2.resize(batch[i], (30, 20))
        assert_exact(out[i], ref)
