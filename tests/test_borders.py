"""copyMakeBorder / borderInterpolate vs cv2, exhaustively over the 5 modes
(SURVEY §7 hard part #6: borders are the #1 source of off-by-ones)."""

import numpy as np
import pytest

from common import cv2, rand_img, assert_exact

import opencv_tpu as tcv

BORDERS = [
    tcv.BORDER_CONSTANT,
    tcv.BORDER_REPLICATE,
    tcv.BORDER_REFLECT,
    tcv.BORDER_WRAP,
    tcv.BORDER_REFLECT_101,
]


@pytest.mark.parametrize("border", BORDERS)
def test_border_interpolate(border):
    for length in [1, 2, 3, 7]:
        if border == tcv.BORDER_WRAP and length == 1:
            continue  # cv2 asserts on tiny wrap in some builds
        for p in range(-2 * length, 3 * length):
            ours = tcv.borderInterpolate(p, length, border)
            ref = cv2.borderInterpolate(p, length, border)
            assert ours == ref, (border, p, length, ours, ref)


@pytest.mark.parametrize("border", BORDERS)
@pytest.mark.parametrize("shape", [(7, 5, 3), (16, 16, 1), (3, 9, 4)])
def test_copy_make_border(border, shape):
    rng = np.random.default_rng(0)
    img = rand_img(rng, *shape)
    pads = (2, 3, 1, 4)
    ref = cv2.copyMakeBorder(img, *pads, border, value=(7, 8, 9, 10))
    ours = tcv.copyMakeBorder(img, *pads, border, value=(7, 8, 9, 10))
    assert_exact(ours, ref, f"border={border} shape={shape}")


@pytest.mark.parametrize("border", [tcv.BORDER_REPLICATE, tcv.BORDER_REFLECT_101,
                                    tcv.BORDER_REFLECT])
def test_big_pad(border):
    # pads larger than the image exercise the iterative reflect logic
    rng = np.random.default_rng(1)
    img = rand_img(rng, 3, 4, 3)
    ref = cv2.copyMakeBorder(img, 7, 7, 9, 9, border)
    ours = tcv.copyMakeBorder(img, 7, 7, 9, 9, border)
    assert_exact(ours, ref)


def test_constant_scalar():
    rng = np.random.default_rng(2)
    img = rand_img(rng, 5, 6, 1)
    ref = cv2.copyMakeBorder(img, 1, 2, 3, 4, cv2.BORDER_CONSTANT, value=42)
    ours = tcv.copyMakeBorder(img, 1, 2, 3, 4, tcv.BORDER_CONSTANT, value=42)
    assert_exact(ours, ref)


def test_batched_shape():
    rng = np.random.default_rng(3)
    batch = rng.integers(0, 256, size=(4, 5, 6, 3), dtype=np.uint8)
    out = tcv.copyMakeBorder(batch, 1, 1, 2, 2, tcv.BORDER_REFLECT_101)
    assert out.shape == (4, 7, 10, 3)
    ref = cv2.copyMakeBorder(batch[2], 1, 1, 2, 2, cv2.BORDER_REFLECT_101)
    assert_exact(np.asarray(out[2]), ref)
