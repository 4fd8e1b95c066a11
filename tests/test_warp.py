"""warpAffine / warpPerspective / remap vs cv2.

The reference's strict suite demands **exact** warpAffine 8U output
(test_imgwarp_strict.cpp:1089-1091); perspective/remap get eps 1.
"""

import numpy as np
import pytest

from common import cv2, rand_img, assert_exact, assert_near

import opencv_tpu as tcv

BORDERS = [tcv.BORDER_CONSTANT, tcv.BORDER_REPLICATE, tcv.BORDER_REFLECT,
           tcv.BORDER_REFLECT_101, tcv.BORDER_WRAP]


def _M_rot():
    return cv2.getRotationMatrix2D((31.5, 23.4), 30.0, 0.8)


@pytest.mark.parametrize("border", BORDERS)
@pytest.mark.parametrize("interp", [tcv.INTER_NEAREST, tcv.INTER_LINEAR])
def test_warp_affine_u8(border, interp):
    rng = np.random.default_rng(0)
    img = rand_img(rng, 48, 64, 3)
    M = _M_rot()
    ref = cv2.warpAffine(img, M, (70, 50), flags=interp, borderMode=border,
                         borderValue=(11, 22, 33, 44))
    ours = np.asarray(tcv.warpAffine(img, M, (70, 50), flags=interp,
                                     borderMode=border, borderValue=(11, 22, 33, 44)))
    if interp == tcv.INTER_NEAREST:
        assert_exact(ours, ref, f"affine b={border}")
    else:
        # float32 device blend vs cv2's double: rare rounding ties -> +-1
        assert_near(ours, ref, atol=1, msg=f"affine b={border}")
        d = np.abs(ours.astype(int) - ref.astype(int))
        assert np.count_nonzero(d) <= d.size // 1000, "too many tie flips"


def test_warp_affine_inverse_flag():
    rng = np.random.default_rng(1)
    img = rand_img(rng, 40, 40, 1)
    M = _M_rot()
    ref = cv2.warpAffine(img, M, (40, 40), flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP)
    ours = np.asarray(tcv.warpAffine(img, M, (40, 40),
                                     flags=tcv.INTER_LINEAR | tcv.WARP_INVERSE_MAP))
    assert_near(ours, ref, atol=1)


def test_warp_affine_f32():
    rng = np.random.default_rng(2)
    img = rng.random((40, 52, 3), dtype=np.float32)
    M = _M_rot()
    ref = cv2.warpAffine(img, M, (60, 44))
    ours = np.asarray(tcv.warpAffine(img, M, (60, 44)))
    assert_near(ours, ref, atol=1e-4)


@pytest.mark.parametrize("border", [tcv.BORDER_CONSTANT, tcv.BORDER_REPLICATE])
@pytest.mark.parametrize("interp", [tcv.INTER_NEAREST, tcv.INTER_LINEAR])
def test_warp_perspective_u8(border, interp):
    rng = np.random.default_rng(3)
    img = rand_img(rng, 48, 64, 3)
    src = np.float32([[0, 0], [63, 0], [63, 47], [0, 47]])
    dst = np.float32([[3, 2], [60, 5], [58, 44], [1, 40]])
    M = cv2.getPerspectiveTransform(src, dst)
    ref = cv2.warpPerspective(img, M, (64, 48), flags=interp, borderMode=border)
    ours = np.asarray(tcv.warpPerspective(img, M, (64, 48), flags=interp,
                                          borderMode=border))
    assert_near(ours, ref, atol=1, msg=f"persp b={border} i={interp}")


def test_remap_float_maps_u8():
    rng = np.random.default_rng(4)
    img = rand_img(rng, 40, 50, 3)
    ys, xs = np.mgrid[0:44, 0:55].astype(np.float32)
    mapx = (xs * 0.9 + 2.3 + 3 * np.sin(ys * 0.2)).astype(np.float32)
    mapy = (ys * 0.85 + 1.1 + 2 * np.cos(xs * 0.3)).astype(np.float32)
    for interp in (cv2.INTER_NEAREST, cv2.INTER_LINEAR):
        ref = cv2.remap(img, mapx, mapy, interp)
        ours = np.asarray(tcv.remap(img, mapx, mapy, interp))
        if interp == cv2.INTER_NEAREST:
            assert_exact(ours, ref, "remap NN")
        else:
            assert_near(ours, ref, atol=1, msg="remap linear")


def test_transform_builders():
    src = np.float32([[0, 0], [10, 0], [0, 10]])
    dst = np.float32([[1, 2], [11, 3], [2, 13]])
    assert_near(tcv.getAffineTransform(src, dst),
                cv2.getAffineTransform(src, dst), atol=1e-10)
    s4 = np.float32([[0, 0], [10, 0], [10, 10], [0, 10]])
    d4 = np.float32([[1, 1], [9, 2], [11, 9], [0, 8]])
    assert_near(tcv.getPerspectiveTransform(s4, d4),
                cv2.getPerspectiveTransform(s4, d4), atol=1e-8)
    assert_near(tcv.getRotationMatrix2D((5, 5), 33, 1.2),
                cv2.getRotationMatrix2D((5, 5), 33, 1.2), atol=1e-10)
    M = tcv.getRotationMatrix2D((5, 5), 33, 1.2)
    assert_near(tcv.invertAffineTransform(M),
                cv2.invertAffineTransform(M), atol=1e-10)


def test_warp_polar():
    rng = np.random.default_rng(0)
    img = cv2.GaussianBlur(rng.integers(0, 256, (120, 160), np.uint8),
                           (5, 5), 2)
    for fl in (cv2.WARP_POLAR_LINEAR, cv2.WARP_POLAR_LOG):
        ref = cv2.warpPolar(img, (80, 180), (80, 60), 70,
                            fl + cv2.INTER_LINEAR)
        ours = np.asarray(tcv.warpPolar(img, (80, 180), (80, 60), 70,
                                        fl + tcv.INTER_LINEAR))
        # cv2 uses BORDER_TRANSPARENT: dst pixels whose source coords land
        # outside the image keep STALE (uninitialized) buffer content —
        # compare only where the source is in-bounds (imgwarp.cpp:3792)
        rr = np.arange(80) * ((np.log(70.0) / 80) if fl else (70.0 / 80))
        mag = (np.exp(rr) - 1.0) if fl else rr
        ang = np.arange(180) * (2 * np.pi / 180)
        sx = mag[None, :] * np.cos(ang)[:, None] + 80
        sy = mag[None, :] * np.sin(ang)[:, None] + 60
        valid = (sx >= 0) & (sx < 159) & (sy >= 0) & (sy < 119)
        d = np.abs(ref.astype(int) - ours.astype(int))[valid]
        assert d.mean() < 0.6 and (d > 2).mean() < 0.01, (fl, d.mean())
        # inverse (inside the valid circle; the reference leaves
        # out-of-circle pixels as stale buffer content)
        back_r = cv2.warpPolar(ref, (160, 120), (80, 60), 70,
                               fl + cv2.INTER_LINEAR + cv2.WARP_INVERSE_MAP)
        back_o = np.asarray(tcv.warpPolar(
            ref, (160, 120), (80, 60), 70,
            fl + tcv.INTER_LINEAR + tcv.WARP_INVERSE_MAP))
        yy, xx = np.mgrid[0:120, 0:160]
        inside = np.hypot(xx - 80, yy - 60) < 65
        d2 = np.abs(back_r.astype(int) - back_o.astype(int))[inside]
        assert d2.max() <= 1


@pytest.mark.parametrize("interp,tol_frac", [(tcv.INTER_CUBIC, 0.0),
                                             (tcv.INTER_LANCZOS4, 0.001)])
def test_warp_affine_cubic_lanczos(interp, tol_frac):
    rng = np.random.default_rng(7)
    img = cv2.GaussianBlur(rand_img(rng, 48, 64, 3), (5, 5), 1.5)
    M = _M_rot()
    for bm in (tcv.BORDER_CONSTANT, tcv.BORDER_REPLICATE,
               tcv.BORDER_REFLECT_101):
        ref = cv2.warpAffine(img, M, (70, 50), flags=interp, borderMode=bm)
        ours = np.asarray(tcv.warpAffine(img, M, (70, 50), flags=interp,
                                         borderMode=bm))
        d = np.abs(ref.astype(int) - ours.astype(int))
        assert (d > 1).mean() <= tol_frac, (bm, (d > 1).mean())
        # lanczos BORDER_CONSTANT edge taps mix the fill value through
        # the 1e30-normalized weights; small deviations concentrate there
        assert d.max() <= 8, (bm, d.max())


def test_warp_perspective_cubic():
    rng = np.random.default_rng(8)
    img = cv2.GaussianBlur(rand_img(rng, 48, 64, 3), (5, 5), 1.5)
    src = np.float32([[0, 0], [63, 0], [63, 47], [0, 47]])
    dst = np.float32([[3, 2], [60, 5], [58, 44], [1, 40]])
    M = cv2.getPerspectiveTransform(src, dst)
    ref = cv2.warpPerspective(img, M, (64, 48), flags=cv2.INTER_CUBIC)
    ours = np.asarray(tcv.warpPerspective(img, M, (64, 48),
                                          flags=tcv.INTER_CUBIC))
    assert_near(ours, ref, atol=1)


def test_calc_hist_3ch():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (60, 80, 3), np.uint8)
    mask = (rng.random((60, 80)) > 0.5).astype(np.uint8) * 255
    for args in [([0, 1, 2], None, [8, 8, 8], [0, 256] * 3),
                 ([0, 2, 1], mask, [4, 8, 16], [0, 256, 16, 240, 0, 200])]:
        ref = cv2.calcHist([img], args[0], args[1], args[2], args[3])
        ours = np.asarray(tcv.calcHist([img], args[0], args[1], args[2],
                                       args[3]))
        assert_exact(ours.reshape(ref.shape), ref, str(args[2]))
