"""Corners/GFTT, Canny, matchTemplate, histograms, median/bilateral vs cv2."""

import numpy as np
import pytest

from common import cv2, rand_img, assert_exact, assert_near

import opencv_tpu as tcv


def _smooth_img(rng, h, w):
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    return cv2.GaussianBlur(img, (5, 5), 1.5)


# ------------------------------------------------------------------ corners

def test_corner_harris():
    rng = np.random.default_rng(0)
    img = _smooth_img(rng, 64, 64)
    ref = cv2.cornerHarris(img, 2, 3, 0.04)
    ours = np.asarray(tcv.cornerHarris(img, 2, 3, 0.04))
    assert_near(ours, ref, atol=1e-6)


def test_corner_min_eigen_val():
    rng = np.random.default_rng(1)
    img = _smooth_img(rng, 48, 52)
    ref = cv2.cornerMinEigenVal(img, 3, 3)
    ours = np.asarray(tcv.cornerMinEigenVal(img, 3, 3))
    assert_near(ours, ref, atol=1e-6)


def test_corner_eigen_vals_vecs():
    rng = np.random.default_rng(2)
    img = _smooth_img(rng, 32, 32)
    ref = cv2.cornerEigenValsAndVecs(img, 3, 3)
    ours = np.asarray(tcv.cornerEigenValsAndVecs(img, 3, 3))
    # eigenvalues must match; eigenvector signs may flip
    assert_near(ours[..., :2], ref[..., :2], atol=1e-5)


def test_gftt():
    rng = np.random.default_rng(3)
    img = _smooth_img(rng, 96, 128)
    ref = cv2.goodFeaturesToTrack(img, 40, 0.05, 10)
    ours = tcv.goodFeaturesToTrack(img, 40, 0.05, 10)
    refset = {tuple(p) for p in ref.reshape(-1, 2).astype(int).tolist()}
    ourset = {tuple(p) for p in ours.reshape(-1, 2).astype(int).tolist()}
    inter = len(refset & ourset)
    # tie order in the reference sort is unspecified (SURVEY §8.8) —
    # demand high overlap rather than equality
    assert inter >= 0.85 * max(len(refset), len(ourset)), \
        f"{inter}/{len(refset)} vs {len(ourset)}"


def test_gftt_harris():
    rng = np.random.default_rng(4)
    img = _smooth_img(rng, 64, 96)
    ref = cv2.goodFeaturesToTrack(img, 20, 0.05, 8, useHarrisDetector=True, k=0.04)
    ours = tcv.goodFeaturesToTrack(img, 20, 0.05, 8, useHarrisDetector=True, k=0.04)
    refset = {tuple(p) for p in ref.reshape(-1, 2).astype(int).tolist()}
    ourset = {tuple(p) for p in ours.reshape(-1, 2).astype(int).tolist()}
    assert len(refset & ourset) >= 0.8 * max(len(refset), len(ourset))


# -------------------------------------------------------------------- canny

@pytest.mark.parametrize("l2", [False, True])
@pytest.mark.parametrize("thresh", [(50, 150), (100, 200)])
def test_canny(l2, thresh):
    rng = np.random.default_rng(5)
    img = _smooth_img(rng, 64, 80)
    ref = cv2.Canny(img, *thresh, L2gradient=l2)
    ours = np.asarray(tcv.Canny(img, *thresh, L2gradient=l2))
    diff = np.count_nonzero(ref != ours)
    assert diff <= ref.size * 0.002, f"{diff} px differ of {ref.size}"


def test_canny_aperture5():
    rng = np.random.default_rng(6)
    img = _smooth_img(rng, 48, 48)
    ref = cv2.Canny(img, 200, 400, apertureSize=5)
    ours = np.asarray(tcv.Canny(img, 200, 400, apertureSize=5))
    diff = np.count_nonzero(ref != ours)
    assert diff <= ref.size * 0.002, f"{diff} px differ"


# ----------------------------------------------------------- matchTemplate

@pytest.mark.parametrize("method", [cv2.TM_SQDIFF, cv2.TM_SQDIFF_NORMED,
                                    cv2.TM_CCORR, cv2.TM_CCORR_NORMED,
                                    cv2.TM_CCOEFF, cv2.TM_CCOEFF_NORMED])
def test_match_template_u8(method):
    rng = np.random.default_rng(7)
    img = rand_img(rng, 64, 80, 1)
    templ = img[20:36, 30:50].copy()
    ref = cv2.matchTemplate(img, templ, method)
    ours = np.asarray(tcv.matchTemplate(img, templ, method))
    rel = np.abs(ref).max() + 1e-5
    assert_near(ours / rel, ref / rel, atol=1e-4, msg=f"method {method}")
    # argmax/argmin position must agree
    if method in (cv2.TM_SQDIFF, cv2.TM_SQDIFF_NORMED):
        assert np.unravel_index(ours.argmin(), ours.shape) == \
            np.unravel_index(ref.argmin(), ref.shape)
    else:
        assert np.unravel_index(ours.argmax(), ours.shape) == \
            np.unravel_index(ref.argmax(), ref.shape)


def test_match_template_color():
    rng = np.random.default_rng(8)
    img = rand_img(rng, 48, 64, 3)
    templ = img[10:26, 20:36].copy()
    ref = cv2.matchTemplate(img, templ, cv2.TM_CCOEFF_NORMED)
    ours = np.asarray(tcv.matchTemplate(img, templ, tcv.TM_CCOEFF_NORMED))
    assert_near(ours, ref, atol=8e-3)


# --------------------------------------------------------------- histograms

def test_calc_hist_1d():
    rng = np.random.default_rng(9)
    img = rand_img(rng, 40, 40, 1)
    ref = cv2.calcHist([img], [0], None, [256], [0, 256])
    ours = np.asarray(tcv.calcHist([img], [0], None, [256], [0, 256]))
    assert_near(ours.reshape(ref.shape), ref, atol=0)


def test_calc_hist_bins_mask():
    rng = np.random.default_rng(10)
    img = rand_img(rng, 40, 40, 1)
    mask = (rng.random((40, 40)) > 0.5).astype(np.uint8) * 255
    ref = cv2.calcHist([img], [0], mask, [32], [0, 256])
    ours = np.asarray(tcv.calcHist([img], [0], mask, [32], [0, 256]))
    assert_near(ours.reshape(ref.shape), ref, atol=0)


def test_calc_hist_2d():
    rng = np.random.default_rng(11)
    img = rand_img(rng, 40, 40, 3)
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2YCrCb)
    ref = cv2.calcHist([hsv], [0, 1], None, [30, 32], [0, 256, 0, 256])
    ours = np.asarray(tcv.calcHist([hsv], [0, 1], None, [30, 32],
                                   [0, 256, 0, 256]))
    assert_near(ours, ref, atol=0)


def test_equalize_hist():
    rng = np.random.default_rng(12)
    img = np.clip(rng.normal(120, 30, (48, 56)), 0, 255).astype(np.uint8)
    ref = cv2.equalizeHist(img)
    ours = np.asarray(tcv.equalizeHist(img))
    assert_exact(ours, ref)


@pytest.mark.parametrize("method", [cv2.HISTCMP_CORREL, cv2.HISTCMP_CHISQR,
                                    cv2.HISTCMP_INTERSECT,
                                    cv2.HISTCMP_BHATTACHARYYA,
                                    cv2.HISTCMP_CHISQR_ALT,
                                    cv2.HISTCMP_KL_DIV])
def test_compare_hist(method):
    rng = np.random.default_rng(13)
    a = rand_img(rng, 32, 32, 1)
    b = rand_img(rng, 32, 32, 1)
    h1 = cv2.calcHist([a], [0], None, [64], [0, 256])
    h2 = cv2.calcHist([b], [0], None, [64], [0, 256])
    ref = cv2.compareHist(h1, h2, method)
    ours = tcv.compareHist(h1, h2, method)
    assert abs(ours - ref) <= max(1e-4, abs(ref) * 1e-4), f"m{method}: {ours} vs {ref}"


def test_calc_back_project():
    rng = np.random.default_rng(14)
    img = rand_img(rng, 32, 32, 1)
    h = cv2.calcHist([img], [0], None, [32], [0, 256])
    ref = cv2.calcBackProject([img], [0], h, [0, 256], 1.0)
    ours = np.asarray(tcv.calcBackProject([img], [0], h, [0, 256], 1.0))
    assert_exact(ours, ref)


def test_clahe():
    rng = np.random.default_rng(15)
    # bit-exact for divisible AND non-divisible sizes.  The long-missing
    # non-divisible piece was clahe.cpp's pad quirk: copyMakeBorder pads
    # `tiles - dim % tiles` WITHOUT a modulo wrap, so a divisible
    # dimension still gets a full extra-tile pad whenever the other
    # dimension is non-divisible (clahe.cpp:374-383).
    for (h, w, grid, clip) in [
            (64, 64, (8, 8), 2.0),
            (128, 160, (16, 16), 3.5),
            (96, 128, (8, 8), 40.0),
            (80, 100, (4, 4), 0.0),
            (97, 131, (8, 8), 40.0),
            (120, 160, (16, 16), 3.5),
            (64, 64, (2, 5), 40.0),     # one dim divisible: pad quirk
            (65, 63, (7, 4), 2.0),
            (30, 31, (3, 3), 0.0),
            (100, 99, (7, 4), 40.0)]:
        img = np.clip(rng.normal(120, 40, (h, w)), 0, 255) \
            .astype(np.uint8)
        ref = cv2.createCLAHE(clip, grid).apply(img)
        ours = np.asarray(tcv.createCLAHE(clip, grid).apply(img))
        assert_exact(np.squeeze(ours), ref, f"{h}x{w} {grid} {clip}")


# ------------------------------------------------------------- median/bilat

@pytest.mark.parametrize("ksize", [3, 5, 7])
def test_median_blur(ksize):
    rng = np.random.default_rng(16)
    img = rand_img(rng, 40, 44, 3)
    ref = cv2.medianBlur(img, ksize)
    ours = np.asarray(tcv.medianBlur(img, ksize))
    assert_exact(ours, ref, f"median k{ksize}")


@pytest.mark.parametrize("d,sc,ss", [(5, 50, 50), (9, 75, 75), (0, 40, 3)])
def test_bilateral_u8(d, sc, ss):
    rng = np.random.default_rng(17)
    img = _smooth_img(rng, 40, 40)
    ref = cv2.bilateralFilter(img, d, sc, ss)
    ours = np.asarray(tcv.bilateralFilter(img, d, sc, ss))
    assert_near(ours, ref, atol=1, msg=f"bilateral {d}")


def test_bilateral_color():
    rng = np.random.default_rng(18)
    img = rand_img(rng, 32, 32, 3)
    img = cv2.GaussianBlur(img, (3, 3), 1)
    ref = cv2.bilateralFilter(img, 5, 50, 50)
    ours = np.asarray(tcv.bilateralFilter(img, 5, 50, 50))
    assert_near(ours, ref, atol=1)


def test_stack_blur():
    rng = np.random.default_rng(19)
    img = rand_img(rng, 40, 40, 1)
    # bit-exact incl. the wheel's SIMD/scalar rounding splits, the
    # (len-1)/2 radius clamp, and the big-kernel stack recurrence
    for ks in [(5, 5), (21, 21), (13, 3), (101, 101), (1, 9)]:
        ref = cv2.stackBlur(img, ks)
        ours = np.asarray(tcv.stackBlur(img, ks))
        assert np.array_equal(ours, ref), ks


# ------------------------------------------------------ moments / cc / dist

def test_moments():
    rng = np.random.default_rng(20)
    img = rand_img(rng, 32, 40, 1)
    ref = cv2.moments(img)
    ours = tcv.moments(img)
    for k in ref:
        r, o = ref[k], ours[k]
        assert abs(r - o) <= max(1e-6, abs(r) * 1e-5), f"{k}: {o} vs {r}"


def test_connected_components():
    rng = np.random.default_rng(21)
    img = (rng.random((48, 64)) > 0.7).astype(np.uint8) * 255
    for conn in (4, 8):
        rn, rl = cv2.connectedComponents(img, connectivity=conn)
        on, ol = tcv.connectedComponents(img, connectivity=conn)
        assert rn == on, f"conn {conn}: {on} vs {rn}"
        assert np.array_equal(rl, ol), f"conn {conn} labels differ"


def test_connected_components_stats():
    rng = np.random.default_rng(22)
    img = (rng.random((32, 40)) > 0.75).astype(np.uint8) * 255
    rn, rl, rs, rc = cv2.connectedComponentsWithStats(img)
    on, ol, os_, oc = tcv.connectedComponentsWithStats(img)
    assert rn == on
    assert np.array_equal(rs, os_)
    assert np.allclose(rc, oc)


@pytest.mark.parametrize("dt,ms", [(cv2.DIST_L1, 3), (cv2.DIST_C, 3),
                                   (cv2.DIST_L2, 3), (cv2.DIST_L2, 5)])
def test_distance_transform(dt, ms):
    rng = np.random.default_rng(23)
    img = (rng.random((40, 50)) > 0.05).astype(np.uint8) * 255
    ref = cv2.distanceTransform(img, dt, ms)
    ours = np.asarray(tcv.distanceTransform(img, dt, ms))
    assert_near(ours, ref, atol=1e-3, msg=f"dist {dt} mask{ms}")


def test_distance_transform_precise():
    rng = np.random.default_rng(0)
    img = (rng.random((64, 80)) > 0.02).astype(np.uint8) * 255
    ref = cv2.distanceTransform(img, cv2.DIST_L2, cv2.DIST_MASK_PRECISE)
    ours = np.asarray(tcv.distanceTransform(img, tcv.DIST_L2,
                                            tcv.DIST_MASK_PRECISE))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_match_template_masked_all_modes():
    """All six TM_* modes with masks vs cv2 (templmatch.cpp:762)."""
    rng = np.random.default_rng(11)
    for C in (1, 3):
        img = rng.integers(0, 256, (60, 80, C) if C > 1 else (60, 80),
                           np.uint8)
        t = rng.integers(0, 256, (16, 12, C) if C > 1 else (16, 12),
                         np.uint8)
        mask = (rng.random((16, 12)) > 0.3).astype(np.uint8) * 255
        for m in range(6):
            ref = cv2.matchTemplate(img, t, m, mask=mask)
            ours = np.asarray(tcv.matchTemplate(img, t, m, mask=mask))
            scale = max(1.0, float(np.abs(ref).max()))
            assert np.abs(ref - ours).max() / scale < 1e-4, (C, m)
            assert ref.argmax() == ours.argmax() or m in (0, 1), (C, m)
