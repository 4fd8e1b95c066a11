"""getRectSubPix / matchShapes / phaseCorrelate / convertMaps /
demosaicing / blendLinear vs cv2."""

import numpy as np
import pytest

from common import cv2, rand_img, assert_exact, assert_near

import opencv_tpu as tcv


def test_get_rect_sub_pix():
    rng = np.random.default_rng(0)
    img = rand_img(rng, 40, 50, 1)
    ref = cv2.getRectSubPix(img, (15, 11), (20.3, 17.7))
    ours = np.asarray(tcv.getRectSubPix(img, (15, 11), (20.3, 17.7)))
    assert_near(ours, ref, atol=1)


def test_match_shapes():
    img = np.zeros((64, 64), np.uint8)
    cv2.circle(img, (32, 32), 20, 255, -1)
    c1, _ = cv2.findContours(img, 0, 2)
    img2 = np.zeros((64, 64), np.uint8)
    cv2.ellipse(img2, (32, 32), (25, 15), 0, 0, 360, 255, -1)
    c2, _ = cv2.findContours(img2, 0, 2)
    for m in (1, 2, 3):
        r = cv2.matchShapes(c1[0], c2[0], m, 0)
        o = tcv.matchShapes(c1[0], c2[0], m, 0)
        assert abs(r - o) < max(0.05, 0.1 * r), (m, r, o)


def test_phase_correlate():
    rng = np.random.default_rng(1)
    a = cv2.GaussianBlur(rng.random((64, 64)).astype(np.float32), (5, 5), 2)
    M = np.float32([[1, 0, 5], [0, 1, -3]])
    b = cv2.warpAffine(a, M, (64, 64))
    (rx, ry), rresp = cv2.phaseCorrelate(a, b)
    (ox, oy), oresp = tcv.phaseCorrelate(a, b)
    assert abs(rx - ox) < 0.2 and abs(ry - oy) < 0.2


def test_hanning_window():
    ref = cv2.createHanningWindow((16, 12), cv2.CV_32F)
    ours = tcv.createHanningWindow((16, 12), tcv.CV_32F)
    assert_near(ours, ref, atol=1e-6)


def test_convert_maps_roundtrip():
    rng = np.random.default_rng(2)
    img = rand_img(rng, 30, 30, 1)
    mapx = (rng.random((30, 30)) * 28).astype(np.float32)
    mapy = (rng.random((30, 30)) * 28).astype(np.float32)
    rm1, rm2 = cv2.convertMaps(mapx, mapy, cv2.CV_16SC2)
    om1, om2 = tcv.convertMaps(mapx, mapy, None)
    assert_exact(om1, rm1)
    assert_exact(np.asarray(om2), rm2)
    # fixed-point remap through our device path matches cv2
    ref = cv2.remap(img, rm1, rm2, cv2.INTER_LINEAR)
    ours = np.asarray(tcv.remap(img, om1, om2, tcv.INTER_LINEAR))
    assert_exact(ours, ref)


@pytest.mark.parametrize("code", ["COLOR_BayerBG2BGR", "COLOR_BayerRG2BGR",
                                  "COLOR_BayerGB2BGR", "COLOR_BayerGR2BGR"])
def test_demosaicing(code):
    rng = np.random.default_rng(3)
    raw = rand_img(rng, 32, 40, 1)
    ref = cv2.demosaicing(raw, getattr(cv2, code))
    ours = np.asarray(tcv.demosaicing(raw, getattr(tcv, code)))
    assert np.array_equal(ours, ref)  # bit-exact incl. the border copy


def test_blend_linear():
    rng = np.random.default_rng(4)
    a = rand_img(rng, 16, 16, 3)
    b = rand_img(rng, 16, 16, 3)
    w1 = rng.random((16, 16)).astype(np.float32)
    w2 = rng.random((16, 16)).astype(np.float32)
    ref = cv2.blendLinear(a, b, w1, w2)
    ours = np.asarray(tcv.blendLinear(a, b, w1, w2))
    assert np.array_equal(ours, ref)  # bit-exact (blend.cpp +1e-5f)


def test_emd_matches_cv2():
    for seed in range(5):
        rng = np.random.default_rng(seed)
        s1 = np.hstack([rng.random((4 + seed, 1)) + 0.2,
                        rng.random((4 + seed, 3)) * 10]).astype(np.float32)
        s2 = np.hstack([rng.random((6, 1)) + 0.2,
                        rng.random((6, 3)) * 10]).astype(np.float32)
        for dt in (cv2.DIST_L1, cv2.DIST_L2, cv2.DIST_C):
            r, _, fl = cv2.EMD(s1, s2, dt)
            o, _, fo = tcv.EMD(s1, s2, dt)
            assert abs(r - o) < 1e-5, (seed, dt, r, o)
            # optimal plans may differ on ties; marginals must agree
            np.testing.assert_allclose(fo.sum(1), fl.sum(1), atol=1e-4)
            np.testing.assert_allclose(fo.sum(0), fl.sum(0), atol=1e-4)


def test_match_template_masked():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (40, 50), np.uint8)
    tmpl = img[10:20, 15:27].copy()
    mask = np.zeros((10, 12), np.uint8)
    mask[2:8, 3:9] = 255
    for m in (cv2.TM_SQDIFF, cv2.TM_CCORR_NORMED):
        r = cv2.matchTemplate(img, tmpl, m, mask=mask)
        o = np.asarray(tcv.matchTemplate(img, tmpl, m, mask=mask))
        assert o.shape == r.shape
        rel = np.abs(r - o).max() / max(np.abs(r).max(), 1)
        assert rel < 1e-5
        assert np.argmin(o) == np.argmin(r)
