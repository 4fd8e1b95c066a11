"""Hough transforms + floodFill/watershed vs cv2."""

import math
import numpy as np
import pytest

from common import cv2, assert_exact

import opencv_tpu as tcv


def test_hough_lines():
    img = np.zeros((100, 100), np.uint8)
    cv2.line(img, (10, 20), (90, 20), 255, 1)     # horizontal: theta=pi/2
    cv2.line(img, (50, 5), (50, 95), 255, 1)      # vertical: theta=0
    ref = cv2.HoughLines(img, 1, np.pi / 180, 60)
    ours = tcv.HoughLines(img, 1, np.pi / 180, 60)
    rset = {(round(float(r), 1), round(float(t), 2))
            for r, t in ref.reshape(-1, 2)}
    oset = {(round(float(r), 1), round(float(t), 2))
            for r, t in ours.reshape(-1, 2)}
    assert rset == oset, (rset, oset)


def test_hough_lines_p():
    img = np.zeros((80, 80), np.uint8)
    cv2.line(img, (10, 40), (70, 40), 255, 1)
    segs = tcv.HoughLinesP(img, 1, np.pi / 180, 40, minLineLength=30,
                           maxLineGap=5)
    assert segs is not None
    x1, y1, x2, y2 = segs.reshape(-1, 4)[0]
    assert y1 == 40 and y2 == 40 and abs((x2 - x1)) >= 50


def test_hough_circles():
    img = np.zeros((100, 100), np.uint8)
    cv2.circle(img, (50, 50), 20, 255, 2)
    img = cv2.GaussianBlur(img, (5, 5), 1)
    ours = tcv.HoughCircles(img, 3, 1, 30, param1=100, param2=20,
                            minRadius=10, maxRadius=40)
    assert ours is not None
    x, y, r = ours.reshape(-1, 3)[0]
    assert abs(x - 50) <= 2 and abs(y - 50) <= 2 and abs(r - 20) <= 3


def test_flood_fill():
    img = np.zeros((40, 40), np.uint8)
    cv2.rectangle(img, (5, 5), (20, 20), 100, -1)
    ref_img = img.copy()
    rn, rimg, rmask, rrect = cv2.floodFill(ref_img, None, (10, 10), 200)
    on, oimg, omask, orect = tcv.floodFill(img, None, (10, 10), 200)
    assert rn == on
    assert rrect == orect
    assert_exact(oimg, rimg)


def test_flood_fill_tolerance():
    rng = np.random.default_rng(0)
    img = (rng.integers(0, 3, (30, 30)) * 10 + 100).astype(np.uint8)
    ref_img = img.copy()
    ours_img = img.copy()
    rn, rimg, _, _ = cv2.floodFill(ref_img, None, (15, 15), 255,
                                   loDiff=25, upDiff=25)
    on, oimg, _, _ = tcv.floodFill(ours_img, None, (15, 15), 255,
                                   loDiff=25, upDiff=25)
    assert rn == on
    assert_exact(oimg, rimg)


def test_watershed():
    img = np.zeros((60, 60, 3), np.uint8)
    cv2.circle(img, (20, 30), 12, (200, 200, 200), -1)
    cv2.circle(img, (42, 30), 12, (120, 120, 120), -1)
    markers = np.zeros((60, 60), np.int32)
    markers[30, 20] = 1
    markers[30, 42] = 2
    markers[5, 5] = 3
    rm = markers.copy()
    cv2.watershed(img, rm)
    om = markers.copy()
    tcv.watershed(img, om)
    assert np.array_equal(om, rm)  # bit-exact


def test_watershed_bit_exact_noise():
    rng = np.random.default_rng(0)
    img = cv2.GaussianBlur(
        rng.integers(0, 256, (81, 97, 3), np.uint8), (0, 0), 2)
    mk = np.zeros((81, 97), np.int32)
    for lbl in range(1, 6):
        mk[rng.integers(2, 79), rng.integers(2, 95)] = lbl
    rm = mk.copy()
    cv2.watershed(img, rm)
    om = mk.copy()
    tcv.watershed(img, om)
    assert np.array_equal(om, rm)
    # the pure-Python twin matches the native tier exactly
    from opencv_tpu.ops.segmentation import _watershed_py
    pm = np.ascontiguousarray(mk.copy(), np.int32)
    _watershed_py(np.ascontiguousarray(img, np.uint8), pm)
    assert np.array_equal(pm, rm)


def test_pyr_mean_shift():
    """pyrMeanShiftFiltering is bit-exact vs the wheel across spatial
    window, color radius, and pyramid depth (segmentation.cpp:333)."""
    rng = np.random.default_rng(1)
    for shape in [(32, 32), (33, 47)]:
        img = cv2.GaussianBlur(
            rng.integers(0, 256, shape + (3,), np.uint8), (5, 5), 2)
        for sp, sr, ml in [(5, 20, 1), (2, 10, 0), (5, 20, 3)]:
            ref = cv2.pyrMeanShiftFiltering(img, sp, sr, maxLevel=ml)
            ours = tcv.pyrMeanShiftFiltering(img, sp, sr, maxLevel=ml)
            assert np.array_equal(ours, ref), (shape, sp, sr, ml)


def test_grabcut_matches_cv2():
    rng = np.random.default_rng(0)
    H, W = 80, 100
    img = np.zeros((H, W, 3), np.uint8)
    img[..., 0] = 40
    img[..., 1] = 120
    img[..., 2] = 60
    cv2.ellipse(img, (50, 40), (22, 16), 0, 0, 360, (200, 80, 160), -1)
    img = np.clip(img.astype(int) + rng.integers(-12, 12, img.shape),
                  0, 255).astype(np.uint8)
    rect = (20, 15, 60, 50)
    m_ref = np.zeros((H, W), np.uint8)
    cv2.grabCut(img, m_ref, rect, np.zeros((1, 65)), np.zeros((1, 65)),
                3, cv2.GC_INIT_WITH_RECT)
    m_our, bgdm, fgdm = tcv.grabCut(img, None, rect, None, None, 3,
                                    tcv.GC_INIT_WITH_RECT)
    assert bgdm.shape == (1, 65) and fgdm.shape == (1, 65)
    fg_ref = (m_ref == 1) | (m_ref == 3)
    fg_our = (m_our == 1) | (m_our == 3)
    iou = (fg_ref & fg_our).sum() / max((fg_ref | fg_our).sum(), 1)
    assert iou > 0.95, iou
    yy, xx = np.mgrid[0:H, 0:W]
    gt = ((xx - 50) / 22) ** 2 + ((yy - 40) / 16) ** 2 <= 1
    assert (fg_our & gt).sum() / (fg_our | gt).sum() > 0.9


def test_lsd_matches_cv2_structure():
    img = np.zeros((100, 140), np.uint8)
    cv2.line(img, (10, 20), (120, 30), 255, 2)
    cv2.line(img, (30, 80), (40, 10), 180, 2)
    img = cv2.GaussianBlur(img, (3, 3), 1)
    ref_lines, _, _, _ = cv2.createLineSegmentDetector().detect(img)
    our_lines, w, p, nfa = tcv.createLineSegmentDetector().detect(img)
    assert our_lines is not None and w.shape[0] == our_lines.shape[0]

    def seg_dist(a, b):
        d1 = np.hypot(a[0] - b[0], a[1] - b[1]) \
            + np.hypot(a[2] - b[2], a[3] - b[3])
        d2 = np.hypot(a[0] - b[2], a[1] - b[3]) \
            + np.hypot(a[2] - b[0], a[3] - b[1])
        return min(d1, d2) / 2

    matched = total = 0
    for r in ref_lines.reshape(-1, 4):
        rlen = np.hypot(r[2] - r[0], r[3] - r[1])
        if rlen <= 15:
            continue
        total += 1
        best = min(seg_dist(r, o) for o in our_lines.reshape(-1, 4))
        matched += best < max(5, 0.2 * rlen)
    assert total and matched == total
    # empty image -> no lines
    flat = np.full((64, 64), 100, np.uint8)
    none_lines, _, _, _ = tcv.createLineSegmentDetector().detect(flat)
    assert none_lines is None


def test_intelligent_scissors():
    img = np.zeros((80, 100), np.uint8)
    cv2.circle(img, (50, 40), 25, 255, 3)
    ref = cv2.segmentation.IntelligentScissorsMB()
    ref.setEdgeFeatureCannyParameters(32, 100)
    ref.setGradientMagnitudeMaxLimit(200)
    ref.applyImage(img)
    ref.buildMap((25, 40))
    c_ref = ref.getContour((75, 40)).reshape(-1, 2)

    ours = tcv.segmentation.IntelligentScissorsMB()
    ours.setEdgeFeatureCannyParameters(32, 100)
    ours.setGradientMagnitudeMaxLimit(200)
    ours.applyImage(img)
    ours.buildMap((25, 40))
    c_our = ours.getContour((75, 40)).reshape(-1, 2)
    # both live-wires hug the circle; paths agree within ~1px
    def mean_min_dist(a, b):
        d = np.linalg.norm(a[:, None] - b[None], axis=-1)
        return d.min(axis=1).mean()
    assert mean_min_dist(c_our, c_ref) < 0.5
    assert mean_min_dist(c_ref, c_our) < 0.5
    assert tuple(c_our[0]) == (25, 40) and tuple(c_our[-1]) == (75, 40)


def test_hough_lines_point_set():
    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, 40)
    pts = np.stack([10 + 80 * t, 20 + 40 * t], -1) \
        + rng.normal(0, 0.3, (40, 2))
    pts32 = pts.astype(np.float32).reshape(-1, 1, 2)
    args = (5, 1, 0.0, 150.0, 1.0, 0.0, np.pi, np.pi / 180)
    ref = cv2.HoughLinesPointSet(pts32, *args).reshape(-1, 3)
    ours = tcv.HoughLinesPointSet(pts32, *args).reshape(-1, 3)
    # top line identical (votes, rho, theta)
    np.testing.assert_allclose(ours[0], ref[0], atol=1e-5)


def test_generalized_hough_ballard():
    tpl = np.zeros((40, 40), np.uint8)
    cv2.rectangle(tpl, (10, 10), (30, 30), 255, 2)
    scene = np.zeros((120, 160), np.uint8)
    cv2.rectangle(scene, (60, 50), (80, 70), 255, 2)
    gh_r = cv2.createGeneralizedHoughBallard()
    gh_r.setTemplate(tpl)
    pos_r, v_r = gh_r.detect(scene)
    gh_o = tcv.createGeneralizedHoughBallard()
    gh_o.setTemplate(tpl)
    gh_o.setVotesThreshold(60)
    gh_o.setMinDist(10)
    pos_o, v_o = gh_o.detect(scene)
    np.testing.assert_allclose(pos_o.reshape(-1, 4)[0],
                               pos_r.reshape(-1, 4)[0], atol=1e-6)
    assert v_o.reshape(-1, 3)[0][0] == v_r.reshape(-1, 3)[0][0]
