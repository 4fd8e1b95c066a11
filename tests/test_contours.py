"""findContours + geometry + drawing vs cv2."""

import numpy as np
import pytest

from common import cv2, assert_near

import opencv_tpu as tcv


def _shapes_img():
    img = np.zeros((60, 80), np.uint8)
    cv2.circle(img, (18, 20), 10, 255, -1)
    cv2.rectangle(img, (40, 10), (70, 40), 255, -1)
    cv2.rectangle(img, (48, 18), (62, 32), 0, -1)
    cv2.circle(img, (55, 25), 3, 255, -1)
    return img


@pytest.mark.parametrize("mode", [0, 1, 3])
@pytest.mark.parametrize("method", [1, 2])
def test_find_contours(mode, method):
    img = _shapes_img()
    rc, rh = cv2.findContours(img, mode, method)
    oc, oh = tcv.findContours(img, mode, method)
    assert len(rc) == len(oc)
    rsets = sorted([frozenset(map(tuple, c.reshape(-1, 2).tolist())) for c in rc],
                   key=lambda s: sorted(s)[0])
    osets = sorted([frozenset(map(tuple, c.reshape(-1, 2).tolist())) for c in oc],
                   key=lambda s: sorted(s)[0])
    assert rsets == osets


def test_contour_geometry():
    img = _shapes_img()
    rc, _ = cv2.findContours(img, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
    for c in rc:
        assert abs(tcv.contourArea(c) - cv2.contourArea(c)) < 1e-9
        assert abs(tcv.arcLength(c, True) - cv2.arcLength(c, True)) < 1e-6
        assert tcv.boundingRect(c) == cv2.boundingRect(c)
        rh = cv2.convexHull(c).reshape(-1, 2)
        oh = tcv.convexHull(c).reshape(-1, 2)
        assert set(map(tuple, rh.tolist())) == set(map(tuple, oh.tolist()))
        assert tcv.isContourConvex(c) == cv2.isContourConvex(c)


def test_min_area_rect_boxpoints():
    rng = np.random.default_rng(0)
    pts = rng.integers(10, 90, (20, 1, 2)).astype(np.int32)
    r = cv2.minAreaRect(pts)
    o = tcv.minAreaRect(pts)
    # rects may differ in vertex order/angle convention; compare area and
    # center (ties in rotating calipers pick different but equal rects)
    assert abs(r[1][0] * r[1][1] - o[1][0] * o[1][1]) < 1e-4
    assert abs(r[0][0] - o[0][0]) < 1e-3 and abs(r[0][1] - o[0][1]) < 1e-3


def test_approx_poly():
    img = _shapes_img()
    rc, _ = cv2.findContours(img, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    c = max(rc, key=cv2.contourArea)
    ref = cv2.approxPolyDP(c, 2.0, True)
    ours = tcv.approxPolyDP(c, 2.0, True)
    # DP variants differ in closed-curve seeding; demand small counts both
    assert abs(len(ref) - len(ours)) <= 2


def test_point_polygon_test():
    sq = np.array([[10, 10], [50, 10], [50, 50], [10, 50]], np.int32).reshape(-1, 1, 2)
    for pt in [(30, 30), (5, 5), (10, 30), (49, 49)]:
        r = cv2.pointPolygonTest(sq, pt, False)
        o = tcv.pointPolygonTest(sq, pt, False)
        assert r == o, (pt, r, o)
    rd = cv2.pointPolygonTest(sq, (30, 30), True)
    od = tcv.pointPolygonTest(sq, (30, 30), True)
    assert abs(rd - od) < 1e-9


def test_min_enclosing_circle():
    rng = np.random.default_rng(1)
    pts = rng.integers(0, 100, (30, 1, 2)).astype(np.int32)
    (rx, ry), rr = cv2.minEnclosingCircle(pts)
    (ox, oy), orr = tcv.minEnclosingCircle(pts)
    assert abs(rr - orr) < 0.1 and abs(rx - ox) < 0.5 and abs(ry - oy) < 0.5


def test_hu_moments():
    img = _shapes_img()
    rm = cv2.moments(img)
    rh = cv2.HuMoments(rm)
    oh = tcv.HuMoments(tcv.moments(img))
    assert_near(oh, rh, atol=1e-8)


def test_drawing_line_rect():
    ref = np.zeros((40, 50), np.uint8)
    ours = np.zeros((40, 50), np.uint8)
    cv2.line(ref, (3, 5), (45, 30), 255, 1)
    tcv.line(ours, (3, 5), (45, 30), 255, 1)
    # Bresenham variants may differ by the odd pixel
    assert np.count_nonzero(ref != ours) <= 3
    ref2 = np.zeros((40, 50), np.uint8)
    ours2 = np.zeros((40, 50), np.uint8)
    cv2.rectangle(ref2, (5, 5), (30, 20), 255, -1)
    tcv.rectangle(ours2, (5, 5), (30, 20), 255, -1)
    assert np.array_equal(ref2, ours2)


def test_drawing_circle_fill():
    ref = np.zeros((50, 50), np.uint8)
    ours = np.zeros((50, 50), np.uint8)
    cv2.circle(ref, (25, 25), 10, 255, -1)
    tcv.circle(ours, (25, 25), 10, 255, -1)
    d = np.count_nonzero(ref != ours)
    assert d <= 40, f"{d} px differ"  # edge convention differences


def test_fill_poly():
    ref = np.zeros((40, 50), np.uint8)
    ours = np.zeros((40, 50), np.uint8)
    poly = np.array([[5, 5], [45, 10], [30, 35], [10, 30]], np.int32)
    cv2.fillPoly(ref, [poly], 255)
    tcv.fillPoly(ours, [poly], 255)
    inter = np.count_nonzero((ref > 0) & (ours > 0))
    union = np.count_nonzero((ref > 0) | (ours > 0))
    assert inter / union > 0.93


def test_puttext_renders_all_fonts():
    """Hershey text: reference-4.12 metrics (the installed 5.0 wheel
    changed its font engine, so this is a self-consistency check)."""
    fonts = [tcv.FONT_HERSHEY_SIMPLEX, tcv.FONT_HERSHEY_PLAIN,
             tcv.FONT_HERSHEY_DUPLEX, tcv.FONT_HERSHEY_COMPLEX,
             tcv.FONT_HERSHEY_TRIPLEX, tcv.FONT_HERSHEY_COMPLEX_SMALL,
             tcv.FONT_HERSHEY_SCRIPT_SIMPLEX, tcv.FONT_HERSHEY_SCRIPT_COMPLEX,
             tcv.FONT_HERSHEY_COMPLEX | tcv.FONT_ITALIC]
    for f in fonts:
        img = np.zeros((80, 420), np.uint8)
        tcv.putText(img, "Quick fox 123!", (8, 55), f, 1.0, 255, 1)
        assert img.any(), f
        (w, h), b = tcv.getTextSize("Quick fox 123!", f, 1.0, 1)
        ys, xs = np.nonzero(img)
        # ink stays within the reported box (+small bearing slack)
        assert xs.max() - 8 <= w + 4, (f, xs.max(), w)
        assert 55 - ys.min() <= h + 2, (f, ys.min(), h)
        assert ys.max() - 55 <= b + 2, (f, ys.max(), b)


def test_gettextsize_formula():
    # Simplex header is (9 + 12*16): base 9, cap 12 (drawing.cpp:2117)
    (w, h), b = tcv.getTextSize("A", tcv.FONT_HERSHEY_SIMPLEX, 1.0, 1)
    assert h == 22 and b == 10  # (12+9)*1 + (1+1)//2 ; 9*1 + 0.5 rounded
    s = tcv.getFontScaleFromHeight(tcv.FONT_HERSHEY_SIMPLEX, 22, 1)
    assert abs(s - 1.0) < 0.05


def test_puttext_bottom_left_origin():
    up = np.zeros((60, 120), np.uint8)
    dn = np.zeros((60, 120), np.uint8)
    tcv.putText(up, "Ab", (5, 30), tcv.FONT_HERSHEY_SIMPLEX, 1.0, 255, 1)
    tcv.putText(dn, "Ab", (5, 30), tcv.FONT_HERSHEY_SIMPLEX, 1.0, 255, 1,
                bottomLeftOrigin=True)
    assert up.any() and dn.any()
    # flipped rendering extends below the origin instead of above
    assert np.nonzero(up)[0].mean() < 30 < np.nonzero(dn)[0].mean()


def test_line_aa_coverage():
    for (p0, p1) in [((5, 10), (90, 40)), ((10, 5), (30, 85)),
                     ((5, 5), (95, 95)), ((5, 50), (95, 50))]:
        a = np.zeros((100, 100), np.uint8)
        b = np.zeros((100, 100), np.uint8)
        cv2.line(a, p0, p1, 255, 1, cv2.LINE_AA)
        tcv.line(b, p0, p1, 255, 1, tcv.LINE_AA)
        inter = ((a > 30) & (b > 30)).sum()
        union = ((a > 30) | (b > 30)).sum()
        assert inter / union > 0.95, (p0, p1, inter / union)
        # intermediate intensities actually present (it IS antialiased)
        mids = ((b > 40) & (b < 220)).sum()
        assert mids > 20
    # color AA blend on BGR
    c = np.full((50, 50, 3), 30, np.uint8)
    tcv.line(c, (5, 10), (45, 40), (0, 255, 0), 2, tcv.LINE_AA)
    assert c[..., 1].max() > 200 and ((c[..., 1] > 60) & (c[..., 1] < 200)).any()


def test_rotated_rect_intersection_and_convex():
    r1 = ((50, 50), (40, 20), 30.0)
    r2 = ((60, 55), (30, 30), -10.0)
    sr, pr = cv2.rotatedRectangleIntersection(r1, r2)
    so, po = tcv.rotatedRectangleIntersection(r1, r2)
    assert so == sr
    ar = cv2.contourArea(cv2.convexHull(np.asarray(pr, np.float32)))
    ao = cv2.contourArea(cv2.convexHull(np.asarray(po, np.float32)))
    assert abs(ar - ao) < 1e-2
    # disjoint
    s0, p0 = tcv.rotatedRectangleIntersection(((0, 0), (4, 4), 0.0),
                                              ((100, 100), (4, 4), 0.0))
    assert s0 == tcv.INTERSECT_NONE and p0 is None
    # contained -> FULL
    sf, _ = tcv.rotatedRectangleIntersection(((50, 50), (40, 40), 0.0),
                                             ((50, 50), (10, 10), 15.0))
    assert sf == tcv.INTERSECT_FULL

    p1 = np.array([[10, 10], [60, 15], [55, 50], [15, 45]], np.float32)
    p2 = np.array([[30, 5], [80, 30], [40, 60]], np.float32)
    a_ref, _ = cv2.intersectConvexConvex(p1, p2)
    a_our, _ = tcv.intersectConvexConvex(p1, p2)
    assert abs(a_ref - a_our) < 1e-2

    pts = np.random.default_rng(0).random((20, 2)).astype(np.float32) * 100
    a_ref, t_ref = cv2.minEnclosingTriangle(pts.reshape(-1, 1, 2))
    a_our, t_our = tcv.minEnclosingTriangle(pts)
    assert a_ref <= a_our <= a_ref * 1.15  # flush-edge search bound
    # triangle actually encloses the points
    for p in pts:
        assert cv2.pointPolygonTest(np.asarray(t_our, np.float32), 
                                    (float(p[0]), float(p[1])), False) >= 0
