"""Round-3 sweep part 7 (final function-surface batch) vs the cv2
oracle: geometry extras, link-runs contours, Hough-circle votes, memory
animation/metadata codecs, ECC wrappers, factories, MST, Octree,
registerCameras, findCirclesGrid."""

import numpy as np
import pytest

from common import cv2, assert_exact

import opencv_tpu as tcv


def test_rectangle_intersection_area():
    cases = [((0, 0, 10, 10), (5, 5, 10, 10)),
             ((0.0, 0.0, 10.0, 10.0), (20.0, 20.0, 3.0, 3.0)),
             ((1, 2, 7, 3), (4, 1, 2, 9))]
    for a, b in cases:
        assert tcv.rectangleIntersectionArea(a, b) == \
            cv2.rectangleIntersectionArea(a, b)


def test_closest_ellipse_points():
    ep = ((5.0, 5.0), (8.0, 4.0), 30.0)
    rng = np.random.default_rng(0)
    q = rng.uniform(-5, 15, (12, 2)).astype(np.float32)
    ref = np.asarray(cv2.getClosestEllipsePoints(ep, q)).reshape(-1, 2)
    got = tcv.getClosestEllipsePoints(ep, q).reshape(-1, 2)
    assert np.allclose(got, ref, atol=1e-2)


def test_filter2dp():
    rng = np.random.default_rng(1)
    img = rng.random((12, 14)).astype(np.float32)
    k = rng.random((3, 3)).astype(np.float32)
    ref = cv2.filter2Dp(img, k, scale=0.5, shift=1.25)
    got = tcv.filter2Dp(img, k, scale=0.5, shift=1.25)
    assert np.allclose(got, ref, atol=1e-5)


def test_find_contours_link_runs():
    m = np.zeros((12, 14), np.uint8)
    m[1:6, 1:6] = 255
    m[2:5, 2:5] = 0       # hole
    m[7:11, 8:13] = 255
    ref_c, ref_h = cv2.findContoursLinkRuns(m)
    got_c, got_h = tcv.findContoursLinkRuns(m)
    assert len(got_c) == len(ref_c)
    ref_sets = [sorted(map(tuple, c.reshape(-1, 2).tolist()))
                for c in ref_c]
    got_sets = [sorted(map(tuple, c.reshape(-1, 2).tolist()))
                for c in got_c]
    assert sorted(ref_sets) == sorted(got_sets)
    assert np.asarray(got_h).shape == np.asarray(ref_h).shape


def test_hough_circles_with_accumulator():
    img = np.zeros((64, 64), np.uint8)
    cv2.circle(img, (32, 32), 14, 255, 2)
    got = tcv.HoughCirclesWithAccumulator(
        img, 3, 1, 20, param1=100, param2=20, minRadius=8,
        maxRadius=20)
    assert got is not None and got.shape[2] == 4
    x, y, r, v = got[0, 0]
    assert abs(x - 32) <= 2 and abs(y - 32) <= 2 and abs(r - 14) <= 2
    assert v > 0


def test_memory_animation_and_metadata(tmp_path):
    rng = np.random.default_rng(2)
    frames = [(rng.integers(0, 4, (10, 12, 3)) * 80).astype(np.uint8)
              for _ in range(2)]
    a = tcv.Animation()
    a.frames, a.durations, a.loop_count = frames, [50, 70], 0
    ok, buf = tcv.imencodeanimation(".gif", a)
    assert ok
    ok2, b = tcv.imdecodeanimation(buf)
    assert ok2 and len(b.frames) == 2
    for f, g in zip(frames, b.frames):
        assert_exact(g, f)
    # metadata wrappers: image roundtrip with empty metadata
    p = str(tmp_path / "m.png")
    img = frames[0]
    assert tcv.imwriteWithMetadata(p, img, [], [])
    back, types, meta = tcv.imreadWithMetadata(p, tcv.IMREAD_COLOR)
    assert_exact(back, img)
    assert types == [] and meta == []


def test_ecc_wrappers():
    base = np.zeros((120, 160), np.uint8)
    cv2.circle(base, (50, 40), 20, 200, -1)
    cv2.rectangle(base, (90, 60), (140, 100), 120, -1)
    base = cv2.GaussianBlur(base, (0, 0), 2)
    M = np.array([[1, 0, 3.0], [0, 1, -2.0]], np.float32)
    shifted = cv2.warpAffine(base, M, (160, 120),
                             flags=cv2.INTER_LINEAR
                             | cv2.WARP_INVERSE_MAP)
    init = np.eye(2, 3, dtype=np.float32)
    rho, W = tcv.findTransformECCWithMask(
        base, shifted, None, None, init.copy(),
        tcv.MOTION_TRANSLATION, (3, 120, 1e-6), 5)
    assert abs(W[0, 2] + 3.0) < 0.3 and abs(W[1, 2] - 2.0) < 0.3
    rho2, W2 = tcv.findTransformECCMultiScale(
        base, shifted, np.eye(2, 3, dtype=np.float32),
        np.array([tcv.MOTION_TRANSLATION, 2]))
    assert abs(W2[0, 2] + 3.0) < 0.5 and abs(W2[1, 2] - 2.0) < 0.5


def test_factories():
    m = tcv.DescriptorMatcher_create("BruteForce-Hamming")
    d0 = np.random.default_rng(0).integers(0, 256, (5, 32), np.uint8)
    d1 = d0.copy()
    matches = m.match(d0, d1)
    assert len(matches) == 5 and all(mm.distance == 0 for mm in matches)
    f = tcv.FlannBasedMatcher_create()
    assert f is not None
    lk = tcv.SparsePyrLKOpticalFlow_create((15, 15), 2)
    assert lk.getWinSize() == (15, 15) and lk.getMaxLevel() == 2


def test_build_mst():
    edges = np.array([[0, 1, 1.0], [1, 2, 2.0], [0, 2, 5.0],
                      [2, 3, 1.0], [3, 3, 0.0]])
    ok, out = tcv.buildMST(4, edges, 0)
    assert ok
    assert abs(out[:, 2].sum() - 4.0) < 1e-9
    ok2, out2 = tcv.buildMST(5, edges, 0)   # node 4 disconnected
    assert not ok2


def test_octree():
    o = tcv.Octree_createWithDepth(4, 4.0)
    rng = np.random.default_rng(4)
    pts = rng.uniform(0, 4, (30, 3))
    for p in pts:
        assert o.insertPoint(p)
    assert not o.insertPoint((9.0, 0.0, 0.0))   # out of bounds
    q = np.array([2.0, 2.0, 2.0])
    knn = np.asarray(o.KNNSearch(q, 3)).reshape(-1, 3)
    d = np.linalg.norm(pts - q, axis=1)
    expect = pts[np.argsort(d)[:3]]
    assert np.allclose(np.sort(knn, axis=0), np.sort(expect, axis=0))
    n, within = o.radiusNNSearch(q, 1.0)
    assert n == int((d < 1.0).sum())


def test_register_cameras():
    rng = np.random.default_rng(5)
    K = np.array([[400, 0, 160], [0, 400, 120], [0, 0, 1]], np.float64)
    R_rel = cv2.Rodrigues(np.array([0.0, 0.3, 0.0]))[0]
    t_rel = np.array([[-0.5], [0.0], [0.0]])
    objs, img1, img2 = [], [], []
    for v in range(3):
        o = np.zeros((5 * 6, 3), np.float32)
        o[:, :2] = np.mgrid[0:6, 0:5].T.reshape(-1, 2) * 0.1
        rv = rng.normal(0, 0.2, 3)
        tv = np.array([-0.2, -0.2, 1.5]) + rng.normal(0, 0.05, 3)
        p1, _ = cv2.projectPoints(o, rv, tv, K, None)
        R1 = cv2.Rodrigues(rv)[0]
        R2 = R_rel @ R1
        t2 = (R_rel @ tv.reshape(3, 1) + t_rel).ravel()
        p2, _ = cv2.projectPoints(o, cv2.Rodrigues(R2)[0], t2, K, None)
        objs.append(o)
        img1.append(p1.reshape(-1, 2).astype(np.float32))
        img2.append(p2.reshape(-1, 2).astype(np.float32))
    rms, Rg, Tg, E, F, pve = tcv.registerCameras(
        objs, objs, img1, img2, K, None, 0, K, None, 0)
    assert np.allclose(Rg, R_rel, atol=1e-4)
    assert np.allclose(Tg, t_rel, atol=1e-4)


def test_find_circles_grid():
    w, h = 4, 3
    img = np.full((200, 260), 255, np.uint8)
    truth = []
    for r in range(h):
        for c in range(w):
            x, y = 40 + c * 55, 35 + r * 60
            cv2.circle(img, (x, y), 12, 0, -1)
            truth.append((x, y))
    ok_ref, ref = cv2.findCirclesGrid(
        img, (w, h), flags=cv2.CALIB_CB_SYMMETRIC_GRID)
    ok_got, got = tcv.findCirclesGrid(
        img, (w, h), flags=tcv.CALIB_CB_SYMMETRIC_GRID)
    assert ok_got
    g = got.reshape(-1, 2)
    if ok_ref:
        r = np.asarray(ref).reshape(-1, 2)
        # same grid traversal up to a 180-degree flip
        assert (np.allclose(g, r, atol=1.5)
                or np.allclose(g[::-1], r, atol=1.5))
    else:
        t = np.asarray(truth, np.float64)
        assert (np.allclose(g, t, atol=1.5)
                or np.allclose(g[::-1], t, atol=1.5))


def test_generalized_hough_guil_surface():
    g = tcv.createGeneralizedHoughGuil()
    g.setMinAngle(0)
    g.setMaxAngle(0)
    g.setAngleStep(10)
    g.setMinScale(1.0)
    g.setMaxScale(1.0)
    g.setScaleStep(0.5)
    g.setPosThresh(20)
    g.setMinDist(10)
    templ = np.zeros((40, 40), np.uint8)
    cv2.rectangle(templ, (10, 10), (30, 30), 255, 2)
    g.setTemplate(templ)
    scene = np.zeros((90, 90), np.uint8)
    cv2.rectangle(scene, (40, 45), (60, 65), 255, 2)
    pos, votes = g.detect(scene)
    assert pos is not None
    x, y = pos[0, 0, 0], pos[0, 0, 1]
    assert abs(x - 50) <= 3 and abs(y - 55) <= 3
