"""Round-3 sweep part 4 vs the cv2 oracle: labeled distance transform,
Hough accumulator variant, CC algorithm wrappers, translation RANSAC,
undistortImagePoints, solveLP, broadcast/finiteMask, KeyPoint helpers,
codec availability probes, headless highgui surface."""

import numpy as np
import pytest

from common import cv2, assert_exact

import opencv_tpu as tcv


def test_distance_transform_with_labels_pixel():
    rng = np.random.default_rng(0)
    a = (rng.random((40, 50)) > 0.05).astype(np.uint8) * 255
    for dt in (cv2.DIST_L2, cv2.DIST_L1, cv2.DIST_C):
        ref_d, ref_l = cv2.distanceTransformWithLabels(
            a, dt, 5, labelType=cv2.DIST_LABEL_PIXEL)
        got_d, got_l = tcv.distanceTransformWithLabels(
            a, dt, 5, tcv.DIST_LABEL_PIXEL)
        assert_exact(got_d, ref_d, f"dist {dt}")
        assert_exact(got_l, ref_l, f"labels {dt}")


def test_distance_transform_with_labels_ccomp():
    rng = np.random.default_rng(1)
    a = (rng.random((30, 35)) > 0.06).astype(np.uint8) * 255
    ref_d, ref_l = cv2.distanceTransformWithLabels(
        a, cv2.DIST_L2, 5, labelType=cv2.DIST_LABEL_CCOMP)
    got_d, got_l = tcv.distanceTransformWithLabels(
        a, cv2.DIST_L2, 5, tcv.DIST_LABEL_CCOMP)
    assert_exact(got_d, ref_d)
    # labels match up to a bijective renumbering of components
    fwd, bwd = {}, {}
    for g, r in zip(got_l.ravel().tolist(), ref_l.ravel().tolist()):
        assert fwd.setdefault(g, r) == r
        assert bwd.setdefault(r, g) == g


def test_hough_lines_with_accumulator():
    img = np.zeros((60, 60), np.uint8)
    cv2.line(img, (5, 30), (55, 30), 255, 1)
    cv2.line(img, (30, 5), (30, 55), 255, 1)
    ref = cv2.HoughLinesWithAccumulator(img, 1, np.pi / 180, 40)
    got = tcv.HoughLinesWithAccumulator(img, 1, np.pi / 180, 40)
    assert got.shape == ref.shape
    assert np.allclose(np.sort(got.reshape(-1, 3), axis=0),
                       np.sort(np.asarray(ref).reshape(-1, 3), axis=0),
                       atol=1e-4)


def test_cc_with_algorithm():
    rng = np.random.default_rng(2)
    a = (rng.random((20, 25)) > 0.5).astype(np.uint8) * 255
    ref_n, ref_l = cv2.connectedComponentsWithAlgorithm(
        a, 8, cv2.CV_32S, cv2.CCL_DEFAULT)
    got_n, got_l = tcv.connectedComponentsWithAlgorithm(
        a, 8, 4, 0)
    assert got_n == ref_n
    fwd = {}
    for g, r in zip(np.asarray(got_l).ravel().tolist(),
                    ref_l.ravel().tolist()):
        assert fwd.setdefault(g, r) == r


def test_estimate_translation2d():
    rng = np.random.default_rng(3)
    src = rng.uniform(0, 100, (40, 2))
    t = np.array([3.5, -2.25])
    dst = src + t
    out = rng.uniform(0, 100, (6, 2))  # outliers
    src2 = np.vstack([src, out])
    dst2 = np.vstack([dst, out[::-1] + 40])
    ref_M, ref_in = cv2.estimateTranslation2D(src2, dst2)
    got_M, got_in = tcv.estimateTranslation2D(src2, dst2)
    assert np.allclose(got_M, ref_M, atol=1e-9)
    assert np.array_equal(np.asarray(got_in).ravel(),
                          np.asarray(ref_in).ravel())


def test_undistort_image_points():
    K = np.array([[400, 0, 160], [0, 390, 120], [0, 0, 1]], np.float64)
    dist = np.array([0.1, -0.05, 0.001, 0.002, 0.01])
    pts = np.array([[[10.0, 20.0]], [[160.0, 120.0]], [[300.0, 200.0]]],
                   np.float32)
    ref = cv2.undistortImagePoints(pts, K, dist)
    got = tcv.undistortImagePoints(pts, K, dist)
    assert np.allclose(got, ref, atol=1e-2)


def test_solve_lp():
    # maximize 3x+y+2z st x+y+3z<=30, 2x+2y+5z<=24, 4x+y+2z<=36 → 28
    F = np.array([3.0, 1.0, 2.0])
    C = np.array([[1.0, 1, 3, 30], [2, 2, 5, 24], [4, 1, 2, 36]])
    ref_s, ref_z = cv2.solveLP(F, C, 1e-12)
    got_s, got_z = tcv.solveLP(F, C, 1e-12)
    assert got_s == ref_s
    assert np.allclose(got_z, np.asarray(ref_z), atol=1e-9)


def test_broadcast_finite_mask():
    a = np.arange(3, dtype=np.float32).reshape(1, 3)
    ref = cv2.broadcast(a, np.array([4, 3]))
    got = tcv.broadcast(a, np.array([4, 3]))
    assert_exact(got, ref)
    f = np.array([[1.0, np.nan], [np.inf, 2]], np.float32)
    assert_exact(tcv.finiteMask(f), cv2.finiteMask(f))


def test_keypoint_helpers():
    kps_ref = [cv2.KeyPoint(10.0, 12.0, 3.0), cv2.KeyPoint(11.5, 7.0, 5.0)]
    kps_got = [tcv.KeyPoint(10.0, 12.0, 3.0), tcv.KeyPoint(11.5, 7.0, 5.0)]
    assert_exact(tcv.KeyPoint_convert(kps_got),
                 cv2.KeyPoint_convert(kps_ref))
    assert abs(tcv.KeyPoint_overlap(kps_got[0], kps_got[1])
               - cv2.KeyPoint_overlap(kps_ref[0], kps_ref[1])) < 1e-5
    back = tcv.KeyPoint_convert(np.array([[1.0, 2.0], [3.0, 4.0]]))
    assert back[0].pt == (1.0, 2.0) and back[1].pt == (3.0, 4.0)


def test_have_image_reader_writer(tmp_path):
    p = str(tmp_path / "x.png")
    assert tcv.haveImageReader(p) == cv2.haveImageReader(p)  # missing
    img = np.zeros((4, 4, 3), np.uint8)
    cv2.imwrite(p, img)
    assert tcv.haveImageReader(p) and cv2.haveImageReader(p)
    assert tcv.haveImageWriter("a.png") == cv2.haveImageWriter("a.png")
    assert tcv.haveImageWriter("a.xyz") == cv2.haveImageWriter("a.xyz")


def test_headless_highgui_surface():
    assert tcv.waitKeyEx(1) == -1
    assert tcv.selectROI("w", np.zeros((5, 5), np.uint8)) == (0, 0, 0, 0)
    assert tcv.selectROIs("w", np.zeros((5, 5), np.uint8)) == []
    tcv.namedWindow("t")
    tcv.imshow("t", np.zeros((7, 9), np.uint8))
    assert tcv.getWindowImageRect("t") == (0, 0, 9, 7)
    tcv.setWindowTitle("t", "x")
    tcv.setTrackbarMin("a", "t", 0)
    tcv.setTrackbarMax("a", "t", 10)
    tcv.displayOverlay("t", "hi")
    tcv.displayStatusBar("t", "hi")
    tcv.createButton("b")
    tcv.startWindowThread()
    assert isinstance(tcv.currentUIFramework(), str)
    tcv.redirectError(None)
    assert tcv.getDefaultAlgorithmHint() in (0, 1, 2)
    tcv.destroyAllWindows()
