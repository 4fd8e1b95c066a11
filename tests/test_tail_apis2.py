"""Round-3 sweep part 2 vs the cv2 oracle: core utility surface
(concat/repeat/reduce/sort/channels/gemm/covar/scalar math) and calib3d
tail APIs (composeRT/decomposeEssentialMat/decomposeProjectionMatrix/
correctMatches/stereo utils)."""

import numpy as np
import pytest

from common import cv2, assert_exact

import opencv_tpu as tcv


def test_concat_repeat():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (4, 5), np.uint8)
    b = rng.integers(0, 255, (4, 3), np.uint8)
    assert_exact(tcv.hconcat([a, b]), cv2.hconcat([a, b]))
    c = rng.integers(0, 255, (2, 5), np.uint8)
    assert_exact(tcv.vconcat([a, c]), cv2.vconcat([a, c]))
    assert_exact(tcv.repeat(a, 2, 3), cv2.repeat(a, 2, 3))


def test_reduce_sort():
    rng = np.random.default_rng(1)
    a = rng.random((5, 7)).astype(np.float32)
    for rt in (cv2.REDUCE_SUM, cv2.REDUCE_AVG, cv2.REDUCE_MAX,
               cv2.REDUCE_MIN):
        ref = cv2.reduce(a, 0, rt)
        got = np.asarray(tcv.reduce(a, 0, rt), ref.dtype)
        assert np.allclose(got, ref, atol=1e-5), rt
    assert_exact(tcv.reduceArgMax(a, 1), cv2.reduceArgMax(a, 1))
    assert_exact(tcv.reduceArgMin(a, 0), cv2.reduceArgMin(a, 0))
    b = rng.integers(0, 100, (6, 4)).astype(np.int32)
    for fl in (cv2.SORT_EVERY_ROW | cv2.SORT_ASCENDING,
               cv2.SORT_EVERY_COLUMN | cv2.SORT_DESCENDING):
        assert_exact(tcv.sort(b, fl), cv2.sort(b, fl), f"sort {fl}")
    fl = cv2.SORT_EVERY_ROW | cv2.SORT_ASCENDING
    assert_exact(tcv.sortIdx(b, fl), cv2.sortIdx(b, fl))


def test_find_nonzero_checkrange():
    rng = np.random.default_rng(2)
    a = (rng.random((8, 9)) > 0.8).astype(np.uint8)
    ref = cv2.findNonZero(a)
    got = tcv.findNonZero(a)
    assert_exact(got, ref)
    assert tcv.hasNonZero(a) == bool(cv2.hasNonZero(a))
    f = rng.random((4, 4)).astype(np.float32)
    assert tcv.checkRange(f) == cv2.checkRange(f)[0]
    f[1, 1] = np.nan
    p = tcv.patchNaNs(f, 7.0)
    ref = f.copy()
    cv2.patchNaNs(ref, 7.0)
    assert_exact(p, ref)


def test_channel_ops():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 255, (5, 6, 3), np.uint8)
    assert_exact(tcv.extractChannel(a, 1), cv2.extractChannel(a, 1))
    s = rng.integers(0, 255, (5, 6), np.uint8)
    ref = a.copy()
    cv2.insertChannel(s, ref, 2)
    assert_exact(tcv.insertChannel(s, a, 2), ref)


def test_gemm_covar():
    rng = np.random.default_rng(4)
    A = rng.random((3, 4))
    B = rng.random((4, 5))
    C = rng.random((3, 5))
    for flags in (0, cv2.GEMM_1_T):
        Aa = A.T if flags else A
        ref = cv2.gemm(Aa, B, 1.5, C, 0.5, flags=flags)
        got = tcv.gemm(Aa, B, 1.5, C, 0.5, flags=flags)
        assert np.allclose(got, ref, atol=1e-10)
    X = rng.random((10, 4))
    refc, refm = cv2.calcCovarMatrix(
        X, None, cv2.COVAR_NORMAL | cv2.COVAR_ROWS | cv2.COVAR_SCALE)
    gotc, gotm = tcv.calcCovarMatrix(
        X, None, tcv.COVAR_NORMAL | tcv.COVAR_ROWS | tcv.COVAR_SCALE)
    assert np.allclose(gotc, refc, atol=1e-10)
    assert np.allclose(gotm.ravel(), np.asarray(refm).ravel(), atol=1e-10)


def test_scalar_math_cliplines():
    assert abs(tcv.fastAtan2(3.0, 4.0) - cv2.fastAtan2(3.0, 4.0)) < 1e-4
    assert abs(tcv.fastAtan2(-2.0, -7.0)
               - cv2.fastAtan2(-2.0, -7.0)) < 1e-4
    assert abs(tcv.cubeRoot(27.5) - cv2.cubeRoot(27.5)) < 1e-5
    assert abs(tcv.cubeRoot(-8.0) - cv2.cubeRoot(-8.0)) < 1e-6
    for (p1, p2) in [((-5, -5), (20, 20)), ((2, 3), (8, 4)),
                     ((-10, 5), (30, 5)), ((-5, -5), (-2, -3))]:
        ok_r, a_r, b_r = cv2.clipLine((0, 0, 10, 10), p1, p2)
        ok_g, a_g, b_g = tcv.clipLine((0, 0, 10, 10), p1, p2)
        assert ok_g == ok_r
        if ok_r:
            assert a_g == a_r and b_g == b_r, (p1, p2, a_g, a_r, b_g, b_r)


def test_compose_decompose():
    rng = np.random.default_rng(5)
    r1 = rng.normal(0, 0.5, 3)
    r2 = rng.normal(0, 0.5, 3)
    t1 = rng.normal(0, 1, 3)
    t2 = rng.normal(0, 1, 3)
    ref = cv2.composeRT(r1, t1, r2, t2)
    got = tcv.composeRT(r1, t1, r2, t2)
    assert np.allclose(got[0].ravel(), np.asarray(ref[0]).ravel(),
                       atol=1e-8)
    assert np.allclose(got[1].ravel(), np.asarray(ref[1]).ravel(),
                       atol=1e-8)


def _skew(t):
    return np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]],
                     [-t[1], t[0], 0]])


def test_decompose_essential():
    rng = np.random.default_rng(6)
    rvec = rng.normal(0, 0.4, 3)
    R = cv2.Rodrigues(rvec)[0]
    t = rng.normal(0, 1, 3)
    t = t / np.linalg.norm(t)
    E = _skew(t) @ R
    ref = cv2.decomposeEssentialMat(E)
    got = tcv.decomposeEssentialMat(E)
    # rotation pair must match as a SET (sign conventions differ per
    # implementation); translation up to sign
    refs = [np.asarray(ref[0]), np.asarray(ref[1])]
    for g in (got[0], got[1]):
        assert any(np.allclose(g, r, atol=1e-8) for r in refs)
    assert np.allclose(np.abs(got[2].ravel()),
                       np.abs(np.asarray(ref[2]).ravel()), atol=1e-8)


def test_decompose_projection():
    rng = np.random.default_rng(7)
    K = np.array([[500, 0, 320], [0, 480, 240], [0, 0, 1]], np.float64)
    R = cv2.Rodrigues(rng.normal(0, 0.3, 3))[0]
    t = rng.normal(0, 2, (3, 1))
    P = K @ np.hstack([R, t])
    ref = cv2.decomposeProjectionMatrix(P)
    got = tcv.decomposeProjectionMatrix(P)
    assert np.allclose(got[0] / got[0][2, 2],
                       np.asarray(ref[0]) / np.asarray(ref[0])[2, 2],
                       atol=1e-6)
    assert np.allclose(got[1], np.asarray(ref[1]), atol=1e-6)
    c_ref = np.asarray(ref[2]).ravel()
    c_got = got[2].ravel()
    assert np.allclose(c_got / c_got[3], c_ref / c_ref[3], atol=1e-6)


def test_calibration_matrix_values():
    K = np.array([[800, 0, 310], [0, 790, 250], [0, 0, 1]], np.float64)
    ref = cv2.calibrationMatrixValues(K, (640, 480), 6.4, 4.8)
    got = tcv.calibrationMatrixValues(K, (640, 480), 6.4, 4.8)
    assert abs(got[0] - ref[0]) < 1e-6 and abs(got[1] - ref[1]) < 1e-6
    assert abs(got[2] - ref[2]) < 1e-6
    assert abs(got[4] - ref[4]) < 1e-9


def test_correct_matches():
    rng = np.random.default_rng(8)
    rvec = rng.normal(0, 0.3, 3)
    R = cv2.Rodrigues(rvec)[0]
    t = np.array([1.0, 0.2, 0.1])
    E = _skew(t) @ R
    K = np.array([[400, 0, 160], [0, 400, 120], [0, 0, 1]], np.float64)
    F = np.linalg.inv(K).T @ E @ np.linalg.inv(K)
    # real correspondences (projections of 3D points) + small noise, so
    # the Hartley-Sturm optimum is well conditioned.  (For far-off pairs
    # cvSolvePoly's 100-iteration roots drift visibly; our np.roots
    # optimum has strictly smaller correction distance — verified.)
    X = rng.uniform(-1, 1, (6, 3)) + np.array([0, 0, 5.0])
    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([R, t[:, None]])
    def _proj(P):
        q = (P @ np.hstack([X, np.ones((6, 1))]).T).T
        return (q[:, :2] / q[:, 2:3])[None]
    pts = _proj(P1) + rng.normal(0, 0.5, (1, 6, 2))
    pts2 = _proj(P2) + rng.normal(0, 0.5, (1, 6, 2))
    ref1, ref2 = cv2.correctMatches(F, pts, pts2)
    got1, got2 = tcv.correctMatches(F, pts, pts2)
    assert np.allclose(got1, ref1, atol=1e-4)
    assert np.allclose(got2, ref2, atol=1e-4)
    # corrected pairs satisfy the epipolar constraint
    h1 = np.concatenate([got1[0], np.ones((6, 1))], 1)
    h2 = np.concatenate([got2[0], np.ones((6, 1))], 1)
    assert np.abs(np.einsum("ni,ij,nj->n", h2, F, h1)).max() < 1e-9


def test_stereo_utils():
    rng = np.random.default_rng(9)
    disp = (rng.integers(0, 64, (30, 40)) * 16).astype(np.int16)
    disp[10:12, 10:12] = 40 * 16   # small speckle
    ref = disp.copy()
    cv2.filterSpeckles(ref, 0, 8, 2 * 16)
    got = tcv.filterSpeckles(disp, 0, 8, 2 * 16)
    assert_exact(got, ref)

    ref_roi = cv2.getValidDisparityROI((0, 0, 40, 30), (0, 0, 40, 30),
                                       0, 16, 5)
    got_roi = tcv.getValidDisparityROI((0, 0, 40, 30), (0, 0, 40, 30),
                                       0, 16, 5)
    assert tuple(got_roi) == tuple(ref_roi)

    Q = np.array([[1, 0, 0, -20], [0, 1, 0, -15], [0, 0, 0, 400],
                  [0, 0, 1.0 / 30, 0]], np.float64)
    ref3d = cv2.reprojectImageTo3D(disp, Q)
    got3d = tcv.reprojectImageTo3D(disp, Q)
    m = np.isfinite(ref3d) & (np.abs(ref3d) < 1e5)
    assert np.allclose(got3d[m], ref3d[m], rtol=1e-4, atol=1e-3)


def test_default_new_camera_matrix():
    K = np.array([[300, 0, 100], [0, 280, 90], [0, 0, 1]], np.float64)
    ref = cv2.getDefaultNewCameraMatrix(K, (200, 160), True)
    got = tcv.getDefaultNewCameraMatrix(K, (200, 160), True)
    assert np.allclose(got, ref)


def test_system_surface():
    assert tcv.getTickFrequency() > 0
    t0 = tcv.getTickCount()
    assert tcv.getTickCount() >= t0
    assert tcv.getNumThreads() >= 1
    tcv.setNumThreads(2)     # documented no-op
    assert isinstance(tcv.getVersionString(), str)
    assert "opencv_tpu" in tcv.getBuildInformation()
