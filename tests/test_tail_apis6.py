"""Round-3 sweep part 6 vs the cv2 oracle: solvePnPGeneric,
solvePnPRefine{LM,VVS}, initCameraMatrix2D, calibrateCameraExtended,
filterHomographyDecompByVisibleRefpoints, initInverseRectificationMap."""

import numpy as np
import pytest

from common import cv2

import opencv_tpu as tcv


def _scene(seed=0, n=20):
    rng = np.random.default_rng(seed)
    K = np.array([[520, 0, 320], [0, 510, 240], [0, 0, 1]], np.float64)
    obj = rng.uniform(-1, 1, (n, 3))
    obj[:, 2] += 4.0
    rvec = rng.normal(0, 0.2, 3)
    tvec = np.array([0.1, -0.2, 0.5])
    img, _ = cv2.projectPoints(obj, rvec, tvec, K, None)
    return K, obj, img.reshape(-1, 2), rvec, tvec


def test_solve_pnp_refine_lm():
    K, obj, img, rvec, tvec = _scene(1)
    r0 = rvec + 0.05
    t0 = tvec + np.array([0.05, -0.03, 0.1])
    ref_r, ref_t = cv2.solvePnPRefineLM(obj, img, K, None,
                                        r0.reshape(3, 1).copy(),
                                        t0.reshape(3, 1).copy())
    got_r, got_t = tcv.solvePnPRefineLM(obj, img, K, None, r0, t0)
    assert np.allclose(got_r.ravel(), np.asarray(ref_r).ravel(),
                       atol=1e-6)
    assert np.allclose(got_t.ravel(), np.asarray(ref_t).ravel(),
                       atol=1e-6)


def test_solve_pnp_refine_vvs():
    K, obj, img, rvec, tvec = _scene(2)
    r0 = rvec + 0.04
    t0 = tvec + np.array([-0.05, 0.02, 0.08])
    ref_r, ref_t = cv2.solvePnPRefineVVS(obj, img, K, None,
                                         r0.reshape(3, 1).copy(),
                                         t0.reshape(3, 1).copy())
    got_r, got_t = tcv.solvePnPRefineVVS(obj, img, K, None, r0, t0)
    assert np.allclose(got_r.ravel(), np.asarray(ref_r).ravel(),
                       atol=1e-6)
    assert np.allclose(got_t.ravel(), np.asarray(ref_t).ravel(),
                       atol=1e-6)


def test_solve_pnp_generic():
    K, obj, img, rvec, tvec = _scene(3)
    n_ref, ref_rs, ref_ts, ref_e = cv2.solvePnPGeneric(
        obj, img, K, None, flags=cv2.SOLVEPNP_ITERATIVE)
    n_got, got_rs, got_ts, got_e = tcv.solvePnPGeneric(
        obj, img, K, None, flags=tcv.SOLVEPNP_ITERATIVE)
    assert n_got == n_ref == 1
    assert np.allclose(got_rs[0].ravel(),
                       np.asarray(ref_rs[0]).ravel(), atol=1e-5)
    assert np.allclose(got_ts[0].ravel(),
                       np.asarray(ref_ts[0]).ravel(), atol=1e-5)
    # P3P: multiple candidate poses; best one must match the truth
    n_got, got_rs, got_ts, _ = tcv.solvePnPGeneric(
        obj[:3], img[:3], K, None, flags=tcv.SOLVEPNP_P3P)
    assert n_got >= 1


def test_init_camera_matrix_2d():
    rng = np.random.default_rng(4)
    K = np.array([[480, 0, 319.5], [0, 460, 239.5], [0, 0, 1]],
                 np.float64)
    objs, imgs = [], []
    for v in range(4):
        o = np.zeros((6 * 7, 3), np.float32)
        o[:, :2] = np.mgrid[0:7, 0:6].T.reshape(-1, 2)
        rvec = rng.normal(0, 0.4, 3)
        tvec = np.array([-3, -2.5, 9.0]) + rng.normal(0, 0.3, 3)
        im, _ = cv2.projectPoints(o, rvec, tvec, K, None)
        objs.append(o)
        imgs.append(im.reshape(-1, 2).astype(np.float32))
    ref = cv2.initCameraMatrix2D(objs, imgs, (640, 480))
    got = tcv.initCameraMatrix2D(objs, imgs, (640, 480))
    assert np.allclose(got, np.asarray(ref), rtol=2e-2)


def test_calibrate_camera_extended():
    rng = np.random.default_rng(5)
    K = np.array([[500, 0, 319.5], [0, 500, 239.5], [0, 0, 1]],
                 np.float64)
    objs, imgs = [], []
    for v in range(5):
        o = np.zeros((6 * 7, 3), np.float32)
        o[:, :2] = np.mgrid[0:7, 0:6].T.reshape(-1, 2)
        rvec = rng.normal(0, 0.4, 3)
        tvec = np.array([-3, -2.5, 10.0]) + rng.normal(0, 0.3, 3)
        im, _ = cv2.projectPoints(o, rvec, tvec, K, None)
        objs.append(o)
        imgs.append(im.reshape(-1, 2).astype(np.float32))
    out = tcv.calibrateCameraExtended(objs, imgs, (640, 480))
    rms, Kg, dist, rvecs, tvecs, std_i, std_e, pve = out
    assert rms < 0.5
    assert np.allclose(Kg, K, atol=2.0)
    assert pve.shape == (5, 1) and (pve < 1.0).all()
    assert std_i.shape[0] >= 4


def test_filter_homography_decomp():
    rng = np.random.default_rng(6)
    K = np.array([[400, 0, 160], [0, 400, 120], [0, 0, 1]], np.float64)
    R = cv2.Rodrigues(np.array([0.05, -0.1, 0.02]))[0]
    t = np.array([[0.2], [0.05], [0.1]])
    n = np.array([[0.1], [-0.05], [1.0]])
    n = n / np.linalg.norm(n)
    d = 3.0
    H = K @ (R + t @ n.T / d) @ np.linalg.inv(K)
    nsol, Rs, Ts, Ns = cv2.decomposeHomographyMat(H, K)
    pts1 = rng.uniform(-0.3, 0.3, (15, 2)).astype(np.float32)
    den = (pts1 @ n[:2].ravel() + n[2] * 1.0)
    # rectified (normalized) correspondences via H on normalized coords
    Hn = np.linalg.inv(K) @ H @ K
    ones = np.ones((15, 1))
    p2 = (np.hstack([pts1, ones]) @ Hn.T)
    pts2 = (p2[:, :2] / p2[:, 2:3]).astype(np.float32)
    ref = cv2.filterHomographyDecompByVisibleRefpoints(
        Rs, Ns, pts1.reshape(-1, 1, 2), pts2.reshape(-1, 1, 2))
    got = tcv.filterHomographyDecompByVisibleRefpoints(Rs, Ns, pts1,
                                                       pts2)
    assert np.array_equal(np.asarray(got).ravel(),
                          np.asarray(ref).ravel())


def test_init_inverse_rectification_map():
    K = np.array([[300, 0, 80], [0, 290, 60], [0, 0, 1]], np.float64)
    dist = np.array([0.05, -0.02, 0.001, 0.001, 0.0])
    newK = np.array([[280, 0, 78], [0, 275, 59], [0, 0, 1]], np.float64)
    ref1, ref2 = cv2.initInverseRectificationMap(
        K, dist, None, newK, (160, 120), cv2.CV_32FC1)
    got1, got2 = tcv.initInverseRectificationMap(
        K, dist, None, newK, (160, 120))
    assert np.allclose(got1, ref1, atol=5e-2)
    assert np.allclose(got2, ref2, atol=5e-2)
