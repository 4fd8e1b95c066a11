"""calib3d geometry vs cv2."""

import numpy as np
import pytest

from common import cv2, assert_near

import opencv_tpu as tcv


def _cam():
    return np.array([[500, 0, 320], [0, 500, 240], [0, 0, 1]], np.float64), \
        np.array([0.1, -0.05, 0.001, 0.002, 0.01], np.float64)


def test_rodrigues_roundtrip():
    for seed in range(3):
        rng = np.random.default_rng(seed)
        rvec = rng.normal(0, 1, 3)
        rR, _ = cv2.Rodrigues(rvec)
        oR, _ = tcv.Rodrigues(rvec)
        assert_near(oR, rR, atol=1e-10)
        rv, _ = cv2.Rodrigues(rR)
        ov, _ = tcv.Rodrigues(oR)
        assert_near(ov, rv, atol=1e-8)


def test_project_points():
    K, dist = _cam()
    rng = np.random.default_rng(0)
    obj = rng.normal(0, 1, (15, 3)) + [0, 0, 5]
    rvec = np.array([0.1, -0.2, 0.05])
    tvec = np.array([0.3, -0.1, 1.0])
    ref, _ = cv2.projectPoints(obj, rvec, tvec, K, dist)
    ours, _ = tcv.projectPoints(obj, rvec, tvec, K, dist)
    assert_near(ours, ref, atol=1e-6)


def test_undistort_points():
    K, dist = _cam()
    rng = np.random.default_rng(1)
    pts = rng.uniform([100, 100], [540, 380], (20, 2)).astype(np.float32)
    ref = cv2.undistortPoints(pts.reshape(-1, 1, 2), K, dist)
    ours = tcv.undistortPoints(pts, K, dist)
    assert_near(ours, ref, atol=1e-4)


def test_undistort_image():
    K, dist = _cam()
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (480, 640), np.uint8)
    # our maps match cv2's initUndistortRectifyMap exactly and our remap
    # matches cv2.remap exactly; cv2.undistort itself goes through a
    # lower-precision internal path, so allow small deviations vs it
    refm_x, refm_y = cv2.initUndistortRectifyMap(K, dist, None, K,
                                                 (640, 480), cv2.CV_32FC1)
    ourm_x, ourm_y = tcv.initUndistortRectifyMap(K, dist, None, K, (640, 480))
    assert np.abs(refm_x - ourm_x).max() == 0
    assert np.abs(refm_y - ourm_y).max() == 0
    ref_remap = cv2.remap(img, refm_x, refm_y, cv2.INTER_LINEAR)
    ours_remap = np.asarray(tcv.remap(img, refm_x, refm_y, tcv.INTER_LINEAR))
    assert np.array_equal(ref_remap, ours_remap)
    ref = cv2.undistort(img, K, dist)
    ours = np.asarray(tcv.undistort(img, K, dist))
    d = np.abs(ref.astype(int) - ours.astype(int))
    assert np.median(d) <= 1 and (d <= 2).mean() > 0.9


def test_find_homography_ransac():
    rng = np.random.default_rng(3)
    H_true = np.array([[1.1, 0.05, 10], [-0.03, 0.95, -5], [1e-4, -2e-4, 1]])
    src = rng.uniform(0, 500, (60, 2))
    dst = cv2.perspectiveTransform(src.reshape(-1, 1, 2), H_true).reshape(-1, 2)
    dst[:10] += rng.uniform(20, 50, (10, 2))  # outliers
    rH, rmask = cv2.findHomography(src, dst, cv2.RANSAC, 3.0)
    oH, omask = tcv.findHomography(src, dst, tcv.RANSAC, 3.0)
    assert_near(oH / oH[2, 2], H_true / H_true[2, 2], atol=1e-2)
    assert omask[10:].all() and omask[:10].sum() == 0


def test_solve_pnp():
    K, dist = _cam()
    rng = np.random.default_rng(4)
    obj = rng.uniform(-1, 1, (20, 3))
    rvec_t = np.array([0.2, -0.1, 0.3])
    tvec_t = np.array([0.1, 0.2, 5.0])
    img, _ = cv2.projectPoints(obj, rvec_t, tvec_t, K, dist)
    okr, rr, rt = cv2.solvePnP(obj, img, K, dist)
    oko, orr, ot = tcv.solvePnP(obj, img, K, dist)
    assert_near(orr, rvec_t.reshape(3, 1), atol=1e-4)
    assert_near(ot, tvec_t.reshape(3, 1), atol=1e-3)


def test_fundamental_epilines():
    rng = np.random.default_rng(5)
    # synthetic stereo
    P1 = np.hstack([np.eye(3), np.zeros((3, 1))])
    Rm, _ = cv2.Rodrigues(np.array([0.02, 0.3, 0.01]))
    t = np.array([[1.0], [0.05], [0.02]])
    P2 = np.hstack([Rm, t])
    X = rng.uniform(-1, 1, (40, 3)) + [0, 0, 6]
    x1 = (P1 @ np.vstack([X.T, np.ones(40)])).T
    x2 = (P2 @ np.vstack([X.T, np.ones(40)])).T
    p1 = (x1[:, :2] / x1[:, 2:]).astype(np.float64)
    p2 = (x2[:, :2] / x2[:, 2:]).astype(np.float64)
    oF, om = tcv.findFundamentalMat(p1, p2, tcv.FM_8POINT)
    # epipolar constraint ~ 0
    err = [abs(np.append(p2[i], 1) @ oF @ np.append(p1[i], 1)) for i in range(40)]
    assert max(err) < 1e-6
    lines = tcv.computeCorrespondEpilines(p1, 1, oF)
    rlines = cv2.computeCorrespondEpilines(p1.reshape(-1, 1, 2), 1, oF)
    assert_near(np.abs(lines), np.abs(rlines), atol=1e-4)


def test_triangulate():
    P1 = np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = np.hstack([np.eye(3), np.array([[-1.0], [0], [0]])])
    X = np.array([[0.2, 0.1, 5.0], [-0.3, 0.4, 7.0]]).T
    x1 = X[:2] / X[2]
    Xs = X + np.array([[-1.0], [0], [0]])
    x2 = Xs[:2] / Xs[2]
    ref = cv2.triangulatePoints(P1, P2, x1, x2)
    ours = tcv.triangulatePoints(P1, P2, x1, x2)
    refp = (ref[:3] / ref[3]).T
    ourp = (ours[:3] / ours[3]).T
    assert_near(ourp, refp, atol=1e-8)


def test_stereo_bm():
    rng = np.random.default_rng(6)
    # synthetic stereo pair with known disparity 8
    scene = cv2.GaussianBlur(rng.integers(0, 256, (96, 160), np.uint8),
                             (3, 3), 1)
    disp_true = 8
    left = scene
    right = np.roll(scene, -disp_true, axis=1)
    ours = tcv.StereoBM_create(numDisparities=32, blockSize=15) \
        .compute(left, right)
    ref = None
    if hasattr(cv2, "StereoBM_create"):
        ref = cv2.StereoBM_create(numDisparities=32, blockSize=15) \
            .compute(left, right)
    valid = ours > 0
    assert valid.mean() > 0.3
    med = np.median(ours[valid]) / 16.0
    assert abs(med - disp_true) <= 1.0, f"median disparity {med}"
    if ref is not None:
        assert np.array_equal(ours, ref)  # bit-exact


def test_stereo_bm_bit_exact_params():
    """StereoBM is bit-exact vs the wheel across prefilter types,
    minDisparity (incl. negative), window sizes, texture/uniqueness,
    and speckle filtering (stereobm.cpp parity incl. its asymmetric
    window clamps and valid-ROI blanking)."""
    rng = np.random.default_rng(2)
    base = (cv2.GaussianBlur(rng.random((64, 160)).astype(np.float32),
                             (0, 0), 1.5) * 255).astype(np.uint8)
    left = np.roll(base, 8, axis=1)
    cases = [
        dict(nd=32, bs=9), dict(nd=32, bs=25),
        dict(nd=32, bs=9, mindisp=4), dict(nd=32, bs=9, mindisp=-2),
        dict(nd=32, bs=9, pftype=0, pfsize=21),
        dict(nd=32, bs=9, speckle=(50, 16)),
    ]
    for c in cases:
        r = cv2.StereoBM_create(c['nd'], c['bs'])
        o = tcv.StereoBM_create(c['nd'], c['bs'])
        for obj in (r, o):
            if 'mindisp' in c:
                obj.setMinDisparity(c['mindisp'])
            if 'speckle' in c:
                obj.setSpeckleWindowSize(c['speckle'][0])
                obj.setSpeckleRange(c['speckle'][1])
            if 'pftype' in c:
                obj.setPreFilterType(c['pftype'])
            if 'pfsize' in c:
                obj.setPreFilterSize(c['pfsize'])
        assert np.array_equal(o.compute(left, base),
                              r.compute(left, base)), c


def test_file_storage_roundtrip(tmp_path):
    p = str(tmp_path / "data.json")
    fs = tcv.FileStorage(p, tcv.FILE_STORAGE_WRITE)
    M = np.arange(12, dtype=np.float32).reshape(3, 4)
    fs.write("mat", M)
    fs.write("scalar", 3.5)
    fs.write("name", "hello")
    fs.release()
    fr = tcv.FileStorage(p, tcv.FILE_STORAGE_READ)
    assert np.array_equal(fr.getNode("mat").mat(), M)
    assert fr.getNode("scalar").real() == 3.5
    assert fr.getNode("name").string() == "hello"
    # cv2 can read our JSON
    if hasattr(cv2, "FileStorage"):
        rf = cv2.FileStorage(p, cv2.FILE_STORAGE_READ)
        assert np.array_equal(rf.getNode("mat").mat(), M)


def test_sgbm_matches_cv2():
    rng = np.random.default_rng(0)
    base = (cv2.GaussianBlur(rng.random((100, 160)).astype(np.float32),
                             (0, 0), 1.5) * 255).astype(np.uint8)
    left = np.roll(base, 6, axis=1)
    for mode in (0, 1):
        cvmode = cv2.STEREO_SGBM_MODE_HH if mode else cv2.STEREO_SGBM_MODE_SGBM
        ref = cv2.StereoSGBM_create(0, 16, 5, P1=200, P2=800,
                                    uniquenessRatio=10,
                                    mode=cvmode).compute(left, base)
        ours = tcv.StereoSGBM_create(0, 16, 5, P1=200, P2=800,
                                     uniquenessRatio=10,
                                     mode=mode).compute(left, base)
        assert ours.dtype == np.int16 and ours.shape == ref.shape
        assert np.array_equal(ours, ref), mode  # bit-exact


def test_sgbm_bit_exact_params():
    """SGBM is bit-exact vs the wheel across parameters: minDisparity
    (incl. negative), numDisparities, blockSize, P1/P2, uniqueness,
    disp12MaxDiff, speckle filtering (stereosgbm.cpp + the 3x3 median
    and filterSpecklesImpl post-passes)."""
    rng = np.random.default_rng(1)
    base = (cv2.GaussianBlur(rng.random((90, 150)).astype(np.float32),
                             (0, 0), 1.5) * 255).astype(np.uint8)
    left = np.roll(base, 5, axis=1)
    cfgs = [
        dict(minDisparity=2, numDisparities=16, blockSize=7, P1=100,
             P2=1000, uniquenessRatio=15, disp12MaxDiff=2),
        dict(minDisparity=-4, numDisparities=32, blockSize=5, P1=200,
             P2=800, uniquenessRatio=10),
        dict(minDisparity=0, numDisparities=16, blockSize=5, P1=200,
             P2=800, uniquenessRatio=10, speckleWindowSize=50,
             speckleRange=2),
    ]
    for cfg in cfgs:
        for mode in (0, 1):
            cvmode = (cv2.STEREO_SGBM_MODE_HH if mode
                      else cv2.STEREO_SGBM_MODE_SGBM)
            ref = cv2.StereoSGBM_create(**cfg, mode=cvmode).compute(
                left, base)
            ours = tcv.StereoSGBM_create(**cfg, mode=mode).compute(
                left, base)
            assert np.array_equal(ours, ref), (cfg, mode)


def _make_board(cols, rows, sq=30, angle=7, noise=8, seed=0):
    W, H = (cols + 3) * sq, (rows + 3) * sq
    img = np.full((H, W), 255, np.uint8)
    for i in range(rows + 1):
        for j in range(cols + 1):
            if (i + j) % 2 == 0:
                img[(i + 1) * sq:(i + 2) * sq, (j + 1) * sq:(j + 2) * sq] = 0
    M = cv2.getRotationMatrix2D((W / 2, H / 2), angle, 1.0)
    img = cv2.warpAffine(img, M, (W, H), borderValue=180)
    rng = np.random.default_rng(seed)
    return np.clip(img.astype(int) + rng.integers(-noise, noise, img.shape),
                   0, 255).astype(np.uint8)


def test_find_chessboard_corners():
    for cols, rows, ang in [(7, 5, 7), (9, 6, 0), (6, 4, -12)]:
        img = _make_board(cols, rows, angle=ang)
        okr, cref = cv2.findChessboardCorners(img, (cols, rows))
        oko, cour = tcv.findChessboardCorners(img, (cols, rows))
        assert okr and oko
        a = cref.reshape(-1, 2)
        g = cour.reshape(rows, cols, 2)
        variants = [g.reshape(-1, 2), g[::-1, ::-1].reshape(-1, 2),
                    np.transpose(g, (1, 0, 2)).reshape(-1, 2)[::-1],
                    np.transpose(g[::-1, ::-1], (1, 0, 2)).reshape(-1, 2)[::-1]]
        best = min(np.linalg.norm(a - v, axis=1).max() for v in variants)
        assert best < 0.3, (cols, rows, ang, best)


def test_corner_subpix():
    img = _make_board(7, 5, angle=0, noise=4)
    ok, corners = cv2.findChessboardCorners(img, (7, 5),
                                            flags=cv2.CALIB_CB_ADAPTIVE_THRESH)
    assert ok
    rough = corners.reshape(-1, 2) + np.random.default_rng(1).uniform(
        -1.5, 1.5, (35, 2)).astype(np.float32)
    crit = (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 0.01)
    ref = cv2.cornerSubPix(img, rough.copy().reshape(-1, 1, 2), (5, 5),
                           (-1, -1), crit)
    ours = tcv.cornerSubPix(img, rough.copy().reshape(-1, 1, 2), (5, 5),
                            (-1, -1), crit)
    d = np.linalg.norm(ref.reshape(-1, 2) - ours.reshape(-1, 2), axis=1)
    assert np.median(d) < 0.1, np.median(d)


def test_calibrate_camera_matches_cv2():
    rng = np.random.default_rng(0)
    K_gt = np.array([[800., 0, 320], [0, 780, 240], [0, 0, 1]])
    dist_gt = np.array([0.1, -0.2, 0.001, 0.002, 0.05])
    obj = np.array([[x, y, 0.0] for y in range(6) for x in range(7)],
                   np.float32) * 0.03
    objpts, imgpts = [], []
    for i in range(8):
        rvec = rng.normal(0, 0.25, 3)
        tvec = np.array([rng.normal(0, 0.05), rng.normal(0, 0.05),
                         0.5 + 0.1 * i])
        proj, _ = cv2.projectPoints(obj, rvec, tvec, K_gt, dist_gt)
        pts = proj.reshape(-1, 2) + rng.normal(0, 0.1, (len(obj), 2))
        objpts.append(obj)
        imgpts.append(pts.astype(np.float32))
    ret_r, K_r, d_r, rv_r, tv_r = cv2.calibrateCamera(objpts, imgpts,
                                                      (640, 480), None, None)
    ret_o, K_o, d_o, rv_o, tv_o = tcv.calibrateCamera(objpts, imgpts,
                                                      (640, 480))
    assert abs(ret_o - ret_r) < 1e-3
    np.testing.assert_allclose(K_o, K_r, atol=0.05)
    np.testing.assert_allclose(d_o.ravel(), d_r.ravel(), atol=1e-3)
    for a, b in zip(rv_o, rv_r):
        np.testing.assert_allclose(np.asarray(a).ravel(),
                                   np.asarray(b).ravel(), atol=1e-3)


def test_stereo_rectify_matches_cv2():
    K = np.array([[700., 0, 320], [0, 700, 240], [0, 0, 1]])
    d = np.array([0.05, -0.1, 0.001, 0.001, 0.02])
    R, _ = cv2.Rodrigues(np.array([0.01, 0.02, -0.005]))
    T = np.array([[-0.12], [0.002], [0.003]])
    for alpha in (-1, 0, 0.5, 1):
        ref = cv2.stereoRectify(K, d, K, d, (640, 480), R, T, alpha=alpha)
        ours = tcv.stereoRectify(K, d, K, d, (640, 480), R, T, alpha=alpha)
        for a, b in zip(ref[:5], ours[:5]):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-4)
        assert tuple(ours[5]) == tuple(ref[5])
        assert tuple(ours[6]) == tuple(ref[6])


def test_fisheye_model_matches_cv2():
    K = np.array([[400., 0, 320], [0, 390, 240], [0, 0, 1]])
    D = np.array([0.1, -0.05, 0.01, -0.002])
    rng = np.random.default_rng(0)
    obj = rng.normal(0, 0.4, (30, 3)) + [0, 0, 2.5]
    rvec = np.array([0.05, -0.1, 0.02])
    tvec = np.array([0.1, -0.05, 0.3])
    ref, _ = cv2.fisheye.projectPoints(obj.reshape(-1, 1, 3), rvec, tvec,
                                       K, D)
    ours, _ = tcv.fisheye.projectPoints(obj, rvec, tvec, K, D)
    np.testing.assert_allclose(np.asarray(ours).reshape(-1, 2),
                               np.asarray(ref).reshape(-1, 2), atol=1e-9)
    pts = np.asarray(ref, np.float64).reshape(-1, 1, 2)
    np.testing.assert_allclose(
        np.asarray(tcv.fisheye.undistortPoints(pts, K, D)),
        np.asarray(cv2.fisheye.undistortPoints(pts, K, D)), atol=1e-9)
    m1r, m2r = cv2.fisheye.initUndistortRectifyMap(K, D, np.eye(3), K,
                                                   (640, 480), cv2.CV_32FC1)
    m1o, m2o = tcv.fisheye.initUndistortRectifyMap(K, D, np.eye(3), K,
                                                   (640, 480))
    np.testing.assert_array_equal(m1o, m1r)
    np.testing.assert_array_equal(m2o, m2r)
    Kn_r = cv2.fisheye.estimateNewCameraMatrixForUndistortRectify(
        K, D, (640, 480), np.eye(3), balance=0.3)
    Kn_o = tcv.fisheye.estimateNewCameraMatrixForUndistortRectify(
        K, D, (640, 480), np.eye(3), balance=0.3)
    np.testing.assert_allclose(Kn_o, Kn_r, atol=1e-9)


def test_two_view_geometry():
    rng = np.random.default_rng(0)
    K = np.array([[600., 0, 320], [0, 600, 240], [0, 0, 1]])
    R_gt, _ = cv2.Rodrigues(np.array([0.05, -0.15, 0.03]))
    t_gt = np.array([0.3, -0.1, 0.05])
    t_gt /= np.linalg.norm(t_gt)
    pts3 = rng.uniform(-1, 1, (60, 3)) + [0, 0, 4]
    p1 = pts3 @ K.T
    p1 = p1[:, :2] / p1[:, 2:3]
    pc2 = pts3 @ R_gt.T + t_gt
    p2 = pc2 @ K.T
    p2 = p2[:, :2] / p2[:, 2:3]
    p1 += rng.normal(0, 0.3, p1.shape)
    p2 += rng.normal(0, 0.3, p2.shape)

    E_o, m_o = tcv.findEssentialMat(p1, p2, K, tcv.RANSAC, 0.999, 1.0)
    assert m_o.sum() > 50
    n_o, R_o, t_o, _ = tcv.recoverPose(E_o, p1, p2, K)
    assert np.abs(R_o - R_gt).max() < 0.02
    assert np.abs(np.abs(t_o.ravel()) - np.abs(t_gt)).max() < 0.05

    n_gt = np.array([0.1, -0.2, 0.97])
    n_gt /= np.linalg.norm(n_gt)
    H_gt = K @ (R_gt + np.outer(t_gt, n_gt) / 3.0) @ np.linalg.inv(K)
    nr, Rs_r, ts_r, _ = cv2.decomposeHomographyMat(H_gt, K)
    no, Rs_o, ts_o, _ = tcv.decomposeHomographyMat(H_gt, K)
    assert no == nr == 4
    assert min(np.abs(np.asarray(R) - R_gt).max() for R in Rs_o) < 1e-6

    imgp = p1.copy()
    imgp[::6] += 40  # outliers
    okr, rv_r, tv_r, in_r = cv2.solvePnPRansac(pts3, imgp, K, np.zeros(5))
    oko, rv_o, tv_o, in_o = tcv.solvePnPRansac(pts3, imgp, K, np.zeros(5))
    assert oko and len(in_o) == len(in_r)
    np.testing.assert_allclose(np.asarray(rv_o).ravel(),
                               np.asarray(rv_r).ravel(), atol=1e-3)


def test_stereo_calibrate_matches_cv2():
    rng = np.random.default_rng(0)
    K1 = np.array([[700., 0, 320], [0, 690, 240], [0, 0, 1]])
    K2 = np.array([[710., 0, 315], [0, 705, 245], [0, 0, 1]])
    d1 = np.array([0.05, -0.1, 0.001, 0.001, 0.0])
    d2 = np.array([-0.02, 0.05, -0.001, 0.002, 0.0])
    R_gt, _ = cv2.Rodrigues(np.array([0.02, 0.25, -0.01]))
    T_gt = np.array([-0.2, 0.01, 0.02])
    obj = np.array([[x, y, 0.0] for y in range(6) for x in range(8)],
                   np.float32) * 0.04
    objpts, i1, i2 = [], [], []
    for k in range(8):
        rv = rng.normal(0, 0.3, 3)
        tv = np.array([rng.normal(0, 0.1), rng.normal(0, 0.1),
                       0.7 + 0.1 * k])
        p1, _ = cv2.projectPoints(obj, rv, tv, K1, d1)
        Rv, _ = cv2.Rodrigues(rv)
        rv2, _ = cv2.Rodrigues(R_gt @ Rv)
        p2, _ = cv2.projectPoints(obj, rv2, R_gt @ tv + T_gt, K2, d2)
        objpts.append(obj)
        i1.append((p1.reshape(-1, 2)
                   + rng.normal(0, 0.15, (len(obj), 2))).astype(np.float32))
        i2.append((p2.reshape(-1, 2)
                   + rng.normal(0, 0.15, (len(obj), 2))).astype(np.float32))
    ret = cv2.stereoCalibrate(objpts, i1, i2, K1, d1, K2, d2, (640, 480),
                              flags=cv2.CALIB_FIX_INTRINSIC)
    rms_r, _, _, _, _, R_r, T_r, E_r, F_r = ret
    rms_o, _, _, _, _, R_o, T_o, E_o, F_o = tcv.stereoCalibrate(
        objpts, i1, i2, K1, d1, K2, d2, (640, 480))
    assert abs(rms_o - rms_r) < 1e-3
    np.testing.assert_allclose(R_o, R_r, atol=1e-4)
    np.testing.assert_allclose(np.asarray(T_o).ravel(),
                               np.asarray(T_r).ravel(), atol=1e-4)


def test_points_3d_estimators_and_misc():
    rng = np.random.default_rng(0)
    p = rng.random((10, 2)).astype(np.float32)
    np.testing.assert_allclose(tcv.convertPointsToHomogeneous(p),
                               cv2.convertPointsToHomogeneous(p), atol=1e-6)
    h = rng.random((10, 3)).astype(np.float32) + 0.5
    np.testing.assert_allclose(tcv.convertPointsFromHomogeneous(h),
                               cv2.convertPointsFromHomogeneous(h),
                               atol=1e-5)
    a = rng.random((30, 3)) * 10
    Mgt = np.hstack([cv2.Rodrigues(np.array([0.1, 0.2, -0.1]))[0] * 1.2,
                     [[1], [2], [-0.5]]])
    b = a @ Mgt[:, :3].T + Mgt[:, 3]
    b[::7] += 20
    r_ref, M_ref, in_ref = cv2.estimateAffine3D(a, b)
    r_our, M_our, in_our = tcv.estimateAffine3D(a, b)
    np.testing.assert_allclose(M_our, M_ref, atol=1e-5)
    assert int(in_our.sum()) == int(np.asarray(in_ref).sum())
    r, t, inl = tcv.estimateTranslation3D(a, a + [1, -2, 3])
    np.testing.assert_allclose(t.ravel(), [1, -2, 3], atol=1e-9)
    F = np.asarray(cv2.findFundamentalMat(
        rng.random((10, 2)) * 100, rng.random((10, 2)) * 100,
        cv2.FM_8POINT)[0])
    x1 = np.array([10., 20, 1])
    x2 = np.array([30., 40, 1])
    assert abs(tcv.sampsonDistance(x1, x2, F)
               - cv2.sampsonDistance(x1.reshape(1, 3),
                                     x2.reshape(1, 3), F)) < 1e-8


def test_get_optimal_new_camera_matrix():
    """calibration_base.cpp:1565 inner/outer rect interpolation."""
    K = np.array([[600., 0, 320], [0, 590, 240], [0, 0, 1]])
    d = np.array([0.1, -0.2, 0.001, 0.002, 0.05])
    for alpha in (0.0, 0.5, 1.0):
        for cpp in (False, True):
            ref, roi_r = cv2.getOptimalNewCameraMatrix(
                K, d, (640, 480), alpha, centerPrincipalPoint=cpp)
            ours, roi_o = tcv.getOptimalNewCameraMatrix(
                K, d, (640, 480), alpha, centerPrincipalPoint=cpp)
            assert np.abs(ref - ours).max() < 1e-3
            assert max(abs(a - b) for a, b in zip(roi_r, roi_o)) <= 1
    # newImgSize path
    ref, _ = cv2.getOptimalNewCameraMatrix(K, d, (640, 480), 0.3, (320, 240))
    ours, _ = tcv.getOptimalNewCameraMatrix(K, d, (640, 480), 0.3, (320, 240))
    assert np.abs(ref - ours).max() < 1e-3


def test_solvepnp_variants():
    """PnP solver family (epnp.cpp/p3p.cpp/ap3p.cpp/ippe.cpp/
    sqpnp.cpp): every flag must recover the pose with sub-1e-3 px
    reprojection error on clean synthetic data, agreeing with cv2's
    returned best solution."""
    rng = np.random.RandomState(1)
    K = np.array([[800., 0, 320], [0, 780, 240], [0, 0, 1]])
    d = np.array([0.05, -0.1, 0.001, 0.002, 0.0])
    rvec_gt = np.array([0.2, -0.3, 0.1])
    tvec_gt = np.array([0.1, -0.2, 3.0])
    cases = [("SOLVEPNP_EPNP", 10, False), ("SOLVEPNP_P3P", 4, False),
             ("SOLVEPNP_AP3P", 4, False), ("SOLVEPNP_IPPE", 8, True),
             ("SOLVEPNP_IPPE_SQUARE", 4, "square"),
             ("SOLVEPNP_SQPNP", 10, False)]
    for flag_name, n, planar in cases:
        if planar == "square":
            obj = np.array([[-1, 1, 0], [1, 1, 0], [1, -1, 0],
                            [-1, -1, 0]], np.float64)
        else:
            obj = rng.rand(n, 3) * 2 - 1
            if planar:
                obj[:, 2] = 0
        img, _ = cv2.projectPoints(obj, rvec_gt, tvec_gt, K, d)
        img = img.reshape(-1, 2)
        okr, rv_r, tv_r = cv2.solvePnP(obj, img, K, d,
                                       flags=getattr(cv2, flag_name))
        oko, rv_o, tv_o = tcv.solvePnP(obj, img, K, d,
                                       flags=getattr(tcv, flag_name))
        assert okr and oko, flag_name
        p, _ = cv2.projectPoints(obj, np.asarray(rv_o, np.float64).ravel(),
                                 np.asarray(tv_o, np.float64).ravel(), K, d)
        err = np.abs(p.reshape(-1, 2) - img).max()
        assert err < 1e-3, (flag_name, err)


def test_solve_p3p_multiple_solutions():
    rng = np.random.RandomState(3)
    K = np.array([[800., 0, 320], [0, 780, 240], [0, 0, 1]])
    obj = rng.rand(3, 3) * 2 - 1
    rvec_gt = np.array([0.1, 0.2, -0.1])
    tvec_gt = np.array([0.0, 0.1, 4.0])
    img, _ = cv2.projectPoints(obj, rvec_gt, tvec_gt, K, None)
    n_r, rv_r, tv_r = cv2.solveP3P(obj, img.reshape(-1, 2), K, None,
                                   flags=cv2.SOLVEPNP_P3P)
    n_o, rv_o, tv_o = tcv.solveP3P(obj, img.reshape(-1, 2), K, None)
    assert n_o >= 1
    # ground-truth pose must appear among our candidates
    best = min(np.abs(np.asarray(r).ravel() - rvec_gt).max()
               for r in rv_o)
    assert best < 1e-3


def test_usac_homography():
    """USAC_* flags (reference usac/): LO-RANSAC recovers all inliers
    and the cv2 model on a 25%-outlier scene."""
    rng = np.random.RandomState(0)
    H_gt = np.array([[1.1, 0.05, 10], [-0.03, 0.97, -5],
                     [1e-4, -2e-4, 1]])
    src = rng.rand(120, 2) * 400
    w = H_gt[2, 0] * src[:, 0] + H_gt[2, 1] * src[:, 1] + 1
    dst = np.column_stack([
        (H_gt[0, 0] * src[:, 0] + H_gt[0, 1] * src[:, 1] + H_gt[0, 2]) / w,
        (H_gt[1, 0] * src[:, 0] + H_gt[1, 1] * src[:, 1] + H_gt[1, 2]) / w])
    dst += rng.normal(0, 0.3, dst.shape)
    out = rng.permutation(120)[:30]
    dst[out] += rng.uniform(20, 80, (30, 2))
    for m in ("USAC_DEFAULT", "USAC_MAGSAC", "USAC_ACCURATE",
              "USAC_PROSAC", "USAC_FAST"):
        Hr, mr = cv2.findHomography(src, dst, getattr(cv2, m), 3.0)
        Ho, mo = tcv.findHomography(src, dst, getattr(tcv, m), 3.0)
        assert abs(int(mr.sum()) - int(mo.sum())) <= 2, m
        assert np.abs(Hr / Hr[2, 2] - Ho / Ho[2, 2]).max() < 0.01, m


def _rand_R(rng, scale=1.0):
    r = rng.normal(0, scale, 3)
    th = np.linalg.norm(r)
    k = r / th
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx


def test_calibrate_hand_eye_all_methods():
    """AX = XB ground-truth recovery for all 5 solvers
    (calibration_handeye.cpp; the 5.0 wheel dropped the API, so the
    oracle is exact synthetic ground truth)."""
    rng = np.random.default_rng(0)
    Rx = _rand_R(rng)                      # cam2gripper ground truth
    tx = rng.normal(0, 0.3, 3)
    X = np.eye(4); X[:3, :3] = Rx; X[:3, 3] = tx
    Rt2b = _rand_R(rng); tt2b = rng.normal(0, 1, 3)
    T2B = np.eye(4); T2B[:3, :3] = Rt2b; T2B[:3, 3] = tt2b
    Rg, tg, Rc, tc = [], [], [], []
    for _ in range(8):
        Rgi = _rand_R(rng); tgi = rng.normal(0, 1, 3)
        G2B = np.eye(4); G2B[:3, :3] = Rgi; G2B[:3, 3] = tgi
        T2C = np.linalg.inv(G2B @ X) @ T2B
        Rg.append(Rgi); tg.append(tgi)
        Rc.append(T2C[:3, :3]); tc.append(T2C[:3, 3])
    for method in range(5):
        R_est, t_est = tcv.calibrateHandEye(Rg, tg, Rc, tc, method=method)
        assert np.allclose(R_est, Rx, atol=1e-6), f"method {method} R"
        assert np.allclose(t_est.ravel(), tx, atol=1e-5), \
            f"method {method} t: {t_est.ravel()} vs {tx}"


def test_calibrate_robot_world_hand_eye():
    """AX = ZB ground-truth recovery (Shah and Li)."""
    rng = np.random.default_rng(1)
    Rxg = _rand_R(rng); txg = rng.normal(0, 0.4, 3)   # base2world
    X = np.eye(4); X[:3, :3] = Rxg; X[:3, 3] = txg
    Rzg = _rand_R(rng); tzg = rng.normal(0, 0.4, 3)   # gripper2cam
    Z = np.eye(4); Z[:3, :3] = Rzg; Z[:3, 3] = tzg
    Rw, tw, Rb, tb = [], [], [], []
    for _ in range(8):
        Rbi = _rand_R(rng); tbi = rng.normal(0, 1, 3)
        B = np.eye(4); B[:3, :3] = Rbi; B[:3, 3] = tbi
        A = Z @ B @ np.linalg.inv(X)       # A X = Z B
        Rw.append(A[:3, :3]); tw.append(A[:3, 3])
        Rb.append(Rbi); tb.append(tbi)
    for method in range(2):
        R_x, t_x, R_z, t_z = tcv.calibrateRobotWorldHandEye(
            Rw, tw, Rb, tb, method=method)
        assert np.allclose(R_x, Rxg, atol=1e-5), f"m{method} Rx"
        assert np.allclose(R_z, Rzg, atol=1e-5), f"m{method} Rz"
        assert np.allclose(t_x.ravel(), txg, atol=1e-4), f"m{method} tx"
        assert np.allclose(t_z.ravel(), tzg, atol=1e-4), f"m{method} tz"


def test_calibrate_camera_ro_matches_cv2():
    rng = np.random.default_rng(2)
    K_gt = np.array([[800., 0, 320], [0, 780, 240], [0, 0, 1]])
    dist_gt = np.array([0.1, -0.15, 0.0, 0.0, 0.02])
    obj = np.array([[x, y, 0.0] for y in range(6) for x in range(7)],
                   np.float32) * 0.03
    objpts, imgpts = [], []
    for i in range(10):
        rvec = rng.normal(0, 0.3, 3)
        tvec = np.array([rng.normal(0, 0.05), rng.normal(0, 0.05),
                         0.5 + 0.08 * i])
        proj, _ = cv2.projectPoints(obj, rvec, tvec, K_gt, dist_gt)
        pts = proj.reshape(-1, 2) + rng.normal(0, 0.05, (len(obj), 2))
        objpts.append(obj)
        imgpts.append(pts.astype(np.float32))
    iFixed = 6  # last point of the first row (recommended by the docs)
    ret_r, K_r, d_r, rv_r, tv_r, no_r = cv2.calibrateCameraRO(
        objpts, imgpts, (640, 480), iFixed, None, None)
    ret_o, K_o, d_o, rv_o, tv_o, no_o = tcv.calibrateCameraRO(
        objpts, imgpts, (640, 480), iFixed)
    assert abs(ret_o - ret_r) < 2e-3, (ret_o, ret_r)
    np.testing.assert_allclose(K_o, K_r, atol=0.5)
    np.testing.assert_allclose(d_o.ravel(), d_r.ravel(), atol=5e-3)
    # refined object points agree with the reference refinement
    np.testing.assert_allclose(np.asarray(no_o).reshape(-1, 3),
                               np.asarray(no_r).reshape(-1, 3),
                               atol=5e-4)
    # fixed points stayed fixed
    no_o = np.asarray(no_o).reshape(-1, 3)
    np.testing.assert_allclose(no_o[0], obj[0], atol=1e-12)
    np.testing.assert_allclose(no_o[iFixed], obj[iFixed], atol=1e-12)


def _h_scene(n_in=200, n_out=60, noise=0.4, seed=0):
    rng = np.random.default_rng(seed)
    H_gt = np.array([[1.02, 0.05, 10], [-0.03, 0.98, -6],
                     [1e-4, -5e-5, 1.0]])
    src = rng.uniform(0, 500, (n_in, 2))
    dst = cv2.perspectiveTransform(src.reshape(-1, 1, 2),
                                   H_gt).reshape(-1, 2)
    dst += rng.normal(0, noise, dst.shape)
    src_all = np.vstack([src, rng.uniform(0, 500, (n_out, 2))])
    dst_all = np.vstack([dst, rng.uniform(0, 500, (n_out, 2))])
    return (H_gt, src, src_all.astype(np.float32),
            dst_all.astype(np.float32))


@pytest.mark.parametrize("flag", ["USAC_DEFAULT", "USAC_MAGSAC",
                                  "USAC_PROSAC", "USAC_ACCURATE",
                                  "USAC_FAST", "USAC_PARALLEL"])
def test_usac_homography_matches_cv2_quality(flag):
    H_gt, src, src_all, dst_all = _h_scene()
    m = getattr(tcv, flag)
    Ho, mo = tcv.findHomography(src_all, dst_all, m, 3.0)
    Hr, mr = cv2.findHomography(src_all, dst_all, m, 3.0)
    gt = cv2.perspectiveTransform(src.reshape(-1, 1, 2),
                                  H_gt).reshape(-1, 2)
    t_o = cv2.perspectiveTransform(src.reshape(-1, 1, 2),
                                   Ho).reshape(-1, 2)
    t_r = cv2.perspectiveTransform(src.reshape(-1, 1, 2),
                                   Hr).reshape(-1, 2)
    err_o = np.linalg.norm(t_o - gt, axis=1).mean()
    err_r = np.linalg.norm(t_r - gt, axis=1).mean()
    # as accurate as the reference (small slack for different RNG)
    assert err_o < max(2 * err_r, 0.15), (err_o, err_r)
    # all true inliers recovered, few outliers admitted
    assert mo[:len(src)].sum() >= 0.97 * len(src)
    assert mo[len(src):].sum() <= 5


def test_usac_fundamental_matches_cv2_quality():
    rng = np.random.default_rng(1)
    n = 250
    X = rng.uniform(-1, 1, (n, 3)) + [0, 0, 4.0]
    K = np.array([[600., 0, 320], [0, 600, 240], [0, 0, 1]])
    R, _ = cv2.Rodrigues(np.array([0.02, 0.3, -0.01]))
    t = np.array([0.4, 0.02, 0.05])
    p1 = (X @ K.T)[:, :2] / (X @ K.T)[:, 2:]
    X2 = X @ R.T + t
    p2 = (X2 @ K.T)[:, :2] / (X2 @ K.T)[:, 2:]
    p1 += rng.normal(0, 0.3, p1.shape)
    p2 += rng.normal(0, 0.3, p2.shape)
    n_out = 60
    p1a = np.vstack([p1, rng.uniform(0, 640, (n_out, 2))])
    p2a = np.vstack([p2, rng.uniform(0, 640, (n_out, 2))])

    for flag in (tcv.USAC_DEFAULT, tcv.USAC_MAGSAC, tcv.USAC_FM_8PTS):
        Fo, mo = tcv.findFundamentalMat(p1a, p2a, flag, 1.5)
        assert Fo is not None
        # epipolar residual of the true correspondences under our F
        l = np.column_stack([p1, np.ones(n)]) @ Fo.T
        d = np.abs((l[:, 0] * p2[:, 0] + l[:, 1] * p2[:, 1] + l[:, 2])
                   / np.hypot(l[:, 0], l[:, 1]))
        assert np.median(d) < 0.5, (flag, np.median(d))
        assert mo[:n].sum() >= 0.9 * n
        assert mo[n:].sum() <= 6


def test_usac_params_object():
    p = tcv.UsacParams()
    assert p.confidence == 0.99 and p.threshold == 1.5
    from opencv_tpu.calib3d import usac as U
    H_gt, src, src_all, dst_all = _h_scene()
    from opencv_tpu.calib3d.geometry import _HomographyEstimator
    est = _HomographyEstimator(src_all.astype(np.float64),
                               dst_all.astype(np.float64))
    p.threshold = 3.0
    p.score = U.SCORE_METHOD_MAGSAC
    p.loMethod = U.LOCAL_OPTIM_SIGMA
    H, inl, iters = U.ransac_solve(est, len(src_all), params=p)
    assert H is not None and inl[:len(src)].sum() >= 0.97 * len(src)


def _sb_board(sq=40, cols=7, rows=5, bg=128, M=None):
    bw = (cols + 1) * sq
    bh = (rows + 1) * sq
    board = np.zeros((bh, bw), np.uint8)
    for i in range(rows + 1):
        for j in range(cols + 1):
            if (i + j) % 2 == 0:
                board[i * sq:(i + 1) * sq, j * sq:(j + 1) * sq] = 255
    img = np.full((480, 640), bg, np.uint8)
    img[60:60 + bh, 80:80 + bw] = board
    if M is not None:
        img = cv2.warpAffine(img, M, (640, 480), borderValue=bg)
    return img


@pytest.mark.parametrize("M", [
    None,
    np.array([[0.95, 0.08, 20], [-0.05, 0.9, 30]], np.float64),
    np.array([[0.8, 0.0, 60], [0.0, 0.8, 50]], np.float64),
])
def test_find_chessboard_corners_sb_vs_cv2(M):
    img = _sb_board(M=M)
    ok_r, c_r = cv2.findChessboardCornersSB(img, (7, 5))
    ok_o, c_o = tcv.findChessboardCornersSB(img, (7, 5))
    assert ok_r and ok_o
    a = c_r.reshape(-1, 2)
    b = c_o.reshape(-1, 2)
    # even-by-even cell grids are 180deg-ambiguous by the reference's
    # own normalization rule; accept either orientation
    d = min(np.linalg.norm(a - b, axis=1).max(),
            np.linalg.norm(a - b[::-1], axis=1).max())
    assert d < 0.7, d


def test_find_chessboard_corners_sb_noise_and_flags():
    rng = np.random.default_rng(0)
    img = _sb_board().astype(np.int16)
    img = np.clip(img + rng.normal(0, 6, img.shape), 0,
                  255).astype(np.uint8)
    ok, c = tcv.findChessboardCornersSB(
        img, (7, 5), tcv.CALIB_CB_EXHAUSTIVE | tcv.CALIB_CB_ACCURACY)
    assert ok
    ok2, _ = tcv.findChessboardCornersSB(img, (9, 9))
    assert not ok2  # wrong pattern size must fail
