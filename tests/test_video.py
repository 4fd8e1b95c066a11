"""video module: MOG2, LK optical flow, Kalman, meanShift vs cv2."""

import numpy as np
import pytest

from common import cv2, assert_near

import opencv_tpu as tcv


def _moving_square_frames(n=20, h=64, w=80):
    rng = np.random.default_rng(0)
    bg = rng.integers(80, 120, (h, w), np.uint8)
    frames = []
    for i in range(n):
        f = bg.copy()
        x = 10 + i
        f[20:30, x:x + 8] = 230
        frames.append(f)
    return frames


def test_mog2_foreground():
    frames = _moving_square_frames()
    ref = cv2.createBackgroundSubtractorMOG2(detectShadows=False)
    ours = tcv.createBackgroundSubtractorMOG2(detectShadows=False)
    for f in frames:
        rm = ref.apply(f)
        om = np.asarray(ours.apply(f))
    # masks must agree (both learn the static background)
    agree = (rm > 0) == (om > 0)
    assert agree.mean() > 0.95, f"mask agreement {agree.mean()}"


def test_lk_translation():
    rng = np.random.default_rng(1)
    base = cv2.GaussianBlur(rng.integers(0, 256, (120, 160), np.uint8),
                            (5, 5), 1.5)
    M = np.float32([[1, 0, 3.0], [0, 1, 2.0]])
    nxt = cv2.warpAffine(base, M, (160, 120))
    pts = cv2.goodFeaturesToTrack(base, 30, 0.05, 10).astype(np.float32)
    ref_p, ref_s, _ = cv2.calcOpticalFlowPyrLK(base, nxt, pts, None)
    our_p, our_s, _ = tcv.calcOpticalFlowPyrLK(base, nxt, pts, None)
    ok = (ref_s.ravel() > 0) & (our_s.ravel() > 0)
    assert ok.sum() >= 0.8 * len(pts)
    d = np.abs(ref_p.reshape(-1, 2)[ok] - our_p.reshape(-1, 2)[ok])
    assert np.median(d) < 0.5, f"median err {np.median(d)}"


def test_kalman():
    rk = cv2.KalmanFilter(4, 2)
    ok = tcv.KalmanFilter(4, 2)
    A = np.array([[1, 0, 1, 0], [0, 1, 0, 1], [0, 0, 1, 0], [0, 0, 0, 1]],
                 np.float32)
    Hm = np.array([[1, 0, 0, 0], [0, 1, 0, 0]], np.float32)
    for k in (rk, ok):
        k.transitionMatrix = A.copy()
        k.measurementMatrix = Hm.copy()
        k.processNoiseCov = np.eye(4, dtype=np.float32) * 1e-3
        k.measurementNoiseCov = np.eye(2, dtype=np.float32) * 1e-1
        k.errorCovPost = np.eye(4, dtype=np.float32)
    rng = np.random.default_rng(2)
    for t in range(10):
        z = np.float32([[t + rng.normal(0, 0.1)], [2 * t + rng.normal(0, 0.1)]])
        rp = rk.predict(); op = ok.predict()
        assert_near(op, rp, atol=1e-3)
        rc = rk.correct(z); oc = ok.correct(z)
        assert_near(oc, rc, atol=1e-3)


def test_meanshift():
    prob = np.zeros((100, 100), np.uint8)
    cv2.circle(prob, (60, 55), 10, 255, -1)
    rn, rwin = cv2.meanShift(prob, (30, 30, 24, 24), (3, 10, 1))
    on, owin = tcv.meanShift(prob, (30, 30, 24, 24), (3, 10, 1))
    # both must converge onto the blob
    assert abs(rwin[0] - owin[0]) <= 2 and abs(rwin[1] - owin[1]) <= 2


def test_camshift():
    prob = np.zeros((100, 100), np.uint8)
    cv2.ellipse(prob, (60, 50), (15, 8), 30, 0, 360, 255, -1)
    rrect, rwin = cv2.CamShift(prob, (40, 35, 40, 30), (3, 10, 1))
    orect, owin = tcv.CamShift(prob, (40, 35, 40, 30), (3, 10, 1))
    assert abs(rrect[0][0] - orect[0][0]) < 3
    assert abs(rrect[0][1] - orect[0][1]) < 3


def test_farneback_matches_cv2():
    rng = np.random.default_rng(0)
    base = rng.random((140, 180)).astype(np.float32)
    base = cv2.GaussianBlur(base, (0, 0), 3) * 255
    H, W = 96, 128
    dx, dy = 3.2, -1.7
    prev = base[20:20 + H, 25:25 + W].astype(np.uint8)
    M2 = np.float32([[1, 0, -dx], [0, 1, -dy]])
    warped = cv2.warpAffine(base, M2, (base.shape[1], base.shape[0]))
    nxt = warped[20:20 + H, 25:25 + W].astype(np.uint8)

    args = (0.5, 3, 15, 3, 5, 1.2, 0)
    ref = cv2.calcOpticalFlowFarneback(prev, nxt, None, *args)
    ours = tcv.calcOpticalFlowFarneback(prev, nxt, None, *args)
    assert ours.shape == ref.shape and ours.dtype == np.float32
    inner = (slice(10, -10), slice(10, -10))
    d = np.linalg.norm(ref[inner] - ours[inner], axis=-1)
    assert np.median(d) < 0.35, np.median(d)
    assert np.percentile(d, 95) < 0.8, np.percentile(d, 95)
    # both should point the same way as the ground-truth shift
    assert np.sign(np.median(ours[inner][..., 0])) == np.sign(np.median(ref[inner][..., 0]))


def test_farneback_class_api():
    rng = np.random.default_rng(1)
    img = (cv2.GaussianBlur(rng.random((64, 80)).astype(np.float32), (0, 0), 2) * 255).astype(np.uint8)
    of = tcv.FarnebackOpticalFlow_create(numLevels=2, winSize=13, numIters=2)
    f = of.calc(img, img)
    assert f.shape == (64, 80, 2)
    assert np.abs(f).max() < 0.5  # zero motion


def test_knn_foreground():
    rng = np.random.default_rng(3)
    H, W = 48, 64
    bg = rng.integers(80, 120, (H, W, 3), np.uint8)
    ours = tcv.createBackgroundSubtractorKNN()
    ref = cv2.createBackgroundSubtractorKNN()
    # feed static background with mild noise
    for i in range(30):
        noise = rng.integers(-3, 4, (H, W, 3))
        frame = np.clip(bg.astype(int) + noise, 0, 255).astype(np.uint8)
        m_ours = ours.apply(frame)
        m_ref = ref.apply(frame)
    # now a bright moving square
    frame = np.clip(bg.astype(int) + rng.integers(-3, 4, (H, W, 3)), 0,
                    255).astype(np.uint8)
    frame[10:25, 20:35] = (250, 250, 250)
    m_ours = ours.apply(frame)
    m_ref = ref.apply(frame)
    fg_ours = m_ours == 255
    fg_ref = m_ref == 255
    # the square must be detected, the background mostly quiet
    assert fg_ours[12:23, 22:33].mean() > 0.95
    assert fg_ours[~np.zeros((H, W), bool)].mean() < 0.2
    agree = (fg_ours == fg_ref).mean()
    assert agree > 0.97, agree
    bgimg = ours.getBackgroundImage()
    assert bgimg.shape == (H, W, 3)
    assert abs(int(bgimg[40:, 40:].mean()) - int(bg[40:, 40:].mean())) < 12


def test_find_transform_ecc_matches_cv2():
    img = np.zeros((120, 160), np.uint8)
    cv2.circle(img, (50, 40), 20, 200, -1)
    cv2.rectangle(img, (90, 60), (140, 100), 120, -1)
    cv2.line(img, (10, 100), (150, 20), 80, 3)
    img = cv2.GaussianBlur(img, (0, 0), 2)
    A_gt = np.float32([[1.01, 0.02, 1.5], [-0.02, 0.99, -1.0]])
    warped = cv2.warpAffine(img, A_gt, (160, 120),
                            flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP)
    crit = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 200, 1e-6)
    pairs = [(cv2.MOTION_TRANSLATION, tcv.MOTION_TRANSLATION),
             (cv2.MOTION_EUCLIDEAN, tcv.MOTION_EUCLIDEAN),
             (cv2.MOTION_AFFINE, tcv.MOTION_AFFINE),
             (cv2.MOTION_HOMOGRAPHY, tcv.MOTION_HOMOGRAPHY)]
    for mt_cv, mt_our in pairs:
        rows = 3 if mt_cv == cv2.MOTION_HOMOGRAPHY else 2
        w0 = np.eye(rows, 3, dtype=np.float32)
        rho_r, M_r = cv2.findTransformECC(img, warped, w0, mt_cv, crit,
                                          None, 5)
        rho_o, M_o = tcv.findTransformECC(img, warped, None, mt_our,
                                          (3, 200, 1e-6), None, 5)
        assert abs(rho_r - rho_o) < 1e-4
        np.testing.assert_allclose(M_o, M_r, atol=1e-3)
    assert abs(tcv.computeECC(img, warped)
               - cv2.computeECC(img, warped)) < 1e-3


def test_dis_optical_flow():
    rng = np.random.default_rng(0)
    base = (cv2.GaussianBlur(rng.random((160, 200)).astype(np.float32),
                             (0, 0), 4) * 255).astype(np.uint8)
    dx, dy = 5.0, -3.0
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    nxt = cv2.warpAffine(base, M, (200, 160))
    ref_dis = cv2.DISOpticalFlow_create(cv2.DISOpticalFlow_PRESET_ULTRAFAST)
    ref_dis.setVariationalRefinementIterations(0)
    ref_flow = ref_dis.calc(base, nxt, None)
    our_flow = tcv.DISOpticalFlow_create(
        tcv.DISOpticalFlow.PRESET_ULTRAFAST).calc(base, nxt, None)
    assert our_flow.shape == ref_flow.shape
    inner = (slice(24, -24), slice(24, -24))
    d = np.linalg.norm(ref_flow[inner] - our_flow[inner], axis=-1)
    assert np.median(d) < 0.25, np.median(d)
    epe = np.linalg.norm(our_flow[inner] - np.array([dx, dy]), axis=-1)
    assert epe.mean() < 0.5, epe.mean()


def test_tracker_mil():
    rng = np.random.default_rng(0)
    H, W = 120, 160
    bg = cv2.GaussianBlur(rng.integers(0, 256, (H, W), np.uint8),
                          (0, 0), 4)
    frames, boxes = [], []
    for t in range(10):
        f = bg.copy()
        x, y = 20 + 4 * t, 30 + 2 * t
        f[y:y + 24, x:x + 30] = 230
        f[y + 6:y + 18, x + 8:x + 22] = 60
        frames.append(np.stack([f] * 3, -1))
        boxes.append((x, y, 30, 24))

    def iou(a, b):
        x0 = max(a[0], b[0])
        y0 = max(a[1], b[1])
        x1 = min(a[0] + a[2], b[0] + b[2])
        y1 = min(a[1] + a[3], b[1] + b[3])
        inter = max(0, x1 - x0) * max(0, y1 - y0)
        return inter / (a[2] * a[3] + b[2] * b[3] - inter)

    tr = tcv.TrackerMIL_create()
    assert tr.init(frames[0], boxes[0])
    ious = []
    for f, gt in zip(frames[1:], boxes[1:]):
        ok, bb = tr.update(f)
        assert ok
        ious.append(iou(bb, gt))
    # same quality band as the reference tracker on this sequence
    assert np.mean(ious) > 0.6, np.mean(ious)


def test_videostab_one_pass():
    rng = np.random.default_rng(0)
    base = cv2.GaussianBlur(rng.integers(0, 256, (160, 200), np.uint8),
                            (0, 0), 2)
    frames = []
    for i in range(14):
        dx = 1.5 * i + rng.normal(0, 2.5)
        dy = rng.normal(0, 2.5)
        M = np.float32([[1, 0, dx], [0, 1, dy]])
        frames.append(cv2.warpAffine(base, M, (200, 160),
                                     borderMode=cv2.BORDER_REPLICATE))
    out = tcv.videostab.OnePassStabilizer(radius=5).stabilize(frames)

    def jitter_std(seq):
        js = []
        for a, b in zip(seq[:-1], seq[1:]):
            s, _ = cv2.phaseCorrelate(
                a[20:-20, 20:-20].astype(np.float32),
                b[20:-20, 20:-20].astype(np.float32))
            js.append(np.hypot(s[0], s[1]))
        return np.std(js)

    assert jitter_std(out) < jitter_std(frames) / 2.5


def test_variational_refinement_matches_cv2():
    rng = np.random.default_rng(3)
    base = (cv2.GaussianBlur(rng.random((80, 96)).astype(np.float32),
                             (0, 0), 3) * 255).astype(np.uint8)
    M = np.float32([[1, 0, 1.5], [0, 1, -1.0]])
    nxt = cv2.warpAffine(base, M, (96, 80))
    # start from a noisy constant-flow initialization
    u0 = np.full((80, 96), 1.2, np.float32) + \
        rng.normal(0, 0.2, (80, 96)).astype(np.float32)
    v0 = np.full((80, 96), -0.8, np.float32) + \
        rng.normal(0, 0.2, (80, 96)).astype(np.float32)

    ref_vr = cv2.VariationalRefinement_create()
    ru, rv = u0.copy(), v0.copy()
    ref_vr.calcUV(base, nxt, ru, rv)

    our_vr = tcv.VariationalRefinement_create()
    ou, ov = our_vr.calcUV(base, nxt, u0.copy(), v0.copy())

    d = np.hypot(ru - ou, rv - ov)
    assert np.median(d) < 0.03, np.median(d)
    assert d.mean() < 0.08, d.mean()


def test_variational_refinement_calc_flow2ch():
    rng = np.random.default_rng(4)
    base = (cv2.GaussianBlur(rng.random((48, 64)).astype(np.float32),
                             (0, 0), 3) * 255).astype(np.uint8)
    nxt = np.roll(base, 1, axis=1)
    flow = np.zeros((48, 64, 2), np.float32)
    rflow = flow.copy()
    cv2.VariationalRefinement_create().calc(base, nxt, rflow)
    out = tcv.VariationalRefinement_create().calc(base, nxt, flow.copy())
    d = np.linalg.norm(rflow - out, axis=-1)
    assert np.median(d) < 0.05, np.median(d)
