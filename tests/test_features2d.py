"""FAST / ORB / BFMatcher vs cv2 (model: the reference's descriptor
regression suite allows small distances and set-comparison for ties)."""

import numpy as np
import pytest

from common import cv2, assert_exact

import opencv_tpu as tcv

LENA = "/root/reference/samples/data/lena.jpg"
from opencv_tpu.features2d import FAST


def _img(seed=0, h=240, w=320):
    rng = np.random.default_rng(seed)
    return cv2.GaussianBlur(rng.integers(0, 256, (h, w), np.uint8), (3, 3), 1.0)


def test_fast_positions_and_scores():
    img = _img(0, 120, 160)
    ref = cv2.FastFeatureDetector_create(threshold=20).detect(img)
    ours = FAST(img, 20, True)
    rset = {(int(k.pt[0]), int(k.pt[1])) for k in ref}
    oset = {(int(k.pt[0]), int(k.pt[1])) for k in ours}
    assert rset == oset
    rresp = {(int(k.pt[0]), int(k.pt[1])): k.response for k in ref}
    for k in ours:
        assert k.response == rresp[(int(k.pt[0]), int(k.pt[1]))]


def test_fast_no_nms_positions():
    img = _img(1, 80, 100)
    ref = cv2.FastFeatureDetector_create(threshold=25,
                                         nonmaxSuppression=False).detect(img)
    ours = FAST(img, 25, False)
    rset = {(int(k.pt[0]), int(k.pt[1])) for k in ref}
    oset = {(int(k.pt[0]), int(k.pt[1])) for k in ours}
    assert rset == oset


def test_orb_detect_and_compute():
    img = _img(2)
    rk, rd = cv2.ORB_create(nfeatures=200).detectAndCompute(img, None)
    ok, od = tcv.ORB_create(nfeatures=200).detectAndCompute(img, None)
    rset = {(round(k.pt[0]), round(k.pt[1]), k.octave) for k in rk}
    oset = {(round(k.pt[0]), round(k.pt[1]), k.octave) for k in ok}
    inter = len(rset & oset)
    assert inter >= 0.97 * max(len(rset), len(oset)), \
        f"kp overlap {inter}/{max(len(rset), len(oset))}"
    # descriptor distance for common keypoints must be tiny
    rmap = {(round(k.pt[0]), round(k.pt[1]), k.octave): i for i, k in enumerate(rk)}
    omap = {(round(k.pt[0]), round(k.pt[1]), k.octave): i for i, k in enumerate(ok)}
    common = list(rset & oset)
    d = [int(np.unpackbits(np.bitwise_xor(rd[rmap[c]], od[omap[c]])).sum())
         for c in common]
    d = np.asarray(d)
    assert np.mean(d) < 4.0, f"mean desc hamming {np.mean(d)}"
    assert np.median(d) <= 1.0


def test_orb_angles():
    img = _img(3, 160, 200)
    rk = cv2.ORB_create(nfeatures=100).detect(img, None)
    ok = tcv.ORB_create(nfeatures=100).detect(img, None)
    rmap = {(round(k.pt[0]), round(k.pt[1]), k.octave): k.angle for k in rk}
    for k in ok:
        key = (round(k.pt[0]), round(k.pt[1]), k.octave)
        if key in rmap:
            d = abs(k.angle - rmap[key])
            d = min(d, 360 - d)
            assert d < 0.01, f"angle {k.angle} vs {rmap[key]}"


def test_bf_matcher_hamming():
    img1 = _img(4)
    M = cv2.getRotationMatrix2D((160, 120), 5, 1.0)
    img2 = cv2.warpAffine(img1, M, (320, 240))
    orb = cv2.ORB_create(nfeatures=150)
    k1, d1 = orb.detectAndCompute(img1, None)
    k2, d2 = orb.detectAndCompute(img2, None)
    ref = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True).match(d1, d2)
    ours = tcv.BFMatcher(tcv.NORM_HAMMING, crossCheck=True).match(d1, d2)
    rpairs = {(m.queryIdx, m.trainIdx) for m in ref}
    opairs = {(m.queryIdx, m.trainIdx) for m in ours}
    inter = len(rpairs & opairs)
    assert inter >= 0.95 * len(rpairs), f"{inter}/{len(rpairs)}"


def test_bf_matcher_l2_knn():
    rng = np.random.default_rng(5)
    d1 = rng.random((40, 64)).astype(np.float32)
    d2 = rng.random((60, 64)).astype(np.float32)
    ref = cv2.BFMatcher(cv2.NORM_L2).knnMatch(d1, d2, k=2)
    ours = tcv.BFMatcher(tcv.NORM_L2).knnMatch(d1, d2, k=2)
    for r, o in zip(ref, ours):
        assert r[0].trainIdx == o[0].trainIdx
        assert abs(r[0].distance - o[0].distance) < 1e-4


def test_sift_detect_and_compute():
    img = _img(6, 160, 200)
    rk, rd = cv2.SIFT_create().detectAndCompute(img, None)
    ok, od = tcv.SIFT_create().detectAndCompute(img, None)
    assert abs(len(ok) - len(rk)) <= 0.05 * len(rk)
    rpts = np.array([k.pt for k in rk])
    desc_d = []
    ang_d = []
    for i, k in enumerate(ok):
        d = np.hypot(rpts[:, 0] - k.pt[0], rpts[:, 1] - k.pt[1])
        j = d.argmin()
        if d[j] < 1.0:
            desc_d.append(np.linalg.norm(rd[j].astype(float) - od[i]))
            da = abs(rk[j].angle - k.angle) % 360
            ang_d.append(min(da, 360 - da))
    assert len(desc_d) >= 0.9 * len(ok)
    assert np.median(desc_d) <= 5.0, f"median desc L2 {np.median(desc_d)}"
    assert np.median(ang_d) <= 0.1


def test_sift_nfeatures_cap():
    img = _img(7, 120, 160)
    kps = tcv.SIFT_create(nfeatures=50).detect(img)
    assert len(kps) <= 60  # ties at the response cut may exceed slightly


def test_agast_detects_corners():
    """AGAST (no oracle: the 5.0 wheel dropped AgastFeatureDetector) —
    segment-test semantics checked structurally: a synthetic L-corner
    fires, flat regions and straight edges don't; OAST_9_16 equals
    FAST-9/16 on the same image."""
    img = np.full((64, 64), 50, np.uint8)
    img[20:, 20:] = 200  # L-corner at (20, 20)
    for t in [tcv.AgastFeatureDetector.AGAST_5_8,
              tcv.AgastFeatureDetector.AGAST_7_12d,
              tcv.AgastFeatureDetector.AGAST_7_12s,
              tcv.AgastFeatureDetector.OAST_9_16]:
        kps = tcv.AGAST(img, 20, False, t)  # strict NMS ties out on
        assert kps, t                        # perfectly flat synthetic input
        pts = np.array([k.pt for k in kps])
        # all detections near the corner, none on straight edges
        assert (np.abs(pts - 20).max(axis=1) < 4).all(), (t, pts)

    flat = np.full((32, 32), 100, np.uint8)
    assert not tcv.AGAST(flat, 10)

    # OAST_9_16 == FAST 9/16 (same ring, same S): same positions
    rng = np.random.default_rng(2)
    tex = rng.integers(0, 256, (48, 48), np.uint8)
    from opencv_tpu.features2d.fast import FAST as _fast
    # NMS scores differ (bisection vs analytic) so compare pre-NMS sets
    a2 = {(k.pt[0], k.pt[1]) for k in tcv.AGAST(tex, 25, False,
                                                tcv.AgastFeatureDetector.OAST_9_16)}
    f2 = {(k.pt[0], k.pt[1]) for k in _fast(tex, 25, False)}
    assert a2 == f2 and len(a2) > 0


def test_simple_blob_detector_matches_cv2():
    img = np.full((120, 160), 255, np.uint8)
    cv2.circle(img, (40, 40), 10, 0, -1)
    cv2.circle(img, (100, 60), 14, 0, -1)
    cv2.circle(img, (60, 95), 7, 0, -1)
    cv2.rectangle(img, (120, 90), (150, 110), 0, -1)
    kref = sorted((round(k.pt[0], 1), round(k.pt[1], 1), round(k.size, 1))
                  for k in cv2.SimpleBlobDetector_create().detect(img))
    kour = sorted((round(k.pt[0], 1), round(k.pt[1], 1), round(k.size, 1))
                  for k in tcv.SimpleBlobDetector_create().detect(img))
    assert kref == kour
    # param object + light blobs
    p = tcv.SimpleBlobDetector_Params()
    p.blobColor = 255
    p.filterByConvexity = False
    inv = 255 - img
    klight = tcv.SimpleBlobDetector_create(p).detect(inv)
    assert len(klight) >= 3


def test_contour_moments_match_cv2():
    pts = np.array([[10, 10], [50, 12], [55, 40], [20, 45], [8, 30]],
                   np.int32).reshape(-1, 1, 2)
    ref = cv2.moments(pts)
    ours = tcv.moments(pts)
    for k in ref:
        assert abs(ref[k] - ours[k]) <= 1e-9 * max(1, abs(ref[k])), k


def test_mser_ground_truth():
    """MSER (the 5.0 wheel's MSER returns no regions on any input, so
    the oracle is ground-truth shapes on noisy backgrounds)."""
    rng = np.random.default_rng(1)
    img = np.full((240, 320), 255, np.uint8)
    img[40:80, 30:90] = 30
    cv2.circle(img, (200, 150), 25, 20, -1)
    img = np.clip(img.astype(int) + rng.integers(-15, 15, img.shape),
                  0, 255).astype(np.uint8)
    regions, boxes = tcv.MSER_create().detectRegions(img)
    assert len(regions) >= 2 and boxes.shape[1] == 4
    gt = {(x, y) for y in range(40, 80) for x in range(30, 90)}
    ious = [len(set(map(tuple, r.tolist())) & gt)
            / len(set(map(tuple, r.tolist())) | gt) for r in regions]
    assert max(ious) > 0.95
    # bright-on-dark polarity
    inv = 255 - img
    regions2, _ = tcv.MSER_create().detectRegions(inv)
    ious2 = [len(set(map(tuple, r.tolist())) & gt)
             / len(set(map(tuple, r.tolist())) | gt) for r in regions2]
    assert max(ious2) > 0.95
    # flat image -> nothing
    assert not tcv.MSER_create().detectRegions(
        np.full((64, 64), 128, np.uint8))[0]


def test_brisk_rotation_matching():
    """BRISK (no oracle in the 5.0 wheel): descriptors must match
    consistently across a 30-degree rotation."""
    rng = np.random.default_rng(0)
    img = (cv2.GaussianBlur(rng.random((160, 220)).astype(np.float32),
                            (0, 0), 1.2) * 255).astype(np.uint8)
    M = cv2.getRotationMatrix2D((110, 80), 30, 1.0)
    rot = cv2.warpAffine(img, M, (220, 160))
    b = tcv.BRISK_create(thresh=25, octaves=2)
    k1, d1 = b.detectAndCompute(img)
    k2, d2 = b.detectAndCompute(rot)
    assert len(k1) > 50 and len(k2) > 50
    assert d1.shape[1] == b.descriptorSize() == 64
    bf = tcv.BFMatcher(6, crossCheck=True)
    matches = bf.match(d1, d2)
    good = 0
    for m in matches:
        p1 = np.array(k1[m.queryIdx].pt)
        p2 = np.array(k2[m.trainIdx].pt)
        pred = M[:, :2] @ p1 + M[:, 2]
        good += np.hypot(*(pred - p2)) < 4
    assert len(matches) > 30
    assert good / len(matches) > 0.6, good / len(matches)


def test_akaze_detect_and_match_rotation():
    """AKAZE self-validation (the cv2 5.0 wheel dropped AKAZE;
    reference: features2d/src/kaze/AKAZEFeatures.cpp): keypoints on
    lena must match across a 30-degree rotation with high geometric
    inlier rate through the MLDB descriptors."""
    img = np.asarray(tcv.imread(LENA, 0))[::2, ::2]
    a = tcv.AKAZE_create()
    kp1, d1 = a.detectAndCompute(img, None)
    assert len(kp1) > 50
    assert d1.shape == (len(kp1), 61) and d1.dtype == np.uint8

    H, W = img.shape
    M = np.asarray(tcv.getRotationMatrix2D((W / 2, H / 2), 30.0, 1.0))
    rot = np.asarray(tcv.warpAffine(img, M.astype(np.float32), (W, H)))
    kp2, d2 = a.detectAndCompute(rot, None)

    b1 = np.unpackbits(d1, axis=1)
    b2 = np.unpackbits(d2, axis=1)
    dist = (b1[:, None, :] != b2[None, :, :]).sum(-1)
    nn = dist.argmin(1)
    s = np.sort(dist, axis=1)
    ok = s[:, 0] < 0.8 * np.maximum(s[:, 1], 1)
    p1 = np.array([k.pt for k in kp1])
    p2 = np.array([kp2[i].pt for i in nn])
    proj = p1 @ M[:, :2].T + M[:, 2]
    good = np.hypot(*(proj - p2).T) < 3.0
    assert ok.sum() > 40
    assert (good & ok).sum() / ok.sum() > 0.8


def test_akaze_upright_and_params():
    img = np.asarray(tcv.imread(LENA, 0))[::2, ::2]
    a = tcv.AKAZE_create(descriptor_type=tcv.AKAZE_DESCRIPTOR_MLDB_UPRIGHT,
                         threshold=0.003)
    kps, desc = a.detectAndCompute(img, None)
    assert len(kps) > 10
    assert all(k.angle == 0.0 for k in kps)
    assert a.getThreshold() == 0.003
    assert a.descriptorSize() == 61


def test_kaze_detect_and_match_rotation():
    """KAZE self-validation (cv2 5.0 dropped KAZE; reference:
    features2d/src/kaze/KAZEFeatures.cpp): MSURF-64 descriptors are
    unit-norm and match across rotation."""
    img = np.asarray(tcv.imread(LENA, 0))[::2, ::2]
    k = tcv.KAZE_create()
    kp1, d1 = k.detectAndCompute(img, None)
    assert len(kp1) > 50
    assert d1.shape[1] == 64 and d1.dtype == np.float32
    assert np.allclose(np.linalg.norm(d1, axis=1), 1.0, atol=1e-4)

    H, W = img.shape
    M = np.asarray(tcv.getRotationMatrix2D((W / 2, H / 2), 25.0, 1.0))
    rot = np.asarray(tcv.warpAffine(img, M.astype(np.float32), (W, H)))
    kp2, d2 = k.detectAndCompute(rot, None)
    dist = ((d1[:, None, :] - d2[None, :, :]) ** 2).sum(-1)
    nn = dist.argmin(1)
    s = np.sort(dist, axis=1)
    ok = s[:, 0] < 0.7 * np.maximum(s[:, 1], 1e-12)
    p1 = np.array([kp.pt for kp in kp1])
    p2 = np.array([kp2[i].pt for i in nn])
    proj = p1 @ M[:, :2].T + M[:, 2]
    good = np.hypot(*(proj - p2).T) < 3.0
    assert ok.sum() > 40
    assert (good & ok).sum() / ok.sum() > 0.8


def test_kaze_extended_upright():
    img = np.asarray(tcv.imread(LENA, 0))[::2, ::2]
    k = tcv.KAZE_create(extended=True, upright=True)
    kps, desc = k.detectAndCompute(img, None)
    assert desc.shape[1] == 128
    assert k.descriptorSize() == 128
    assert k.defaultNorm() == tcv.NORM_L2


def test_affine_feature_asift():
    """AffineFeature (ASIFT wrapper) vs the reference with a SIFT
    backend at maxTilt=1 (affine_feature.cpp view grid)."""
    img = cv2.GaussianBlur(_img(11, 140, 180), (0, 0), 1.0)

    ref_af = cv2.AffineFeature_create(cv2.SIFT_create(nfeatures=150),
                                      maxTilt=1)
    rk, rd = ref_af.detectAndCompute(img, None)
    our_af = tcv.AffineFeature_create(tcv.SIFT_create(nfeatures=150),
                                      maxTilt=1)
    ok, od = our_af.detectAndCompute(img, None)
    assert len(ok) >= 0.8 * len(rk), (len(ok), len(rk))
    rset = {(round(k.pt[0]), round(k.pt[1])) for k in rk}
    oset = {(round(k.pt[0]), round(k.pt[1])) for k in ok}
    inter = len(rset & oset)
    assert inter >= 0.6 * min(len(rset), len(oset)), \
        f"overlap {inter}/{min(len(rset), len(oset))}"
    assert od is not None and od.shape[1] == rd.shape[1]


def test_bow_trainer_and_extractor():
    """BOWKMeansTrainer/BOWImgDescriptorExtractor semantics
    (bagofwords.cpp; API dropped from the 5.0 wheel — semantic oracle):
    vocabulary clusters the descriptor space, the image descriptor is the
    L1-normalized assignment histogram."""
    rng = np.random.default_rng(0)
    centers_gt = rng.normal(0, 10, (4, 32)).astype(np.float32)
    descs = np.vstack([c + rng.normal(0, 0.3, (50, 32))
                       for c in centers_gt]).astype(np.float32)
    tr = tcv.BOWKMeansTrainer(4)
    tr.add(descs[:100])
    tr.add(descs[100:])
    assert tr.descriptorsCount() == 200
    vocab = tr.cluster()
    assert vocab.shape == (4, 32)
    # every GT center recovered within the intra-cluster noise
    d = ((vocab[:, None, :] - centers_gt[None, :, :]) ** 2).sum(-1)
    assert (np.sqrt(d.min(0)) < 1.0).all()

    ext = tcv.BOWImgDescriptorExtractor()
    ext.setVocabulary(vocab)
    h = ext.compute2(descs)
    assert h.shape == (1, 4)
    assert abs(h.sum() - 1.0) < 1e-6
    assert (np.abs(h - 0.25) < 0.05).all()  # balanced clusters


def test_fast_all_pattern_types():
    """FAST TYPE_9_16 / TYPE_7_12 / TYPE_5_8: positions AND responses
    exact vs cv2 (fast.cpp FAST_t incl. the wrapped pre-gate)."""
    rng = np.random.default_rng(13)
    img = cv2.GaussianBlur(rng.integers(0, 256, (120, 160), np.uint8),
                           (3, 3), 1.0)
    for T in (cv2.FAST_FEATURE_DETECTOR_TYPE_9_16,
              cv2.FAST_FEATURE_DETECTOR_TYPE_7_12,
              cv2.FAST_FEATURE_DETECTOR_TYPE_5_8):
        for nms in (True, False):
            rk = cv2.FastFeatureDetector_create(20, nms, type=T).detect(img)
            ok = tcv.FastFeatureDetector_create(20, nms, type=T).detect(img)
            if nms:
                key = lambda k: (round(k.pt[0]), round(k.pt[1]),
                                 round(k.response))
            else:
                key = lambda k: (round(k.pt[0]), round(k.pt[1]))
            assert {key(k) for k in rk} == {key(k) for k in ok}, (T, nms)


def test_orb_wta_k_variants():
    """ORB WTA_K=3/4: randomized tuple pattern (cv::RNG reproduction) +
    2-bit code descriptors match the reference (orb.cpp:286-330)."""
    rng = np.random.default_rng(14)
    img = cv2.GaussianBlur(rng.integers(0, 256, (240, 320), np.uint8),
                           (3, 3), 1.0)
    for wta in (3, 4):
        rk, rd = cv2.ORB_create(nfeatures=150,
                                WTA_K=wta).detectAndCompute(img, None)
        ok, od = tcv.ORB_create(nfeatures=150,
                                WTA_K=wta).detectAndCompute(img, None)
        rmap = {(round(k.pt[0]), round(k.pt[1]), k.octave): i
                for i, k in enumerate(rk)}
        omap = {(round(k.pt[0]), round(k.pt[1]), k.octave): i
                for i, k in enumerate(ok)}
        common = set(rmap) & set(omap)
        assert len(common) >= 0.95 * max(len(rk), len(ok)), wta
        d = [int(np.unpackbits(np.bitwise_xor(rd[rmap[c]],
                                              od[omap[c]])).sum())
             for c in common]
        assert np.median(d) <= 1.0 and np.mean(d) < 4.0, (wta, np.mean(d))
        # NORM_HAMMING2 matcher parity
        ref_m = cv2.BFMatcher(cv2.NORM_HAMMING2).match(rd[:50], rd[50:100])
        our_m = tcv.BFMatcher(tcv.NORM_HAMMING2).match(rd[:50], rd[50:100])
        agree = sum(1 for a, b in zip(ref_m, our_m)
                    if a.trainIdx == b.trainIdx and a.distance == b.distance)
        assert agree >= 48, agree


def test_orb_small_edge_threshold():
    """edgeThreshold < half_patch: IC disk taps near the border must
    replicate-clamp (the sliding-window operand pads with edge values,
    not zeros) — angles near edges then match cv2."""
    img = _img(7)
    rk, _ = cv2.ORB_create(nfeatures=150, edgeThreshold=10) \
        .detectAndCompute(img, None)
    ok, _ = tcv.ORB_create(nfeatures=150, edgeThreshold=10) \
        .detectAndCompute(img, None)
    near = [k for k in rk if min(k.pt[0], k.pt[1],
                                 img.shape[1] - k.pt[0],
                                 img.shape[0] - k.pt[1]) < 16]
    if not near:
        return
    omap = {(round(k.pt[0]), round(k.pt[1]), k.octave): k for k in ok}
    checked = 0
    for k in near:
        key = (round(k.pt[0]), round(k.pt[1]), k.octave)
        if key in omap:
            da = abs(omap[key].angle - k.angle)
            da = min(da, 360 - da)
            assert da < 2.0, (key, omap[key].angle, k.angle)
            checked += 1
    assert checked > 0


def test_evaluate_feature_detector():
    """Detector repeatability (evaluation.cpp): identical keypoints under
    the identity/translation homography must be fully repeatable; the
    5.0 wheel removed the API so this is geometry-validated."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (120, 160), np.uint8)
    kps = [tcv.KeyPoint(float(x), float(y), 16.0)
           for x, y in rng.integers(30, 90, (12, 2))]
    H = np.eye(3)
    rep, n = tcv.evaluateFeatureDetector(img, img, H, kps, kps)
    assert n == len(kps) and abs(rep - 1.0) < 1e-6, (rep, n)
    # pure translation: shifted keypoints still correspond 1:1
    H = np.array([[1, 0, 5.0], [0, 1, -3.0], [0, 0, 1]])
    kps2 = [tcv.KeyPoint(k.pt[0] + 5.0, k.pt[1] - 3.0, 16.0) for k in kps]
    rep, n = tcv.evaluateFeatureDetector(img, img, H, kps, kps2)
    assert n == len(kps) and abs(rep - 1.0) < 1e-6, (rep, n)
    # disjoint keypoints -> no correspondences
    kps3 = [tcv.KeyPoint(k.pt[0] + 40.0, k.pt[1], 16.0) for k in kps]
    rep, n = tcv.evaluateFeatureDetector(img, img, np.eye(3), kps, kps3)
    assert n <= 2, n


def test_recall_precision_curve():
    class M:
        def __init__(self, d):
            self.distance = d
    matches = [[M(0.1), M(0.5)], [M(0.2)], [M(0.3)]]
    mask = [[1, 0], [1], [0]]
    curve = tcv.computeRecallPrecisionCurve(matches, mask)
    # sorted by distance: d=.1 ok, .2 ok, .3 bad, .5 bad
    assert curve.shape == (4, 2)
    assert np.allclose(curve[0], [0.0, 0.5])       # p=1, r=1/2
    assert np.allclose(curve[1], [0.0, 1.0])       # p=1, r=1
    assert np.allclose(curve[3], [0.5, 1.0])       # p=1/2
    assert abs(tcv.getRecall(curve, 1.0) - 1.0) < 1e-6


def test_sift_batch_parity():
    """SIFT.detect_and_compute_batch: one fused device program for the
    batch pyramids must reproduce the single-image path exactly."""
    rng = np.random.default_rng(1)
    imgs = np.stack([
        cv2.GaussianBlur(rng.integers(0, 256, (96, 128), np.uint8),
                         (0, 0), 1.2) for _ in range(2)])
    sift = tcv.SIFT_create(nfeatures=50)
    batch = sift.detect_and_compute_batch(imgs)
    for b in range(2):
        kps1, d1 = sift.detectAndCompute(imgs[b])
        kps2, d2 = batch[b]
        assert len(kps1) == len(kps2)
        p1 = sorted((k.pt[0], k.pt[1], k.angle) for k in kps1)
        p2 = sorted((k.pt[0], k.pt[1], k.angle) for k in kps2)
        assert np.allclose(np.array(p1), np.array(p2), atol=1e-4)
        assert np.array_equal(np.sort(d1, axis=0), np.sort(d2, axis=0))


def test_akaze_brisk_batch_parity():
    rng = np.random.default_rng(2)
    imgs = np.stack([
        cv2.GaussianBlur(rng.integers(0, 256, (80, 96), np.uint8),
                         (0, 0), 1.5) for _ in range(2)])
    for det in (tcv.AKAZE_create(), tcv.BRISK_create(thresh=40)):
        batch = det.detect_and_compute_batch(imgs)
        for b in range(2):
            kps1, d1 = det.detectAndCompute(imgs[b])
            kps2, d2 = batch[b]
            assert len(kps1) == len(kps2)
            assert (d1 is None and d2 is None) or np.array_equal(d1, d2)
