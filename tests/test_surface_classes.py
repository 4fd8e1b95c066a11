"""Class-surface batch vs the cv2 oracle: Subdiv2D (exact Delaunay),
IntelligentScissorsMB (exact live-wire paths), ColorCorrectionModel
(CCM within 5e-3 of the wheel), TSDF Volume + ICP Odometry
(functional ground-truth checks), mcc ColorChecker detection, misc
class scaffolding."""

import numpy as np
import pytest

from common import cv2, assert_exact

import opencv_tpu as tcv


def test_subdiv2d_delaunay_matches():
    rng = np.random.default_rng(0)
    pts = rng.uniform(10, 90, (12, 2)).astype(np.float32)
    ours = tcv.Subdiv2D((0, 0, 100, 100))
    ref = cv2.Subdiv2D((0, 0, 100, 100))
    for p in pts:
        ours.insert((float(p[0]), float(p[1])))
        ref.insert((float(p[0]), float(p[1])))

    def norm(tl):
        keep = []
        for t in np.asarray(tl).reshape(-1, 6):
            xs, ys = t[0::2], t[1::2]
            if (xs >= 0).all() and (xs <= 100).all() \
                    and (ys >= 0).all() and (ys <= 100).all():
                keep.append(tuple(sorted(zip(np.round(xs, 3),
                                             np.round(ys, 3)))))
        return sorted(keep)

    assert norm(ours.getTriangleList()) == norm(ref.getTriangleList())
    assert ours.findNearest((50, 50))[0] == ref.findNearest((50, 50))[0]
    f, c = ours.getVoronoiFacetList([])
    assert len(f) == 12 and c.shape == (12, 2)


def test_intelligent_scissors_exact():
    rng = np.random.default_rng(0)
    img = np.zeros((60, 80), np.uint8)
    for y in range(60):
        img[y, int(35 + 10 * np.sin(y / 8)):] = 180
    img = (img.astype(int)
           + rng.integers(0, 12, img.shape)).astype(np.uint8)
    ours = tcv.segmentation_IntelligentScissorsMB()
    ref = cv2.segmentation.IntelligentScissorsMB()
    for s in (ours, ref):
        s.applyImage(img)
        s.buildMap((38, 5))
    got = ours.getContour((40, 55)).reshape(-1, 2)
    want = np.asarray(ref.getContour((40, 55))).reshape(-1, 2)
    assert np.array_equal(got, want)


def test_intelligent_scissors_canny_mode():
    img = np.zeros((40, 50), np.uint8)
    img[:, 25:] = 200
    ours = tcv.segmentation_IntelligentScissorsMB()
    ref = cv2.segmentation.IntelligentScissorsMB()
    for s in (ours, ref):
        s.setEdgeFeatureCannyParameters(50, 100)
        s.applyImage(img)
        s.buildMap((25, 5))
    got = ours.getContour((25, 35)).reshape(-1, 2)
    want = np.asarray(ref.getContour((25, 35))).reshape(-1, 2)
    assert np.array_equal(got, want)


def test_color_correction_model():
    from opencv_tpu.ops.ccm import (_lab_d50_to_linear_rgb,
                                    _MACBETH_LAB)
    ref_lin = np.clip(_lab_d50_to_linear_rgb(_MACBETH_LAB), 0, 1)
    M = np.array([[0.9, 0.1, 0.0], [0.05, 0.85, 0.05],
                  [0.0, 0.1, 0.95]])
    src = (np.clip(ref_lin @ np.linalg.inv(M), 0, 1)
           ** (1 / 2.2)).reshape(-1, 1, 3)
    ours = tcv.ccm_ColorCorrectionModel(src, 0)
    ours.compute()
    ref = cv2.ccm.ColorCorrectionModel(src.astype(np.float64),
                                       cv2.ccm.COLORCHECKER_MACBETH)
    ref.compute()
    got = ours.getColorCorrectionMatrix()
    want = np.asarray(ref.getColorCorrectionMatrix())
    assert np.allclose(got, want, atol=5e-3)
    assert abs(ours.getLoss() - ref.getLoss()) < 0.1


def _rodr(v):
    th = np.linalg.norm(v)
    if th < 1e-12:
        return np.eye(3)
    k = v / th
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                   [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx


def _bumpy_scene():
    K = np.array([[200, 0, 80], [0, 200, 60], [0, 0, 1]], np.float64)
    H, W = 120, 160
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    Z = 2.0 + 0.2 * np.sin(xs / 15.0) + 0.15 * np.cos(ys / 11.0)
    X = (xs - K[0, 2]) / K[0, 0] * Z
    Y = (ys - K[1, 2]) / K[1, 1] * Z
    return K, H, W, Z, np.stack([X, Y, Z], -1).reshape(-1, 3)


def test_odometry_icp():
    K, H, W, Z, pts = _bumpy_scene()
    Rt = np.eye(4)
    Rt[:3, :3] = _rodr(np.array([0.01, -0.015, 0.008]))
    Rt[:3, 3] = [0.01, -0.005, 0.02]
    p2 = pts @ Rt[:3, :3].T + Rt[:3, 3]
    u = np.round(p2[:, 0] / p2[:, 2] * K[0, 0] + K[0, 2]).astype(int)
    v = np.round(p2[:, 1] / p2[:, 2] * K[1, 1] + K[1, 2]).astype(int)
    dst = np.full((H, W), np.nan)
    inb = (u >= 0) & (u < W) & (v >= 0) & (v < H)
    order = np.argsort(-p2[inb, 2])
    dst[v[inb][order], u[inb][order]] = p2[inb, 2][order]
    settings = tcv.OdometrySettings()
    settings.setCameraMatrix(K)
    od = tcv.Odometry(settings)
    ok, T = od.compute(Z.astype(np.float32), dst.astype(np.float32))
    assert ok
    assert np.abs(T[:3, :3] - Rt[:3, :3]).max() < 5e-3
    assert np.abs(T[:3, 3] - Rt[:3, 3]).max() < 5e-3


def test_tsdf_volume_roundtrip():
    K, H, W, Z, _ = _bumpy_scene()
    vs = tcv.VolumeSettings()
    vs.setVoxelSize(0.02)
    vs.setVolumeResolution((64, 64, 64))
    vs.setTsdfTruncateDistance(0.06)
    vs.setCameraIntegrateIntrinsics(K)
    vs.setRaycastWidth(W)
    vs.setRaycastHeight(H)
    vs.setVolumePose(np.array([[1, 0, 0, -0.64], [0, 1, 0, -0.64],
                               [0, 0, 1, 1.4], [0, 0, 0, 1.0]]))
    vol = tcv.Volume(0, vs)
    vol.integrate(Z.astype(np.float32), np.eye(4))
    p, n = vol.raycast(np.eye(4), H, W)
    zr = p[..., 2]
    m = np.isfinite(zr) & (zr > 0)
    assert m.mean() > 0.5
    assert np.nanmedian(np.abs(zr[m] - Z[m])) < 0.02
    pts, _normals = vol.fetchPointsNormals()
    assert len(pts) > 100


def test_mcc_detector():
    # synthetic 6x4 ColorChecker-like chart
    rng = np.random.default_rng(0)
    img = np.full((300, 440, 3), 30, np.uint8)
    colors = rng.integers(40, 230, (24, 3))
    truth = []
    k = 0
    for r in range(4):
        for c in range(6):
            x0, y0 = 25 + c * 68, 25 + r * 66
            img[y0:y0 + 52, x0:x0 + 56] = colors[k]
            truth.append(colors[k])
            k += 1
    det = tcv.mcc_CCheckerDetector.create()
    assert det.process(img, 0)
    chk = det.getBestColorChecker()
    assert chk is not None
    rgb = chk.getChartsRGB().reshape(-1, 3)
    assert rgb.shape == (24, 3)
    # patches read back in row-major order, RGB
    want = np.asarray(truth)[:, ::-1]
    assert np.abs(rgb - want).max() <= 2


def test_class_scaffolding():
    a = tcv.AsyncArray(42)
    assert a.get() == 42 and a.valid()
    assert isinstance(tcv.error("boom"), Exception)
    g = tcv.cuda_GpuMat()
    with pytest.raises(tcv.error):
        g.upload(np.zeros((2, 2)))
    assert not tcv.cuda_TargetArchs.has(7, 0)
    assert tcv.MatShape([1, 3, 224, 224])[1] == 3
    assert tcv.ALIKED.create().empty()
    f = tcv.FontFace("sans")
    assert f.getName() == "sans"
