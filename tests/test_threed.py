"""3d-module surface vs the cv2 oracle (5.x wheel; the reference
checkout predates the 3d module, so the wheel is the parity target):
point-cloud/mesh IO, depth utilities, the software triangle rasterizer,
and GIF animation IO interop."""

import numpy as np
import pytest

from common import cv2, assert_exact

import opencv_tpu as tcv


def test_point_cloud_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
    rgb = (rng.integers(0, 256, (10, 3)) / 255.0).astype(np.float32)
    p_ours = str(tmp_path / "ours.ply")
    tcv.savePointCloud(p_ours, v.reshape(-1, 1, 3), None,
                       rgb.reshape(-1, 1, 3))
    rv, rn, rc = cv2.loadPointCloud(p_ours)   # oracle reads our file
    assert np.allclose(np.asarray(rv).reshape(-1, 3), v, atol=1e-5)
    assert np.allclose(np.asarray(rc).reshape(-1, 3), rgb, atol=1e-2)
    gv, gn, gc = tcv.loadPointCloud(p_ours)
    assert np.allclose(gv.reshape(-1, 3), v, atol=1e-5)
    # oracle writes, we read (vertices only: its color scaling is buggy)
    p_ref = str(tmp_path / "ref.ply")
    cv2.savePointCloud(p_ref, v.reshape(-1, 1, 3))
    gv2, _, _ = tcv.loadPointCloud(p_ref)
    assert np.allclose(gv2.reshape(-1, 3), v, atol=1e-5)


def test_mesh_roundtrip(tmp_path):
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                 np.float32).reshape(-1, 1, 3)
    idx = [np.array([0, 1, 2], np.int32), np.array([1, 3, 2], np.int32)]
    for ext in ("ply", "obj"):
        p = str(tmp_path / f"m.{ext}")
        tcv.saveMesh(p, v, idx)
        rv, ri = cv2.loadMesh(p)[:2]
        assert np.allclose(np.asarray(rv).reshape(-1, 3),
                           v.reshape(-1, 3))
        assert [list(np.asarray(x).ravel()) for x in ri] == \
            [[0, 1, 2], [1, 3, 2]]
        gv, gi = tcv.loadMesh(p)[:2]
        assert np.allclose(gv.reshape(-1, 3), v.reshape(-1, 3))
        assert [list(x) for x in gi] == [[0, 1, 2], [1, 3, 2]]


def test_depth_to_3d():
    K = np.array([[100, 0, 16], [0, 100, 12], [0, 0, 1]], np.float64)
    rng = np.random.default_rng(1)
    d = rng.uniform(0.5, 3.0, (24, 32)).astype(np.float32)
    ref = cv2.depthTo3d(d, K)
    got = tcv.depthTo3d(d, K)
    assert got.shape == ref.shape
    assert np.allclose(got, ref, atol=1e-5)
    d16 = (d * 1000).astype(np.uint16)
    assert np.allclose(tcv.depthTo3d(d16, K), cv2.depthTo3d(d16, K),
                       atol=1e-4)


def test_rescale_depth():
    d16 = np.array([[0, 1500], [2000, 65535]], np.uint16)
    ref = cv2.rescaleDepth(d16, cv2.CV_32F)
    got = tcv.rescaleDepth(d16, tcv.CV_32F)
    m = np.isfinite(ref)
    assert np.array_equal(np.isfinite(got), m)
    assert np.allclose(got[m], ref[m])


def test_register_depth():
    K = np.array([[100, 0, 16], [0, 100, 12], [0, 0, 1]], np.float64)
    depth = np.full((24, 32), 2.0, np.float32)
    ref = cv2.registerDepth(K, K, None, np.eye(4), depth, (32, 24))
    got = tcv.registerDepth(K, K, None, np.eye(4), depth, (32, 24))
    m = (ref > 0) & (got > 0)
    assert m.mean() > 0.9
    assert np.allclose(got[m], ref[m], atol=1e-5)


@pytest.mark.parametrize("trial", [0, 1, 2])
def test_triangle_rasterize(trial):
    rng = np.random.default_rng(trial)
    nv = 9
    verts = rng.uniform(-1.5, 1.5, (nv, 3)).astype(np.float32)
    verts[:, 2] = -rng.uniform(2, 8, nv)
    idxs = rng.integers(0, nv, (5, 3)).astype(np.int32)
    cols = rng.uniform(0, 1, (nv, 3)).astype(np.float32)
    H, W = 40, 48
    w2c = np.eye(4, dtype=np.float32)
    args = (verts, idxs, cols, np.zeros((H, W, 3), np.float32),
            np.full((H, W), 50.0, np.float32), w2c, np.deg2rad(55.0),
            0.1, 50.0)
    ref_cb, ref_db = cv2.triangleRasterize(*args)
    got_cb, got_db = tcv.triangleRasterize(*args)
    assert np.array_equal(ref_db < 49, got_db < 49)   # exact coverage
    m = ref_db < 49
    if m.any():
        assert np.abs(ref_db[m] - got_db[m]).max() < 1e-3
        assert np.abs(ref_cb[m] - got_cb[m]).max() < 1e-5


def test_triangle_rasterize_shading_culling():
    verts = np.array([[-0.5, -0.5, -3], [0.5, -0.5, -3], [0, 0.5, -3]],
                     np.float32)
    idxs = np.array([[0, 1, 2]], np.int32)
    cols = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    H, W = 24, 32
    w2c = np.eye(4, dtype=np.float32)
    for shading in (cv2.RASTERIZE_SHADING_WHITE,
                    cv2.RASTERIZE_SHADING_FLAT):
        s_ref = cv2.TriangleRasterizeSettings().setShadingType(shading)
        s_got = tcv.TriangleRasterizeSettings().setShadingType(shading)
        args = lambda s: (verts, idxs, cols,
                          np.zeros((H, W, 3), np.float32),
                          np.full((H, W), 50.0, np.float32), w2c,
                          np.deg2rad(60.0), 0.1, 50.0, s)
        ref_cb, ref_db = cv2.triangleRasterize(*args(s_ref))
        got_cb, got_db = tcv.triangleRasterize(*args(s_got))
        m = ref_db < 49
        assert np.array_equal(m, got_db < 49)
        assert np.allclose(ref_cb[m], got_cb[m], atol=1e-6), shading
    # reversed winding is culled by both by default
    rev = np.array([[0, 2, 1]], np.int32)
    _, db_ref = cv2.triangleRasterize(verts, rev, cols,
                                      np.zeros((H, W, 3), np.float32),
                                      np.full((H, W), 50.0, np.float32),
                                      w2c, np.deg2rad(60.0), 0.1, 50.0)
    _, db_got = tcv.triangleRasterize(verts, rev, cols,
                                      np.zeros((H, W, 3), np.float32),
                                      np.full((H, W), 50.0, np.float32),
                                      w2c, np.deg2rad(60.0), 0.1, 50.0)
    assert (db_ref < 49).sum() == (db_got < 49).sum()


def test_animation_interop(tmp_path):
    rng = np.random.default_rng(2)
    frames = [(rng.integers(0, 4, (20, 30, 3)) * 80).astype(np.uint8)
              for _ in range(3)]
    p = str(tmp_path / "a.gif")
    a = tcv.Animation()
    a.frames = frames
    a.durations = [40, 80, 120]
    a.loop_count = 2
    assert tcv.imwriteanimation(p, a)
    ok, ref = cv2.imreadanimation(p)       # oracle reads our GIF
    assert ok and len(ref.frames) == 3
    assert list(ref.durations) == [40, 80, 120]
    assert ref.loop_count == 2
    for f, g in zip(frames, ref.frames):
        assert_exact(np.asarray(g)[:, :, :3], f)
    # oracle writes (lossy quantizer); our decode must match ITS decode
    p2 = str(tmp_path / "b.gif")
    a2 = cv2.Animation()
    a2.frames = [np.dstack([f, np.full(f.shape[:2], 255, np.uint8)])
                 for f in frames]
    a2.durations = [40, 80, 120]
    a2.loop_count = 2
    assert cv2.imwriteanimation(p2, a2)
    ok_r, dec_ref = cv2.imreadanimation(p2)
    ok_g, dec_got = tcv.imreadanimation(p2)
    assert ok_r and ok_g and len(dec_got.frames) == len(dec_ref.frames)
    assert dec_got.loop_count == dec_ref.loop_count
    for f, g in zip(dec_ref.frames, dec_got.frames):
        assert_exact(np.asarray(g)[:, :, :3], np.asarray(f)[:, :, :3])
