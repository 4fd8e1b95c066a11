"""Stitching warpers (modules/stitching) parity tests."""
import numpy as np

from common import cv2

import opencv_tpu as tcv

def test_rotation_warpers_vs_cv2():
    """PyRotationWarper parity (stitching/src/warpers.cpp projectors):
    corners, point maps, and warped pixels must match cv2 for every
    projector family."""
    import math
    K = np.array([[120., 2, 64], [0, 115, 50], [0, 0, 1]], np.float32)
    ax, ay = 0.1, -0.2
    Rx = np.array([[1, 0, 0], [0, math.cos(ax), -math.sin(ax)],
                   [0, math.sin(ax), math.cos(ax)]])
    Ry = np.array([[math.cos(ay), 0, math.sin(ay)], [0, 1, 0],
                   [-math.sin(ay), 0, math.cos(ay)]])
    R = (Ry @ Rx).astype(np.float32)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (100, 128, 3), np.uint8)
    for t in ("plane", "spherical", "cylindrical", "fisheye",
              "stereographic", "mercator", "transverseMercator"):
        wr = cv2.PyRotationWarper(t, 110.0)
        wo = tcv.PyRotationWarper(t, 110.0)
        c_ref, d_ref = wr.warp(img, K, R, cv2.INTER_LINEAR,
                               cv2.BORDER_CONSTANT)
        c_our, d_our = wo.warp(img, K, R)
        assert c_ref == c_our, t
        assert d_ref.shape == d_our.shape, t
        bad = (np.abs(d_ref.astype(int) - d_our.astype(int)) > 2).mean()
        assert bad < 0.005, (t, bad)
        p_ref = wr.warpPoint((64, 50), K, R)
        p_our = wo.warpPoint((64, 50), K, R)
        assert np.hypot(p_ref[0] - p_our[0], p_ref[1] - p_our[1]) < 1e-3
        roi_r, xm_r, ym_r = wr.buildMaps((128, 100), K, R)
        roi_o, xm_o, ym_o = wo.buildMaps((128, 100), K, R)
        assert tuple(roi_r) == tuple(roi_o), t
        assert np.abs(xm_o - xm_r).max() < 1e-3
        assert np.abs(ym_o - ym_r).max() < 1e-3
