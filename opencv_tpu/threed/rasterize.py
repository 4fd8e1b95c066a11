"""Software triangle rasterizer (the 5.x 3d module's triangleRasterize,
ptcloud/src/rendering.cpp in the wheel).  Camera looks down −z
(GL-style), pinhole from fovY with f = (H/2)/tan(fovY/2) and principal
point ((W−1)/2, (H−1)/2); the depth buffer holds linear camera-space
depth unless INVDEPTH compat is selected.  Vectorized per-triangle
bounding-box coverage in numpy."""

from __future__ import annotations

import numpy as np

__all__ = ["triangleRasterize", "triangleRasterizeColor",
           "triangleRasterizeDepth", "TriangleRasterizeSettings",
           "RASTERIZE_CULLING_NONE", "RASTERIZE_CULLING_CW",
           "RASTERIZE_CULLING_CCW", "RASTERIZE_SHADING_WHITE",
           "RASTERIZE_SHADING_FLAT", "RASTERIZE_SHADING_SHADED",
           "RASTERIZE_COMPAT_DISABLED", "RASTERIZE_COMPAT_INVDEPTH"]

RASTERIZE_SHADING_WHITE = 0
RASTERIZE_SHADING_FLAT = 1
RASTERIZE_SHADING_SHADED = 2
RASTERIZE_CULLING_NONE = 0
RASTERIZE_CULLING_CW = 1
RASTERIZE_CULLING_CCW = 2
RASTERIZE_COMPAT_DISABLED = 0
RASTERIZE_COMPAT_INVDEPTH = 1


class TriangleRasterizeSettings:
    def __init__(self):
        self.shadingType = RASTERIZE_SHADING_SHADED
        self.cullingMode = RASTERIZE_CULLING_CW
        self.glCompatibleMode = RASTERIZE_COMPAT_DISABLED

    def setShadingType(self, t):
        self.shadingType = t
        return self

    def setCullingMode(self, m):
        self.cullingMode = m
        return self

    def setGlCompatibleMode(self, m):
        self.glCompatibleMode = m
        return self


def _rasterize(vertices, indices, colors, colorBuf, depthBuf, world2cam,
               fovY, zNear, zFar, settings, want_color, want_depth):
    v = np.asarray(vertices, np.float64).reshape(-1, 3)
    tri = np.asarray(indices, np.int32).reshape(-1, 3)
    cols = (np.asarray(colors, np.float64).reshape(-1, 3)
            if colors is not None and np.asarray(colors).size else None)
    T = np.asarray(world2cam, np.float64).reshape(-1, 4)[:3]
    st = settings or TriangleRasterizeSettings()

    cb = None if colorBuf is None else np.array(colorBuf, np.float32,
                                                copy=True)
    db = np.array(depthBuf, np.float32, copy=True)
    H, W = db.shape[:2]
    f = (H / 2.0) / np.tan(fovY / 2.0)
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0

    vc = v @ T[:, :3].T + T[:, 3]
    z = -vc[:, 2]                      # camera looks down -z
    with np.errstate(divide="ignore", invalid="ignore"):
        su = vc[:, 0] / z * f + cx
        sv = cy - vc[:, 1] / z * f

    invdepth = st.glCompatibleMode == RASTERIZE_COMPAT_INVDEPTH

    for t in range(len(tri)):
        i0, i1, i2 = tri[t]
        z0, z1, z2 = z[i0], z[i1], z[i2]
        if z0 < zNear or z1 < zNear or z2 < zNear:
            continue
        if z0 > zFar and z1 > zFar and z2 > zFar:
            continue
        p0 = np.array([su[i0], sv[i0]])
        p1 = np.array([su[i1], sv[i1]])
        p2 = np.array([su[i2], sv[i2]])
        area = ((p1[0] - p0[0]) * (p2[1] - p0[1])
                - (p2[0] - p0[0]) * (p1[1] - p0[1]))
        if st.cullingMode == RASTERIZE_CULLING_CW and area >= 0:
            continue
        if st.cullingMode == RASTERIZE_CULLING_CCW and area <= 0:
            continue
        if area == 0:
            continue
        xmin = max(int(np.ceil(min(p0[0], p1[0], p2[0]))), 0)
        xmax = min(int(np.floor(max(p0[0], p1[0], p2[0]))), W - 1)
        ymin = max(int(np.ceil(min(p0[1], p1[1], p2[1]))), 0)
        ymax = min(int(np.floor(max(p0[1], p1[1], p2[1]))), H - 1)
        if xmin > xmax or ymin > ymax:
            continue
        gx, gy = np.meshgrid(np.arange(xmin, xmax + 1),
                             np.arange(ymin, ymax + 1))
        w0 = ((p1[0] - p0[0]) * (gy - p0[1])
              - (gx - p0[0]) * (p1[1] - p0[1])) / area
        w1 = ((p2[0] - p1[0]) * (gy - p1[1])
              - (gx - p1[0]) * (p2[1] - p1[1])) / area
        w2 = ((p0[0] - p2[0]) * (gy - p2[1])
              - (gx - p2[0]) * (p0[1] - p2[1])) / area
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        # barycentric wrt (i2, i0, i1) edge functions above: w0 is the
        # weight of i2, w1 of i0, w2 of i1
        l2, l0, l1 = w0, w1, w2
        with np.errstate(divide="ignore"):
            zi = 1.0 / (l0 / z0 + l1 / z1 + l2 / z2)
        sub_d = db[ymin:ymax + 1, xmin:xmax + 1]
        passed = inside & (zi < sub_d) & (zi >= zNear) & (zi <= zFar)
        if not passed.any():
            continue
        new_d = np.where(passed, 1.0 / zi if invdepth else zi, sub_d)
        db[ymin:ymax + 1, xmin:xmax + 1] = new_d.astype(np.float32)
        if cb is not None and want_color:
            if st.shadingType == RASTERIZE_SHADING_WHITE or cols is None:
                col = np.ones(passed.shape + (3,))
            elif st.shadingType == RASTERIZE_SHADING_FLAT:
                col = np.broadcast_to(cols[i0], passed.shape + (3,))
            else:   # perspective-correct interpolation
                col = (zi[..., None]
                       * (l0[..., None] * cols[i0] / z0
                          + l1[..., None] * cols[i1] / z1
                          + l2[..., None] * cols[i2] / z2))
            sub_c = cb[ymin:ymax + 1, xmin:xmax + 1]
            cb[ymin:ymax + 1, xmin:xmax + 1] = np.where(
                passed[..., None], col, sub_c).astype(np.float32)
    return cb, db


def triangleRasterize(vertices, indices, colors, colorBuf, depthBuf,
                      world2cam, fovY, zNear, zFar, settings=None):
    return _rasterize(vertices, indices, colors, colorBuf, depthBuf,
                      world2cam, fovY, zNear, zFar, settings, True, True)


def triangleRasterizeColor(vertices, indices, colors, colorBuf,
                           world2cam, fovY, zNear, zFar, settings=None):
    H, W = np.asarray(colorBuf).shape[:2]
    cb, _ = _rasterize(vertices, indices, colors, colorBuf,
                       np.full((H, W), zFar, np.float32), world2cam,
                       fovY, zNear, zFar, settings, True, False)
    return cb


def triangleRasterizeDepth(vertices, indices, depthBuf, world2cam, fovY,
                           zNear, zFar, settings=None):
    _, db = _rasterize(vertices, indices, None, None, depthBuf,
                       world2cam, fovY, zNear, zFar, settings, False,
                       True)
    return db
