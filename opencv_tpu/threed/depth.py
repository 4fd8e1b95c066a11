"""Depth-map utilities from the 5.x 3d module (depthTo3d, rescaleDepth,
registerDepth, warpFrame).  These are dense per-pixel maps — a natural
fit for batched device execution; implemented as vectorized numpy host
ops with the wheel's exact output conventions (validated against it)."""

from __future__ import annotations

import numpy as np

__all__ = ["depthTo3d", "depthTo3dSparse", "rescaleDepth",
           "registerDepth", "warpFrame"]


def rescaleDepth(in_, type: int = 5, depth_factor: float = 1000.0):
    """u16/u8 integer depth (millimetres) → float metres; invalid (0 or
    the integer sentinel) becomes NaN like the reference."""
    a = np.asarray(in_)
    if a.dtype in (np.uint16, np.int16, np.uint8):
        bad = (a == 0)
        out = a.astype(np.float64) / float(depth_factor)
        out[bad] = np.nan
    else:
        out = a.astype(np.float64)
    return out.astype(np.float32 if type in (5, -1) else np.float64)


def depthTo3d(depth, K, points3d=None, mask=None):
    """Backproject a depth map: (H, W, 4) float32 of (X, Y, Z, 0)
    camera-space points (the wheel returns a 4-channel map)."""
    d = np.asarray(depth)
    if d.dtype in (np.uint16, np.int16, np.uint8):
        d = rescaleDepth(d, 5)
    d = d.astype(np.float64)
    Km = np.asarray(K, np.float64).reshape(3, 3)
    H, W = d.shape[:2]
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    X = (xs - Km[0, 2]) / Km[0, 0] * d
    Y = (ys - Km[1, 2]) / Km[1, 1] * d
    out = np.stack([X, Y, d, np.zeros_like(d)], axis=-1)
    if mask is not None:
        out[np.asarray(mask) == 0] = np.nan
    return out.astype(np.float32)


def depthTo3dSparse(depth, K, points):
    """Backproject only the given pixel coordinates → (N, 1, 3)."""
    d = np.asarray(depth)
    if d.dtype in (np.uint16, np.int16, np.uint8):
        d = rescaleDepth(d, 5)
    Km = np.asarray(K, np.float64).reshape(3, 3)
    pts = np.asarray(points).reshape(-1, 2)
    z = d[pts[:, 1].astype(int), pts[:, 0].astype(int)]
    X = (pts[:, 0] - Km[0, 2]) / Km[0, 0] * z
    Y = (pts[:, 1] - Km[1, 2]) / Km[1, 1] * z
    return np.stack([X, Y, z], -1).astype(np.float32).reshape(-1, 1, 3)


def registerDepth(unregisteredCameraMatrix, registeredCameraMatrix,
                  registeredDistCoeffs, Rt, unregisteredDepth,
                  outputImagePlaneSize, depthDilation: bool = False):
    """Reproject a depth map into another camera's image plane with a
    z-buffer (3d module registerDepth)."""
    Ku = np.asarray(unregisteredCameraMatrix, np.float64).reshape(3, 3)
    Kr = np.asarray(registeredCameraMatrix, np.float64).reshape(3, 3)
    T = np.asarray(Rt, np.float64).reshape(-1, 4)[:3]
    d = np.asarray(unregisteredDepth)
    scaled = d.dtype in (np.uint16, np.int16)
    df = rescaleDepth(d, 5).astype(np.float64) if scaled \
        else d.astype(np.float64)
    H, W = df.shape
    Wo, Ho = int(outputImagePlaneSize[0]), int(outputImagePlaneSize[1])
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    valid = np.isfinite(df) & (df > 0)
    z = df[valid]
    X = (xs[valid] - Ku[0, 2]) / Ku[0, 0] * z
    Y = (ys[valid] - Ku[1, 2]) / Ku[1, 1] * z
    P = np.stack([X, Y, z, np.ones_like(z)])
    Pc = T @ P
    zn = Pc[2]
    ok = zn > 0
    u = np.round(Pc[0][ok] / zn[ok] * Kr[0, 0] + Kr[0, 2]).astype(int)
    v = np.round(Pc[1][ok] / zn[ok] * Kr[1, 1] + Kr[1, 2]).astype(int)
    zn = zn[ok]
    inb = (u >= 0) & (u < Wo) & (v >= 0) & (v < Ho)
    u, v, zn = u[inb], v[inb], zn[inb]
    out = np.full((Ho, Wo), np.inf)
    np.minimum.at(out, (v, u), zn)
    out[~np.isfinite(out)] = 0.0
    if depthDilation:
        from scipy import ndimage  # pragma: no cover
    if scaled:
        return np.round(out * 1000).astype(d.dtype)
    return out.astype(np.float32)


def warpFrame(depth, image, mask, Rt, cameraMatrix, warpedDepth=None,
              warpedImage=None, warpedMask=None):
    """Forward-warp an RGB-D frame by the pose Rt (3d module
    warpFrame): backproject, transform, project, z-buffer scatter."""
    K = np.asarray(cameraMatrix, np.float64).reshape(3, 3)
    T = np.asarray(Rt, np.float64).reshape(-1, 4)[:3]
    d = np.asarray(depth)
    img = None if image is None else np.asarray(image)
    df = rescaleDepth(d, 5).astype(np.float64) \
        if d.dtype in (np.uint16, np.int16) else d.astype(np.float64)
    H, W = df.shape
    m = np.ones((H, W), bool) if mask is None \
        else np.asarray(mask) != 0
    valid = np.isfinite(df) & (df > 0) & m
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    z = df[valid]
    X = (xs[valid] - K[0, 2]) / K[0, 0] * z
    Y = (ys[valid] - K[1, 2]) / K[1, 1] * z
    Pc = T @ np.stack([X, Y, z, np.ones_like(z)])
    zn = Pc[2]
    ok = zn > 0
    u = np.round(Pc[0][ok] / zn[ok] * K[0, 0] + K[0, 2]).astype(int)
    v = np.round(Pc[1][ok] / zn[ok] * K[1, 1] + K[1, 2]).astype(int)
    zn2 = zn[ok]
    src_y = ys[valid][ok]
    src_x = xs[valid][ok]
    inb = (u >= 0) & (u < W) & (v >= 0) & (v < H)
    u, v, zn2 = u[inb], v[inb], zn2[inb]
    src_y, src_x = src_y[inb], src_x[inb]
    wd = np.full((H, W), np.inf)
    np.minimum.at(wd, (v, u), zn2)
    # pick the source pixel that won the z-buffer
    win = zn2 == wd[v, u]
    wi = None
    if img is not None:
        wi = np.zeros_like(img)
        wi[v[win], u[win]] = img[src_y[win], src_x[win]]
    wm = np.zeros((H, W), np.uint8)
    wm[v[win], u[win]] = 255
    wd[~np.isfinite(wd)] = np.nan
    out_d = wd.astype(np.float32)
    out_d[wm == 0] = np.nan
    return out_d, wi, wm
