"""Misc imgproc ops: getRectSubPix, matchShapes, phaseCorrelate,
createHanningWindow, convertMaps, demosaicing, blendLinear
(imgproc/src/samplers.cpp, matchcontours.cpp, phasecorr.cpp,
demosaicing.cpp, blend.cpp).
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from .. import constants as K
from ..core.arrays import to_batched, from_batched
from ..core.fixedpoint import saturate_cast

__all__ = ["getRectSubPix", "matchShapes", "phaseCorrelate",
           "createHanningWindow", "convertMaps", "demosaicing",
           "blendLinear", "CONTOURS_MATCH_I1", "CONTOURS_MATCH_I2",
           "CONTOURS_MATCH_I3"]

CONTOURS_MATCH_I1 = 1
CONTOURS_MATCH_I2 = 2
CONTOURS_MATCH_I3 = 3


def getRectSubPix(image, patchSize, center, patchType=-1):
    """Bilinear sub-pixel patch extraction (samplers.cpp)."""
    from ..ops.warp import _remap_linear_float

    x, _ = to_batched(image)
    w, h = int(patchSize[0]), int(patchSize[1])
    cx, cy = float(center[0]), float(center[1])
    x0 = cx - (w - 1) * 0.5
    y0 = cy - (h - 1) * 0.5
    mapx = x0 + np.arange(w, dtype=np.float64)[None, :] \
        + np.zeros((h, 1))
    mapy = y0 + np.arange(h, dtype=np.float64)[:, None] \
        + np.zeros((1, w))
    out = _remap_linear_float(x, mapx, mapy, K.BORDER_REPLICATE, 0)
    meta = "hwc" if np.asarray(image).ndim == 3 else "hw"
    return from_batched(out, meta)


def matchShapes(contour1, contour2, method: int, parameter: float = 0.0):
    """Hu-moment shape distance (matchcontours.cpp)."""
    from .shape import moments
    from .contours import HuMoments

    def hu_of(c):
        arr = np.asarray(c)
        if arr.ndim >= 3 or (arr.ndim == 2 and arr.shape[1] == 2):
            # contour points → use contour moments via dense rasterization
            from .contours import contourArea
            pts = arr.reshape(-1, 2).astype(np.float64)
            # polygon moments (Green's theorem), matching cv::moments on
            # contours
            x = pts[:, 0]
            y = pts[:, 1]
            xn = np.roll(x, -1)
            yn = np.roll(y, -1)
            a = x * yn - xn * y
            m00 = a.sum() / 2
            m10 = ((x + xn) * a).sum() / 6
            m01 = ((y + yn) * a).sum() / 6
            m20 = ((x * x + x * xn + xn * xn) * a).sum() / 12
            m02 = ((y * y + y * yn + yn * yn) * a).sum() / 12
            m11 = ((2 * x * y + x * yn + xn * y + 2 * xn * yn) * a).sum() / 24
            m30 = ((x ** 3 + x * x * xn + x * xn * xn + xn ** 3) * a).sum() / 20
            m03 = ((y ** 3 + y * y * yn + y * yn * yn + yn ** 3) * a).sum() / 20
            m21 = ((x * x * (3 * y + yn) + 2 * x * xn * (y + yn)
                    + xn * xn * (y + 3 * yn)) * a).sum() / 60
            m12 = ((y * y * (3 * x + xn) + 2 * y * yn * (x + xn)
                    + yn * yn * (x + 3 * xn)) * a).sum() / 60
            if m00 < 0:
                m00, m10, m01, m20, m11, m02, m30, m21, m12, m03 = [
                    -v for v in (m00, m10, m01, m20, m11, m02, m30, m21,
                                 m12, m03)]
            cx, cy = m10 / m00, m01 / m00
            mu20 = m20 - m10 * cx
            mu11 = m11 - m10 * cy
            mu02 = m02 - m01 * cy
            mu30 = m30 - cx * (3 * mu20 + cx * m10)
            mu21 = m21 - cx * (2 * mu11 + cx * m01) - cy * mu20
            mu12 = m12 - cy * (2 * mu11 + cy * m10) - cx * mu02
            mu03 = m03 - cy * (3 * mu02 + cy * m01)
            md = {"mu20": mu20, "mu11": mu11, "mu02": mu02, "mu30": mu30,
                  "mu21": mu21, "mu12": mu12, "mu03": mu03}
            for name in ["mu20", "mu11", "mu02"]:
                md["nu" + name[2:]] = md[name] / (m00 * m00)
            for name in ["mu30", "mu21", "mu12", "mu03"]:
                md["nu" + name[2:]] = md[name] / (m00 ** 2.5)
            return HuMoments(md).ravel()
        return HuMoments(moments(arr)).ravel()

    ha = hu_of(contour1)
    hb = hu_of(contour2)
    eps = 1e-5
    ma = np.where(np.abs(ha) > eps, np.sign(ha) * np.log10(np.abs(ha)), 0)
    mb = np.where(np.abs(hb) > eps, np.sign(hb) * np.log10(np.abs(hb)), 0)
    valid = (np.abs(ha) > eps) & (np.abs(hb) > eps)
    if method == CONTOURS_MATCH_I1:
        return float(np.sum(np.abs(1.0 / ma[valid] - 1.0 / mb[valid])))
    if method == CONTOURS_MATCH_I2:
        return float(np.sum(np.abs(ma[valid] - mb[valid])))
    return float(np.max(np.abs(ma[valid] - mb[valid])
                        / np.abs(ma[valid])) if valid.any() else 0.0)


def createHanningWindow(winSize, type=K.CV_32F):
    """Hanning window (phasecorr.cpp:601): sqrt of the separable product
    (the reference sqrt-s the 2-D window)."""
    w, h = int(winSize[0]), int(winSize[1])
    wy = 0.5 * (1 - np.cos(2 * np.pi * np.arange(h) / (h - 1)))
    wx = 0.5 * (1 - np.cos(2 * np.pi * np.arange(w) / (w - 1)))
    return np.sqrt(np.outer(wy, wx)).astype(
        np.float32 if type == K.CV_32F else np.float64)


def phaseCorrelate(src1, src2, window=None):
    """Translation estimation via normalized cross-power spectrum
    (phasecorr.cpp) with the same 5×5 weighted-centroid subpixel peak."""
    a = np.asarray(src1, np.float64)
    b = np.asarray(src2, np.float64)
    if window is not None:
        wnd = np.asarray(window, np.float64)
        a = a * wnd
        b = b * wnd
    FA = np.fft.fft2(a)
    FB = np.fft.fft2(b)
    P = FA * np.conj(FB)
    mag = np.abs(P)
    C = np.fft.ifft2(P / np.maximum(mag, 1e-15)).real
    H, W = C.shape
    py, px = np.unravel_index(C.argmax(), C.shape)
    # 5x5 weighted centroid around the peak
    r = 2
    ys = (np.arange(py - r, py + r + 1)) % H
    xs = (np.arange(px - r, px + r + 1)) % W
    patch = C[np.ix_(ys, xs)]
    patch = np.maximum(patch, 0)
    total = patch.sum()
    if total > 0:
        dy = (patch.sum(axis=1) * (np.arange(-r, r + 1))).sum() / total
        dx = (patch.sum(axis=0) * (np.arange(-r, r + 1))).sum() / total
    else:
        dy = dx = 0.0
    sy = py + dy
    sx = px + dx
    if sy > H / 2:
        sy -= H
    if sx > W / 2:
        sx -= W
    resp = float(C.max())
    return (-sx, -sy), resp


def convertMaps(map1, map2, dstmap1type, nninterpolation=False):
    """Float maps → CV_16SC2 (+CV_16UC1 Q5 fractions), imgwarp.cpp:1713."""
    from ..ops.warp import INTER_BITS, INTER_TAB_SIZE

    mx = np.asarray(map1, np.float32)
    my = np.asarray(map2, np.float32)
    if nninterpolation:
        m1 = np.stack([np.rint(mx), np.rint(my)], axis=-1).astype(np.int16)
        return m1, None
    X = np.rint(mx * INTER_TAB_SIZE).astype(np.int64)
    Y = np.rint(my * INTER_TAB_SIZE).astype(np.int64)
    m1 = np.stack([X >> INTER_BITS, Y >> INTER_BITS], axis=-1)
    m1 = np.clip(m1, -32768, 32767).astype(np.int16)
    m2 = ((Y & (INTER_TAB_SIZE - 1)) * INTER_TAB_SIZE
          + (X & (INTER_TAB_SIZE - 1))).astype(np.uint16)
    return m1, m2


def demosaicing(src, code: int, dstCn: int = 0):
    """Bilinear Bayer demosaicing (demosaicing.cpp Bayer2BGR_, the
    default non-VNG path): green averaged from 4 neighbors, R/B from
    2 or 4 diagonal neighbors, with the reference's descale rounding."""
    x, meta = to_batched(src)
    xi = x.astype(jnp.int32)[..., 0]
    N, H, W = xi.shape
    p = jnp.pad(xi, ((0, 0), (1, 1), (1, 1)), mode="reflect")

    def at(dy, dx):
        return p[:, 1 + dy:1 + dy + H, 1 + dx:1 + dx + W]

    c = at(0, 0)
    h2 = (at(0, -1) + at(0, 1) + 1) >> 1
    v2 = (at(-1, 0) + at(1, 0) + 1) >> 1
    x4 = (at(-1, -1) + at(-1, 1) + at(1, -1) + at(1, 1) + 2) >> 2
    p4 = (at(0, -1) + at(0, 1) + at(-1, 0) + at(1, 0) + 2) >> 2

    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    # red-site parity per code (empirically matched to the reference:
    # BayerBG2BGR has R at (0,0) — the enum names the 2nd-row pattern)
    if code == K.COLOR_BayerBG2BGR:
        ry, rx = 0, 0
    elif code == K.COLOR_BayerGB2BGR:
        ry, rx = 0, 1
    elif code == K.COLOR_BayerRG2BGR:
        ry, rx = 1, 1
    else:  # BayerGR
        ry, rx = 1, 0
    is_r = ((ys % 2) == ry) & ((xs % 2) == rx)
    is_b = ((ys % 2) == (1 - ry)) & ((xs % 2) == (1 - rx))
    is_g = ~(is_r | is_b)
    g_row_r = (ys % 2) == ry  # green pixels on red rows

    R = jnp.where(is_r, c,
                  jnp.where(is_b, x4,
                            jnp.where(g_row_r, h2, v2)))
    B = jnp.where(is_b, c,
                  jnp.where(is_r, x4,
                            jnp.where(g_row_r, v2, h2)))
    G = jnp.where(is_g, c, p4)
    out = jnp.stack([B, G, R], axis=-1)
    # the reference fills the one-pixel frame by copying the adjacent
    # computed row/column (demosaicing.cpp border handling) — rows
    # first, then columns (covers the corners)
    out = out.at[:, 0].set(out[:, 1])
    out = out.at[:, H - 1].set(out[:, H - 2])
    out = out.at[:, :, 0].set(out[:, :, 1])
    out = out.at[:, :, W - 1].set(out[:, :, W - 2])
    return from_batched(saturate_cast(out, x.dtype), meta)


def blendLinear(src1, src2, weights1, weights2):
    a, meta = to_batched(src1)
    b, _ = to_batched(src2)
    w1, _ = to_batched(weights1)
    w2, _ = to_batched(weights2)
    w1 = w1.astype(jnp.float32)
    w2 = w2.astype(jnp.float32)
    num = a.astype(jnp.float32) * w1 + b.astype(jnp.float32) * w2
    # blend.cpp adds 1e-5f to the denominator (not a clamp)
    out = num / (w1 + w2 + jnp.float32(1e-5))
    return from_batched(saturate_cast(out, a.dtype), meta)
