"""Corner detectors: cornerHarris / cornerMinEigenVal /
cornerEigenValsAndVecs / goodFeaturesToTrack (imgproc/src/corner.cpp,
featureselect.cpp).

TPU-native design: the covariance pipeline (Sobel dx,dy → 3 per-pixel
products → unnormalized box sum → per-pixel response) is pure fused VPU
work over the NHWC batch.  goodFeaturesToTrack's data-dependent output is
split TPU-first: response + 3×3-dilate NMS + validity mask run on device
(`good_features_response`), and the tiny greedy min-distance tail runs on
host — mirroring how the reference itself splits parallel scoring from the
sequential grid filter (featureselect.cpp:185-240).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import constants as K
from ..core.arrays import to_batched, from_batched
from .deriv import Sobel
from .filter import boxFilter
from .morph import dilate

__all__ = ["cornerHarris", "cornerMinEigenVal", "cornerEigenValsAndVecs",
           "goodFeaturesToTrack", "goodFeaturesToTrackWithQuality",
           "good_features_response", "preCornerDetect"]


def preCornerDetect(src, ksize: int, borderType: int = K.BORDER_DEFAULT):
    """cv::preCornerDetect (corner.cpp:672): Dx²·Dyy + Dy²·Dxx − 2·Dx·Dy·Dxy,
    scaled by 1/(2^(ksize−1)·[255])³.  Pure fused VPU elementwise work on
    top of five Sobel passes."""
    x, meta = to_batched(src)
    s = from_batched(x, "nhwc")
    Dx, _ = to_batched(Sobel(s, K.CV_32F, 1, 0, ksize=ksize,
                             borderType=borderType))
    Dy, _ = to_batched(Sobel(s, K.CV_32F, 0, 1, ksize=ksize,
                             borderType=borderType))
    D2x, _ = to_batched(Sobel(s, K.CV_32F, 2, 0, ksize=ksize,
                              borderType=borderType))
    D2y, _ = to_batched(Sobel(s, K.CV_32F, 0, 2, ksize=ksize,
                              borderType=borderType))
    Dxy, _ = to_batched(Sobel(s, K.CV_32F, 1, 1, ksize=ksize,
                              borderType=borderType))
    factor = float(1 << (ksize - 1))
    if x.dtype == jnp.uint8:
        factor *= 255.0
    factor = 1.0 / (factor * factor * factor)
    out = (Dx * Dx * D2y + Dy * Dy * D2x - 2.0 * Dx * Dy * Dxy) \
        * jnp.float32(factor)
    return from_batched(out, meta)


def _corner_cov(x, blockSize: int, ksize: int, borderType: int):
    """Sobel-derivative covariance triplet (corner.cpp cornerEigenValsVecs).

    Returns (a, b, c) = box-summed (dx², dx·dy, dy²) · scale², f32 NHWC.
    """
    aperture = ksize if ksize > 0 else 3
    scale = float(1 << (aperture - 1)) * blockSize
    if x.dtype == jnp.uint8:
        scale *= 255.0
    scale = 1.0 / scale

    src = from_batched(x, "nhwc")
    dx, _ = to_batched(Sobel(src, K.CV_32F, 1, 0, ksize=ksize, scale=scale,
                             borderType=borderType))
    dy, _ = to_batched(Sobel(src, K.CV_32F, 0, 1, ksize=ksize, scale=scale,
                             borderType=borderType))
    covs = []
    for prod in (dx * dx, dx * dy, dy * dy):
        s, _ = to_batched(boxFilter(from_batched(prod, "nhwc"), -1,
                                    (blockSize, blockSize), normalize=False,
                                    borderType=borderType))
        covs.append(s)
    return covs


def cornerHarris(src, blockSize: int, ksize: int, k: float,
                 borderType: int = K.BORDER_DEFAULT):
    """Harris response `det(M) − k·trace(M)²` (corner.cpp:104-123)."""
    x, meta = to_batched(src)
    a, b, c = _corner_cov(x, blockSize, ksize, borderType)
    kf = jnp.float32(k)
    r = a * c - b * b - kf * (a + c) * (a + c)
    return from_batched(r, meta)


def cornerMinEigenVal(src, blockSize: int, ksize: int = 3,
                      borderType: int = K.BORDER_DEFAULT):
    """Smaller eigenvalue of M (corner.cpp:52-72)."""
    x, meta = to_batched(src)
    a, b, c = _corner_cov(x, blockSize, ksize, borderType)
    a = a * 0.5
    c = c * 0.5
    r = (a + c) - jnp.sqrt((a - c) * (a - c) + b * b)
    return from_batched(r, meta)


def cornerEigenValsAndVecs(src, blockSize: int, ksize: int,
                           borderType: int = K.BORDER_DEFAULT):
    """(λ1, λ2, x1, y1, x2, y2) 6-channel output (corner.cpp calcEigenValsVecs)."""
    x, meta = to_batched(src)
    a, b, c = _corner_cov(x, blockSize, ksize, borderType)
    u = (a + c) * 0.5
    v = jnp.sqrt(((a - c) * 0.5) ** 2 + b * b)
    l1 = u + v
    l2 = u - v
    # eigenvectors of [[a, b], [b, c]] for λ: (b, λ - a) normalized
    def evec(lam):
        vx = b
        vy = lam - a
        n = jnp.sqrt(vx * vx + vy * vy)
        bad = n < 1e-12
        nx = jnp.where(bad, 1.0, vx / jnp.where(bad, 1.0, n))
        ny = jnp.where(bad, 0.0, vy / jnp.where(bad, 1.0, n))
        return nx, ny

    x1, y1 = evec(l1)
    x2, y2 = evec(l2)
    out = jnp.concatenate([l1, l2, x1, y1, x2, y2], axis=-1)
    return from_batched(out, meta)


def good_features_response(src, maxCorners: int, qualityLevel: float,
                           blockSize: int = 3, gradientSize: int = 3,
                           useHarrisDetector: bool = False, k: float = 0.04,
                           mask=None):
    """Device part of goodFeaturesToTrack: returns (eig, nms_mask) where
    nms_mask marks strict 3×3 local maxima above qualityLevel·max
    (featureselect.cpp:366-440), excluding the 1-px image border."""
    x, meta = to_batched(src)
    if useHarrisDetector:
        eig, _ = to_batched(cornerHarris(from_batched(x, "nhwc"), blockSize,
                                         gradientSize, k))
    else:
        eig, _ = to_batched(cornerMinEigenVal(from_batched(x, "nhwc"),
                                              blockSize, gradientSize))
    if mask is not None:
        m, _ = to_batched(mask)
        eig = jnp.where(m != 0, eig, jnp.float32(-np.inf))
    maxv = jnp.max(eig, axis=(1, 2, 3), keepdims=True)
    thr = maxv * jnp.float32(qualityLevel)
    eig = jnp.where(eig > thr, eig, 0.0)  # THRESH_TOZERO
    dil, _ = to_batched(dilate(from_batched(eig, "nhwc")))
    sel = (eig != 0) & (eig == dil)
    # exclude 1-px border (reference loops 1..rows-2)
    N, H, W, C = eig.shape
    border = np.zeros((1, H, W, 1), bool)
    border[:, 1:H - 1, 1:W - 1, :] = True
    sel = sel & jnp.asarray(border)
    return eig, sel


def _gftt_host_tail(image, maxCorners, qualityLevel, minDistance, mask,
                    blockSize, gradientSize, useHarrisDetector, k):
    """Shared host tail: returns (corners list [(x, y)], quality list)."""
    eig, sel = good_features_response(image, maxCorners, qualityLevel,
                                      blockSize, gradientSize,
                                      useHarrisDetector, k, mask)
    eig_np = np.asarray(eig)[0, :, :, 0]
    sel_np = np.asarray(sel)[0, :, :, 0]
    ys, xs = np.nonzero(sel_np)
    vals = eig_np[ys, xs]
    order = np.argsort(-vals, kind="stable")
    ys, xs, vals = ys[order], xs[order], vals[order]

    H, W = eig_np.shape
    if minDistance >= 1:
        cell = int(minDistance)
        gw = (W + cell - 1) // cell
        gh = (H + cell - 1) // cell
        grid = [[[] for _ in range(gw)] for _ in range(gh)]
        md2 = minDistance * minDistance
        out, qual = [], []
        for y, x, v in zip(ys.tolist(), xs.tolist(), vals.tolist()):
            gx, gy = x // cell, y // cell
            ok = True
            for yy in range(max(gy - 1, 0), min(gy + 2, gh)):
                for xx in range(max(gx - 1, 0), min(gx + 2, gw)):
                    for (py, px) in grid[yy][xx]:
                        if (px - x) ** 2 + (py - y) ** 2 < md2:
                            ok = False
                            break
                    if not ok:
                        break
                if not ok:
                    break
            if ok:
                grid[gy][gx].append((y, x))
                out.append((x, y))
                qual.append(v)
                if maxCorners > 0 and len(out) >= maxCorners:
                    break
    else:
        out = list(zip(xs.tolist(), ys.tolist()))
        qual = vals.tolist()
        if maxCorners > 0:
            out, qual = out[:maxCorners], qual[:maxCorners]
    return out, qual


def goodFeaturesToTrack(image, maxCorners: int, qualityLevel: float,
                        minDistance: float, mask=None, blockSize: int = 3,
                        gradientSize: int = 3, useHarrisDetector: bool = False,
                        k: float = 0.04):
    """cv2-compatible GFTT. Returns an (N, 1, 2) float32 numpy array (the
    greedy min-distance grid filter is a host tail, like the reference's
    sequential pass)."""
    out, _ = _gftt_host_tail(image, maxCorners, qualityLevel, minDistance,
                             mask, blockSize, gradientSize,
                             useHarrisDetector, k)
    if not out:
        return None
    return np.asarray(out, np.float32).reshape(-1, 1, 2)


def goodFeaturesToTrackWithQuality(image, maxCorners: int,
                                   qualityLevel: float, minDistance: float,
                                   mask=None, corners=None,
                                   qualityMeasure=None, blockSize: int = 3,
                                   gradientSize: int = 3,
                                   useHarrisDetector: bool = False,
                                   k: float = 0.04):
    """cv::goodFeaturesToTrack overload returning per-corner response
    values (featureselect.cpp, quality output)."""
    out, qual = _gftt_host_tail(image, maxCorners, qualityLevel,
                                minDistance, mask, blockSize, gradientSize,
                                useHarrisDetector, k)
    if not out:
        return None, None
    return (np.asarray(out, np.float32).reshape(-1, 1, 2),
            np.asarray(qual, np.float32).reshape(-1, 1))
