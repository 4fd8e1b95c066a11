"""threshold / adaptiveThreshold (imgproc/src/thresh.cpp).

Thresholding is pure elementwise VPU work.  Otsu/Triangle automatic
thresholds reduce a 256-bin histogram on device (`jnp.argmax` picks the
first maximum, matching the reference's `>` update rule).
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from .. import constants as K
from ..core.arrays import to_batched, from_batched
from ..core.fixedpoint import saturate_cast  # noqa: F401

__all__ = ["threshold", "adaptiveThreshold", "thresholdWithMask"]


def _otsu_u8(x):
    """Otsu threshold on a u8 array (thresh.cpp getThreshVal_Otsu_8u)."""
    # f32 histogram math (f64 unavailable on TPU); counts are exact in f32
    # up to 16M pixels per histogram bin.
    from .hist import _hist_fixed
    hist = _hist_fixed(x.astype(jnp.int32), 256)
    return _otsu_from_hist(hist)


def _otsu_from_hist(hist):
    hist = jnp.asarray(hist).astype(jnp.float32)
    scale = 1.0 / jnp.sum(hist)
    i = jnp.arange(256, dtype=jnp.float32)
    p = hist * scale
    mu = jnp.sum(i * p)
    q1 = jnp.cumsum(p)
    mu1s = jnp.cumsum(i * p)
    q2 = 1.0 - q1
    valid = (jnp.minimum(q1, q2) >= np.finfo(np.float32).eps)
    mu1 = jnp.where(q1 > 0, mu1s / q1, 0.0)
    mu2 = jnp.where(q2 > 0, (mu - mu1s) / q2, 0.0)
    sigma = jnp.where(valid, q1 * q2 * (mu1 - mu2) ** 2, -1.0)
    return jnp.argmax(sigma).astype(jnp.float32)


def _triangle_u8(x):
    """Triangle threshold (thresh.cpp getThreshVal_Triangle_8u): maximize
    a*i + b*h[i] over (left_bound, max_ind], with the histogram flipped
    when the peak sits closer to the left bound."""
    from .hist import _hist_fixed
    hist = _hist_fixed(x.astype(jnp.int32), 256)
    return _triangle_from_hist(hist)


def _triangle_from_hist(hist):
    hist = jnp.asarray(hist)
    idx = jnp.arange(256)
    nz = hist > 0
    left = jnp.argmax(nz)
    left = jnp.maximum(left - 1, 0)
    right = 255 - jnp.argmax(nz[::-1])
    right = jnp.minimum(right + 1, 255)
    peak = jnp.argmax(hist)
    hmax = hist[peak]

    flip = (peak - left) < (right - peak)
    h = jnp.where(flip, hist[::-1], hist)
    left_b = jnp.where(flip, 255 - right, left)
    max_i = jnp.where(flip, 255 - peak, peak)

    a = hmax.astype(jnp.float32)
    b = (left_b - max_i).astype(jnp.float32)
    dist = a * idx.astype(jnp.float32) + b * h.astype(jnp.float32)
    # reference keeps thresh=left_bound unless tempdist > 0 strictly
    dist = jnp.where((idx > left_b) & (idx <= max_i), dist, -jnp.inf)
    best = jnp.argmax(dist)
    t = jnp.where(dist[best] > 0, best, left_b) - 1
    t = jnp.where(flip, 255 - t, t)
    return t.astype(jnp.float32)


def threshold(src, thresh: float, maxval: float, type: int):
    """`cv::threshold` — returns (retval, dst) like cv2."""
    x, meta = to_batched(src)
    ttype = type & K.THRESH_MASK
    use_otsu = bool(type & K.THRESH_OTSU)
    use_tri = bool(type & K.THRESH_TRIANGLE)

    if use_otsu or use_tri:
        if x.dtype != jnp.uint8:
            raise ValueError("OTSU/TRIANGLE require 8-bit input")
        tval = _otsu_u8(x) if use_otsu else _triangle_u8(x)
    else:
        tval = thresh

    if x.dtype.kind in "ui":
        # integer semantics: ithresh = floor(thresh), comparisons strict >;
        # the floored value is also what cv2 returns for integer images
        if use_otsu or use_tri:
            it = jnp.floor(jnp.asarray(tval, jnp.float32))
        else:
            it = math.floor(thresh)
            tval = float(it)
        info = np.iinfo(np.dtype(x.dtype))
        imax = int(np.clip(np.rint(maxval), info.min, info.max))
        xi = x.astype(jnp.int32)
        gt = xi > it
        if ttype == K.THRESH_BINARY:
            y = jnp.where(gt, imax, 0)
        elif ttype == K.THRESH_BINARY_INV:
            y = jnp.where(gt, 0, imax)
        elif ttype == K.THRESH_TRUNC:
            y = jnp.where(gt, it, xi)
        elif ttype == K.THRESH_TOZERO:
            y = jnp.where(gt, xi, 0)
        elif ttype == K.THRESH_TOZERO_INV:
            y = jnp.where(gt, 0, xi)
        else:
            raise ValueError(f"unknown threshold type {type}")
        out = saturate_cast(y, x.dtype)
    else:
        t = jnp.asarray(tval, x.dtype)
        mv = jnp.asarray(maxval, x.dtype)
        gt = x > t
        if ttype == K.THRESH_BINARY:
            out = jnp.where(gt, mv, 0)
        elif ttype == K.THRESH_BINARY_INV:
            out = jnp.where(gt, 0, mv)
        elif ttype == K.THRESH_TRUNC:
            out = jnp.where(gt, t, x)
        elif ttype == K.THRESH_TOZERO:
            out = jnp.where(gt, x, 0)
        elif ttype == K.THRESH_TOZERO_INV:
            out = jnp.where(gt, 0, x)
        else:
            raise ValueError(f"unknown threshold type {type}")
        out = out.astype(x.dtype)

    # cv2 returns the computed threshold for OTSU/TRIANGLE, else the
    # caller's value unchanged
    return tval, from_batched(out, meta)


def adaptiveThreshold(src, maxValue: float, adaptiveMethod: int,
                      thresholdType: int, blockSize: int, C: float):
    """`cv::adaptiveThreshold` (thresh.cpp:1590 region)."""
    from .filter import boxFilter, GaussianBlur

    x, meta = to_batched(src)
    if x.dtype != jnp.uint8:
        raise ValueError("adaptiveThreshold requires 8-bit input")
    if thresholdType not in (K.THRESH_BINARY, K.THRESH_BINARY_INV):
        raise ValueError("thresholdType must be BINARY or BINARY_INV")

    if adaptiveMethod == K.ADAPTIVE_THRESH_MEAN_C:
        mean, _ = to_batched(boxFilter(
            from_batched(x, "nhwc"), -1, (blockSize, blockSize),
            borderType=K.BORDER_REPLICATE | K.BORDER_ISOLATED))
    elif adaptiveMethod == K.ADAPTIVE_THRESH_GAUSSIAN_C:
        # reference converts to CV_32F, blurs in float, converts back
        # (thresh.cpp adaptiveThreshold)
        mf = GaussianBlur(
            from_batched(x.astype(jnp.float32), "nhwc"),
            (blockSize, blockSize), 0,
            borderType=K.BORDER_REPLICATE | K.BORDER_ISOLATED)
        mean, _ = to_batched(mf)
        mean = saturate_cast(mean, jnp.uint8)
    else:
        raise ValueError(f"unknown adaptive method {adaptiveMethod}")

    imaxval = int(np.clip(np.rint(maxValue), 0, 255))
    idelta = math.ceil(C) if thresholdType == K.THRESH_BINARY else math.floor(C)
    diff = x.astype(jnp.int32) - mean.astype(jnp.int32)
    if thresholdType == K.THRESH_BINARY:
        y = jnp.where(diff > -idelta, imaxval, 0)
    else:
        y = jnp.where(diff > -idelta, 0, imaxval)
    return from_batched(y.astype(jnp.uint8), meta)


def thresholdWithMask(src, dst, mask, thresh: float, maxval: float,
                      type: int):
    """cv::thresholdWithMask (cv2 5.x): #threshold applied only where
    mask != 0; elsewhere dst pixels are left as-is.  OTSU/TRIANGLE
    statistics are computed over the masked pixels only (validated
    against the wheel; not present in the reference checkout)."""
    a = np.asarray(src)
    if mask is None or np.asarray(mask).size == 0:
        return threshold(src, thresh, maxval, type)
    m = np.asarray(mask) != 0
    use_auto = bool(type & (K.THRESH_OTSU | K.THRESH_TRIANGLE))
    if use_auto:
        if a.dtype != np.uint8:
            raise ValueError("OTSU/TRIANGLE require 8-bit input")
        sel = a[m] if a.ndim == m.ndim else a[m, ...]
        hist = np.bincount(sel.ravel(), minlength=256).astype(np.int64)
        hj = jnp.asarray(hist)
        if type & K.THRESH_OTSU:
            tval = float(_otsu_from_hist(hj))
        else:
            tval = float(_triangle_from_hist(hj))
        rv, out = threshold(src, tval, maxval, type & K.THRESH_MASK)
        rv = tval
    else:
        rv, out = threshold(src, thresh, maxval, type)
    out = np.asarray(out)
    base = a if dst is None else np.asarray(dst)
    mm = m if m.ndim == out.ndim else m[..., None]
    return rv, np.where(mm, out, base).astype(a.dtype)
