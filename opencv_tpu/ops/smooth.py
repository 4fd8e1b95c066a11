"""medianBlur / bilateralFilter / stackBlur
(imgproc/src/median_blur.simd.hpp, bilateral_filter.simd.hpp, stackblur.cpp).

TPU-native design: medianBlur gathers the k² window taps as shifted
slices and reduces with a vectorized sort (XLA sorts along the tap axis —
the VPU analogue of the reference's sorting networks for k=3/5); the
histogram-based O(1) path is unnecessary when the whole batch is one
fused program.  bilateralFilter unrolls the static disk of offsets into
fused exp-weighted accumulates (the reference's space/color LUTs become
closed-form exps the compiler hoists).
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from .. import constants as K
from ..core.arrays import to_batched, from_batched
from ..core.borders import pad_nhwc
from ..core.fixedpoint import saturate_cast

__all__ = ["medianBlur", "bilateralFilter", "stackBlur"]


def medianBlur(src, ksize: int):
    """`cv::medianBlur` — BORDER_REPLICATE semantics (median_blur.dispatch)."""
    x, meta = to_batched(src)
    k = int(ksize)
    assert k % 2 == 1 and k > 1
    r = k // 2
    xp = pad_nhwc(x, r, r, r, r, K.BORDER_REPLICATE)
    N, H, W, C = x.shape
    taps = []
    for j in range(k):
        for i in range(k):
            taps.append(xp[:, j:j + H, i:i + W, :])
    stack = jnp.stack(taps, axis=-1)          # (N,H,W,C,k*k)
    med = jnp.sort(stack, axis=-1)[..., (k * k) // 2]
    return from_batched(med, meta)


def bilateralFilter(src, d: int, sigmaColor: float, sigmaSpace: float,
                    borderType: int = K.BORDER_DEFAULT):
    """`cv::bilateralFilter` (bilateral_filter.dispatch.cpp)."""
    x, meta = to_batched(src)
    N, H, W, C = x.shape
    if sigmaColor <= 0:
        sigmaColor = 1.0
    if sigmaSpace <= 0:
        sigmaSpace = 1.0
    gauss_color = -0.5 / (sigmaColor * sigmaColor)
    gauss_space = -0.5 / (sigmaSpace * sigmaSpace)
    if d <= 0:
        radius = int(np.rint(sigmaSpace * 1.5))
    else:
        radius = d // 2
    radius = max(radius, 1)

    xp = pad_nhwc(x, radius, radius, radius, radius, borderType)
    is_u8 = x.dtype == jnp.uint8
    xf = xp.astype(jnp.float32)
    center = xf[:, radius:radius + H, radius:radius + W, :]

    # offsets within the disk, matching the reference's space LUT build
    offs = []
    for j in range(-radius, radius + 1):
        for i in range(-radius, radius + 1):
            rr = math.sqrt(i * i + j * j)
            if rr > radius:
                continue
            offs.append((j, i, math.exp(rr * rr * gauss_space)))

    if is_u8:
        # color weight LUT on |diff| summed over channels (256*cn entries)
        lut = jnp.asarray(
            np.exp(np.arange(256 * C) ** 2 * gauss_color), jnp.float32)
        wsum = None
        vsum = None
        for (j, i, sw) in offs:
            v = xf[:, radius + j:radius + j + H, radius + i:radius + i + W, :]
            cdiff = jnp.sum(jnp.abs(v - center), axis=-1, keepdims=True) \
                .astype(jnp.int32)
            w = jnp.float32(sw) * lut[cdiff[..., 0]][..., None]
            vsum = v * w if vsum is None else vsum + v * w
            wsum = w if wsum is None else wsum + w
        out = vsum / wsum
        return from_batched(saturate_cast(out, x.dtype), meta)

    wsum = None
    vsum = None
    for (j, i, sw) in offs:
        v = xf[:, radius + j:radius + j + H, radius + i:radius + i + W, :]
        cdiff = jnp.sum(jnp.abs(v - center), axis=-1, keepdims=True)
        w = jnp.float32(sw) * jnp.exp(cdiff * cdiff * jnp.float32(gauss_color))
        vsum = v * w if vsum is None else vsum + v * w
        wsum = w if wsum is None else wsum + w
    out = vsum / wsum
    return from_batched(out.astype(x.dtype), meta)


def stackBlur(src, ksize):
    """`cv::stackBlur` (stackblur.cpp): triangular-weighted box blur.

    The stack blur kernel is the triangle [1, 2, …, r+1, …, 2, 1]
    normalized — applied separably with BORDER_REPLICATE and u8 fixed
    rounding via the reference's mulShr tables; we use the exact
    triangle weights with float accumulation and rint (tolerance ±1).
    """
    x, meta = to_batched(src)
    kw, kh = (ksize, ksize) if np.isscalar(ksize) else ksize
    rx, ry = kw // 2, kh // 2
    tri_x = np.minimum(np.arange(1, kw + 1), np.arange(kw, 0, -1)).astype(np.float64)
    tri_y = np.minimum(np.arange(1, kh + 1), np.arange(kh, 0, -1)).astype(np.float64)
    tri_x /= tri_x.sum()
    tri_y /= tri_y.sum()
    xp = pad_nhwc(x, ry, ry, rx, rx, K.BORDER_REPLICATE)
    xf = xp.astype(jnp.float32)
    N, H, W, C = x.shape
    h = None
    for i, c in enumerate(tri_x):
        t = xf[:, :, i:i + W, :] * jnp.float32(c)
        h = t if h is None else h + t
    v = None
    for j, c in enumerate(tri_y):
        t = h[:, j:j + H, :, :] * jnp.float32(c)
        v = t if v is None else v + t
    return from_batched(saturate_cast(v, x.dtype), meta)
