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


# stackBlur's per-radius (multiplier, shift) quantization of 1/(r+1)^2
# — normative public constants (stackblur.cpp:49-87, Klingemann tables)
_STACKBLUR_MUL = np.array([
    512, 512, 456, 512, 328, 456, 335, 512, 405, 328, 271, 456, 388, 335,
    292, 512, 454, 405, 364, 328, 298, 271, 496, 456, 420, 388, 360, 335,
    312, 292, 273, 512, 482, 454, 428, 405, 383, 364, 345, 328, 312, 298,
    284, 271, 259, 496, 475, 456, 437, 420, 404, 388, 374, 360, 347, 335,
    323, 312, 302, 292, 282, 273, 265, 512, 497, 482, 468, 454, 441, 428,
    417, 405, 394, 383, 373, 364, 354, 345, 337, 328, 320, 312, 305, 298,
    291, 284, 278, 271, 265, 259, 507, 496, 485, 475, 465, 456, 446, 437,
    428, 420, 412, 404, 396, 388, 381, 374, 367, 360, 354, 347, 341, 335,
    329, 323, 318, 312, 307, 302, 297, 292, 287, 282, 278, 273, 269, 265,
    261, 512, 505, 497, 489, 482, 475, 468, 461, 454, 447, 441, 435, 428,
    422, 417, 411, 405, 399, 394, 389, 383, 378, 373, 368, 364, 359, 354,
    350, 345, 341, 337, 332, 328, 324, 320, 316, 312, 309, 305, 301, 298,
    294, 291, 287, 284, 281, 278, 274, 271, 268, 265, 262, 259, 257, 507,
    501, 496, 491, 485, 480, 475, 470, 465, 460, 456, 451, 446, 442, 437,
    433, 428, 424, 420, 416, 412, 408, 404, 400, 396, 392, 388, 385, 381,
    377, 374, 370, 367, 363, 360, 357, 354, 350, 347, 344, 341, 338, 335,
    332, 329, 326, 323, 320, 318, 315, 312, 310, 307, 304, 302, 299, 297,
    294, 292, 289, 287, 285, 282, 280, 278, 275, 273, 271, 269, 267, 265,
    263, 261, 259], np.int64)
_STACKBLUR_SHR = np.array(
    [9, 11, 12, 13, 13, 14, 14, 15, 15, 15, 15, 16, 16, 16, 16] +
    [17] * 7 + [18] * 9 + [19] * 14 + [20] * 18 + [21] * 27 +
    [22] * 48 + [23] * 75 + [24] * 100, np.int64)


def _stackblur_sums(arr, k, axis):
    """Replicate-border triangular window sums (int32) along axis."""
    r = k // 2
    tri = np.minimum(np.arange(1, k + 1), np.arange(k, 0, -1))
    H, W = arr.shape[1], arr.shape[2]
    if axis == 2:
        p = pad_nhwc(arr, 0, 0, r, r, K.BORDER_REPLICATE)
        taps = [p[:, :, i:i + W, :] for i in range(k)]
    else:
        p = pad_nhwc(arr, r, r, 0, 0, K.BORDER_REPLICATE)
        taps = [p[:, i:i + H, :, :] for i in range(k)]
    return sum(t.astype(jnp.int32) * int(w) for t, w in zip(taps, tri))


def _simd16_end(i0, end):
    """Extent covered by a 16-lane stride loop `for(i=i0; i<=end-16;
    i+=16)` — the reference wheel's universal intrinsics are 128-bit."""
    if end - 16 < i0:
        return i0
    return i0 + ((end - 16 - i0) // 16 + 1) * 16


def _stackblur_row_big(s, radius):
    """The big-kernel row recurrence (stackblur.cpp:560-677) as prefix
    sums: sliding-stack diffs whose right tail advances only while
    `dist >= r` — the source's quirk, which skews the last columns'
    weights away from plain replication.  s: (R, W, C) int64; returns
    the integer window sums."""
    R, W, C = s.shape
    wm = W - 1
    nD = W + radius + 1
    D = np.zeros((R, nD, C), np.int64)
    for i in range(radius):
        D[:, i] = s[:, min(i + 1, wm)] - s[:, 0]
    mcount = W - radius - 1
    if mcount > 0:
        D[:, radius:radius + mcount] = \
            s[:, radius + 1:radius + 1 + mcount] - s[:, 0:mcount]
    q = max(mcount, 0)
    dist = W - q
    for r in range(radius):
        D[:, radius + max(mcount, 0) + r] = s[:, wm] - s[:, min(q, wm)]
        if dist >= r:
            q += 1
            dist -= 1
    radius_mul = (radius + 2) * (radius + 1) // 2
    sum0 = s[:, 0] * radius_mul
    for i in range(radius):
        sum0 = sum0 + s[:, min(i + 1, wm)] * (radius - i)
    diff_val0 = D[:, :radius + 1].sum(axis=1)
    E = D[:, radius + 1:radius + W] - D[:, 0:W - 1]
    CE = np.concatenate([np.zeros((R, 1, C), np.int64),
                         np.cumsum(E, axis=1)], axis=1)
    diff_val = diff_val0[:, None] + CE
    return sum0[:, None] + np.concatenate(
        [np.zeros((R, 1, C), np.int64),
         np.cumsum(diff_val[:, :-1], axis=1)], axis=1)


def stackBlur(src, ksize):
    """`cv::stackBlur` (stackblur.cpp): separable triangular blur.
    Bit-exact vs the wheel, including its quirks: the radius clamps to
    (len-1)/2 per axis; the small-kernel row branch mixes SIMD mul/shr
    quantization (16-lane blocks) with float-truncate scalar borders;
    the big-kernel row branch uses the sliding-stack diff recurrence
    (whose right tail freezes mid-way) with saturate_cast rounding;
    the column pass is a replicate triangle with the same SIMD/scalar
    split.  Lane splits follow the wheel's 128-bit baseline."""
    x, meta = to_batched(src)
    kw, kh = (ksize, ksize) if np.isscalar(ksize) else ksize
    N, H, W, C = x.shape
    is_u8 = x.dtype == jnp.uint8

    def row_pass(arr):
        r = min(kw // 2, (W - 1) // 2)
        if r == 0:
            return arr
        k = 2 * r + 1
        mulf = np.float32(1.0 / ((r + 1) * (r + 1)))
        if k <= 9 and W > k:
            S = _stackblur_sums(arr, k, 2)
            if not is_u8:
                return (S.astype(jnp.float32) * mulf).astype(arr.dtype) \
                    if not jnp.issubdtype(arr.dtype, jnp.integer) else \
                    saturate_cast(S.astype(jnp.float32) * mulf, arr.dtype)
            i0 = r * C
            end = (W - r) * C
            e16 = _simd16_end(i0, end)
            idx = jnp.arange(W * C)
            simd = ((idx >= i0) & (idx < e16)).reshape(W, C)[None, None]
            q_int = (S * int(_STACKBLUR_MUL[r])) >> int(_STACKBLUR_SHR[r])
            q_trn = (S.astype(jnp.float32) * mulf).astype(jnp.int32)
            return jnp.where(simd, q_int, q_trn).astype(jnp.uint8)
        sn = np.asarray(arr).astype(np.int64).reshape(N * H, W, C)
        S = _stackblur_row_big(sn, r).reshape(N, H, W, C)
        if is_u8:
            v = np.rint(S.astype(np.float32) * mulf)
            return jnp.asarray(np.clip(v, 0, 255).astype(np.uint8))
        return jnp.asarray((S.astype(np.float32) * mulf).astype(
            np.asarray(arr).dtype))

    def col_pass(arr):
        r = min(kh // 2, (H - 1) // 2)
        if r == 0:
            return arr
        k = 2 * r + 1
        mulf = np.float32(1.0 / ((r + 1) * (r + 1)))
        S = _stackblur_sums(arr, k, 1)
        if not is_u8:
            return (S.astype(jnp.float32) * mulf).astype(arr.dtype) \
                if not jnp.issubdtype(arr.dtype, jnp.integer) else \
                saturate_cast(S.astype(jnp.float32) * mulf, arr.dtype)
        we = W * C
        e16 = _simd16_end(0, we) if r <= 254 else 0
        idx = jnp.arange(we)
        simd = (idx < e16).reshape(W, C)[None, None]
        q_int = (S * int(_STACKBLUR_MUL[min(r, 254)])) \
            >> int(_STACKBLUR_SHR[min(r, 254)])
        q_trn = (S.astype(jnp.float32) * mulf).astype(jnp.int32)
        return jnp.where(simd, q_int, q_trn).astype(jnp.uint8)

    out = x
    if kw > 1:
        out = row_pass(out)
    if kh > 1:
        out = col_pass(out)
    return from_batched(out, meta)
