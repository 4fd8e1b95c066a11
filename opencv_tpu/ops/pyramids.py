"""Image pyramids: pyrDown / pyrUp / buildPyramid
(imgproc/src/pyramids.cpp).

Bit-exact contract (SURVEY §8.6): 5-tap {1,4,6,4,1}/256 kernel, int32
accumulation for u8 with a single final round `(t + 128) >> 8`
(pyramids.cpp:488), BORDER_REFLECT_101, default dst size
((w+1)/2, (h+1)/2).  pyrUp zero-stuffs: even outputs use taps {1,6,1},
odd {4,4} (per-axis sum 8), u8 cast `(t + 32) >> 6`.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import constants as K
from ..core.arrays import to_batched, from_batched
from ..core.fixedpoint import saturate_cast
from ..core.borders import pad_nhwc

__all__ = ["pyrDown", "pyrUp", "buildPyramid"]

_PD_K = (1, 4, 6, 4, 1)


def _pyr_down_nhwc(x, border_type):
    N, H, W, C = x.shape
    dh, dw = (H + 1) // 2, (W + 1) // 2
    is_int = x.dtype.kind in "ui"
    # pad enough for window [2d-2, 2d+2] with d up to dh-1 (2d can be H for odd H)
    pad_b = 2 * (dh - 1) + 2 - (H - 1)
    pad_r = 2 * (dw - 1) + 2 - (W - 1)
    xp = pad_nhwc(x, 2, pad_b, 2, pad_r, border_type)
    # u8 input: the whole 1-4-6-4-1 x 1-4-6-4-1 accumulation fits u16
    # (max 256*255 = 65280), halving the traffic of an int32 pipeline
    acc_t = (jnp.uint16 if x.dtype == jnp.uint8
             else jnp.int32 if is_int else jnp.float32)
    xa = xp.astype(acc_t)
    h = None
    for i, c in enumerate(_PD_K):
        t = xa[:, :, i:i + 2 * (dw - 1) + 1:2, :] * acc_t(c)
        h = t if h is None else h + t
    v = None
    for j, c in enumerate(_PD_K):
        t = h[:, j:j + 2 * (dh - 1) + 1:2, :, :] * acc_t(c)
        v = t if v is None else v + t
    if is_int:
        out = (v + acc_t(128)) >> acc_t(8)
        return saturate_cast(out, x.dtype)
    return (v * jnp.asarray(1.0 / 256, acc_t)).astype(x.dtype)


def _pyr_up_nhwc(x, border_type):
    N, H, W, C = x.shape
    dh, dw = H * 2, W * 2
    is_int = x.dtype.kind in "ui"
    # empirical reference semantics: REFLECT_101 on the leading edge,
    # REPLICATE on the trailing edge (last odd output row/col replicates
    # the final sample)
    xp = pad_nhwc(x, 1, 0, 1, 0, border_type)
    xp = pad_nhwc(xp, 0, 1, 0, 1, K.BORDER_REPLICATE)
    acc_t = jnp.int32 if is_int else jnp.float32
    xa = xp.astype(acc_t)
    # horizontal: even cols = s[j-1] + 6 s[j] + s[j+1]; odd = 4 (s[j] + s[j+1])
    left = xa[:, :, 0:W, :]
    center = xa[:, :, 1:W + 1, :]
    right = xa[:, :, 2:W + 2, :]
    he = left + 6 * center + right          # (N, H+2, W, C) at even cols
    ho = 4 * (center + right)               # odd col between j and j+1
    h = jnp.stack([he, ho], axis=3).reshape(N, H + 2, dw, C)
    # vertical on h (which still has the +-1 row padding)
    top = h[:, 0:H, :, :]
    mid = h[:, 1:H + 1, :, :]
    bot = h[:, 2:H + 2, :, :]
    ve = top + 6 * mid + bot
    vo = 4 * (mid + bot)
    v = jnp.stack([ve, vo], axis=2).reshape(N, dh, dw, C)
    if is_int:
        out = (v + 32) >> 6
        return saturate_cast(out, x.dtype)
    return (v * jnp.asarray(1.0 / 64, acc_t)).astype(x.dtype)


def pyrDown(src, dstsize=None, borderType: int = K.BORDER_DEFAULT):
    x, meta = to_batched(src)
    if dstsize is not None:
        dw, dh = dstsize
        if (dw, dh) != ((x.shape[2] + 1) // 2, (x.shape[1] + 1) // 2):
            raise NotImplementedError("non-default pyrDown dstsize")
    # dispatch ladder: stride-2 tap-folded MXU kernel when registered
    from ..core.dispatch import lookup
    kern = lookup("pyr_down_u8", dtype=jnp.dtype(x.dtype).name,
                  channels=x.shape[3], border=borderType,
                  h=x.shape[1], w=x.shape[2])
    if kern is not None:
        return from_batched(kern(x), meta)
    y = _pyr_down_nhwc(x, borderType)
    return from_batched(y, meta)


def pyrUp(src, dstsize=None, borderType: int = K.BORDER_DEFAULT):
    x, meta = to_batched(src)
    crop = None
    if dstsize is not None:
        dw, dh = dstsize
        W2, H2 = x.shape[2] * 2, x.shape[1] * 2
        # cv::pyrUp allows dst = 2s or 2s-1 per axis; the odd sizes are
        # exactly the even result cropped (verified vs the wheel)
        if not (W2 - (dw % 2 == 1) <= dw <= W2
                and H2 - (dh % 2 == 1) <= dh <= H2):
            raise NotImplementedError("non-default pyrUp dstsize")
        if (dw, dh) != (W2, H2):
            crop = (dh, dw)
    y = _pyr_up_nhwc(x, borderType)
    if crop is not None:
        y = y[:, :crop[0], :crop[1], :]
    return from_batched(y, meta)


def buildPyramid(src, maxlevel: int, borderType: int = K.BORDER_DEFAULT):
    out = [src]
    for _ in range(maxlevel):
        out.append(pyrDown(out[-1], borderType=borderType))
    return out
