"""Canny edge detector (imgproc/src/canny.cpp).

TPU-native design: the reference's per-stripe stacks + flood `finalPass`
(canny.cpp:908,930) become (1) fused integer Sobel + Q15 sector NMS on the
VPU, and (2) hysteresis as an iterated masked 8-neighbor dilation inside a
`lax.while_loop` — converging seed propagation with a changed-flag, the
standard fixed-point reformulation for data-dependent flood fill
(SURVEY §7 hard part #4).

Integer contracts (SURVEY §8.7): Sobel aperture with BORDER_REPLICATE;
L1 = |dx|+|dy| / L2 = dx²+dy² vs (squared) thresholds floored to int;
NMS sector test in Q15 with TG22 = 13573 and the exact >/>= tie rules of
canny.cpp:538-590.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .. import constants as K
from ..core.arrays import to_batched, from_batched
from .deriv import Sobel

__all__ = ["Canny"]

_TG22 = 13573


def _nms(mag, dx, dy, low):
    """Sector-based non-maximum suppression; returns bool mask of pixels
    that survive (candidates)."""
    N, H, W, C = mag.shape
    # neighbors with zero padding (the reference's mag buffers have zero
    # borders)
    pad = jnp.pad(mag, ((0, 0), (1, 1), (1, 1), (0, 0)))
    m_l = pad[:, 1:H + 1, 0:W, :]
    m_r = pad[:, 1:H + 1, 2:W + 2, :]
    m_u = pad[:, 0:H, 1:W + 1, :]
    m_d = pad[:, 2:H + 2, 1:W + 1, :]
    m_ul = pad[:, 0:H, 0:W, :]
    m_ur = pad[:, 0:H, 2:W + 2, :]
    m_dl = pad[:, 2:H + 2, 0:W, :]
    m_dr = pad[:, 2:H + 2, 2:W + 2, :]

    # int32 arithmetic incl. the (x<<16) overflow wrap, matching the C int
    x = jnp.abs(dx).astype(jnp.int32)
    y = jnp.abs(dy).astype(jnp.int32) << 15
    tg22x = x * _TG22
    tg67x = tg22x + (x << 16)

    horiz = y < tg22x
    vert = y > tg67x
    diag_neg = (dx ^ dy) < 0  # s = -1

    keep_h = (mag > m_l) & (mag >= m_r)
    keep_v = (mag > m_u) & (mag >= m_d)
    # s=1: m > mag_p[k-1] && m > mag_n[k+1]  (up-left / down-right)
    keep_d1 = (mag > m_ul) & (mag > m_dr)
    # s=-1: m > mag_p[k+1] && m > mag_n[k-1]
    keep_d2 = (mag > m_ur) & (mag > m_dl)

    keep = jnp.where(horiz, keep_h,
                     jnp.where(vert, keep_v,
                               jnp.where(diag_neg, keep_d2, keep_d1)))
    # borders participate: out-of-image neighbors read as 0 magnitude,
    # matching the reference's zero-padded mag buffers
    return keep & (mag > low)


def _hysteresis(seeds, cands):
    """Propagate seeds through candidates via iterated masked 3×3 dilation."""

    def dil8(m):
        mi = m.astype(jnp.int32)
        p = jnp.pad(mi, ((0, 0), (1, 1), (1, 1), (0, 0)))
        H, W = m.shape[1], m.shape[2]
        acc = None
        for dy in range(3):
            for dx in range(3):
                s = p[:, dy:dy + H, dx:dx + W, :]
                acc = s if acc is None else jnp.maximum(acc, s)
        return acc > 0

    def cond(state):
        cur, changed = state
        return changed

    def body(state):
        cur, _ = state
        grown = dil8(cur) & cands
        new = cur | grown
        return new, jnp.any(new != cur)

    out, _ = lax.while_loop(cond, body, (seeds, jnp.asarray(True)))
    return out


def Canny(image, threshold1: float, threshold2: float,
          apertureSize: int = 3, L2gradient: bool = False):
    """`cv::Canny` (canny.cpp:859)."""
    x, meta = to_batched(image)
    low_t, high_t = min(threshold1, threshold2), max(threshold1, threshold2)

    src = from_batched(x, "nhwc")
    dx, _ = to_batched(Sobel(src, K.CV_16S, 1, 0, ksize=apertureSize,
                             borderType=K.BORDER_REPLICATE))
    dy, _ = to_batched(Sobel(src, K.CV_16S, 0, 1, ksize=apertureSize,
                             borderType=K.BORDER_REPLICATE))
    if x.shape[-1] > 1:
        # multi-channel: per-pixel channel with max L2 magnitude
        # (canny.cpp cn>1 path)
        dxi = dx.astype(jnp.int32)
        dyi = dy.astype(jnp.int32)
        mag_all = dxi * dxi + dyi * dyi
        best = jnp.argmax(mag_all, axis=-1, keepdims=True)
        dx = jnp.take_along_axis(dx, best, axis=-1)
        dy = jnp.take_along_axis(dy, best, axis=-1)

    dxi = dx.astype(jnp.int32)
    dyi = dy.astype(jnp.int32)
    if L2gradient:
        low = int(math.floor(min(32767.0, low_t)))
        high = int(math.floor(min(32767.0, high_t)))
        low, high = low * low, high * high
        mag = dxi * dxi + dyi * dyi
    else:
        low = int(math.floor(low_t))
        high = int(math.floor(high_t))
        mag = jnp.abs(dxi) + jnp.abs(dyi)

    cand = _nms(mag, dxi, dyi, low)
    seeds = cand & (mag > high)
    edges = _hysteresis(seeds, cand)
    out = jnp.where(edges, jnp.uint8(255), jnp.uint8(0))
    return from_batched(out, meta)
