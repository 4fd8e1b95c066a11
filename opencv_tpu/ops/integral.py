"""integral images (imgproc/src/sumpixels.dispatch.cpp).

TPU-native: two `jnp.cumsum` passes (XLA lowers to fast parallel scans).
Sums are exact in int32 for u8 inputs (matches the reference's CV_32S
default); squared sums use float32 on TPU where the reference uses
float64 — documented tolerance.

The tilted (45°-rotated) integral — t(y,x) = Σ src(m,n) for m<y,
|n-x+1| ≤ y-m-1 — is computed with two skewed diagonal prefix sums
(see `_tilted`), fully vectorized instead of the reference's row
recurrence.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import constants as K
from ..core.arrays import to_batched, from_batched

__all__ = ["integral", "integral2", "integral3"]

_DEPTH_MAP = {
    -1: None,
    K.CV_32S: jnp.int32,
    K.CV_32F: jnp.float32,
    K.CV_64F: jnp.float32,  # no f64 on TPU; documented departure
}


def _integral_sum(x, sdepth):
    if sdepth in (-1, None):
        dt = jnp.int32 if x.dtype.kind in "iu" else jnp.float32
    else:
        dt = _DEPTH_MAP[sdepth]
    s = jnp.cumsum(jnp.cumsum(x.astype(dt), axis=1, dtype=dt), axis=2, dtype=dt)
    N, H, W, C = x.shape
    out = jnp.zeros((N, H + 1, W + 1, C), dt)
    return out.at[:, 1:, 1:, :].set(s)


def integral(src, sdepth: int = -1):
    x, meta = to_batched(src)
    y = _integral_sum(x, sdepth)
    return from_batched(y, meta)


def integral2(src, sdepth: int = -1, sqdepth: int = -1):
    x, meta = to_batched(src)
    s = _integral_sum(x, sdepth)
    xf = x.astype(jnp.float32)
    sq = _integral_sum(xf * xf, K.CV_32F)
    return from_batched(s, meta), from_batched(sq, meta)


def _tilted_numpy_reference(x):
    """O(H·W·k) definition, used by tests as the oracle for _tilted."""
    N, H, W, C = x.shape
    t = np.zeros((N, H + 1, W + 1, C), np.int64)
    xi = np.asarray(x, np.int64)
    for y in range(1, H + 1):
        for xx in range(W + 1):
            acc = 0
            for m in range(y):
                lo = max(xx - 1 - (y - m - 1), 0)
                hi = min(xx - 1 + (y - m - 1), W - 1)
                if hi >= lo:
                    acc += xi[:, m, lo:hi + 1].sum(axis=1)
            t[:, y, xx] = acc
    return t


def _tilted(x, dt):
    """Tilted integral via two skewed diagonal prefix sums.

    t(y,x) = Σ_{m<y} [P(m, clip(x+y-m-1, 0, W)) − P(m, clip(x−y+m, 0, W))]
    where P is the per-row prefix sum — two gathers along skewed diagonals
    plus cumsums over rows; O(H·(H+W)) memory, fully vectorized.
    """
    N, H, W, C = x.shape
    xi = x.astype(dt)
    # P: (N, H, W+1, C) row prefix sums with leading zero
    P = jnp.concatenate([jnp.zeros((N, H, 1, C), dt),
                         jnp.cumsum(xi, axis=2, dtype=dt)], axis=2)
    D = H + W + 1
    m = np.arange(H)[:, None]
    d = np.arange(D)[None, :]
    idx1 = np.clip(d - m - 1, 0, W)     # for diagonal u = x + y
    idx2 = np.clip(d - H + m, 0, W)     # for diagonal v = x - y + H
    g1 = jnp.take_along_axis(
        P, jnp.broadcast_to(jnp.asarray(idx1)[None, :, :, None], (N, H, D, C)),
        axis=2)
    g2 = jnp.take_along_axis(
        P, jnp.broadcast_to(jnp.asarray(idx2)[None, :, :, None], (N, H, D, C)),
        axis=2)
    ys = np.arange(1, H + 1)[:, None]
    xs = np.arange(W + 1)[None, :]
    u = xs + ys                         # index into the u diagonal axis
    v = xs - ys + H
    A1 = jnp.cumsum(g1, axis=1, dtype=dt)  # A1[y-1] = Σ_{m<y} g1
    A2 = jnp.cumsum(g2, axis=1, dtype=dt)
    iu = jnp.broadcast_to(jnp.asarray(u)[None, :, :, None], (N, H, W + 1, C))
    iv = jnp.broadcast_to(jnp.asarray(v)[None, :, :, None], (N, H, W + 1, C))
    t_body = jnp.take_along_axis(A1, iu, axis=2) \
        - jnp.take_along_axis(A2, iv, axis=2)
    return jnp.concatenate([jnp.zeros((N, 1, W + 1, C), dt), t_body], axis=1)


def integral3(src, sdepth: int = -1, sqdepth: int = -1):
    """sum, sqsum and tilted integrals (`cv::integral` 3-output form)."""
    x, meta = to_batched(src)
    s = _integral_sum(x, sdepth)
    xf = x.astype(jnp.float32)
    sq = _integral_sum(xf * xf, K.CV_32F)
    t = _tilted(x, s.dtype)
    return from_batched(s, meta), from_batched(sq, meta), from_batched(t, meta)
