"""Non-photorealistic rendering filters (photo/src/npr.cpp, npr.hpp).

All four entry points ride the Gastal-Oliveira domain transform.  The
reference's sequential per-row IIR (compute_Rfilter, npr.hpp:172) is a
first-order linear recurrence y[j] = V[j]*y[j-1] + (1-V[j])*x[j] — on
TPU that becomes `lax.associative_scan` over the width axis (log-depth,
fully parallel across rows/channels), and the normalized-convolution
variant's per-row index search (compute_boxfilter, npr.hpp:216) becomes
a vmapped `searchsorted` over the domain-transform prefix sums.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.color import cvtColor
from .. import constants as K

__all__ = ["edgePreservingFilter", "detailEnhance", "stylization",
           "pencilSketch", "RECURS_FILTER", "NORMCONV_FILTER"]

RECURS_FILTER = 1
NORMCONV_FILTER = 2

_SQRT3 = float(np.sqrt(3.0))


def _domain_derivs(img, sigma_s, sigma_r):
    """horiz/vert domain-transform derivatives (npr.hpp init:420-455):
    1 + (sigma_s/sigma_r) * sum_c |d I|."""
    dx = jnp.abs(jnp.diff(img, axis=1)).sum(-1)      # (h, w-1)
    dy = jnp.abs(jnp.diff(img, axis=0)).sum(-1)      # (h-1, w)
    h, w = img.shape[:2]
    distx = jnp.pad(dx, ((0, 0), (1, 0)))
    disty = jnp.pad(dy, ((1, 0), (0, 0)))
    k = sigma_s / sigma_r
    return 1.0 + k * distx, 1.0 + k * disty


def _iir_scan(x, V):
    """y[j] = V[j]*y[j-1] + (1-V[j])*x[j] along axis 1 via associative
    scan; matches the reference's in-place forward pass."""
    a = V[..., None] * jnp.ones_like(x)
    b = (1.0 - V[..., None]) * x
    # first element passes through unchanged (loop starts at j=1)
    a = a.at[:, 0].set(0.0)
    b = b.at[:, 0].set(x[:, 0])

    def combine(c1, c2):
        a1, b1 = c1
        a2, b2 = c2
        return a1 * a2, a2 * b1 + b2

    _, y = jax.lax.associative_scan(combine, (a, b), axis=1)
    return y


def _rfilter(x, horiz, sigma_h):
    a = jnp.exp(jnp.float32(-np.sqrt(2.0) / sigma_h))
    V = jnp.power(a, horiz)
    y = _iir_scan(x, V)
    # backward pass: y[j] += (y[j+1]-y[j]) * V[j+1], right to left
    yr = _iir_scan(y[:, ::-1], jnp.concatenate(
        [V[:, :1] * 0, V[:, :0:-1]], axis=1))
    return yr[:, ::-1]


@functools.partial(jax.jit, static_argnames=("iters",))
def _edge_preserving_rf(img, horiz, vert, sigma_s, iters=3):
    O = img
    for i in range(iters):
        sigma_h = sigma_s * _SQRT3 * (2.0 ** (iters - (i + 1))) \
            / np.sqrt(4.0 ** iters - 1)
        O = _rfilter(O, horiz, sigma_h)
        O = jnp.transpose(_rfilter(jnp.transpose(O, (1, 0, 2)),
                                   vert.T, sigma_h), (1, 0, 2))
    return O


def _box_indices(ct, radius):
    """(lo, hi) searchsorted bounds over the domain transform rows
    (compute_boxfilter, npr.hpp:216): first k with ct[k] > pos."""
    h, w = ct.shape
    dom = jnp.concatenate([ct, jnp.full((h, 1), np.inf, ct.dtype)], axis=1)
    lo = jax.vmap(lambda row, v: jnp.searchsorted(row, v, side="right"))(
        dom, ct - radius)
    hi = jax.vmap(lambda row, v: jnp.searchsorted(row, v, side="right"))(
        dom, ct + radius)
    return lo, hi


def _ncfilter(x, ct, radius):
    h, w = x.shape[:2]
    lo, hi = _box_indices(ct, radius)
    sat = jnp.concatenate(
        [jnp.zeros((h, 1, x.shape[2]), x.dtype), jnp.cumsum(x, axis=1)],
        axis=1)
    take = lambda idx: jnp.take_along_axis(sat, idx[..., None], axis=1)
    num = take(hi) - take(lo)
    cnt = (hi - lo).astype(x.dtype)[..., None]
    return num / jnp.maximum(cnt, 1.0)


@functools.partial(jax.jit, static_argnames=("iters",))
def _edge_preserving_nc(img, ct_H, ct_V, sigma_s, iters=3):
    O = img
    for i in range(iters):
        sigma_h = sigma_s * _SQRT3 * (2.0 ** (iters - (i + 1))) \
            / np.sqrt(4.0 ** iters - 1)
        radius = _SQRT3 * sigma_h
        O = _ncfilter(O, ct_H, radius)
        O = jnp.transpose(
            _ncfilter(jnp.transpose(O, (1, 0, 2)), ct_V.T, radius),
            (1, 0, 2))
    return O


def _prep(src, sigma_s, sigma_r, need_ct):
    img = jnp.asarray(np.asarray(src), jnp.float32) / 255.0
    horiz, vert = _domain_derivs(img, sigma_s, sigma_r)
    if need_ct:
        ct_H = jnp.cumsum(horiz, axis=1)
        ct_V = jnp.cumsum(vert, axis=0)
        return img, horiz, vert, ct_H, ct_V
    return img, horiz, vert, None, None


def _to_u8(x):
    return np.asarray(jnp.clip(jnp.round(x * 255.0), 0, 255)
                      ).astype(np.uint8)


def edgePreservingFilter(src, dst=None, flags: int = RECURS_FILTER,
                         sigma_s: float = 60, sigma_r: float = 0.4):
    """photo/src/npr.cpp:52."""
    img, horiz, vert, ct_H, ct_V = _prep(src, sigma_s, sigma_r,
                                         flags == NORMCONV_FILTER)
    if flags == NORMCONV_FILTER:
        out = _edge_preserving_nc(img, ct_H, ct_V, float(sigma_s))
    else:
        out = _edge_preserving_rf(img, horiz, vert, float(sigma_s))
    return _to_u8(out)


def detailEnhance(src, dst=None, sigma_s: float = 10, sigma_r: float = 0.15):
    """photo/src/npr.cpp:69: RF-filter the Lab L channel, amplify the
    residual by 3."""
    img = jnp.asarray(np.asarray(src), jnp.float32) / 255.0
    lab = cvtColor(img, K.COLOR_BGR2Lab)
    L = lab[..., 0] / 255.0
    horiz, vert = _domain_derivs(L[..., None], sigma_s, sigma_r)
    res = _edge_preserving_rf(L[..., None], horiz, vert, float(sigma_s))
    L2 = (res[..., 0] + 3.0 * (L - res[..., 0])) * 255.0
    lab = jnp.stack([L2, lab[..., 1], lab[..., 2]], axis=-1)
    out = cvtColor(lab, K.COLOR_Lab2BGR)
    return _to_u8(out)


def stylization(src, dst=None, sigma_s: float = 60, sigma_r: float = 0.45):
    """photo/src/npr.cpp:131: NC filter then scale by (1 - |Sobel grad|)."""
    img, _, _, ct_H, ct_V = _prep(src, sigma_s, sigma_r, True)
    res = _edge_preserving_nc(img, ct_H, ct_V, float(sigma_s))
    # find_magnitude (npr.hpp:134): per-channel Sobel-3 magnitudes summed
    from ..ops.deriv import Sobel
    resn = np.asarray(res)
    mag = np.zeros(resn.shape[:2], np.float32)
    for c in range(3):
        gx = np.asarray(Sobel(resn[..., c], K.CV_32F, 1, 0, ksize=3))
        gy = np.asarray(Sobel(resn[..., c], K.CV_32F, 0, 1, ksize=3))
        mag += np.sqrt(gx * gx + gy * gy)
    mag = 1.0 - mag
    return _to_u8(jnp.asarray(resn * mag[..., None]))


def pencilSketch(src, dst1=None, dst2=None, sigma_s: float = 60,
                 sigma_r: float = 0.07, shade_factor: float = 0.02):
    """photo/src/npr.cpp:105 / pencil_sketch (npr.hpp:533): the sketch is
    shade_factor * (horizontal + vertical box-filter footprint counts) at
    the first (widest) iteration radius."""
    img, _, _, ct_H, ct_V = _prep(src, sigma_s, sigma_r, True)
    iters = 3
    sigma_h = sigma_s * _SQRT3 * (2.0 ** (iters - 1)) \
        / np.sqrt(4.0 ** iters - 1)
    radius = _SQRT3 * sigma_h
    lox, hix = _box_indices(ct_H, radius)
    loy, hiy = _box_indices(ct_V.T, radius)
    pen = shade_factor * ((hix - lox) + (hiy - loy).T).astype(jnp.float32)
    sketch = _to_u8(pen)
    ycrcb = cvtColor(img, K.COLOR_BGR2YCrCb)
    ycrcb = jnp.stack([jnp.clip(pen, 0, 1), ycrcb[..., 1], ycrcb[..., 2]],
                      axis=-1)
    color = cvtColor(ycrcb, K.COLOR_YCrCb2BGR)
    return sketch, _to_u8(color)
