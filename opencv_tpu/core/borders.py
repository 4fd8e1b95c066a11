"""Border handling — the shared pad layer used by every filtering op.

Replicates `cv::borderInterpolate` (`core/src/copy.cpp:748`) and
`cv::copyMakeBorder` (`core/src/copy.cpp:1021`) semantics: CONSTANT /
REPLICATE / REFLECT / WRAP / REFLECT_101 (+ISOLATED, which is a no-op here
because this library has no ROI-carrying views — arrays are always
"isolated").

TPU-first design: pad amounts and border types are static at trace time,
so the border segments are built as SMALL host-indexed gathers (a few
rows/cols each) concatenated around the untouched interior — a full-image
index-vector gather along each axis measured several ms per op on TPU,
while concat of contiguous pieces is a plain copy that XLA fuses into the
consumer.  BORDER_CONSTANT masks corners constant too, matching
copyMakeBorder.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import (
    BORDER_CONSTANT,
    BORDER_REPLICATE,
    BORDER_REFLECT,
    BORDER_WRAP,
    BORDER_REFLECT_101,
    BORDER_TRANSPARENT,
    BORDER_ISOLATED,
)

__all__ = ["border_interpolate", "border_index", "copy_make_border", "pad_nhwc"]


def border_interpolate(p: int, length: int, border_type: int) -> int:
    """Host-side scalar twin of `cv::borderInterpolate` (copy.cpp:748).

    Returns the source coordinate for out-of-range coordinate ``p``, or -1
    for BORDER_CONSTANT.
    """
    bt = border_type & ~BORDER_ISOLATED
    if 0 <= p < length:
        return p
    if bt == BORDER_REPLICATE:
        return 0 if p < 0 else length - 1
    if bt in (BORDER_REFLECT, BORDER_REFLECT_101):
        delta = 1 if bt == BORDER_REFLECT_101 else 0
        if length == 1:
            return 0
        while p < 0 or p >= length:
            if p < 0:
                p = -p - 1 + delta
            else:
                p = length - 1 - (p - length) - delta
        return p
    if bt == BORDER_WRAP:
        if p < 0:
            p -= ((p - length + 1) // length) * length
        if p >= length:
            p %= length
        return p
    if bt in (BORDER_CONSTANT, BORDER_TRANSPARENT):
        return -1
    raise ValueError(f"unsupported border type {border_type}")


def border_index(length: int, before: int, after: int, border_type: int) -> np.ndarray:
    """Index vector of length before+length+after mapping padded coords to
    source coords (-1 ⇒ constant fill)."""
    idx = np.empty(before + length + after, dtype=np.int32)
    for i in range(-before, length + after):
        idx[i + before] = border_interpolate(i, length, border_type)
    return idx


def pad_nhwc(x, top: int, bottom: int, left: int, right: int,
             border_type: int, value=0, extra_bottom: int = 0,
             extra_right: int = 0):
    """Pad an (N, H, W, C) array; static pad sizes.

    ``extra_bottom``/``extra_right`` append DON'T-CARE rows/cols (edge
    copies) in the same concat — callers that need tile-aligned shapes
    (Pallas kernels) fold both pads into one materialization."""
    if top == 0 and bottom == 0 and left == 0 and right == 0             and extra_bottom == 0 and extra_right == 0:
        return x
    bt = border_type & ~BORDER_ISOLATED
    N, H, W, C = x.shape
    if bt == BORDER_CONSTANT:
        if np.isscalar(value) or np.ndim(value) == 0:
            pads = ((0, 0), (top, bottom + extra_bottom),
                    (left, right + extra_right), (0, 0))
            return jnp.pad(x, pads, mode="constant",
                           constant_values=jnp.asarray(value, dtype=x.dtype))
        # per-channel scalar (cv2 Scalar): pad with zeros then fix borders
        val = jnp.asarray(value, dtype=x.dtype).reshape(1, 1, 1, -1)
        val = jnp.broadcast_to(val[..., :C], (1, 1, 1, C))
        ridx = border_index(H, top, bottom, bt)
        cidx = border_index(W, left, right, bt)
        rmask = (ridx < 0)[None, :, None, None]
        cmask = (cidx < 0)[None, None, :, None]
        y = jnp.pad(x, ((0, 0), (top, bottom + extra_bottom),
                        (left, right + extra_right), (0, 0)))
        rmask = np.append(rmask.ravel(),
                          np.ones(extra_bottom, bool))[None, :, None, None]
        cmask = np.append(cmask.ravel(),
                          np.ones(extra_right, bool))[None, None, :, None]
        y = jnp.where(jnp.asarray(rmask) | jnp.asarray(cmask), val, y)
        return y
    y = _axis_pad(x, top, bottom, 1, bt, H, extra_bottom)
    y = _axis_pad(y, left, right, 2, bt, W, extra_right)
    return y


def _axis_pad(y, before: int, after: int, axis: int, bt: int,
              length: int, extra: int = 0):
    """Pad one axis: small border-segment gathers + concat (the interior
    passes through untouched).  ``extra`` appends don't-care edge rows."""
    if not (before or after or extra):
        return y
    idx = border_index(length, before, after, bt)
    post = idx[before + length:]
    if extra:
        post = np.append(post, np.full(extra, length - 1, np.int32))
    parts = []
    if before:
        parts.append(jnp.take(y, jnp.asarray(idx[:before]), axis=axis))
    parts.append(y)
    if len(post):
        parts.append(jnp.take(y, jnp.asarray(post), axis=axis))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                            axis=axis)


def copy_make_border(src, top: int, bottom: int, left: int, right: int,
                     borderType: int = BORDER_CONSTANT, value=0):
    """cv2-compatible `copyMakeBorder` over (H,W), (H,W,C) or (N,H,W,C)."""
    from .arrays import to_batched, from_batched

    x, meta = to_batched(src)
    y = pad_nhwc(x, top, bottom, left, right, borderType, value)
    return from_batched(y, meta)
