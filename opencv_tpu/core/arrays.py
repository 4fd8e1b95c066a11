"""Array layout conventions.

The TPU-native canonical layout is **batched NHWC** (`(N, H, W, C)` jnp
arrays living in HBM).  The public API additionally accepts the cv2-style
per-image shapes — `(H, W)` single channel and `(H, W, C)` — and returns
results in the matching convention: single-channel per-image results come
back as `(H, W)`, exactly like the numpy bridge of the reference
(`modules/python/src2/cv2_numpy.cpp`).

Batch is the outer data-parallel axis from day one: every op in this
library is written directly over `(N, H, W, C)` so a whole batch is one XLA
program with no vmap overhead, and the batch axis can be sharded over a
`jax.sharding.Mesh` (see `opencv_tpu.parallel`).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

__all__ = [
    "to_batched",
    "from_batched",
    "imagewise",
    "channel_count",
]


def to_batched(src):
    """Normalize input to (N, H, W, C); returns (x, meta) with meta for
    :func:`from_batched`."""
    x = jnp.asarray(src)
    if x.ndim == 2:
        return x[None, :, :, None], "hw"
    if x.ndim == 3:
        return x[None], "hwc"
    if x.ndim == 4:
        return x, "nhwc"
    raise ValueError(f"expected 2-4 dims, got shape {x.shape}")


def from_batched(y, meta):
    """Undo :func:`to_batched`, using the cv2 convention that per-image
    single-channel results are rank-2."""
    if meta == "nhwc":
        return y
    y = y[0]
    if y.shape[-1] == 1:
        return y[..., 0]
    return y


def imagewise(fn):
    """Decorator: adapt an NHWC-batched op to also accept cv2-style
    per-image arrays (first positional argument is the image)."""

    @functools.wraps(fn)
    def wrapper(src, *args, **kwargs):
        x, meta = to_batched(src)
        out = fn(x, *args, **kwargs)
        if isinstance(out, tuple):
            return tuple(
                from_batched(o, meta) if hasattr(o, "ndim") and o.ndim == 4 else o
                for o in out
            )
        return from_batched(out, meta)

    return wrapper


def channel_count(src) -> int:
    x = jnp.asarray(src)
    return 1 if x.ndim == 2 else int(x.shape[-1])
