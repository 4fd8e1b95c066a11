"""Saturating casts and fixed-point arithmetic helpers.

The reference's integer image paths never wrap — every narrowing store goes
through `cv::saturate_cast<>` (`core/include/opencv2/core/saturate.hpp`) and
every fixed-point accumulate rounds with `CV_DESCALE(x, n) =
(x + (1 << (n-1))) >> n`.  On TPU all of this happens in int32 VPU lanes; the
helpers here are the single source of truth for those semantics so every op
reproduces the reference bit-for-bit on the integer paths.

Float→int rounding follows `cvRound` (round-half-to-even, i.e. IEEE rint).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "descale",
    "fixed_round_shift",
    "saturate_cast",
    "round_to_int",
    "alpha_max",
]


def descale(x, n: int):
    """`CV_DESCALE`: round-half-up shift of a non-negative-biased int."""
    return (x + (1 << (n - 1))) >> n


def fixed_round_shift(x, n: int):
    """Fixed-point `fixedround` + shift: `(x + (1 << (n-1))) >> n`
    (see `modules/imgproc/src/fixedpoint.inl.hpp:19`)."""
    return (x + (1 << (n - 1))) >> n


_INT_DTYPES = (
    jnp.uint8, jnp.int8, jnp.uint16, jnp.int16, jnp.uint32, jnp.int32,
    jnp.uint64, jnp.int64,
)


def round_to_int(x):
    """`cvRound` semantics: round half to even (IEEE rint)."""
    return jnp.rint(x)


def saturate_cast(x, dtype):
    """Clamp-then-cast matching `cv::saturate_cast<>`.

    Integer targets clamp to the target range; float sources are rounded
    half-to-even first (`cvRound`).  Float targets are a plain cast.
    """
    dtype = jnp.dtype(dtype)
    if dtype.kind in "ui":
        info = np.iinfo(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating):
            x = jnp.rint(x)
        x = jnp.clip(x, info.min, info.max)
        return x.astype(dtype)
    return x.astype(dtype)


def alpha_max(dtype) -> float:
    """Alpha-channel fill value per depth (255 / 65535 / 1.0), matching
    `cv::cvtColor` alpha conventions."""
    dtype = jnp.dtype(dtype)
    if dtype.kind in "ui":
        return int(np.iinfo(dtype).max)
    return 1.0
