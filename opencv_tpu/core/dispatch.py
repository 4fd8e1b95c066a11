"""Central acceleration-dispatch registry — the `CALL_HAL` analogue.

The reference dispatches every hot call down a ladder: vendor HAL →
OpenCL → IPP → CPU SIMD → scalar (`imgproc/src/hal_replacement.hpp:1351`
CALL_HAL, `core/include/opencv2/core/opencl/ocl_defs.hpp:80` CV_OCL_RUN).
The TPU-native equivalent has two tiers (SURVEY §7): XLA-primitive
composition (always-correct baseline) and fused Pallas kernels registered
here per (op, dtype, interp, border, …) predicate.

Usage — kernel side::

    @register("sep_filter_u8", lambda ctx: ctx["kw"] <= 31 and ...)
    def _pallas_sep_filter(ctx, x, kx, ky):
        ...

Op side::

    fn = lookup("sep_filter_u8", kw=kw, kh=kh, border=borderType, ...)
    if fn is not None:
        return fn(ctx, x, kx, ky)
    # ... XLA fallback ...

Selection honors `OPENCV_TPU_PALLAS`:
  unset/"1"  — Pallas kernels used on the TPU backend only (default)
  "0"        — Pallas kernels disabled (pure-XLA tier, the
               `OPENCV_CPU_DISABLE` analogue, system.cpp:785)
  "force"    — kernels selected on any backend (interpret mode on CPU;
               used by the bit-exact kernel tests)
"""

from __future__ import annotations

import os

__all__ = ["register", "lookup", "pallas_mode", "kernels_enabled"]

_REGISTRY: dict = {}


def pallas_mode() -> str:
    return os.environ.get("OPENCV_TPU_PALLAS", "1")


def kernels_enabled() -> bool:
    mode = pallas_mode()
    if mode == "0":
        return False
    if mode == "force":
        return True
    import jax

    return jax.default_backend() == "tpu"


def register(op: str, predicate=None):
    """Register a kernel implementation for `op`; first match wins."""

    def deco(fn):
        _REGISTRY.setdefault(op, []).append((predicate, fn))
        return fn

    return deco


def lookup(op: str, **ctx):
    """Return the first registered kernel whose predicate accepts `ctx`
    (bound to that ctx), or None (caller falls to the XLA tier).

    Every resolution bumps a ``tier.<op>.<pallas|xla>`` counter in
    utils.trace (the CV_INSTRUMENT analogue for the CALL_HAL ladder)."""
    from ..utils import trace as _trace

    if not kernels_enabled():
        _trace.count(f"tier.{op}.xla")
        return None
    import functools

    from .. import kernels  # noqa: F401  (ensures registrations ran)

    ctx.setdefault("interpret", pallas_mode() == "force")
    for pred, fn in _REGISTRY.get(op, ()):
        try:
            if pred is None or pred(ctx):
                _trace.count(f"tier.{op}.pallas")
                return functools.partial(fn, ctx)
        except Exception:
            continue
    _trace.count(f"tier.{op}.xla")
    return None
