"""Generic separable fixed-point filter Pallas kernel (u8 → u8).

The workhorse behind GaussianBlur / sepFilter2D / boxFilter 8U paths
(reference: `GaussianBlurFixedPoint`, smooth.dispatch.cpp:720 and the
separable FilterEngine, filter.simd.hpp:198).  TPU-native design:

- Border handling happens ONCE on the host side of the pallas_call (an
  XLA gather implementing all 5 border modes), so the kernel sees a
  padded image and needs no edge branches — the same split the reference
  makes between `copyMakeBorder` rows and the inner row loop.
- Channels are folded into the lane axis: an (N,H,W,C) u8 image is
  viewed as (N,H,W*C) — horizontal taps then stride by C.  NHWC is
  contiguous so the reshape is free, and C=3 images need no transpose.
- The grid walks (N, row-tiles, col-tiles); each step DMAs one input
  window HBM→VMEM (double-buffered: tile k+1's DMA overlaps tile k's
  MACs), runs the horizontal then vertical integer MAC chain in int32
  VPU lanes, and writes one (TH, TW) u8 output tile.
- Bit-exactness: identical arithmetic to the composed XLA path —
  int32 Q·Q MAC, one round `(v + 2^(s-1)) >> s`, clip to u8.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.borders import pad_nhwc
from ..core.dispatch import register
from .. import constants as K

__all__ = ["sep_filter_u8"]

_TH = 128   # output tile rows
_TW = 256   # output tile lanes (W*C)


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def _make_sep_kernel(kx, ky, stride, shift, ih, iw, NI, NJ):
    kx = [int(v) for v in kx]
    ky = [int(v) for v in ky]
    half = 1 << (shift - 1)

    def kernel(src_hbm, out_ref, win0, win1, sem0, sem1):
        n = pl.program_id(0)
        ti = pl.program_id(1)
        tj = pl.program_id(2)
        nn = pl.num_programs(0)
        gi = (n * NI + ti) * NJ + tj
        ntiles = nn * NI * NJ

        def dma_for(gidx, win, sem):
            tn = gidx // (NI * NJ)
            rem = gidx % (NI * NJ)
            tti = rem // NJ
            ttj = rem % NJ
            return pltpu.make_async_copy(
                src_hbm.at[tn, pl.ds(tti * _TH, ih), pl.ds(ttj * _TW, iw)],
                win, sem)

        parity = gi % 2

        @pl.when(gi == 0)
        def _():
            dma_for(gi, win0, sem0).start()

        @pl.when(jnp.logical_and(gi + 1 < ntiles, parity == 0))
        def _():
            dma_for(gi + 1, win1, sem1).start()

        @pl.when(jnp.logical_and(gi + 1 < ntiles, parity == 1))
        def _():
            dma_for(gi + 1, win0, sem0).start()

        @pl.when(parity == 0)
        def _():
            dma_for(gi, win0, sem0).wait()

        @pl.when(parity == 1)
        def _():
            dma_for(gi, win1, sem1).wait()

        w = jnp.where(parity == 0, win0[:], win1[:]).astype(jnp.int32)

        h = None
        for i, c in enumerate(kx):
            t = w[:, i * stride:i * stride + _TW] * c
            h = t if h is None else h + t
        v = None
        for j, c in enumerate(ky):
            t = h[j:j + _TH] * c
            v = t if v is None else v + t
        out = (v + half) >> shift
        out_ref[:] = jnp.clip(out, 0, 255).astype(jnp.uint8)[None]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("kx", "ky", "shift", "border", "border_value",
                     "interpret"))
def sep_filter_u8(x, kx, ky, shift: int,
                  border: int = K.BORDER_DEFAULT, border_value=0,
                  interpret: bool = False):
    """x: (N,H,W,C) u8.  Returns u8 separable correlation:
    clip((Σ_j ky[j] · Σ_i kx[i] · x) + 2^(shift-1) >> shift).

    kx/ky: tuples of python ints (fixed-point taps, anchor = center).
    """
    kx = tuple(int(v) for v in kx)
    ky = tuple(int(v) for v in ky)
    kw, kh = len(kx), len(ky)
    N, H, W, C = x.shape
    ax, ay = kw // 2, kh // 2

    Wf = W * C
    Hp = _round_up(H, _TH)
    Wp = _round_up(Wf, _TW)
    ih = _TH + _round_up(kh - 1, 8)
    iw = _TW + _round_up((kw - 1) * C, 128)
    bt = border & ~K.BORDER_ISOLATED
    if bt == K.BORDER_CONSTANT:
        # XLA PadOp is cheap; two pads are fine for the constant border
        xp = pad_nhwc(x, ay, kh - 1 - ay, ax, kw - 1 - ax, border,
                      border_value)
        xf = xp.reshape(N, H + kh - 1, (W + kw - 1) * C)
        pad_h = Hp + ih - _TH - xf.shape[1]
        pad_w = Wp + iw - _TW - xf.shape[2]
        xf = jnp.pad(xf, ((0, 0), (0, pad_h), (0, pad_w)))
    else:
        # fold the border pad AND the tile-alignment pad into one concat
        # per axis (a separate alignment pad re-materialized the array
        # and cost ~17% of the whole fused-blur pipeline)
        from ..core.borders import _axis_pad, border_index
        pad_h_extra = Hp + ih - _TH - (H + kh - 1)
        xp = _axis_pad(x, ay, kh - 1 - ay, 1, bt, H, extra=pad_h_extra)
        xf = xp.reshape(N, xp.shape[1], W * C)
        cidx = border_index(W, ax, kw - 1 - ax, bt)
        ar = np.arange(C)
        left_idx = (cidx[:ax, None] * C + ar).ravel()
        right_idx = (cidx[ax + W:, None] * C + ar).ravel()
        extra_w = Wp + iw - _TW - (Wf + (kw - 1) * C)
        right_idx = np.append(right_idx,
                              np.full(extra_w, Wf - 1, np.int64))
        parts = []
        if len(left_idx):
            parts.append(jnp.take(xf, jnp.asarray(left_idx, jnp.int32),
                                  axis=2))
        parts.append(xf)
        if len(right_idx):
            parts.append(jnp.take(xf, jnp.asarray(right_idx, jnp.int32),
                                  axis=2))
        xf = jnp.concatenate(parts, axis=2) if len(parts) > 1 else xf
    NI, NJ = Hp // _TH, Wp // _TW

    out = pl.pallas_call(
        _make_sep_kernel(kx, ky, C, shift, ih, iw, NI, NJ),
        out_shape=jax.ShapeDtypeStruct((N, Hp, Wp), jnp.uint8),
        grid=(N, NI, NJ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, _TH, _TW), lambda n, i, j: (n, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ih, iw), jnp.uint8),
            pltpu.VMEM((ih, iw), jnp.uint8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xf)
    return out[:, :H, :Wf].reshape(N, H, W, C)


def _sep_pred(ctx):
    # VMEM budget: two (ih, iw) u8 windows + int32 intermediates
    return (ctx.get("dtype") == "uint8" and ctx["kw"] <= 31
            and ctx["kh"] <= 31 and 1 <= ctx.get("channels", 1) <= 4
            and ctx.get("shift", 0) >= 1)


@register("sep_filter_u8", _sep_pred)
def _sep_filter_u8_kernel(ctx, x, kx, ky):
    return sep_filter_u8(x, tuple(int(v) for v in kx),
                         tuple(int(v) for v in ky), ctx["shift"],
                         border=ctx.get("border", K.BORDER_DEFAULT),
                         border_value=ctx.get("border_value", 0),
                         interpret=ctx.get("interpret", False))
