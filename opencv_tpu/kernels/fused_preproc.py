"""Pallas TPU kernel: fused bit-exact GaussianBlur(5×5) + 2×2 AREA
downsample on u8 — the hot preprocess pattern (BASELINE config 1).

Why a kernel: composed ops round-trip intermediates through HBM
(u8→i32 blur accumulators → u8 → resize). This kernel streams one gray
tile (with halo) HBM→VMEM via async DMA, runs the whole integer chain in
VMEM int32 lanes, and writes only the 4×-smaller output — HBM traffic
drops from ~5 image-sizes to ~1.25.

Bit-exactness: identical arithmetic to the composed path —
separable Q8·Q8 MAC, one round `(v + 2^15) >> 16`, saturate to u8
(smooth.dispatch.cpp semantics), then the AREA-fast `(a+b+c+d+2) >> 2`
(resize.cpp ResizeAreaFastVec).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.borders import pad_nhwc
from ..ops.filter import gaussian_kernel_bitexact, gaussian_kernel_fixedpoint_ed
from .. import constants as K

__all__ = ["gauss5_down2_u8", "gauss5_down2_u8_db",
           "fused_gray_gauss5_down2"]

_TH = 64    # output tile rows
_TW = 128   # output tile cols


def _make_kernel(kq):
    k0, k1, k2, k3, k4 = [int(v) for v in kq]

    def kernel(gray_hbm, out_ref, win_ref, sem):
        n = pl.program_id(0)
        ti = pl.program_id(1)
        tj = pl.program_id(2)
        # DMA window is tile-aligned: (8, 128)-aligned sizes (Mosaic
        # requires aligned memref slices); we only consume the +4 halo.
        ih = 2 * _TH + 8
        iw = 2 * _TW + 128
        dma = pltpu.make_async_copy(
            gray_hbm.at[n, pl.ds(ti * 2 * _TH, ih), pl.ds(tj * 2 * _TW, iw)],
            win_ref, sem)
        dma.start()
        dma.wait()
        w = win_ref[:].astype(jnp.int32)
        # horizontal 5-tap Q8 (no intermediate rounding)
        W2 = 2 * _TW
        h = (w[:, 0:W2] * k0 + w[:, 1:W2 + 1] * k1 + w[:, 2:W2 + 2] * k2
             + w[:, 3:W2 + 3] * k3 + w[:, 4:W2 + 4] * k4)
        H2 = 2 * _TH
        v = (h[0:H2] * k0 + h[1:H2 + 1] * k1 + h[2:H2 + 2] * k2
             + h[3:H2 + 3] * k3 + h[4:H2 + 4] * k4)
        blurred = jnp.clip((v + (1 << 15)) >> 16, 0, 255)
        # 2×2 AREA at full resolution in exact int32 (rolls), producing
        # the final u8 value at every position; the downsample is then a
        # pure 0/1 selection matmul — exact even when the MXU runs bf16,
        # because every dot row has exactly one nonzero and values ≤ 255.
        s2 = blurred + pltpu.roll(blurred, W2 - 1, 1)  # col pairs (roll -1)
        s4 = s2 + pltpu.roll(s2, H2 - 1, 0)            # + row pairs
        full = ((s4 + 2) >> 2).astype(jnp.float32)     # ≤ 255, exact
        ri = jax.lax.broadcasted_iota(jnp.int32, (_TH, H2), 0)
        rj = jax.lax.broadcasted_iota(jnp.int32, (_TH, H2), 1)
        Ar = (rj == 2 * ri).astype(jnp.float32)        # pick even rows
        ci = jax.lax.broadcasted_iota(jnp.int32, (W2, _TW), 0)
        cj = jax.lax.broadcasted_iota(jnp.int32, (W2, _TW), 1)
        Ac = (ci == 2 * cj).astype(jnp.float32)        # pick even cols
        s = jnp.dot(jnp.dot(Ar, full, preferred_element_type=jnp.float32),
                    Ac, preferred_element_type=jnp.float32)
        out_ref[:] = s.astype(jnp.int32).astype(jnp.uint8)[None]

    return kernel


@functools.partial(jax.jit, static_argnames=("sigma", "interpret"))
def gauss5_down2_u8(gray, sigma: float = 0.0, interpret: bool = False):
    """gray: (N, H, W) u8 with H, W even. Returns (N, H//2, W//2) u8 ==
    resize(GaussianBlur(gray, (5,5), sigma), (W//2, H//2), INTER_AREA-fast).
    """
    kf = gaussian_kernel_bitexact(5, sigma)
    kq = gaussian_kernel_fixedpoint_ed(kf, 8)

    N, H, W = gray.shape
    Ho, Wo = H // 2, W // 2
    # REFLECT_101 halo of 2 + pad up to tile multiples
    g4 = gray[..., None]
    gp = pad_nhwc(g4, 2, 2, 2, 2, K.BORDER_REFLECT_101)[..., 0]
    Hp = ((Ho + _TH - 1) // _TH) * _TH
    Wp = ((Wo + _TW - 1) // _TW) * _TW
    extra_h = 2 * Hp + 8 - gp.shape[1]
    extra_w = 2 * Wp + 128 - gp.shape[2]
    gp = jnp.pad(gp, ((0, 0), (0, extra_h), (0, extra_w)))

    out = pl.pallas_call(
        _make_kernel(kq),
        out_shape=jax.ShapeDtypeStruct((N, Hp, Wp), jnp.uint8),
        grid=(N, Hp // _TH, Wp // _TW),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, _TH, _TW),
                               lambda n, i, j: (n, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * _TH + 8, 2 * _TW + 128), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(gp)
    return out[:, :Ho, :Wo]


def fused_gray_gauss5_down2(imgs, sigma: float = 0.0, interpret: bool = False):
    """(N, H, W, 3) BGR u8 → (N, H//2, W//2) u8: cvtColor(BGR2GRAY) +
    GaussianBlur(5×5) + 2× AREA downsample, bit-exact with the composed
    ops. Gray conversion stays in XLA (fuses with the deinterleave); the
    blur+downsample run in the Pallas kernel."""
    from ..ops.color import RY15, GY15, BY15, GRAY_SHIFT

    xi = imgs.astype(jnp.int32)
    gray = ((xi[..., 2] * RY15 + xi[..., 1] * GY15 + xi[..., 0] * BY15
             + (1 << (GRAY_SHIFT - 1))) >> GRAY_SHIFT).astype(jnp.uint8)
    return gauss5_down2_u8_db(gray, sigma=sigma, interpret=interpret)


def _make_kernel_db(kq, NI, NJ):
    """Double-buffered variant: prefetch tile k+1's HBM->VMEM DMA while
    computing tile k (classic two-slot pipeline; grid steps run
    sequentially per core)."""
    k0, k1, k2, k3, k4 = [int(v) for v in kq]
    ih = 2 * _TH + 8
    iw = 2 * _TW + 128
    total = None  # filled by closure users via NI*NJ*N at trace time

    def kernel(gray_hbm, out_ref, win0, win1, sem0, sem1):
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
                gray_hbm.at[tn, pl.ds(tti * 2 * _TH, ih),
                            pl.ds(ttj * 2 * _TW, iw)],
                win, sem)

        parity = gi % 2

        # first tile: kick off its own DMA
        @pl.when(gi == 0)
        def _():
            dma_for(gi, win0, sem0).start()

        # prefetch the next tile into the other slot
        @pl.when(jnp.logical_and(gi + 1 < ntiles, parity == 0))
        def _():
            dma_for(gi + 1, win1, sem1).start()

        @pl.when(jnp.logical_and(gi + 1 < ntiles, parity == 1))
        def _():
            dma_for(gi + 1, win0, sem0).start()

        # wait for the current slot
        @pl.when(parity == 0)
        def _():
            dma_for(gi, win0, sem0).wait()

        @pl.when(parity == 1)
        def _():
            dma_for(gi, win1, sem1).wait()

        w8 = jnp.where(parity == 0, win0[:], win1[:])
        w = w8.astype(jnp.int32)
        W2 = 2 * _TW
        h = (w[:, 0:W2] * k0 + w[:, 1:W2 + 1] * k1 + w[:, 2:W2 + 2] * k2
             + w[:, 3:W2 + 3] * k3 + w[:, 4:W2 + 4] * k4)
        H2 = 2 * _TH
        v = (h[0:H2] * k0 + h[1:H2 + 1] * k1 + h[2:H2 + 2] * k2
             + h[3:H2 + 3] * k3 + h[4:H2 + 4] * k4)
        blurred = jnp.clip((v + (1 << 15)) >> 16, 0, 255)
        s2 = blurred + pltpu.roll(blurred, W2 - 1, 1)
        s4 = s2 + pltpu.roll(s2, H2 - 1, 0)
        full = ((s4 + 2) >> 2).astype(jnp.float32)
        ri = jax.lax.broadcasted_iota(jnp.int32, (_TH, H2), 0)
        rj = jax.lax.broadcasted_iota(jnp.int32, (_TH, H2), 1)
        Ar = (rj == 2 * ri).astype(jnp.float32)
        ci = jax.lax.broadcasted_iota(jnp.int32, (W2, _TW), 0)
        cj = jax.lax.broadcasted_iota(jnp.int32, (W2, _TW), 1)
        Ac = (ci == 2 * cj).astype(jnp.float32)
        s = jnp.dot(jnp.dot(Ar, full, preferred_element_type=jnp.float32),
                    Ac, preferred_element_type=jnp.float32)
        out_ref[:] = s.astype(jnp.int32).astype(jnp.uint8)[None]

    del total
    return kernel


@functools.partial(jax.jit, static_argnames=("sigma", "interpret"))
def gauss5_down2_u8_db(gray, sigma: float = 0.0, interpret: bool = False):
    """Double-buffered gauss5_down2_u8 (same contract, DMA prefetch)."""
    kf = gaussian_kernel_bitexact(5, sigma)
    kq = gaussian_kernel_fixedpoint_ed(kf, 8)

    N, H, W = gray.shape
    Ho, Wo = H // 2, W // 2
    g4 = gray[..., None]
    gp = pad_nhwc(g4, 2, 2, 2, 2, K.BORDER_REFLECT_101)[..., 0]
    Hp = ((Ho + _TH - 1) // _TH) * _TH
    Wp = ((Wo + _TW - 1) // _TW) * _TW
    extra_h = 2 * Hp + 8 - gp.shape[1]
    extra_w = 2 * Wp + 128 - gp.shape[2]
    gp = jnp.pad(gp, ((0, 0), (0, extra_h), (0, extra_w)))
    NI = Hp // _TH
    NJ = Wp // _TW

    out = pl.pallas_call(
        _make_kernel_db(kq, NI, NJ),
        out_shape=jax.ShapeDtypeStruct((N, Hp, Wp), jnp.uint8),
        grid=(N, NI, NJ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, _TH, _TW),
                               lambda n, i, j: (n, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * _TH + 8, 2 * _TW + 128), jnp.uint8),
            pltpu.VMEM((2 * _TH + 8, 2 * _TW + 128), jnp.uint8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(gp)
    return out[:, :Ho, :Wo]
