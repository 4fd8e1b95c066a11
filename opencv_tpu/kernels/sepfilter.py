"""Generic separable stencil Pallas kernels (u8 in → u8/i16 out).

The workhorse behind the GaussianBlur / sepFilter2D / Sobel / boxFilter /
erode / dilate / pyrDown 8U paths (reference: `GaussianBlurFixedPoint`,
smooth.dispatch.cpp:720; the separable FilterEngine, filter.simd.hpp:198;
morph row/col min-max filters, morph.simd.hpp; pyramids.cpp:488).
TPU-native design:

- Border handling happens ONCE on the host side of the pallas_call (an
  XLA gather implementing all 5 border modes), so the kernel sees a
  padded image and needs no edge branches — the same split the reference
  makes between `copyMakeBorder` rows and the inner row loop.
- Channels are folded into the lane axis: an (N,H,W,C) u8 image is
  viewed as (N,H,W*C) — horizontal taps then stride by C.  NHWC is
  contiguous so the reshape is free, and C=3 images need no transpose.
- The grid walks (N, row-tiles, col-tiles); each step DMAs one input
  window HBM→VMEM (double-buffered: tile k+1's DMA overlaps tile k's
  compute), runs the horizontal then vertical pass in VPU lanes, and
  writes one (TH, TW) output tile.
- One scaffold, three compute bodies:
    * MAC (int32 taps, optional round-shift, optional float scale,
      u8 or i16 saturating output) — Gaussian Q8, integer Sobel/Scharr,
      normalized boxFilter;
    * 2:1 downsample MAC via MXU matmuls — pyrDown's stride-2 taps as
      two tap-folded selection matmuls (f32 is exact for these integer
      ranges), avoiding sub-16-bit strided slices which are pathological
      on this part (see kernels/README.md).
- Bit-exactness: identical arithmetic to the composed XLA tier —
  int32 Q·Q MAC, one round `(v + 2^(s-1)) >> s`, saturate; float-scale
  outputs use rint (= cvRound's half-to-even).
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

__all__ = ["sep_filter_u8", "sep_filter_int", "pyr_down_u8"]

_TH = 128   # output tile rows
_TW = 512   # output tile lanes (W*C); 512 measured ~17% faster than 256
            # on 1080p batch 32 (fewer tiles, better DMA/compute overlap)


def _round_up(v, m):
    return ((v + m - 1) // m) * m


# ---------------------------------------------------------------------------
# shared scaffold: (N, row-tile, col-tile) grid with double-buffered DMA
# ---------------------------------------------------------------------------

def _scaffold(compute, ih, iw, NI, NJ, row_stride=_TH, col_stride=_TW):
    """Wrap `compute(window_i32_or_u8) -> (TH, TW) out` with the grid walk
    and double-buffered HBM→VMEM window DMA."""

    def kernel(src_hbm, *rest):
        out_ref = rest[-5]
        win0, win1, sem0, sem1 = rest[-4:]
        consts = rest[:-5]
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
                src_hbm.at[tn, pl.ds(tti * row_stride, ih),
                           pl.ds(ttj * col_stride, iw)],
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

        w = jnp.where(parity == 0, win0[:], win1[:])
        out_ref[:] = compute(w, *consts)[None]

    return kernel


def _pallas_tiled(kernel, xf, N, NI, NJ, ih, iw, out_dtype, n_consts=0,
                  interpret=False, th=_TH, tw=_TW):
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_consts
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, NI * th, NJ * tw), out_dtype),
        grid=(N, NI, NJ),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, tw), lambda n, i, j: (n, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ih, iw), jnp.uint8),
            pltpu.VMEM((ih, iw), jnp.uint8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# host-side border + tile-alignment padding (shared by all kernel entries)
# ---------------------------------------------------------------------------

def _pad_for_tiles(x, kw, kh, ax, ay, border, border_value, ih, iw,
                   Hp, Wp, th=_TH, tw=_TW):
    """(N,H,W,C) u8 → flat (N, Hp+ih-TH, Wp+iw-TW) with the border
    applied and the tile-alignment region appended (alignment content is
    never read by in-range outputs)."""
    N, H, W, C = x.shape
    Wf = W * C
    bt = border & ~K.BORDER_ISOLATED
    if bt == K.BORDER_CONSTANT:
        xp = pad_nhwc(x, ay, kh - 1 - ay, ax, kw - 1 - ax, border,
                      border_value)
        xf = xp.reshape(N, H + kh - 1, (W + kw - 1) * C)
        pad_h = Hp + ih - th - xf.shape[1]
        pad_w = Wp + iw - tw - xf.shape[2]
        cval = int(border_value) if np.isscalar(border_value) else 0
        return jnp.pad(xf, ((0, 0), (0, pad_h), (0, pad_w)),
                       constant_values=np.uint8(cval) if cval else 0)
    # fold the border pad AND the tile-alignment pad into one concat
    # per axis (a separate alignment pad re-materialized the array
    # and cost ~17% of the whole fused-blur pipeline)
    from ..core.borders import _axis_pad, border_index
    pad_h_extra = Hp + ih - th - (H + kh - 1)
    xp = _axis_pad(x, ay, kh - 1 - ay, 1, bt, H, extra=pad_h_extra)
    xf = xp.reshape(N, xp.shape[1], W * C)
    cidx = border_index(W, ax, kw - 1 - ax, bt)
    ar = np.arange(C)
    left_idx = (cidx[:ax, None] * C + ar).ravel()
    right_idx = (cidx[ax + W:, None] * C + ar).ravel()
    extra_w = Wp + iw - tw - (Wf + (kw - 1) * C)
    right_idx = np.append(right_idx, np.full(extra_w, Wf - 1, np.int64))
    parts = []
    if len(left_idx):
        parts.append(jnp.take(xf, jnp.asarray(left_idx, jnp.int32),
                              axis=2))
    parts.append(xf)
    if len(right_idx):
        parts.append(jnp.take(xf, jnp.asarray(right_idx, jnp.int32),
                              axis=2))
    return jnp.concatenate(parts, axis=2) if len(parts) > 1 else xf


# ---------------------------------------------------------------------------
# MAC kernels (Gaussian Q8 / integer Sobel / boxFilter)
# ---------------------------------------------------------------------------

def _mac_compute(kx, ky, stride, shift, delta, scale, lo, hi, out_dtype,
                 th=_TH, tw=_TW):
    kx = [int(v) for v in kx]
    ky = [int(v) for v in ky]
    half = 1 << (shift - 1) if shift > 0 else 0

    def compute(w):
        w = w.astype(jnp.int32)
        h = None
        for i, c in enumerate(kx):
            t = w[:, i * stride:i * stride + tw]
            if c != 1:
                t = t * c
            h = t if h is None else h + t
        v = None
        for j, c in enumerate(ky):
            t = h[j:j + th]
            if c != 1:
                t = t * c
            v = t if v is None else v + t
        if shift > 0:
            v = (v + half) >> shift
        if delta:
            v = v + delta
        if scale is not None:
            v = jnp.rint(v.astype(jnp.float32) * scale).astype(jnp.int32)
        return jnp.clip(v, lo, hi).astype(out_dtype)

    return compute


@functools.partial(
    jax.jit,
    static_argnames=("kx", "ky", "shift", "delta", "scale", "out_dtype",
                     "border", "border_value", "interpret", "th", "tw"))
def sep_filter_int(x, kx, ky, shift: int = 0, delta: int = 0,
                   scale=None, out_dtype=jnp.uint8,
                   border: int = K.BORDER_DEFAULT, border_value=0,
                   interpret: bool = False, th: int = _TH, tw: int = _TW):
    """x: (N,H,W,C) u8.  Separable integer correlation with the full
    finishing chain:  acc = Σ ky ⊗ kx · x  (int32);
    shift>0 → (acc + 2^(shift-1)) >> shift;  +delta;
    scale → rint(acc·scale);  saturate to out_dtype (u8 or i16).

    kx/ky: tuples of python ints (anchor = center)."""
    kx = tuple(int(v) for v in kx)
    ky = tuple(int(v) for v in ky)
    kw, kh = len(kx), len(ky)
    N, H, W, C = x.shape
    ax, ay = kw // 2, kh // 2
    out_dtype = jnp.dtype(out_dtype)
    info = np.iinfo(out_dtype)

    Wf = W * C
    Hp = _round_up(H, th)
    Wp = _round_up(Wf, tw)
    ih = th + _round_up(kh - 1, 8)
    iw = tw + _round_up((kw - 1) * C, 128)
    xf = _pad_for_tiles(x, kw, kh, ax, ay, border, border_value, ih, iw,
                        Hp, Wp, th=th, tw=tw)
    NI, NJ = Hp // th, Wp // tw

    compute = _mac_compute(kx, ky, C, shift, int(delta), scale,
                           info.min, info.max, out_dtype, th=th, tw=tw)
    out = _pallas_tiled(_scaffold(compute, ih, iw, NI, NJ,
                                  row_stride=th, col_stride=tw), xf,
                        N, NI, NJ, ih, iw, out_dtype,
                        interpret=interpret, th=th, tw=tw)(xf)
    return out[:, :H, :Wf].reshape(N, H, W, C)


def sep_filter_u8(x, kx, ky, shift: int,
                  border: int = K.BORDER_DEFAULT, border_value=0,
                  interpret: bool = False):
    """Back-compat wrapper: u8 → u8 separable Q·Q correlation
    `clip((Σ ky⊗kx · x + 2^(shift-1)) >> shift, 0, 255)`."""
    return sep_filter_int(x, tuple(int(v) for v in kx),
                          tuple(int(v) for v in ky), shift=shift,
                          out_dtype=jnp.uint8, border=border,
                          border_value=border_value, interpret=interpret)


# ---------------------------------------------------------------------------
# pyrDown kernel: stride-2 5-tap via tap-folded MXU matmuls
# ---------------------------------------------------------------------------

def _down2_compute():
    def compute(w, mx, my):
        # Exactness: the MXU rounds f32 inputs to bf16 at DEFAULT
        # precision.  First dot: inputs are u8 values (≤255, 8 mantissa
        # bits) and taps (≤6) — both bf16-exact, f32 accumulation ⇒
        # exact.  Second dot: h ≤ 4080 needs 12 bits ⇒ force HIGHEST
        # (bf16x3 ≅ f32) so the integer arithmetic stays bit-exact.
        # Accumulators: horizontal ≤ 4080, vertical ≤ 65280 < 2^24.
        # Mosaic has no direct u8->f32 cast; go through int32
        wf = w.astype(jnp.int32).astype(jnp.float32)
        h = jax.lax.dot_general(
            wf, mx[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        v = jax.lax.dot_general(
            my[:], h, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        out = jnp.floor((v + 128.0) * (1.0 / 256.0))
        # (f32 -> u8 must go through int32 on Mosaic)
        return jnp.clip(out, 0, 255).astype(jnp.int32).astype(jnp.uint8)

    return compute


@functools.partial(
    jax.jit, static_argnames=("border", "interpret"))
def pyr_down_u8(x, border: int = K.BORDER_DEFAULT,
                interpret: bool = False):
    """`cv::pyrDown` 8U: {1,4,6,4,1}⊗{1,4,6,4,1}/256 with 2:1 decimation
    (pyramids.cpp:488), REFLECT_101 default border, dst ((W+1)/2,(H+1)/2).

    The stride-2 taps become two tap-folded selection matmuls on the MXU
    (sub-16-bit strided slices are pathological on this hardware).  The
    output tile lane width must be a multiple of C so the selection
    matrix is pixel-phase-invariant across tiles (384 for C=3)."""
    N, H, W, C = x.shape
    dh, dw = (H + 1) // 2, (W + 1) // 2
    taps = (1, 4, 6, 4, 1)
    th = _TH
    # 256 (not the MAC kernels' 512): the (iw, tw) selection matrix must
    # stay VMEM-resident and its matmul cost grows with iw·tw — measured
    # 5.9 ms vs 12.3 ms at tw=512 for 1080p batch 32
    tw = 384 if C == 3 else 256

    Hp = _round_up(dh, th)
    Wp = _round_up(dw * C, tw)
    NI, NJ = Hp // th, Wp // tw
    ih = 2 * th + 8                       # rows 2r+j, j∈[0,5), r<th
    iw = 2 * tw + 128                     # lanes 2l+iC-c ≤ 2tw+3C-1
    Wf = W * C
    bt = border & ~K.BORDER_ISOLATED

    # border pad (2 each side) + tile alignment, folded into one concat
    # per axis; REFLECT index ranges are clamped to the image size
    from ..core.borders import _axis_pad, border_index
    rows_needed = (NI - 1) * 2 * th + ih
    pad_h_extra = rows_needed - (H + 2 + min(H - 1, 4))
    xp = _axis_pad(x, 2, min(H - 1, 4), 1, bt, H,
                   extra=max(0, pad_h_extra))
    xf = xp.reshape(N, xp.shape[1], Wf)
    cidx = border_index(W, 2, min(W - 1, 4), bt)
    ar = np.arange(C)
    left_idx = (cidx[:2, None] * C + ar).ravel()
    right_idx = (cidx[2 + W:, None] * C + ar).ravel()
    lanes_needed = (NJ - 1) * 2 * tw + iw
    extra_w = lanes_needed - (Wf + 2 * C + len(right_idx))
    right_idx = np.concatenate(
        [right_idx, np.full(max(0, extra_w), Wf - 1, np.int64)])
    parts = [jnp.take(xf, jnp.asarray(left_idx, jnp.int32), axis=2), xf,
             jnp.take(xf, jnp.asarray(right_idx, jnp.int32), axis=2)]
    xf = jnp.concatenate(parts, axis=2)

    # tap-folded selection matrices (host-built constants); output lane
    # l = j·C+c reads input lane (2j+i)·C+c
    mx = np.zeros((iw, tw), np.float32)
    for j in range(tw // C):
        for i, t in enumerate(taps):
            for c in range(C):
                r = (2 * j + i) * C + c
                if r < iw:
                    mx[r, j * C + c] = t
    my = np.zeros((th, ih), np.float32)
    for r in range(th):
        for j, t in enumerate(taps):
            my[r, 2 * r + j] = t

    kernel = _scaffold(_down2_compute(), ih, iw, NI, NJ,
                       row_stride=2 * th, col_stride=2 * tw)
    out = _pallas_tiled(kernel, xf, N, NI, NJ, ih, iw, jnp.uint8,
                        n_consts=2, interpret=interpret, th=th, tw=tw)(
        xf, jnp.asarray(mx), jnp.asarray(my))
    return out[:, :dh, :dw * C].reshape(N, dh, dw, C)


# ---------------------------------------------------------------------------
# dispatch registrations
# ---------------------------------------------------------------------------

def _vmem_ok(ctx):
    return (ctx.get("dtype") == "uint8" and ctx.get("kw", 99) <= 31
            and ctx.get("kh", 99) <= 31
            and 1 <= ctx.get("channels", 1) <= 4)


def _sep_pred(ctx):
    # VMEM budget: two (ih, iw) u8 windows + int32 intermediates
    return _vmem_ok(ctx) and ctx.get("shift", 0) >= 1


@register("sep_filter_u8", _sep_pred)
def _sep_filter_u8_kernel(ctx, x, kx, ky):
    return sep_filter_u8(x, tuple(int(v) for v in kx),
                         tuple(int(v) for v in ky), ctx["shift"],
                         border=ctx.get("border", K.BORDER_DEFAULT),
                         border_value=ctx.get("border_value", 0),
                         interpret=ctx.get("interpret", False))


def _sep_int_pred(ctx):
    if not _vmem_ok(ctx):
        return False
    # int32 accumulator headroom
    if ctx.get("max_abs_acc", 1 << 31) >= (1 << 31):
        return False
    return ctx.get("out") in ("uint8", "int16")


@register("sep_filter_int", _sep_int_pred)
def _sep_filter_int_kernel(ctx, x, kx, ky):
    return sep_filter_int(
        x, tuple(int(v) for v in kx), tuple(int(v) for v in ky),
        shift=ctx.get("shift", 0), delta=ctx.get("delta", 0),
        scale=ctx.get("scale"), out_dtype=ctx["out"],
        border=ctx.get("border", K.BORDER_DEFAULT),
        border_value=ctx.get("border_value", 0),
        interpret=ctx.get("interpret", False))


def _pyrdown_pred(ctx):
    return (ctx.get("dtype") == "uint8"
            and 1 <= ctx.get("channels", 1) <= 4
            and ctx.get("h", 0) >= 16 and ctx.get("w", 0) >= 16)


@register("pyr_down_u8", _pyrdown_pred)
def _pyr_down_u8_kernel(ctx, x):
    return pyr_down_u8(x, border=ctx.get("border", K.BORDER_DEFAULT),
                       interpret=ctx.get("interpret", False))
