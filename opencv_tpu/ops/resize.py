"""resize — all interpolation modes of `cv::resize` (imgproc/src/resize.cpp:4201).

TPU-native design: all coordinate/coefficient tables depend only on static
shapes, so they are computed **on the host in numpy** (double precision,
replicating the reference's table builders exactly) and baked into the
traced program as constants.  The device work is pure gathers along H and W
plus integer/float MACs — XLA fuses the per-axis passes; the fractional
INTER_AREA path becomes two dense matmuls (MXU).

Numeric contracts reproduced (SURVEY §8.4):
- coordinate rule ``fx = (float)((dx+0.5)*scale_x - 0.5)``, ``sx=floor(fx)``
  with linear edge resets (resize.cpp:4099-4123);
- INTER_LINEAR 8U: Q11 coeffs ``saturate_cast<short>(cbuf*2048)``
  (INTER_RESIZE_COEF_BITS=11); vertical pass exactly
  ``uchar((((b0*(S0>>4))>>16) + ((b1*(S1>>4))>>16) + 2) >> 2)``
  (VResizeLinearVec_32s8u, resize.cpp:1311);
- INTER_LINEAR_EXACT 8U: ufixedpoint16 Q8 weights from softdouble coords
  (`interpolationLinear::getCoeffs`, resize.cpp:789) with a single final
  round ``(v + 2^15) >> 16``;
- INTER_NEAREST_EXACT: Q16 integer center-aligned mapping
  (resizeNN_bitexact, resize.cpp:1267);
- INTER_AREA integer-ratio downscale: exact mean, 2x2 fast path
  ``(a+b+c+d+2)>>2`` (ResizeAreaFastVec, resize.cpp:2920+);
- INTER_AREA fractional: DecimateAlpha span tables
  (computeResizeAreaTab, resize.cpp:3334);
- cubic ``A=-0.75`` and Lanczos4 sin/cos table weights
  (interpolateCubic/interpolateLanczos4, resize.cpp:964,974).
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from .. import constants as K
from ..core.arrays import to_batched, from_batched
from ..core.fixedpoint import saturate_cast

__all__ = ["resize"]

COEF_BITS = 11
COEF_SCALE = 1 << COEF_BITS  # 2048


# --------------------------------------------------------------------------
# host-side coefficient builders
# --------------------------------------------------------------------------

def _interpolate_cubic(x32):
    """float32 bicubic weights, A=-0.75 (resize.cpp:964)."""
    A = np.float32(-0.75)
    x = x32.astype(np.float32)
    c0 = ((A * (x + 1) - 5 * A) * (x + 1) + 8 * A) * (x + 1) - 4 * A
    c1 = ((A + 2) * x - (A + 3)) * x * x + 1
    c2 = ((A + 2) * (1 - x) - (A + 3)) * (1 - x) * (1 - x) + 1
    c3 = np.float32(1.0) - c0 - c1 - c2
    return np.stack([c0, c1, c2, c3], axis=1)


def _interpolate_lanczos4(x32):
    """float32 Lanczos4 weights (resize.cpp:974)."""
    s45 = 0.70710678118654752440084436210485
    cs = np.array([[1, 0], [-s45, -s45], [0, 1], [s45, -s45],
                   [-1, 0], [s45, s45], [0, -1], [-s45, s45]])
    out = np.empty((len(x32), 8), np.float32)
    for n, xf in enumerate(x32):
        x = float(np.float32(xf))
        y0 = -(x + 3) * math.pi * 0.25
        s0, c0 = math.sin(y0), math.cos(y0)
        coeffs = np.empty(8, np.float32)
        ssum = np.float32(0)
        for i in range(8):
            y0_ = np.float32(x + 3 - i)
            if abs(y0_) >= 1e-6:
                y = -float(y0_) * math.pi * 0.25
                coeffs[i] = np.float32((cs[i][0] * s0 + cs[i][1] * c0) / (y * y))
            else:
                coeffs[i] = np.float32(1e30)
            ssum = np.float32(ssum + coeffs[i])
        inv = np.float32(1.0) / ssum
        out[n] = coeffs * inv
    return out


def _coords_linear(dst_n: int, src_n: int, scale: float, area_mode: bool,
                   inv_scale: float, edge_reset: bool = True):
    """sx / fx tables for ksize=2 modes.

    ``edge_reset`` applies the reference's X-direction border resets
    (resize.cpp:4112-4124).  The Y direction has NO such resets
    (resize.cpp:4155-4167) — out-of-range rows are clipped at fetch time
    (resizeGeneric_Invoker `clip(sy...)`), which changes the fixed-point
    rounding on edge rows; replicate exactly.
    """
    dxs = np.arange(dst_n)
    if not area_mode:
        fxd = ((dxs + 0.5) * scale - 0.5).astype(np.float32)
        sx = np.floor(fxd).astype(np.int64)
        fx = (fxd - sx).astype(np.float32)
    else:
        sx = np.floor(dxs * scale).astype(np.int64)
        fx = ((dxs + 1) - (sx + 1) * inv_scale).astype(np.float32)
        fx = np.where(fx <= 0, np.float32(0), fx - np.floor(fx))
    if edge_reset:
        neg = sx < 0
        fx[neg] = 0.0
        sx[neg] = 0
        hi = sx >= src_n - 1
        fx[hi] = 0.0
        sx[hi] = src_n - 1
    return sx, fx


def _coords_ksize(dst_n: int, src_n: int, scale: float, ksize: int):
    """sx / fx tables for cubic (ksize=4) / lanczos4 (ksize=8): no edge
    resets; taps are clamped at gather time (HResizeCubic border loop)."""
    dxs = np.arange(dst_n)
    fxd = ((dxs + 0.5) * scale - 0.5).astype(np.float32)
    sx = np.floor(fxd).astype(np.int64)
    fx = (fxd - sx).astype(np.float32)
    return sx, fx


def _q11(c):
    """saturate_cast<short>(c * 2048) with cvRound."""
    return np.clip(np.rint(c.astype(np.float64) * COEF_SCALE),
                   -32768, 32767).astype(np.int64)


# --------------------------------------------------------------------------
# device helpers
# --------------------------------------------------------------------------

_PHASE_Q_MAX = 32


def _phase_plan(idx, length):
    """Detect an interleaved arithmetic-progression structure in a host
    index vector: idx[d0 + k*q + r] == base_r + k*p_r for r in [0,q).

    Resize index tables are periodic in the output coordinate for any
    rational scale (sx = floor((d+0.5)*p/q - 0.5) steps by a fixed
    pattern with period q), so the device gather lowers to q strided
    slices — pure copies — instead of an XLA gather whose TPU cost is
    ~14ns per index.  Edge-clamped head/tail entries (resize.cpp
    :4112-4124 border resets) fall back to a small gather.

    Returns (q, d0, nd, bases, strides, head, tail) or None."""
    dw = len(idx)
    idx = np.asarray(idx, np.int64)
    for q in range(1, min(_PHASE_Q_MAX, max(1, dw // 4)) + 1):
        m = (dw // q) // 2                       # middle period anchor
        if (m + 2) * q > dw:
            continue
        strides = idx[(m + 1) * q:(m + 2) * q] - idx[m * q:(m + 1) * q]
        if np.any(strides < 0):
            continue
        k = np.arange(dw) // q - m
        pred = np.tile(idx[m * q:(m + 1) * q], dw // q + 1)[:dw] \
            + k * np.tile(strides, dw // q + 1)[:dw]
        # out-of-range entries go to the head/tail fallback gather (their
        # fallback uses clipped indices = the clamp semantics callers want)
        bad = np.nonzero((pred != idx) | (pred < 0) | (pred > length - 1))[0]
        if bad.size > 4 * q + 16:
            continue
        head = int(bad[bad < dw // 2].max() + 1) if np.any(bad < dw // 2) \
            else 0
        tail_lo = int(bad[bad >= dw // 2].min()) if np.any(bad >= dw // 2) \
            else dw
        if head >= tail_lo:
            continue
        d0 = head
        nd = (tail_lo - d0) // q
        if nd < 1:
            continue
        bases = idx[d0:d0 + q]
        strides = idx[d0 + q:d0 + 2 * q] - bases if nd > 1 else \
            np.zeros(q, np.int64)
        if bases.min() < 0 or (bases + strides * (nd - 1)).max() > length - 1:
            continue
        return (q, d0, int(nd), bases, strides, head, dw - (d0 + nd * q))
    return None


def _phase_gather(x, idx, axis):
    """Axis-aligned gather with host-constant indices; lowers to strided
    slices when the index vector is phase-decomposable (see above)."""
    length = x.shape[axis]
    idx = np.asarray(idx, np.int64)
    plan = _phase_plan(idx, length)
    cidx = np.clip(idx, 0, length - 1)
    if plan is None:
        return jnp.take(x, jnp.asarray(cidx, np.int32), axis=axis)
    q, d0, nd, bases, strides, head, tail = plan

    def axslice(start, stride, n):
        sl = [slice(None)] * x.ndim
        if stride == 0:
            sl[axis] = slice(start, start + 1)
            reps = [1] * x.ndim
            reps[axis] = n
            return jnp.tile(x[tuple(sl)], reps)
        sl[axis] = slice(start, start + stride * (n - 1) + 1, stride)
        return x[tuple(sl)]

    parts = [axslice(int(bases[r]), int(strides[r]), nd)
             for r in range(q)]
    if q == 1:
        mid = parts[0]
    else:
        mid = jnp.stack(parts, axis=axis + 1)
        shp = list(mid.shape)
        shp[axis:axis + 2] = [nd * q]
        mid = mid.reshape(shp)
    chunks = []
    if head:
        chunks.append(jnp.take(x, jnp.asarray(cidx[:head], np.int32),
                               axis=axis))
    chunks.append(mid)
    if tail:
        chunks.append(jnp.take(x, jnp.asarray(cidx[len(idx) - tail:],
                                              np.int32), axis=axis))
    return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks,
                                                              axis=axis)


def _gather_w(x, idx):
    return _phase_gather(x, idx, 2)


def _gather_h(x, idx):
    return _phase_gather(x, idx, 1)


def _col_const(v, dtype):
    """per-output-column constant, broadcast over (N,H,W,C): shape (1,1,W,1)."""
    return jnp.asarray(np.asarray(v), dtype).reshape(1, 1, -1, 1)


def _row_const(v, dtype):
    return jnp.asarray(np.asarray(v), dtype).reshape(1, -1, 1, 1)


# --------------------------------------------------------------------------
# mode implementations (batched NHWC)
# --------------------------------------------------------------------------

def _resize_nn(x, dw, dh):
    N, H, W, C = x.shape
    ifx, ify = W / dw, H / dh
    xo = np.minimum(np.floor(np.arange(dw) * ifx), W - 1).astype(np.int64)
    yo = np.minimum(np.floor(np.arange(dh) * ify), H - 1).astype(np.int64)
    return _gather_w(_gather_h(x, yo), xo)


def _resize_nn_exact(x, dw, dh):
    N, H, W, C = x.shape
    ifx = ((W << 16) + dw // 2) // dw
    ifx0 = ifx // 2 - W % 2
    ify = ((H << 16) + dh // 2) // dh
    ify0 = ify // 2 - H % 2
    xo = np.minimum((ifx * np.arange(dw) + ifx0) >> 16, W - 1)
    yo = np.minimum((ify * np.arange(dh) + ify0) >> 16, H - 1)
    return _gather_w(_gather_h(x, yo), xo)


def _resize_linear_u8(x, dw, dh, area_mode=False):
    """Bit-exact u8 INTER_LINEAR (Q11 + the >>4 SSE-compat vertical)."""
    N, H, W, C = x.shape
    sx, fx = _coords_linear(dw, W, W / dw, area_mode, dw / W)
    sy, fy = _coords_linear(dh, H, H / dh, area_mode, dh / H, edge_reset=False)
    ax0 = _q11(np.float32(1.0) - fx)
    ax1 = _q11(fx)
    by0 = _q11(np.float32(1.0) - fy)
    by1 = _q11(fy)

    xi = x.astype(jnp.int32)
    s0 = _gather_w(xi, sx)
    s1 = _gather_w(xi, sx + 1)
    hbuf = s0 * _col_const(ax0, jnp.int32) + s1 * _col_const(ax1, jnp.int32)

    h0 = _gather_h(hbuf, sy)
    h1 = _gather_h(hbuf, sy + 1)
    b0 = _row_const(by0, jnp.int32)
    b1 = _row_const(by1, jnp.int32)
    v = (((b0 * (h0 >> 4)) >> 16) + ((b1 * (h1 >> 4)) >> 16) + 2) >> 2
    return jnp.clip(v, 0, 255).astype(jnp.uint8)


def _resize_linear_float(x, dw, dh, out_dtype, area_mode=False):
    N, H, W, C = x.shape
    sx, fx = _coords_linear(dw, W, W / dw, area_mode, dw / W)
    sy, fy = _coords_linear(dh, H, H / dh, area_mode, dh / H, edge_reset=False)
    xf = x.astype(jnp.float32)
    s0 = _gather_w(xf, sx)
    s1 = _gather_w(xf, sx + 1)
    h = s0 * _col_const(1.0 - fx, jnp.float32) + s1 * _col_const(fx, jnp.float32)
    h0 = _gather_h(h, sy)
    h1 = _gather_h(h, sy + 1)
    v = h0 * _row_const(1.0 - fy, jnp.float32) + h1 * _row_const(fy, jnp.float32)
    return saturate_cast(v, out_dtype)


def _resize_linear_exact_u8(x, dw, dh):
    """INTER_LINEAR_EXACT for u8: ufixedpoint16 Q8 weights, one final round
    (resize.cpp:789 interpolationLinear + fixedpoint.inl.hpp)."""
    N, H, W, C = x.shape

    def coeffs(dst_n, src_n):
        scale = src_n / dst_n  # softdouble(1/inv_scale) == double division
        off = np.zeros(dst_n, np.int64)
        c1 = np.zeros(dst_n, np.int64)  # Q8 weight of tap+1
        lo_repl = np.zeros(dst_n, bool)  # replicate first pixel
        hi_repl = np.zeros(dst_n, bool)  # replicate last pixel
        for v in range(dst_n):
            fval = scale * (v + 0.5) - 0.5
            ival = math.floor(fval)
            if ival >= 0 and src_n > 1:
                if ival < src_n - 1:
                    off[v] = ival
                    c1[v] = int(np.rint((fval - ival) * 256))  # cvRound64 Q8
                else:
                    off[v] = src_n - 1
                    hi_repl[v] = True
            else:
                lo_repl[v] = True
        return off, c1, lo_repl, hi_repl

    xo, xc1, xlo, xhi = coeffs(dw, W)
    yo, yc1, ylo, yhi = coeffs(dh, H)
    xo = np.where(xlo, 0, xo)
    yo = np.where(ylo, 0, yo)
    xc1 = np.where(xlo | xhi, 0, xc1)
    yc1 = np.where(ylo | yhi, 0, yc1)
    xc0 = 256 - xc1
    yc0 = 256 - yc1

    xi = x.astype(jnp.int32)
    s0 = _gather_w(xi, xo)
    s1 = _gather_w(xi, xo + 1)
    h = s0 * _col_const(xc0, jnp.int32) + s1 * _col_const(xc1, jnp.int32)
    h0 = _gather_h(h, yo)
    h1 = _gather_h(h, yo + 1)
    v = h0 * _row_const(yc0, jnp.int32) + h1 * _row_const(yc1, jnp.int32)
    out = (v + (1 << 15)) >> 16
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def _resize_ksize(x, dw, dh, ksize, out_dtype):
    """Cubic (ksize=4) / Lanczos4 (ksize=8), all dtypes.

    u8 uses Q11 short coeffs horizontally (int32 accum); vertical is
    integer Q22: `(v + 2^21) >> 22` (FixedPtCast<int,uchar,22>), for
    BOTH cubic and lanczos.  The reference's cubic vertical is float32
    betas + rint (VResizeCubicVec_32s8u); the integer form differs from
    it only on f32 rounding ties (~1e-4 of pixels) but is bit-identical
    across backends (CPU/TPU), which the on-TPU tier contract requires
    (tests/test_tpu.py: 99.9% exact).  Worst-case |v| for A=-0.75 is
    255*2048^2*1.375^2 = 2.02e9 < 2^31, so int32 accumulation is safe.
    Other dtypes are float32 end-to-end.
    """
    N, H, W, C = x.shape
    interp = _interpolate_cubic if ksize == 4 else _interpolate_lanczos4
    sx, fx = _coords_ksize(dw, W, W / dw, ksize)
    sy, fy = _coords_ksize(dh, H, H / dh, ksize)
    cx = interp(fx)  # (dw, ksize) float32
    cy = interp(fy)
    k2 = ksize // 2
    is_u8 = x.dtype == jnp.uint8

    if is_u8:
        xi = x.astype(jnp.int32)
        axq = _q11(cx)
        h = None
        for j in range(ksize):
            t = _gather_w(xi, sx - (k2 - 1) + j) * _col_const(axq[:, j], jnp.int32)
            h = t if h is None else h + t
        byq = _q11(cy)
        v = None
        for j in range(ksize):
            t = _gather_h(h, sy - (k2 - 1) + j) * _row_const(byq[:, j], jnp.int32)
            v = t if v is None else v + t
        out = (v + (1 << 21)) >> 22
        return jnp.clip(out, 0, 255).astype(jnp.uint8)

    xf = x.astype(jnp.float32)
    h = None
    for j in range(ksize):
        t = _gather_w(xf, sx - (k2 - 1) + j) * _col_const(cx[:, j], jnp.float32)
        h = t if h is None else h + t
    v = None
    for j in range(ksize):
        t = _gather_h(h, sy - (k2 - 1) + j) * _row_const(cy[:, j], jnp.float32)
        v = t if v is None else v + t
    return saturate_cast(v, out_dtype)


def _area_tab(ssize, dsize, scale):
    """computeResizeAreaTab (resize.cpp:3334) as a dense (dsize, ssize)
    float32 matrix."""
    A = np.zeros((dsize, ssize), np.float32)
    for dx in range(dsize):
        fsx1 = dx * scale
        fsx2 = fsx1 + scale
        cell = min(scale, ssize - fsx1)
        sx1 = math.ceil(fsx1)
        sx2 = math.floor(fsx2)
        sx2 = min(sx2, ssize - 1)
        sx1 = min(sx1, sx2)
        if sx1 - fsx1 > 1e-3:
            A[dx, sx1 - 1] = np.float32((sx1 - fsx1) / cell)
        for sxi in range(sx1, sx2):
            A[dx, sxi] = np.float32(1.0 / cell)
        if fsx2 - sx2 > 1e-3:
            A[dx, sx2] = np.float32(min(min(fsx2 - sx2, 1.0), cell) / cell)
    return A


def _resize_area(x, dw, dh, out_dtype):
    N, H, W, C = x.shape
    scale_x, scale_y = W / dw, H / dh
    iscale_x, iscale_y = int(round(scale_x)), int(round(scale_y))
    is_fast = (abs(scale_x - iscale_x) < np.finfo(float).eps
               and abs(scale_y - iscale_y) < np.finfo(float).eps)
    if is_fast:
        return _resize_area_fast(x, dw, dh, iscale_x, iscale_y, out_dtype)
    # fractional decimation: two dense matmuls (MXU) in float32
    Ax = _area_tab(W, dw, scale_x)
    Ay = _area_tab(H, dh, scale_y)
    xf = x.astype(jnp.float32)
    # horizontal: (N,H,W,C) x (dw,W)^T  → (N,H,dw,C)
    h = jnp.einsum("nhwc,dw->nhdc", xf, jnp.asarray(Ax),
                   preferred_element_type=jnp.float32, precision="highest")
    v = jnp.einsum("nhdc,eh->nedc", h, jnp.asarray(Ay),
                   preferred_element_type=jnp.float32, precision="highest")
    return saturate_cast(v, out_dtype)


def _resize_area_fast(x, dw, dh, sx, sy, out_dtype):
    """Integer-ratio AREA: exact mean over sx×sy blocks
    (resizeAreaFast_Invoker, resize.cpp:2975).

    TPU layout note: the divisible case accumulates via strided slices —
    H-strides directly on u8 (cheap) and W-strides only after widening
    (sub-16-bit lane strides are pathological on the VPU), which measures
    ~5x faster than a blocked-reshape reduction."""
    N, H, W, C = x.shape
    if W % sx == 0 and H % sy == 0:
        if x.dtype == jnp.uint8 and sx * sy <= 128:
            adt = jnp.int16
        elif x.dtype.kind in "ui":
            adt = jnp.int32
        else:
            adt = jnp.float32
        a = x[:, 0::sy].astype(adt)
        for r in range(1, sy):
            a = a + x[:, r::sy].astype(adt)
        ssum = a[:, :, 0::sx]
        for c in range(1, sx):
            ssum = ssum + a[:, :, c::sx]
        if x.dtype == jnp.uint8 and sx == 2 and sy == 2:
            return ((ssum + 2) >> 2).astype(out_dtype)
        if x.dtype.kind in "ui":
            v = jnp.rint(ssum.astype(jnp.float32)
                         * jnp.float32(1.0 / (sx * sy)))
            return saturate_cast(v, out_dtype)
        return saturate_cast(ssum * jnp.float32(1.0 / (sx * sy)),
                             out_dtype)
    # pad so the reshape covers dw*sx, dh*sy (partial windows masked below)
    ph, pw = dh * sy, dw * sx
    xpad = jnp.pad(x.astype(jnp.int32 if x.dtype.kind in "ui" else jnp.float32),
                   ((0, 0), (0, max(0, ph - H)), (0, max(0, pw - W)), (0, 0)))
    xpad = xpad[:, :ph, :pw, :]
    blocks = xpad.reshape(N, dh, sy, dw, sx, C)
    ssum = blocks.sum(axis=(2, 4))
    # count of in-range pixels per output cell
    incol = np.minimum(np.maximum(W - np.arange(dw) * sx, 0), sx)
    inrow = np.minimum(np.maximum(H - np.arange(dh) * sy, 0), sy)
    counts = inrow[:, None] * incol[None, :]
    full = counts == sx * sy
    if x.dtype == jnp.uint8 and sx == 2 and sy == 2:
        out_full = (ssum + 2) >> 2
    elif x.dtype.kind in "ui":
        out_full = jnp.clip(jnp.rint(ssum.astype(jnp.float32)
                                     * jnp.float32(1.0 / (sx * sy))), 0, None)
    else:
        out_full = ssum * jnp.float32(1.0 / (sx * sy))
    counts_safe = np.where(counts == 0, 1, counts)
    partial = ssum.astype(jnp.float32) / jnp.asarray(
        counts_safe[None, :, :, None], jnp.float32)
    sel = jnp.asarray(full[None, :, :, None])
    zero_mask = jnp.asarray((counts == 0)[None, :, :, None])
    v = jnp.where(sel, out_full.astype(jnp.float32), partial)
    v = jnp.where(zero_mask, 0.0, v)
    return saturate_cast(v, out_dtype)


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------

def resize(src, dsize, fx: float = 0.0, fy: float = 0.0,
           interpolation: int = K.INTER_LINEAR):
    """cv2-compatible resize. ``dsize`` is (width, height) or None."""
    x, meta = to_batched(src)
    N, H, W, C = x.shape
    if dsize is None or dsize == (0, 0) or dsize == 0:
        if fx <= 0 or fy <= 0:
            raise ValueError("dsize or fx/fy required")
        dw = int(np.rint(W * fx))
        dh = int(np.rint(H * fy))
    else:
        dw, dh = int(dsize[0]), int(dsize[1])
        if dw == 0 or dh == 0:
            raise ValueError("empty dsize")
    if dw == W and dh == H:
        return from_batched(x, meta)

    interp = interpolation
    scale_x, scale_y = W / dw, H / dh

    if interp == K.INTER_NEAREST:
        y = _resize_nn(x, dw, dh)
        return from_batched(y, meta)
    if interp == K.INTER_NEAREST_EXACT:
        y = _resize_nn_exact(x, dw, dh)
        return from_batched(y, meta)
    if interp == K.INTER_LINEAR_EXACT:
        if x.dtype == jnp.uint8:
            y = _resize_linear_exact_u8(x, dw, dh)
            return from_batched(y, meta)
        interp = K.INTER_LINEAR  # u16/f32: float path (documented tolerance)

    iscale_x, iscale_y = int(round(scale_x)), int(round(scale_y))
    is_area_fast = (abs(scale_x - iscale_x) < np.finfo(float).eps
                    and abs(scale_y - iscale_y) < np.finfo(float).eps)

    # 2x2 INTER_LINEAR downscale is silently rerouted to fast AREA
    # (resize.cpp:4010-4012)
    if interp == K.INTER_LINEAR and is_area_fast and iscale_x == 2 and iscale_y == 2:
        interp = K.INTER_AREA

    if interp == K.INTER_AREA:
        if scale_x >= 1 and scale_y >= 1:
            y = _resize_area(x, dw, dh, x.dtype)
            return from_batched(y, meta)
        # upscale AREA emulated by bilinear with area coords (resize.cpp:4106)
        if x.dtype == jnp.uint8:
            y = _resize_linear_u8(x, dw, dh, area_mode=True)
        else:
            y = _resize_linear_float(x, dw, dh, x.dtype, area_mode=True)
        return from_batched(y, meta)

    if interp == K.INTER_LINEAR:
        if x.dtype == jnp.uint8:
            y = _resize_linear_u8(x, dw, dh)
        else:
            y = _resize_linear_float(x, dw, dh, x.dtype)
        return from_batched(y, meta)

    if interp == K.INTER_CUBIC:
        y = _resize_ksize(x, dw, dh, 4, x.dtype)
        return from_batched(y, meta)
    if interp == K.INTER_LANCZOS4:
        y = _resize_ksize(x, dw, dh, 8, x.dtype)
        return from_batched(y, meta)

    raise ValueError(f"unknown interpolation {interpolation}")
