"""Filtering family: GaussianBlur, sepFilter2D, filter2D, blur/boxFilter.

TPU-native design
-----------------
The reference streams rows through a ring-buffered `FilterEngine`
(`imgproc/src/filterengine.hpp:214`) because CPU caches are small.  On TPU a
whole image batch fits in HBM, so filtering is expressed as padded
shifted-window multiply-accumulates over the full `(N, H, W, C)` array —
XLA fuses the k taps into a handful of vector passes, and batch replaces the
reference's `parallel_for_` row-striping as the parallel axis.  float paths
additionally route through `lax.conv_general_dilated` so large kernels land
on the MXU.

Bit-exact contracts reproduced (SURVEY §8.2, §8.3):

- Gaussian kernels are generated in IEEE double precision like the
  reference's softdouble path (`smooth.dispatch.cpp:81`
  `getGaussianKernelBitExact`) and quantized to Q8 with error-diffusion
  rounding and exact-sum center correction
  (`getGaussianKernelFixedPoint_ED`, `smooth.dispatch.cpp:224-258`).
- The u8 apply is the separable Q8·Q8 MAC in int32 lanes with a single
  final round `(v + 2^15) >> 16` and saturation, matching the evaluator in
  `imgproc/test/test_smooth_bitexact.cpp:38-50`.
- Auto kernel size: `cvRound(sigma*(depth==8U?3:4)*2+1) | 1`
  (`smooth.dispatch.cpp:290-293`).
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp
from jax import lax

from .. import constants as K
from ..core.arrays import to_batched, from_batched
from ..core.borders import pad_nhwc
from ..core.fixedpoint import saturate_cast

__all__ = [
    "getGaussianKernel",
    "GaussianBlur",
    "sepFilter2D",
    "filter2D",
    "blur",
    "boxFilter",
    "sqrBoxFilter",
]


# --------------------------------------------------------------------------
# Kernel generation (host, numpy float64 == IEEE double == softdouble)
# --------------------------------------------------------------------------

def _fma(a, b, c):
    try:
        return math.fma(a, b, c)
    except AttributeError:  # pragma: no cover - python < 3.13
        return a * b + c


def gaussian_kernel_bitexact(n: int, sigma: float) -> np.ndarray:
    """Float64 Gaussian kernel, replicating `getGaussianKernelBitExact`
    (smooth.dispatch.cpp:81).  softdouble is bit-exact IEEE-754 double, so
    host float64 reproduces it."""
    if sigma <= 0:
        if n == 1:
            return np.array([1.0])
        if n == 3:
            return np.array([0.25, 0.5, 0.25])
        if n == 5:
            return np.array([0.0625, 0.25, 0.375, 0.25, 0.0625])
        if n == 7:
            return np.array([0.03125, 0.109375, 0.21875, 0.28125,
                             0.21875, 0.109375, 0.03125])
        if n == 9:
            return np.array([4, 13, 30, 51, 60, 51, 30, 13, 4]) / 256.0
    sigma_x = float(sigma) if sigma > 0 else _fma(float(n), 0.15, 0.35)
    scale2x = -0.125 / (sigma_x * sigma_x)
    n2 = (n - 1) // 2
    vals = np.empty(n2, np.float64)
    s = 0.0
    x = 1 - n
    for i in range(n2):
        t = math.exp(float(x * x) * scale2x)
        vals[i] = t
        s += t
        x += 2
    s *= 2.0
    s += 1.0
    if n % 2 == 0:
        s += 1.0
    mul1 = 1.0 / s
    out = np.empty(n, np.float64)
    for i in range(n2):
        out[i] = out[n - 1 - i] = vals[i] * mul1
    out[n2] = mul1
    if n % 2 == 0:
        out[n2 + 1] = mul1
    return out


def gaussian_kernel_fixedpoint_ed(kernel: np.ndarray, fraction_bits: int) -> np.ndarray:
    """Error-diffusion fixed-point quantization with exact-sum center
    correction (`getGaussianKernelFixedPoint_ED`, smooth.dispatch.cpp:224)."""
    n = len(kernel)
    assert n % 2 == 1
    mult = 1 << fraction_bits
    out = np.zeros(n, np.int64)
    n2 = n // 2
    err = 0.0
    total = 0
    for i in range(n2):
        adj = kernel[i] * mult + err
        v0 = int(np.rint(adj))  # cvRound == round-half-even
        err = adj - v0
        out[i] = out[n - 1 - i] = v0
        total += v0
    out[n2] = mult - 2 * total
    return out


def getGaussianKernel(ksize: int, sigma: float, ktype=np.float64):
    """cv2-compatible `getGaussianKernel` — returns an (n, 1) numpy array."""
    k = gaussian_kernel_bitexact(ksize, sigma)
    dt = np.dtype(ktype) if not isinstance(ktype, int) else (
        np.float32 if ktype == K.CV_32F else np.float64)
    return k.astype(dt).reshape(-1, 1)


def _auto_ksize(sigma: float, depth_is_8u: bool) -> int:
    mult = 3 if depth_is_8u else 4
    return int(np.rint(sigma * mult * 2 + 1)) | 1


# --------------------------------------------------------------------------
# Separable correlation cores (device)
# --------------------------------------------------------------------------

def _sep_correlate_int(x, kx, ky, border_type, border_value=0):
    """Bit-exact separable correlate: int32 lanes, no intermediate rounding.

    x: (N,H,W,C) unsigned int array; kx/ky: int taps (anchor = center).
    Returns int32 (N,H,W,C) un-rounded accumulator (Q(2*shift))."""
    kw, kh = len(kx), len(ky)
    ax, ay = kw // 2, kh // 2
    xp = pad_nhwc(x, ay, kh - 1 - ay, ax, kw - 1 - ax, border_type, border_value)
    xi = xp.astype(jnp.int32)
    W = x.shape[2]
    h = None
    for i, c in enumerate(kx):
        term = xi[:, :, i:i + W, :] * int(c)
        h = term if h is None else h + term
    H = x.shape[1]
    v = None
    for j, c in enumerate(ky):
        term = h[:, j:j + H, :, :] * int(c)
        v = term if v is None else v + term
    return v


def _sep_correlate_float(x, kx, ky, border_type, border_value=0, dtype=jnp.float32):
    """Separable correlate in float; returns float (N,H,W,C)."""
    kw, kh = len(kx), len(ky)
    ax, ay = kw // 2, kh // 2
    xp = pad_nhwc(x, ay, kh - 1 - ay, ax, kw - 1 - ax, border_type, border_value)
    xf = xp.astype(dtype)
    W = x.shape[2]
    h = None
    for i, c in enumerate(kx):
        term = xf[:, :, i:i + W, :] * jnp.asarray(float(c), dtype)
        h = term if h is None else h + term
    H = x.shape[1]
    v = None
    for j, c in enumerate(ky):
        term = h[:, j:j + H, :, :] * jnp.asarray(float(c), dtype)
        v = term if v is None else v + term
    return v


def _correlate2d_float(x, kernel, anchor, border_type, border_value=0,
                       dtype=jnp.float32):
    """Dense 2-D correlation via lax.conv (depthwise, MXU-friendly)."""
    kh, kw = kernel.shape
    ax = kw // 2 if anchor[0] < 0 else anchor[0]
    ay = kh // 2 if anchor[1] < 0 else anchor[1]
    xp = pad_nhwc(x, ay, kh - 1 - ay, ax, kw - 1 - ax, border_type, border_value)
    xf = xp.astype(dtype)
    C = x.shape[3]
    k = jnp.asarray(np.asarray(kernel, np.float64), dtype)
    # depthwise correlation: HWIO with feature_group_count=C
    kd = jnp.tile(k[:, :, None, None], (1, 1, 1, C))
    return lax.conv_general_dilated(
        xf, kd, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
        preferred_element_type=dtype,
        precision=lax.Precision.HIGHEST,
    )


def _correlate2d_fft(x, kernel, anchor, border_type, border_value=0):
    """Dense 2-D correlation via rfft2 for large kernels (`dftFilter2D`,
    filter.dispatch.cpp:1274).  The border is applied spatially first, so
    the circular wrap of the FFT never touches real data."""
    kh, kw = kernel.shape
    ax = kw // 2 if anchor[0] < 0 else anchor[0]
    ay = kh // 2 if anchor[1] < 0 else anchor[1]
    xp = pad_nhwc(x, ay, kh - 1 - ay, ax, kw - 1 - ax, border_type,
                  border_value)
    xf = xp.astype(jnp.float32)
    N, Hp, Wp, C = xf.shape
    H, W = x.shape[1], x.shape[2]
    kpad = np.zeros((Hp, Wp), np.float32)
    kpad[:kh, :kw] = np.asarray(kernel, np.float64)
    Xf = jnp.fft.rfft2(xf, axes=(1, 2))
    Kf = jnp.asarray(np.conj(np.fft.rfft2(kpad)), jnp.complex64)
    out = jnp.fft.irfft2(Xf * Kf[None, :, :, None], s=(Hp, Wp),
                         axes=(1, 2))
    return out[:, :H, :W, :]


# --------------------------------------------------------------------------
# GaussianBlur
# --------------------------------------------------------------------------

def GaussianBlur(src, ksize, sigmaX: float, sigmaY: float = 0.0,
                 borderType: int = K.BORDER_DEFAULT,
                 hint: int = K.ALGO_HINT_DEFAULT):
    """Gaussian smoothing, mirroring `cv::GaussianBlur`
    (imgproc/src/smooth.dispatch.cpp:609).

    u8 inputs take the bit-exact Q8 fixed-point path (default hint); other
    dtypes use float32 separable filtering.
    """
    x, meta = to_batched(src)
    kw, kh = (ksize if ksize is not None else (0, 0))
    if sigmaY <= 0:
        sigmaY = sigmaX
    is_8u = x.dtype == jnp.uint8
    if kw <= 0 and sigmaX > 0:
        kw = _auto_ksize(sigmaX, is_8u)
    if kh <= 0 and sigmaY > 0:
        kh = _auto_ksize(sigmaY, is_8u)
    if not (kw > 0 and kw % 2 == 1 and kh > 0 and kh % 2 == 1):
        raise ValueError(f"invalid ksize {(kw, kh)}")
    sigmaX = max(sigmaX, 0.0)
    sigmaY = max(sigmaY, 0.0)

    kxf = gaussian_kernel_bitexact(kw, sigmaX)
    kyf = (kxf if (kh == kw and abs(sigmaX - sigmaY) <= np.finfo(np.float64).eps)
           else gaussian_kernel_bitexact(kh, sigmaY))

    if is_8u and hint in (K.ALGO_HINT_DEFAULT, K.ALGO_HINT_ACCURATE):
        bits = 8
        kx = gaussian_kernel_fixedpoint_ed(kxf, bits)
        ky = (kx if kyf is kxf else gaussian_kernel_fixedpoint_ed(kyf, bits))
        # dispatch ladder (CALL_HAL analogue): fused Pallas kernel when
        # registered for this (dtype, ksize, border), else composed XLA
        from ..core.dispatch import lookup
        kern = lookup("sep_filter_u8", dtype="uint8", kw=kw, kh=kh,
                      channels=x.shape[3], border=borderType,
                      shift=2 * bits)
        if kern is not None:
            y = kern(x, kx, ky)
        else:
            acc = _sep_correlate_int(x, kx, ky, borderType)
            out = (acc + (1 << (2 * bits - 1))) >> (2 * bits)
            y = saturate_cast(out, x.dtype)
    else:
        acc = _sep_correlate_float(x, kxf, kyf, borderType)
        y = saturate_cast(acc, x.dtype) if x.dtype.kind in "ui" else acc.astype(x.dtype)
    return from_batched(y, meta)


# --------------------------------------------------------------------------
# sepFilter2D / filter2D
# --------------------------------------------------------------------------

def _as_1d(k):
    a = np.asarray(k, np.float64).reshape(-1)
    return a


_DEPTH_TO_DTYPE = {
    -1: None,
    K.CV_8U: jnp.uint8,
    K.CV_16U: jnp.uint16,
    K.CV_16S: jnp.int16,
    K.CV_32F: jnp.float32,
    K.CV_64F: jnp.float32,  # TPU has no f64; documented departure
}


def _resolve_ddepth(src_dtype, ddepth):
    if ddepth in (-1, None):
        return src_dtype
    dt = _DEPTH_TO_DTYPE.get(ddepth)
    if dt is None:
        raise ValueError(f"unsupported ddepth {ddepth}")
    return jnp.dtype(dt)


def sepFilter2D(src, ddepth, kernelX, kernelY, anchor=(-1, -1), delta=0.0,
                borderType: int = K.BORDER_DEFAULT):
    """Separable filtering (`cv::sepFilter2D`, filter.dispatch.cpp).

    u8→u8/16S with integer-representable behavior uses the reference's
    bit-exact scheme: 1-D kernels quantized to Q8 (`convertTo(CV_32S, 1<<8)`
    via rounding, filter.dispatch.cpp:288-296), int32 accumulation, final
    `(v + 2^15) >> 16` (FixedPtCast bits=16).  Float kernels that don't
    round-trip exactly fall back to float32 accumulation (tolerance anchor:
    perf sanity eps=1, perf_filter2d.cpp:39).
    """
    x, meta = to_batched(src)
    out_dtype = _resolve_ddepth(x.dtype, ddepth)
    kx = _as_1d(kernelX)
    ky = _as_1d(kernelY)

    if (x.dtype == jnp.uint8 and out_dtype in (jnp.dtype(jnp.uint8), jnp.dtype(jnp.int16))
            and delta == int(delta)):
        from ..core.dispatch import lookup

        def _int_path(kxi, kyi, shift):
            # dispatch ladder (CALL_HAL analogue): fused Pallas kernel
            # when registered for this config, else composed XLA
            max_abs = (int(np.abs(kxi).sum()) * int(np.abs(kyi).sum()) * 255
                       + abs(int(delta)))
            kern = lookup("sep_filter_int", dtype="uint8",
                          kw=len(kxi), kh=len(kyi),
                          channels=x.shape[3], border=borderType,
                          shift=shift, delta=int(delta),
                          out=out_dtype.name, max_abs_acc=max_abs)
            if kern is not None:
                return kern(x, tuple(int(v) for v in kxi),
                            tuple(int(v) for v in kyi))
            acc = _sep_correlate_int(x, kxi, kyi, borderType)
            if shift:
                acc = (acc + (1 << (shift - 1))) >> shift
            return saturate_cast(acc + int(delta), out_dtype)

        # integer kernels (Sobel/Scharr/derivs): exact int32 MAC, no shift
        kxi = np.rint(kx).astype(np.int64)
        kyi = np.rint(ky).astype(np.int64)
        if np.all(kxi == kx) and np.all(kyi == ky):
            return from_batched(_int_path(kxi, kyi, 0), meta)
        # fractional kernels: bit-exact Q8 scheme mirroring
        # filter.dispatch.cpp:332-362 (validity check incl.)
        bits = 8
        kxq = np.rint(kx * (1 << bits)).astype(np.int64)
        kyq = np.rint(ky * (1 << bits)).astype(np.int64)
        eps = 10 * np.finfo(np.float32).eps * (1 << bits)
        if (np.all(np.abs(kxq - kx * (1 << bits)) <= eps)
                and np.all(np.abs(kyq - ky * (1 << bits)) <= eps)):
            return from_batched(_int_path(kxq, kyq, 2 * bits), meta)

    acc = _sep_correlate_float(x, kx, ky, borderType)
    acc = acc + jnp.asarray(delta, acc.dtype)
    y = saturate_cast(acc, out_dtype)
    return from_batched(y, meta)


def filter2D(src, ddepth, kernel, anchor=(-1, -1), delta=0.0,
             borderType: int = K.BORDER_DEFAULT):
    """Dense 2-D correlation (`cv::filter2D`, filter.dispatch.cpp:1425).

    Always accumulates in float (the reference's non-separable fixed-point
    path is disabled, filter.simd.hpp:3190-3200), so integer outputs carry
    the same ±1 tolerance contract as the reference.
    """
    x, meta = to_batched(src)
    out_dtype = _resolve_ddepth(x.dtype, ddepth)
    kern = np.asarray(kernel, np.float64)
    if kern.ndim == 1:
        kern = kern[None, :]
    # large kernels go through DFT like the reference (dftFilter2D,
    # filter.dispatch.cpp:1274; crossover :1288 — 130 for 8U->8U/16S,
    # 50 otherwise; both paths share the float tolerance contract)
    dft_size = 130 if (x.dtype == jnp.uint8
                       and out_dtype in (jnp.uint8, jnp.int16)) else 50
    if kern.shape[0] * kern.shape[1] >= dft_size:
        acc = _correlate2d_fft(x, kern, anchor, borderType)
    else:
        acc = _correlate2d_float(x, kern, anchor, borderType)
    acc = acc + jnp.asarray(delta, acc.dtype)
    y = saturate_cast(acc, out_dtype)
    return from_batched(y, meta)


# --------------------------------------------------------------------------
# Box filters
# --------------------------------------------------------------------------

def _box_sum_int(x, ksize, anchor, border_type):
    """Integer box sum (int32), exact.

    Small kernels use separable static shift-adds (XLA fuses the k
    offset reads into ~one pass); large kernels use the cumsum sliding
    window, whose two scans are O(1) in taps but cost ~4 full passes —
    the crossover on TPU is around k=16 per axis."""
    kw, kh = ksize
    ax = kw // 2 if anchor[0] < 0 else anchor[0]
    ay = kh // 2 if anchor[1] < 0 else anchor[1]
    xp = pad_nhwc(x, ay, kh - 1 - ay, ax, kw - 1 - ax, border_type)
    xi = xp.astype(jnp.int32)
    W = x.shape[2]
    H = x.shape[1]
    if kw <= 16 and kh <= 16:
        h = xi[:, :, 0:W, :]
        for i in range(1, kw):
            h = h + xi[:, :, i:i + W, :]
        v = h[:, 0:H]
        for j in range(1, kh):
            v = v + h[:, j:j + H]
        return v
    ch = jnp.cumsum(xi, axis=2)
    h = ch[:, :, kw - 1:kw - 1 + W, :] - jnp.pad(ch, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :W, :]
    cv = jnp.cumsum(h, axis=1)
    v = cv[:, kh - 1:kh - 1 + H, :, :] - jnp.pad(cv, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :H, :, :]
    return v


def boxFilter(src, ddepth, ksize, anchor=(-1, -1), normalize: bool = True,
              borderType: int = K.BORDER_DEFAULT):
    """`cv::boxFilter` (box_filter.dispatch.cpp): sliding-window sum with
    optional 1/(kw*kh) normalization; u8 sums in int32, normalization rounds
    like `saturate_cast<T>(sum*scale)`."""
    x, meta = to_batched(src)
    out_dtype = _resolve_ddepth(x.dtype, ddepth)
    kw, kh = ksize
    if x.dtype.kind in "ui":
        ax = kw // 2 if anchor[0] < 0 else anchor[0]
        ay = kh // 2 if anchor[1] < 0 else anchor[1]
        if (x.dtype == jnp.uint8 and (ax, ay) == (kw // 2, kh // 2)):
            # dispatch ladder: fused Pallas kernel (sum + normalize in
            # one VMEM pass) when registered
            from ..core.dispatch import lookup
            kern = lookup("sep_filter_int", dtype="uint8", kw=kw, kh=kh,
                          channels=x.shape[3], border=borderType,
                          shift=0, delta=0,
                          scale=(1.0 / (kw * kh)) if normalize else None,
                          out=jnp.dtype(out_dtype).name,
                          max_abs_acc=kw * kh * 255)
            if kern is not None:
                y = kern(x, (1,) * kw, (1,) * kh)
                return from_batched(y, meta)
        s = _box_sum_int(x, ksize, anchor, borderType)
        if normalize:
            scale = 1.0 / (kw * kh)
            y = saturate_cast(s.astype(jnp.float32) * jnp.float32(scale), out_dtype)
        else:
            y = saturate_cast(s, out_dtype)
    else:
        kx = np.ones(kw, np.float64)
        ky = np.ones(kh, np.float64)
        s = _sep_correlate_float(x, kx, ky, borderType)
        if normalize:
            s = s * jnp.asarray(1.0 / (kw * kh), s.dtype)
        y = saturate_cast(s, out_dtype)
    return from_batched(y, meta)


def blur(src, ksize, anchor=(-1, -1), borderType: int = K.BORDER_DEFAULT):
    """`cv::blur` == normalized boxFilter with ddepth=-1."""
    return boxFilter(src, -1, ksize, anchor=anchor, normalize=True,
                     borderType=borderType)


def sqrBoxFilter(src, ddepth, ksize, anchor=(-1, -1), normalize: bool = True,
                 borderType: int = K.BORDER_DEFAULT):
    """Box filter of squared values (`cv::sqrBoxFilter`)."""
    x, meta = to_batched(src)
    if ddepth in (-1, None):
        ddepth = K.CV_32F
    out_dtype = _resolve_ddepth(x.dtype, ddepth)
    xf = x.astype(jnp.float32)
    kw, kh = ksize
    s = _sep_correlate_float(xf * xf, np.ones(kw), np.ones(kh), borderType)
    if normalize:
        s = s * jnp.asarray(1.0 / (kw * kh), s.dtype)
    y = saturate_cast(s, out_dtype)
    return from_batched(y, meta)
