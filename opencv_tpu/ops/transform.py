"""DFT / DCT / spectrum ops (core/src/dxt.cpp) + Gabor kernels +
accumulate family (imgproc/src/accum.cpp, gabor.cpp).

TPU-native: jnp.fft (XLA FFT, float32) replaces the reference's radix
codelets; DCT-II/III via jax.scipy.fft.  The reference packs real-input
spectra in CCS format — we support the modern explicit flags
(DFT_COMPLEX_OUTPUT / DFT_REAL_OUTPUT) and return 2-channel float arrays
like cv2.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp
import jax.scipy.fft as jfft

from ..core.arrays import to_batched, from_batched
from ..core.fixedpoint import saturate_cast

__all__ = ["dft", "idft", "dct", "idct", "mulSpectrums",
           "getOptimalDFTSize", "getGaborKernel",
           "accumulate", "accumulateSquare", "accumulateProduct",
           "accumulateWeighted",
           "DFT_INVERSE", "DFT_SCALE", "DFT_ROWS", "DFT_COMPLEX_OUTPUT",
           "DFT_REAL_OUTPUT", "DFT_COMPLEX_INPUT",
           "DCT_INVERSE", "DCT_ROWS"]

DFT_INVERSE = 1
DFT_SCALE = 2
DFT_ROWS = 4
DFT_COMPLEX_OUTPUT = 16
DFT_REAL_OUTPUT = 32
DFT_COMPLEX_INPUT = 64
DCT_INVERSE = DFT_INVERSE
DCT_ROWS = DFT_ROWS


def _to_complex(x):
    if x.ndim >= 3 and x.shape[-1] == 2:
        return x[..., 0] + 1j * x[..., 1]
    return x.astype(jnp.complex64)


def _from_complex(z):
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1).astype(jnp.float32)


def _ccs_pack(F):
    """Full complex spectrum (M, N) of a real input -> CCS-packed real
    matrix (core/src/dxt.cpp packing layout)."""
    F = np.asarray(F)
    M, N = F.shape
    out = np.zeros((M, N), np.float32)

    def pack_col(dstcol, col):
        out[0, dstcol] = col[0].real
        half = (M - 1) // 2
        for i in range(1, half + 1):
            out[2 * i - 1, dstcol] = col[i].real
            out[2 * i, dstcol] = col[i].imag
        if M % 2 == 0:
            out[M - 1, dstcol] = col[M // 2].real

    pack_col(0, F[:, 0])
    for k in range(1, (N - 1) // 2 + 1):
        out[:, 2 * k - 1] = F[:, k].real
        out[:, 2 * k] = F[:, k].imag
    if N % 2 == 0:
        pack_col(N - 1, F[:, N // 2])
    return out


def _ccs_unpack(P):
    """CCS-packed real matrix -> full complex spectrum."""
    P = np.asarray(P, np.float64)
    M, N = P.shape
    F = np.zeros((M, N), np.complex128)

    def unpack_col(srccol):
        col = np.zeros(M, np.complex128)
        col[0] = P[0, srccol]
        half = (M - 1) // 2
        for i in range(1, half + 1):
            col[i] = P[2 * i - 1, srccol] + 1j * P[2 * i, srccol]
            col[M - i] = col[i].conjugate()
        if M % 2 == 0:
            col[M // 2] = P[M - 1, srccol]
        return col

    F[:, 0] = unpack_col(0)
    for k in range(1, (N - 1) // 2 + 1):
        F[:, k] = P[:, 2 * k - 1] + 1j * P[:, 2 * k]
        F[:, N - k] = np.conj(np.roll(F[:, k][::-1], 1))
    if N % 2 == 0:
        F[:, N // 2] = unpack_col(N - 1)
    return F


def dft(src, flags: int = 0, nonzeroRows: int = 0):
    """`cv::dft`. Real input packs the spectrum in CCS format like the
    reference unless DFT_COMPLEX_OUTPUT is given; inverse of a real
    (CCS) array with DFT_REAL_OUTPUT unpacks it."""
    x = jnp.asarray(src)
    axes = (-1,) if flags & DFT_ROWS else (-2, -1)
    real_in = x.ndim == 2 or (x.ndim == 3 and x.shape[-1] == 1)
    if flags & DFT_INVERSE:
        if real_in and not (flags & DFT_COMPLEX_INPUT) and x.ndim == 2 \
                and not (flags & DFT_ROWS):
            z = jnp.asarray(_ccs_unpack(np.asarray(x)))
        else:
            z = _to_complex(x)
        out = jnp.fft.ifftn(z, axes=axes)
        # cv2's idft WITHOUT DFT_SCALE is unnormalized: multiply back
        if not (flags & DFT_SCALE):
            n = np.prod([z.shape[a] for a in axes])
            out = out * n
        if flags & DFT_REAL_OUTPUT or (real_in
                                       and not (flags & DFT_COMPLEX_OUTPUT)
                                       and not (flags & DFT_COMPLEX_INPUT)):
            return jnp.real(out).astype(jnp.float32)
        return _from_complex(out)
    z = _to_complex(x)
    out = jnp.fft.fftn(z, axes=axes)
    if flags & DFT_SCALE:
        n = np.prod([z.shape[a] for a in axes])
        out = out / n
    if real_in and not (flags & DFT_COMPLEX_OUTPUT) and x.ndim == 2 \
            and not (flags & DFT_ROWS):
        return jnp.asarray(_ccs_pack(np.asarray(out)))
    return _from_complex(out)


def idft(src, flags: int = 0, nonzeroRows: int = 0):
    return dft(src, flags | DFT_INVERSE, nonzeroRows)


def dct(src, flags: int = 0):
    x = jnp.asarray(src).astype(jnp.float32)
    axes = [-1] if flags & DCT_ROWS else [-2, -1]
    if flags & DCT_INVERSE:
        out = x
        for a in axes:
            out = jfft.idct(out, type=2, axis=a, norm="ortho")
        return out.astype(jnp.float32)
    out = x
    for a in axes:
        out = jfft.dct(out, type=2, axis=a, norm="ortho")
    return out.astype(jnp.float32)


def idct(src, flags: int = 0):
    return dct(src, flags | DCT_INVERSE)


def mulSpectrums(a, b, flags: int = 0, conjB: bool = False):
    za = _to_complex(jnp.asarray(a))
    zb = _to_complex(jnp.asarray(b))
    if conjB:
        zb = jnp.conj(zb)
    return _from_complex(za * zb)


def getOptimalDFTSize(vecsize: int) -> int:
    """Smallest 2^p·3^q·5^r ≥ vecsize (dxt.cpp getOptimalDFTSize)."""
    if vecsize <= 0:
        return 1
    n = vecsize
    while True:
        m = n
        while m % 2 == 0:
            m //= 2
        while m % 3 == 0:
            m //= 3
        while m % 5 == 0:
            m //= 5
        if m == 1:
            return n
        n += 1


def getGaborKernel(ksize, sigma: float, theta: float, lambd: float,
                   gamma: float, psi: float = math.pi * 0.5,
                   ktype=np.float64):
    """Host twin of `cv::getGaborKernel` (imgproc/src/gabor.cpp)."""
    sigma_x = sigma
    sigma_y = sigma / gamma
    c, s = math.cos(theta), math.sin(theta)
    if ksize[0] > 0:
        xmax = ksize[0] // 2
    else:
        xmax = int(np.rint(max(abs(3 * sigma_x * c), abs(3 * sigma_y * s))))
    if ksize[1] > 0:
        ymax = ksize[1] // 2
    else:
        ymax = int(np.rint(max(abs(3 * sigma_x * s), abs(3 * sigma_y * c))))
    xs = np.arange(-xmax, xmax + 1)
    ys = np.arange(-ymax, ymax + 1)
    X, Y = np.meshgrid(xs, ys)
    xr = X * c + Y * s
    yr = -X * s + Y * c
    ex = -0.5 / (sigma_x * sigma_x)
    ey = -0.5 / (sigma_y * sigma_y)
    cscale = 2 * math.pi / lambd
    k = np.exp(ex * xr * xr + ey * yr * yr) * np.cos(cscale * xr + psi)
    # the reference stores kernel(ymax - y, xmax - x) — a 180° flip
    k = k[::-1, ::-1]
    return k.astype(np.dtype(ktype) if not isinstance(ktype, int) else np.float64)


# ------------------------------------------------------------- accumulate

def accumulate(src, dst, mask=None):
    x, _ = to_batched(src)
    d, meta = to_batched(dst)
    out = d + x.astype(d.dtype)
    if mask is not None:
        m, _ = to_batched(mask)
        out = jnp.where(m != 0, out, d)
    return from_batched(out, meta)


def accumulateSquare(src, dst, mask=None):
    x, _ = to_batched(src)
    d, meta = to_batched(dst)
    xf = x.astype(d.dtype)
    out = d + xf * xf
    if mask is not None:
        m, _ = to_batched(mask)
        out = jnp.where(m != 0, out, d)
    return from_batched(out, meta)


def accumulateProduct(src1, src2, dst, mask=None):
    x, _ = to_batched(src1)
    y, _ = to_batched(src2)
    d, meta = to_batched(dst)
    out = d + x.astype(d.dtype) * y.astype(d.dtype)
    if mask is not None:
        m, _ = to_batched(mask)
        out = jnp.where(m != 0, out, d)
    return from_batched(out, meta)


def accumulateWeighted(src, dst, alpha: float, mask=None):
    x, _ = to_batched(src)
    d, meta = to_batched(dst)
    a = jnp.asarray(alpha, d.dtype)
    out = d * (1 - a) + x.astype(d.dtype) * a
    if mask is not None:
        m, _ = to_batched(mask)
        out = jnp.where(m != 0, out, d)
    return from_batched(out, meta)
