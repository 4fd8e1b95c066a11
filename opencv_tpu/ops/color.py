"""cvtColor — color space conversions.

TPU-native design: conversions are pure elementwise NHWC math (VPU lanes),
so the whole family is plain jnp that XLA fuses with neighbors.  Integer
paths keep the reference's Q-format fixed-point arithmetic in int32 lanes so
8/16-bit outputs are bit-exact:

- Gray (BGR2GRAY et al.): Q15 coefficients ``RY15=9798, GY15=19235,
  BY15=3735`` (sum exactly 2^15) with ``CV_DESCALE`` rounding —
  `imgproc/src/color.simd_helpers.hpp:16,22-24`,
  `color_rgb.simd.hpp:660,752`.
- YCrCb / YUV: Q14 coefficient sets from `color_yuv.simd.hpp`.
- XYZ: Q12 coefficients from `color_rgb.simd.hpp` (sRGB D65 matrix).
- HSV/HLS 8U: integer hue division tables (`color_hsv.simd.hpp`).

The dispatcher mirrors `cv::cvtColor`'s switch (`imgproc/src/color.cpp:192`)
as a registry keyed on the public COLOR_* codes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import constants as K
from ..core.arrays import to_batched, from_batched
from ..core.fixedpoint import descale, saturate_cast, alpha_max

__all__ = ["cvtColor"]

# Q14 coefficients, used by the YCrCb/YUV family (color.simd_helpers.hpp:19-21)
R2Y, G2Y, B2Y = 4899, 9617, 1868
YUV_SHIFT = 14
# Q15 gray coefficients, sum == 2^15 exactly (color.simd_helpers.hpp:16,22-24;
# RGB2Gray<uchar/ushort> in color_rgb.simd.hpp:660,752)
RY15, GY15, BY15 = 9798, 19235, 3735
GRAY_SHIFT = 15
# float gray coefficients (color.hpp)
R2YF, G2YF, B2YF = 0.299, 0.587, 0.114

_REGISTRY = {}


def _register(*codes):
    def deco(fn):
        for c in codes:
            _REGISTRY[c] = fn
        return fn
    return deco


def _is_int(x):
    return x.dtype.kind in "ui"


def _swap_rb(x):
    if x.shape[-1] == 4:
        return x[..., [2, 1, 0, 3]]
    return x[..., ::-1]


# ------------------------------------------------------------ RGB family

@_register(K.COLOR_BGR2BGRA)
def _bgr2bgra(x):
    a = jnp.full(x.shape[:-1] + (1,), alpha_max(x.dtype), dtype=x.dtype)
    return jnp.concatenate([x[..., :3], a], axis=-1)


@_register(K.COLOR_BGRA2BGR)
def _bgra2bgr(x):
    return x[..., :3]


@_register(K.COLOR_BGR2RGBA)
def _bgr2rgba(x):
    a = jnp.full(x.shape[:-1] + (1,), alpha_max(x.dtype), dtype=x.dtype)
    return jnp.concatenate([x[..., 2::-1], a], axis=-1)


@_register(K.COLOR_RGBA2BGR)
def _rgba2bgr(x):
    return x[..., 2::-1]


@_register(K.COLOR_BGR2RGB)
def _bgr2rgb(x):
    return x[..., ::-1]


@_register(K.COLOR_BGRA2RGBA)
def _bgra2rgba(x):
    return _swap_rb(x)


def _rgb_to_gray(x, r, g, b):
    if _is_int(x):
        xi = x.astype(jnp.int32)
        y = descale(xi[..., r] * RY15 + xi[..., g] * GY15 + xi[..., b] * BY15,
                    GRAY_SHIFT)
        return y[..., None].astype(x.dtype)
    y = (x[..., r] * jnp.asarray(R2YF, x.dtype)
         + x[..., g] * jnp.asarray(G2YF, x.dtype)
         + x[..., b] * jnp.asarray(B2YF, x.dtype))
    return y[..., None]


@_register(K.COLOR_BGR2GRAY, K.COLOR_BGRA2GRAY)
def _bgr2gray(x):
    return _rgb_to_gray(x, 2, 1, 0)


@_register(K.COLOR_RGB2GRAY, K.COLOR_RGBA2GRAY)
def _rgb2gray(x):
    return _rgb_to_gray(x, 0, 1, 2)


@_register(K.COLOR_GRAY2BGR)
def _gray2bgr(x):
    return jnp.repeat(x[..., :1], 3, axis=-1)


@_register(K.COLOR_GRAY2BGRA)
def _gray2bgra(x):
    a = jnp.full(x.shape[:-1] + (1,), alpha_max(x.dtype), dtype=x.dtype)
    return jnp.concatenate([jnp.repeat(x[..., :1], 3, axis=-1), a], axis=-1)


# -------------------------------------------------------- YCrCb / YUV

# color_yuv.simd.hpp coefficient sets (Q14)
_YCRCB_COEFFS_I = (R2Y, G2Y, B2Y, 11682, 9241)   # R2Y,G2Y,B2Y, Cr, Cb
_YCRCB_COEFFS_F = (R2YF, G2YF, B2YF, 0.713, 0.564)
_YCRCB2RGB_I = (22987, -11698, -5636, 29049)      # Cr→R, Cr→G, Cb→G, Cb→B
_YCRCB2RGB_F = (1.403, -0.714, -0.344, 1.773)
_YUV_COEFFS_I = (R2Y, G2Y, B2Y, 14369, 8061)      # V=(R-Y)*0.877, U=(B-Y)*0.492
_YUV_COEFFS_F = (R2YF, G2YF, B2YF, 0.877, 0.492)
_YUV2RGB_I = (18678, -9519, -6472, 33292)         # V2R, V2G, U2G, U2B (Q14)
_YUV2RGB_F = (1.140, -0.581, -0.395, 2.032)


def _rgb2ycrcb(x, bidx, coeffs_i, coeffs_f, yuv_order=False):
    """yuv_order: True → (Y,U,V)=(Y,Cb,Cr) channel order (BGR2YUV)."""
    if _is_int(x):
        xi = x.astype(jnp.int32)
        r = xi[..., 2 - bidx]
        g = xi[..., 1]
        b = xi[..., bidx]
        C0, C1, C2, C3, C4 = coeffs_i
        # delta = ColorChannel<T>::half() << shift (color_yuv.simd.hpp:237)
        half = (128 if x.dtype == jnp.uint8 else 32768) << YUV_SHIFT
        y = descale(r * C0 + g * C1 + b * C2, YUV_SHIFT)
        cr = descale((r - y) * C3 + half, YUV_SHIFT)
        cb = descale((b - y) * C4 + half, YUV_SHIFT)
        chans = [y, cb, cr] if yuv_order else [y, cr, cb]
        out = jnp.stack(chans, axis=-1)
        return saturate_cast(out, x.dtype)
    r = x[..., 2 - bidx]
    g = x[..., 1]
    b = x[..., bidx]
    C0, C1, C2, C3, C4 = [jnp.asarray(c, x.dtype) for c in coeffs_f]
    half = jnp.asarray(0.5, x.dtype)
    y = r * C0 + g * C1 + b * C2
    cr = (r - y) * C3 + half
    cb = (b - y) * C4 + half
    chans = [y, cb, cr] if yuv_order else [y, cr, cb]
    return jnp.stack(chans, axis=-1)


def _ycrcb2rgb(x, bidx, coeffs_i, coeffs_f, yuv_order=False):
    if _is_int(x):
        xi = x.astype(jnp.int32)
        y = xi[..., 0]
        if yuv_order:
            cb, cr = xi[..., 1], xi[..., 2]
        else:
            cr, cb = xi[..., 1], xi[..., 2]
        C0, C1, C2, C3 = coeffs_i
        if x.dtype == jnp.uint8:
            delta = 128
        elif x.dtype == jnp.uint16:
            delta = 32768
        else:
            delta = 0
        b = y + descale((cb - delta) * C3, YUV_SHIFT)
        g = y + descale((cb - delta) * C2 + (cr - delta) * C1, YUV_SHIFT)
        r = y + descale((cr - delta) * C0, YUV_SHIFT)
        chans = [0, 0, 0]
        chans[bidx] = b
        chans[1] = g
        chans[2 - bidx] = r
        return saturate_cast(jnp.stack(chans, axis=-1), x.dtype)
    y = x[..., 0]
    if yuv_order:
        cb, cr = x[..., 1], x[..., 2]
    else:
        cr, cb = x[..., 1], x[..., 2]
    C0, C1, C2, C3 = [jnp.asarray(c, x.dtype) for c in coeffs_f]
    delta = jnp.asarray(0.5, x.dtype)
    b = y + (cb - delta) * C3
    g = y + (cb - delta) * C2 + (cr - delta) * C1
    r = y + (cr - delta) * C0
    chans = [0, 0, 0]
    chans[bidx] = b
    chans[1] = g
    chans[2 - bidx] = r
    return jnp.stack(chans, axis=-1)


@_register(K.COLOR_BGR2YCrCb)
def _bgr2ycrcb(x):
    return _rgb2ycrcb(x, 0, _YCRCB_COEFFS_I, _YCRCB_COEFFS_F)


@_register(K.COLOR_RGB2YCrCb)
def _rgb2ycrcb_(x):
    return _rgb2ycrcb(x, 2, _YCRCB_COEFFS_I, _YCRCB_COEFFS_F)


@_register(K.COLOR_YCrCb2BGR)
def _ycrcb2bgr(x):
    return _ycrcb2rgb(x, 0, _YCRCB2RGB_I, _YCRCB2RGB_F)


@_register(K.COLOR_YCrCb2RGB)
def _ycrcb2rgb_(x):
    return _ycrcb2rgb(x, 2, _YCRCB2RGB_I, _YCRCB2RGB_F)


@_register(K.COLOR_BGR2YUV)
def _bgr2yuv(x):
    return _rgb2ycrcb(x, 0, _YUV_COEFFS_I, _YUV_COEFFS_F, yuv_order=True)


@_register(K.COLOR_RGB2YUV)
def _rgb2yuv(x):
    return _rgb2ycrcb(x, 2, _YUV_COEFFS_I, _YUV_COEFFS_F, yuv_order=True)


@_register(K.COLOR_YUV2BGR)
def _yuv2bgr(x):
    return _ycrcb2rgb(x, 0, _YUV2RGB_I, _YUV2RGB_F, yuv_order=True)


@_register(K.COLOR_YUV2RGB)
def _yuv2rgb(x):
    return _ycrcb2rgb(x, 2, _YUV2RGB_I, _YUV2RGB_F, yuv_order=True)


# ---------------------------------------------------------------- XYZ

_XYZ_SHIFT = 12
# sRGB D65 (color_rgb: Q12), rows X,Y,Z × cols R,G,B
_RGB2XYZ_I = np.array([[1689, 1465, 739],
                       [871, 2929, 296],
                       [79, 488, 3892]], np.int32)
_RGB2XYZ_F = np.array([[0.412453, 0.357580, 0.180423],
                       [0.212671, 0.715160, 0.072169],
                       [0.019334, 0.119193, 0.950227]], np.float64)
_XYZ2RGB_I = np.array([[13273, -6296, -2042],
                       [-3970, 7684, 170],
                       [228, -836, 4331]], np.int32)
_XYZ2RGB_F = np.array([[3.240479, -1.53715, -0.498535],
                       [-0.969256, 1.875991, 0.041556],
                       [0.055648, -0.204043, 1.057311]], np.float64)


def _mat3(x, Mi, Mf, bidx_in, bidx_out, shift):
    if _is_int(x):
        xi = x.astype(jnp.int32)
        c0 = xi[..., 2 - bidx_in]   # R
        c1 = xi[..., 1]
        c2 = xi[..., bidx_in]       # B
        outs = [descale(c0 * int(Mi[k, 0]) + c1 * int(Mi[k, 1])
                        + c2 * int(Mi[k, 2]), shift) for k in range(3)]
        out = jnp.stack(outs, axis=-1)
        return saturate_cast(out, x.dtype)
    c0 = x[..., 2 - bidx_in]
    c1 = x[..., 1]
    c2 = x[..., bidx_in]
    outs = [c0 * jnp.asarray(Mf[k, 0], x.dtype)
            + c1 * jnp.asarray(Mf[k, 1], x.dtype)
            + c2 * jnp.asarray(Mf[k, 2], x.dtype) for k in range(3)]
    return jnp.stack(outs, axis=-1)


@_register(K.COLOR_BGR2XYZ)
def _bgr2xyz(x):
    return _mat3(x, _RGB2XYZ_I, _RGB2XYZ_F, 0, None, _XYZ_SHIFT)


@_register(K.COLOR_RGB2XYZ)
def _rgb2xyz(x):
    return _mat3(x, _RGB2XYZ_I, _RGB2XYZ_F, 2, None, _XYZ_SHIFT)


@_register(K.COLOR_XYZ2BGR)
def _xyz2bgr(x):
    if _is_int(x):
        xi = x.astype(jnp.int32)
        X, Y, Z = xi[..., 0], xi[..., 1], xi[..., 2]
        M = _XYZ2RGB_I
        r = descale(X * int(M[0, 0]) + Y * int(M[0, 1]) + Z * int(M[0, 2]), _XYZ_SHIFT)
        g = descale(X * int(M[1, 0]) + Y * int(M[1, 1]) + Z * int(M[1, 2]), _XYZ_SHIFT)
        b = descale(X * int(M[2, 0]) + Y * int(M[2, 1]) + Z * int(M[2, 2]), _XYZ_SHIFT)
        return saturate_cast(jnp.stack([b, g, r], axis=-1), x.dtype)
    X, Y, Z = x[..., 0], x[..., 1], x[..., 2]
    M = _XYZ2RGB_F
    r = X * jnp.asarray(M[0, 0], x.dtype) + Y * jnp.asarray(M[0, 1], x.dtype) + Z * jnp.asarray(M[0, 2], x.dtype)
    g = X * jnp.asarray(M[1, 0], x.dtype) + Y * jnp.asarray(M[1, 1], x.dtype) + Z * jnp.asarray(M[1, 2], x.dtype)
    b = X * jnp.asarray(M[2, 0], x.dtype) + Y * jnp.asarray(M[2, 1], x.dtype) + Z * jnp.asarray(M[2, 2], x.dtype)
    return jnp.stack([b, g, r], axis=-1)


@_register(K.COLOR_XYZ2RGB)
def _xyz2rgb(x):
    y = _xyz2bgr(x)
    return y[..., ::-1]




# ----------------------------------------------------------- HSV / HLS

# hue division scale, Q12 (color_hsv.simd.hpp:63-77); the reference's
# sdiv/hdiv tables are evaluated arithmetically in _rgb2hsv (exact)
_HSV_SHIFT = 12

# sector → (b, g, r) tab indices (HSV2RGB_native, color_hsv.simd.hpp:440)
_SECTOR_DATA = np.array([[1, 3, 0], [1, 0, 2], [3, 0, 1],
                         [0, 2, 1], [0, 1, 3], [2, 1, 0]], np.int32)


def _rgb2hsv(x, bidx, hrange):
    if _is_int(x):
        xi = x.astype(jnp.int32)
        b = xi[..., bidx]
        g = xi[..., 1]
        r = xi[..., 2 - bidx]
        v = jnp.maximum(jnp.maximum(b, g), r)
        vmin = jnp.minimum(jnp.minimum(b, g), r)
        diff = v - vmin
        # the reference's Q12 division tables evaluated arithmetically:
        # rint(a/den) == floor((2a + den) // (2 den)), exact because no
        # quotient lands on an exact half (denominators <= 255/1530 can't
        # cancel a's power of two) — per-pixel LUT gathers cost ~14ns
        # each on TPU (two per pixel made BGR2HSV 20x slower than this)
        vs = jnp.maximum(v, 1)
        sdiv = jnp.where(v > 0,
                         (2 * (255 << _HSV_SHIFT) + vs) // (2 * vs), 0)
        ds = jnp.maximum(diff, 1)
        if hrange == 180:
            hdiv = jnp.where(diff > 0,
                             (2 * (30 << _HSV_SHIFT) + ds) // (2 * ds), 0)
        else:
            hdiv = jnp.where(
                diff > 0,
                (2 * (256 << _HSV_SHIFT) + 6 * ds) // (12 * ds), 0)
        s = (diff * sdiv + (1 << (_HSV_SHIFT - 1))) >> _HSV_SHIFT
        h0 = jnp.where(v == r, g - b,
                       jnp.where(v == g, b - r + 2 * diff, r - g + 4 * diff))
        h = (h0 * hdiv + (1 << (_HSV_SHIFT - 1))) >> _HSV_SHIFT
        h = jnp.where(h < 0, h + hrange, h)
        out = jnp.stack([h, s, v], axis=-1)
        return saturate_cast(out, x.dtype)
    b = x[..., bidx]
    g = x[..., 1]
    r = x[..., 2 - bidx]
    v = jnp.maximum(jnp.maximum(b, g), r)
    vmin = jnp.minimum(jnp.minimum(b, g), r)
    diff = v - vmin
    eps = jnp.float32(np.finfo(np.float32).eps)
    s = diff / (jnp.abs(v) + eps)
    d60 = jnp.float32(60.0) / (diff + eps)
    h = jnp.where(v == r, (g - b) * d60,
                  jnp.where(v == g, (b - r) * d60 + 120.0,
                            (r - g) * d60 + 240.0))
    h = jnp.where(h < 0, h + 360.0, h)
    hscale = jnp.float32(hrange / 360.0)
    return jnp.stack([h * hscale, s, v], axis=-1)


def _sector_select(sec, tab0, tab1, tab2, tab3):
    """(b, g, r) from the 6-sector table via select chains — per-pixel
    table gathers cost ~14ns/idx on TPU; selects are VPU-free."""
    outs = []
    for ch in range(3):
        idxs = _SECTOR_DATA[:, ch]
        tabs = (tab0, tab1, tab2, tab3)
        val = tabs[int(idxs[5])]
        for s_ in range(4, -1, -1):
            val = jnp.where(sec == s_, tabs[int(idxs[s_])], val)
        outs.append(val)
    return outs


def _hsv2rgb_native(h, s, v, hscale):
    """HSV2RGB_native (color_hsv.simd.hpp:430): float sector math."""
    hh = h * jnp.float32(hscale)
    sector = jnp.floor(hh)
    frac = hh - sector
    sec = sector.astype(jnp.int32) % 6
    sec = jnp.where(sec < 0, sec + 6, sec)
    tab0 = v
    tab1 = v * (1.0 - s)
    tab2 = v * (1.0 - s * frac)
    tab3 = v * (1.0 - s * (1.0 - frac))
    b, g, r = _sector_select(sec, tab0, tab1, tab2, tab3)
    gray = s == 0
    return (jnp.where(gray, v, b), jnp.where(gray, v, g),
            jnp.where(gray, v, r))


def _hsv2rgb(x, bidx, hrange):
    if _is_int(x):
        xf = x.astype(jnp.float32)
        h = xf[..., 0]
        s = xf[..., 1] * jnp.float32(1.0 / 255.0)
        v = xf[..., 2] * jnp.float32(1.0 / 255.0)
        b, g, r = _hsv2rgb_native(h, s, v, 6.0 / hrange)
        chans = [0, 0, 0]
        chans[bidx] = b
        chans[1] = g
        chans[2 - bidx] = r
        out = jnp.stack(chans, axis=-1) * jnp.float32(255.0)
        return saturate_cast(out, x.dtype)
    h = x[..., 0]
    s = x[..., 1]
    v = x[..., 2]
    b, g, r = _hsv2rgb_native(h, s, v, 6.0 / hrange)
    chans = [0, 0, 0]
    chans[bidx] = b
    chans[1] = g
    chans[2 - bidx] = r
    return jnp.stack(chans, axis=-1)


def _rgb2hls_f(b, g, r, hscale):
    vmax = jnp.maximum(jnp.maximum(b, g), r)
    vmin = jnp.minimum(jnp.minimum(b, g), r)
    diff = vmax - vmin
    l = (vmax + vmin) * jnp.float32(0.5)
    eps = np.finfo(np.float32).eps
    safe_diff = jnp.where(diff > eps, diff, 1.0)
    s = jnp.where(l < 0.5, diff / (vmax + vmin),
                  diff / (2.0 - vmax - vmin))
    d60 = jnp.float32(60.0) / safe_diff
    h = jnp.where(vmax == r, (g - b) * d60,
                  jnp.where(vmax == g, (b - r) * d60 + 120.0,
                            (r - g) * d60 + 240.0))
    h = jnp.where(h < 0, h + 360.0, h)
    h = jnp.where(diff > eps, h, 0.0)
    s = jnp.where(diff > eps, s, 0.0)
    return h * jnp.float32(hscale), l, s


def _rgb2hls(x, bidx, hrange):
    if _is_int(x):
        xf = x.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        b = xf[..., bidx]
        g = xf[..., 1]
        r = xf[..., 2 - bidx]
        h, l, s = _rgb2hls_f(b, g, r, hrange / 360.0)
        out = jnp.stack([h, l * 255.0, s * 255.0], axis=-1)
        return saturate_cast(out, x.dtype)
    b = x[..., bidx]
    g = x[..., 1]
    r = x[..., 2 - bidx]
    h, l, s = _rgb2hls_f(b, g, r, hrange / 360.0)
    return jnp.stack([h, l, s], axis=-1)


def _hls2rgb_native(h, l, s, hscale):
    p2 = jnp.where(l <= 0.5, l * (1.0 + s), l + s - l * s)
    p1 = 2.0 * l - p2
    hh = h * jnp.float32(hscale)
    sector = jnp.floor(hh)
    frac = hh - sector
    sec = sector.astype(jnp.int32) % 6
    sec = jnp.where(sec < 0, sec + 6, sec)
    tab0 = p2
    tab1 = p1
    tab2 = p1 + (p2 - p1) * (1.0 - frac)
    tab3 = p1 + (p2 - p1) * frac
    b, g, r = _sector_select(sec, tab0, tab1, tab2, tab3)
    gray = s == 0
    return (jnp.where(gray, l, b), jnp.where(gray, l, g),
            jnp.where(gray, l, r))


def _hls2rgb(x, bidx, hrange):
    if _is_int(x):
        xf = x.astype(jnp.float32)
        h = xf[..., 0]
        l = xf[..., 1] * jnp.float32(1.0 / 255.0)
        s = xf[..., 2] * jnp.float32(1.0 / 255.0)
        b, g, r = _hls2rgb_native(h, l, s, 6.0 / hrange)
        chans = [0, 0, 0]
        chans[bidx] = b
        chans[1] = g
        chans[2 - bidx] = r
        out = jnp.stack(chans, axis=-1) * jnp.float32(255.0)
        return saturate_cast(out, x.dtype)
    h = x[..., 0]
    l = x[..., 1]
    s = x[..., 2]
    b, g, r = _hls2rgb_native(h, l, s, 6.0 / hrange)
    chans = [0, 0, 0]
    chans[bidx] = b
    chans[1] = g
    chans[2 - bidx] = r
    return jnp.stack(chans, axis=-1)


def _hrange_f(x, full):
    if _is_int(x):
        return 256 if full else 180
    return 360


def _hrange_inv(x, full):
    # inverse u8 conversions treat full-range hue as 255 (color.cpp
    # dispatch: h_range = fullRange ? 255 : 180)
    if _is_int(x):
        return 255 if full else 180
    return 360


for _code, _bidx, _full, _fn in [
    (K.COLOR_BGR2HSV, 0, False, _rgb2hsv), (K.COLOR_RGB2HSV, 2, False, _rgb2hsv),
    (K.COLOR_BGR2HSV_FULL, 0, True, _rgb2hsv), (K.COLOR_RGB2HSV_FULL, 2, True, _rgb2hsv),
    (K.COLOR_HSV2BGR, 0, False, _hsv2rgb), (K.COLOR_HSV2RGB, 2, False, _hsv2rgb),
    (K.COLOR_HSV2BGR_FULL, 0, "inv", _hsv2rgb), (K.COLOR_HSV2RGB_FULL, 2, "inv", _hsv2rgb),
    (K.COLOR_BGR2HLS, 0, False, _rgb2hls), (K.COLOR_RGB2HLS, 2, False, _rgb2hls),
    (K.COLOR_BGR2HLS_FULL, 0, True, _rgb2hls), (K.COLOR_RGB2HLS_FULL, 2, True, _rgb2hls),
    (K.COLOR_HLS2BGR, 0, False, _hls2rgb), (K.COLOR_HLS2RGB, 2, False, _hls2rgb),
    (K.COLOR_HLS2BGR_FULL, 0, "inv", _hls2rgb), (K.COLOR_HLS2RGB_FULL, 2, "inv", _hls2rgb),
]:
    def _mk(bidx=_bidx, full=_full, fn=_fn):
        def conv(x):
            if full == "inv":
                return fn(x, bidx, _hrange_inv(x, True))
            return fn(x, bidx, _hrange_f(x, full))
        return conv
    _REGISTRY[_code] = _mk()



# ------------------------------------------------------------ Lab / Luv

# sRGB D65 (color_lab.cpp:100-115)
_LAB_XYZ = np.array([[0.412453, 0.357580, 0.180423],
                     [0.212671, 0.715160, 0.072169],
                     [0.019334, 0.119193, 0.950227]])
_D65 = np.array([0.950456, 1.0, 1.088754])


def _srgb_inv_gamma(x):
    return jnp.where(x <= 0.04045, x / 12.92,
                     jnp.power((x + 0.055) / 1.055, 2.4))


def _srgb_gamma(x):
    return jnp.where(x <= 0.0031308, x * 12.92,
                     1.055 * jnp.power(jnp.maximum(x, 1e-12), 1.0 / 2.4)
                     - 0.055)


def _f_lab(t):
    # CIE f(): cbrt above (6/29)^3, linear below (color_lab.cpp splineCbrt)
    thr = 0.008856451679035631
    return jnp.where(t > thr, jnp.cbrt(t), t * 7.787068965517241 + 16.0 / 116.0)


def _rgb2lab_f(x, bidx, srgb=True):
    """Analytic Lab (the reference uses spline-interpolated gamma/cbrt
    tables — documented tolerance ~1e-3 on L)."""
    b = x[..., bidx]
    g = x[..., 1]
    r = x[..., 2 - bidx]
    if srgb:
        r = _srgb_inv_gamma(r)
        g = _srgb_inv_gamma(g)
        b = _srgb_inv_gamma(b)
    M = _LAB_XYZ / _D65[:, None]
    X = r * M[0, 0] + g * M[0, 1] + b * M[0, 2]
    Y = r * M[1, 0] + g * M[1, 1] + b * M[1, 2]
    Z = r * M[2, 0] + g * M[2, 1] + b * M[2, 2]
    fx, fy, fz = _f_lab(X), _f_lab(Y), _f_lab(Z)
    L = jnp.where(Y > 0.008856451679035631, 116.0 * jnp.cbrt(Y) - 16.0,
                  903.3 * Y)
    a = 500.0 * (fx - fy)
    bb = 200.0 * (fy - fz)
    return L, a, bb


def _lab2rgb_f(L, a, bb, bidx, srgb=True):
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - bb / 200.0
    thr = 6.0 / 29.0

    def finv(t):
        return jnp.where(t > thr, t * t * t,
                         (t - 16.0 / 116.0) / 7.787068965517241)

    Y = jnp.where(L > 8.0, fy * fy * fy, L / 903.3)
    X = finv(fx)
    Z = finv(fz)
    Mi = np.linalg.inv(_LAB_XYZ / _D65[:, None])
    r = X * Mi[0, 0] + Y * Mi[0, 1] + Z * Mi[0, 2]
    g = X * Mi[1, 0] + Y * Mi[1, 1] + Z * Mi[1, 2]
    b = X * Mi[2, 0] + Y * Mi[2, 1] + Z * Mi[2, 2]
    if srgb:
        r, g, b = _srgb_gamma(r), _srgb_gamma(g), _srgb_gamma(b)
    chans = [0, 0, 0]
    chans[bidx] = b
    chans[1] = g
    chans[2 - bidx] = r
    return jnp.stack(chans, axis=-1)


def _rgb2luv_f(x, bidx, srgb=True):
    b = x[..., bidx]
    g = x[..., 1]
    r = x[..., 2 - bidx]
    if srgb:
        r = _srgb_inv_gamma(r)
        g = _srgb_inv_gamma(g)
        b = _srgb_inv_gamma(b)
    M = _LAB_XYZ
    X = r * M[0, 0] + g * M[0, 1] + b * M[0, 2]
    Y = r * M[1, 0] + g * M[1, 1] + b * M[1, 2]
    Z = r * M[2, 0] + g * M[2, 1] + b * M[2, 2]
    L = jnp.where(Y > 0.008856451679035631, 116.0 * jnp.cbrt(Y) - 16.0,
                  903.3 * Y)
    d = X + 15.0 * Y + 3.0 * Z
    dn = jnp.where(d != 0, 1.0 / d, 0.0)
    un = 4 * _D65[0] / (_D65[0] + 15 * _D65[1] + 3 * _D65[2])
    vn = 9 * _D65[1] / (_D65[0] + 15 * _D65[1] + 3 * _D65[2])
    u = 13.0 * L * (4.0 * X * dn - un)
    v = 13.0 * L * (9.0 * Y * dn - vn)
    return L, u, v


def _luv2rgb_f(L, u, v, bidx, srgb=True):
    un = 4 * _D65[0] / (_D65[0] + 15 * _D65[1] + 3 * _D65[2])
    vn = 9 * _D65[1] / (_D65[0] + 15 * _D65[1] + 3 * _D65[2])
    Y = jnp.where(L > 8.0, ((L + 16.0) / 116.0) ** 3, L / 903.3)
    L13 = 13.0 * jnp.maximum(L, 1e-12)
    up = u / L13 + un
    vp = v / L13 + vn
    vp_safe = jnp.where(vp != 0, vp, 1.0)
    X = 2.25 * Y * up / vp_safe
    Z = Y * (3.0 - 0.75 * up - 5.0 * vp) / vp_safe
    Mi = np.linalg.inv(_LAB_XYZ)
    r = X * Mi[0, 0] + Y * Mi[0, 1] + Z * Mi[0, 2]
    g = X * Mi[1, 0] + Y * Mi[1, 1] + Z * Mi[1, 2]
    b = X * Mi[2, 0] + Y * Mi[2, 1] + Z * Mi[2, 2]
    if srgb:
        r, g, b = _srgb_gamma(r), _srgb_gamma(g), _srgb_gamma(b)
    chans = [0, 0, 0]
    chans[bidx] = b
    chans[1] = g
    chans[2 - bidx] = r
    return jnp.stack(chans, axis=-1)


# --- bit-exact u8 Lab/Luv: the reference's fixed-point/LUT pipelines -----
# (color_lab.cpp: RGB2Lab_b :1573, Lab2RGBinteger :2399, RGB2Luvinterpolate
# :3276, Luv2RGBinteger :3556).  The LUT contents are platform-independent
# softfloat-built constants snapshotted by tools/gen_lab_luts.py; every
# conversion below is verified bit-exact against the wheel over ALL 2^24
# u8 inputs (tests/test_color.py).

_LAB_LUTS_CACHE = None


def _lab_luts():
    global _LAB_LUTS_CACHE
    if _LAB_LUTS_CACHE is None:
        import os
        path = os.path.join(os.path.dirname(__file__), "lab_luts.npz")
        with np.load(path) as z:
            _LAB_LUTS_CACHE = {k: z[k] for k in z.files}
    return _LAB_LUTS_CACHE


_LAB_SHIFT, _LAB_SHIFT2, _INVG_SHIFT = 12, 15, 12
_LAB_BASE = 1 << 14
_M14 = (1 << 14) - 1


def _idescale(x, n):
    return (x + (1 << (n - 1))) >> n


def _rgb2lab_u8(x, bidx, srgb):
    T = _lab_luts()
    xi = x.astype(jnp.int32)
    b, g, r = xi[..., bidx], xi[..., 1], xi[..., 2 - bidx]
    tab = jnp.asarray(T["sRGBGammaTab_b" if srgb else "linearGammaTab_b"],
                      jnp.int32)
    R, G, B = tab[r], tab[g], tab[b]
    C = T["lab_fwd_coeffs"]          # static host ints, rows X/Y/Z
    cb = jnp.asarray(T["LabCbrtTab_b"], jnp.int32)
    f = [cb[_idescale(R * int(C[i, 0]) + G * int(C[i, 1])
                      + B * int(C[i, 2]), _LAB_SHIFT)] for i in range(3)]
    fX, fY, fZ = f
    lscale = (116 * 255 + 50) // 100
    lshift = -((16 * 255 * (1 << _LAB_SHIFT2) + 50) // 100)
    Lo = _idescale(lscale * fY + lshift, _LAB_SHIFT2)
    ao = _idescale(500 * (fX - fY) + (128 << _LAB_SHIFT2), _LAB_SHIFT2)
    bo = _idescale(200 * (fY - fZ) + (128 << _LAB_SHIFT2), _LAB_SHIFT2)
    out = jnp.stack([Lo, ao, bo], axis=-1)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def _inv_gamma_store(ch3, srgb, T):
    res = []
    inv_tab = jnp.asarray(T["sRGBInvGammaTab_b"], jnp.int32) if srgb else None
    for v in ch3:
        v = jnp.clip(v, 0, (1 << _INVG_SHIFT) - 1)
        if srgb:
            v = inv_tab[v]
        else:
            v = ((v << 8) - v) >> _INVG_SHIFT
        res.append(jnp.clip(v, 0, 255))
    return jnp.stack(res, axis=-1).astype(jnp.uint8)


def _lab2rgb_u8(x, bidx, srgb):
    T = _lab_luts()
    xi = x.astype(jnp.int32)
    LL, aa, bb = xi[..., 0], xi[..., 1], xi[..., 2]
    yf = jnp.asarray(T["LabToYF_b"], jnp.int32)
    y, ify = yf[LL, 0], yf[LL, 1]
    adiv = ((5 * aa * 53687 + (1 << 7)) >> 13) - 128 * _LAB_BASE // 500
    bdiv = ((bb * 41943 + (1 << 4)) >> 9) - 128 * _LAB_BASE // 200 + 1
    ab = jnp.asarray(T["abToXZ_b"], jnp.int32)
    min_ab = -8145
    xx = ab[ify + adiv - min_ab]
    zz = ab[ify - bdiv - min_ab]
    C = T["lab_inv_coeffs"]          # rows R/G/B, cols X/Y/Z
    sh = _LAB_SHIFT + (14 - _INVG_SHIFT)
    ro = _idescale(int(C[0, 0]) * xx + int(C[0, 1]) * y + int(C[0, 2]) * zz, sh)
    go = _idescale(int(C[1, 0]) * xx + int(C[1, 1]) * y + int(C[1, 2]) * zz, sh)
    bo = _idescale(int(C[2, 0]) * xx + int(C[2, 1]) * y + int(C[2, 2]) * zz, sh)
    out = _inv_gamma_store([bo, go, ro], srgb, T)
    if bidx == 2:
        out = out[..., ::-1]
    return out


def _trilinear_lut(cx, cy, cz, lut):
    """trilinearInterpolate (color_lab.cpp:1352): coords in [0, LAB_BASE],
    cube origin at >>9, 16-step weights, CV_DESCALE by 12."""
    tx, ty, tz = cx >> 9, cy >> 9, cz >> 9           # cube origin, 0..32
    xw, yw, zw = (cx >> 5) & 15, (cy >> 5) & 15, (cz >> 5) & 15
    acc = 0
    for dp in (0, 1):
        wx = xw if dp else 16 - xw
        for dq in (0, 1):
            wy = yw if dq else 16 - yw
            for dr in (0, 1):
                wz = zw if dr else 16 - zw
                idx = (jnp.minimum(tz + dr, 32) * (33 * 33)
                       + jnp.minimum(ty + dq, 32) * 33
                       + jnp.minimum(tx + dp, 32))
                acc = acc + lut[idx] * (wx * wy * wz)[..., None]
    return _idescale(acc, 12)


def _rgb2luv_u8(x, bidx):
    """Trilinear interpolation over the 33^3 LUT (RGB2Luvinterpolate)."""
    T = _lab_luts()
    xi = x.astype(jnp.int32)
    b, g, r = xi[..., bidx], xi[..., 1], xi[..., 2 - bidx]
    base_div = _LAB_BASE // 256                      # 64
    lut = jnp.asarray(T["RGB2LuvLUT"].reshape(-1, 3), jnp.int32)  # (33^3, 3)
    out = _trilinear_lut(b * base_div, g * base_div, r * base_div, lut)
    out = out >> 6                    # values >= 0: shift == trunc division
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def _rgb2lab_f32_interp(x, bidx):
    """f32 sRGB RGB2Lab: the reference's interpolated path (RGB2Lab_f,
    color_lab.cpp:2037-2050) — cvRound to the LAB_BASE grid, the same
    trilinear 33^3 LUT as u8 Luv, float rescale.  Bit-exact."""
    T = _lab_luts()
    b = jnp.clip(x[..., bidx], 0.0, 1.0)
    g = jnp.clip(x[..., 1], 0.0, 1.0)
    r = jnp.clip(x[..., 2 - bidx], 0.0, 1.0)
    fb = jnp.float32(_LAB_BASE)
    cb = jnp.rint(b * fb).astype(jnp.int32)
    cg = jnp.rint(g * fb).astype(jnp.int32)
    cr = jnp.rint(r * fb).astype(jnp.int32)
    lut = jnp.asarray(T["RGB2LabLUT"].reshape(-1, 3), jnp.int32)
    iv = _trilinear_lut(cb, cg, cr, lut).astype(jnp.float32)
    inv = jnp.float32(1.0 / _LAB_BASE)               # exact power of two
    L = (iv[..., 0] * inv) * jnp.float32(100.0)
    a = (iv[..., 1] * inv) * jnp.float32(256.0) - jnp.float32(128.0)
    bb = (iv[..., 2] * inv) * jnp.float32(256.0) - jnp.float32(128.0)
    return jnp.stack([L, a, bb], axis=-1).astype(jnp.float32)


# base-2^14 limb arithmetic (LSB first, signed top limb) — lets the 48-bit
# int64 intermediates of Luv2RGBinteger run in pure int32 lanes on TPU.

def _limbs_norm(limbs):
    out, carry = [], 0
    for l in limbs[:-1]:
        v = l + carry
        out.append(v & _M14)
        carry = v >> 14                   # arithmetic shift == floor
    out.append(limbs[-1] + carry)
    return out


def _limbs_shift14_trunc(limbs):
    """trunc(value / 2^14) for normalized limbs."""
    rem, rest = limbs[0], list(limbs[1:])
    fix = ((rest[-1] < 0) & (rem != 0)).astype(jnp.int32)
    return _limbs_norm([rest[0] + fix] + rest[1:])


def _luv2rgb_u8(x, bidx, srgb):
    T = _lab_luts()
    xi = x.astype(jnp.int32)
    LL, uu, vv = xi[..., 0], xi[..., 1], xi[..., 2]
    y = jnp.asarray(T["LabToYF_b"], jnp.int32)[LL, 0]
    up = jnp.asarray(T["LuToUp_b"].reshape(-1), jnp.int32)[LL * 256 + uu]
    vp = jnp.asarray(T["LvToVp_b"].reshape(-1), jnp.int32)[LL * 256 + vv]
    zero = jnp.zeros_like(up)

    # xv = up*vp (37 bits)
    v0, v1 = vp & _M14, vp >> 14
    xv = _limbs_norm([up * v0, up * v1, zero, zero])
    # x = trunc(xv/BASE) fits int32; then x = trunc(y*x/BASE)
    xq = _limbs_shift14_trunc(xv)
    xs = xq[0] + (xq[1] << 14) + (xq[2] << 28)
    x0, x1 = xs & _M14, xs >> 14
    fl = y * x1 + ((y * x0) >> 14)
    rem = (y * x0) & _M14
    xout = fl + ((fl < 0) & (rem != 0)).astype(jnp.int32)

    # z chain needs vpl - xv*(255//3) at 48 bits
    vpl = jnp.asarray(T["LvToVpl_limbs"].reshape(-1, 4),
                      jnp.int32)[LL * 256 + vv]
    xv85 = _limbs_norm([l * 85 for l in xv])
    diff = _limbs_norm([vpl[..., k] - xv85[k] for k in range(4)])
    zp = _limbs_shift14_trunc(diff)                   # 34 bits, 3 limbs
    zq = _limbs_norm([zp[0], zp[1] - 1275, zp[2]])    # -5*255*BASE == -1275<<14
    zmq = _limbs_norm([y * zq[0], y * zq[1], y * zq[2], zero])
    zm = _limbs_shift14_trunc(zmq)                    # 34 bits, 3 limbs
    mid = (zm[1] << 14) + zm[0]                       # [0, 2^28)
    neg = zm[-1] < 0
    t256 = zm[2] * (1 << 20) + (mid >> 8)
    t256 = t256 + (neg & ((mid & 255) != 0)).astype(jnp.int32)
    t65536 = zm[2] * (1 << 12) + (mid >> 16)
    t65536 = t65536 + (neg & ((mid & 65535) != 0)).astype(jnp.int32)
    zout = t256 + t65536

    xout = jnp.clip(xout, 0, 2 * _LAB_BASE)
    zout = jnp.clip(zout, 0, 2 * _LAB_BASE)
    C = T["luv_inv_coeffs"]
    sh = _LAB_SHIFT + (14 - _INVG_SHIFT)
    ro = _idescale(int(C[0, 0]) * xout + int(C[0, 1]) * y
                   + int(C[0, 2]) * zout, sh)
    go = _idescale(int(C[1, 0]) * xout + int(C[1, 1]) * y
                   + int(C[1, 2]) * zout, sh)
    bo = _idescale(int(C[2, 0]) * xout + int(C[2, 1]) * y
                   + int(C[2, 2]) * zout, sh)
    out = _inv_gamma_store([bo, go, ro], srgb, T)
    if bidx == 2:
        out = out[..., ::-1]
    return out


def _lab_fwd(x, bidx, kind, srgb=True):
    fwd = _rgb2lab_f if kind == "lab" else _rgb2luv_f
    if _is_int(x):
        if kind == "lab":
            return _rgb2lab_u8(x, bidx, srgb)
        if srgb:
            return _rgb2luv_u8(x, bidx)
        # LRGB2Luv u8: the reference uses its float path here
        # (RGB2Luv_b:3415, interpolation disabled for linear RGB).
        xf = x.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        L, A, B = fwd(xf, bidx, srgb)
        out = jnp.stack([L * (255.0 / 100.0),
                         (A + 134.0) * (255.0 / 354.0),
                         (B + 140.0) * (255.0 / 262.0)], axis=-1)
        return saturate_cast(out, x.dtype)
    if kind == "lab" and srgb:
        return _rgb2lab_f32_interp(x, bidx)
    L, A, B = fwd(x, bidx, srgb)
    return jnp.stack([L, A, B], axis=-1).astype(jnp.float32)


def _lab_inv(x, bidx, kind, srgb=True):
    inv = _lab2rgb_f if kind == "lab" else _luv2rgb_f
    if _is_int(x):
        if kind == "lab":
            return _lab2rgb_u8(x, bidx, srgb)
        return _luv2rgb_u8(x, bidx, srgb)
    return inv(x[..., 0], x[..., 1], x[..., 2], bidx, srgb).astype(jnp.float32)


for _code, _bidx, _kind, _dir, _srgb in [
    (K.COLOR_BGR2Lab, 0, "lab", "fwd", True), (K.COLOR_RGB2Lab, 2, "lab", "fwd", True),
    (K.COLOR_Lab2BGR, 0, "lab", "inv", True), (K.COLOR_Lab2RGB, 2, "lab", "inv", True),
    (K.COLOR_BGR2Luv, 0, "luv", "fwd", True), (K.COLOR_RGB2Luv, 2, "luv", "fwd", True),
    (K.COLOR_Luv2BGR, 0, "luv", "inv", True), (K.COLOR_Luv2RGB, 2, "luv", "inv", True),
    (K.COLOR_LBGR2Lab, 0, "lab", "fwd", False), (K.COLOR_LRGB2Lab, 2, "lab", "fwd", False),
    (K.COLOR_Lab2LBGR, 0, "lab", "inv", False), (K.COLOR_Lab2LRGB, 2, "lab", "inv", False),
    (K.COLOR_LBGR2Luv, 0, "luv", "fwd", False), (K.COLOR_LRGB2Luv, 2, "luv", "fwd", False),
    (K.COLOR_Luv2LBGR, 0, "luv", "inv", False), (K.COLOR_Luv2LRGB, 2, "luv", "inv", False),
]:
    def _mk_lab(bidx=_bidx, kind=_kind, dirn=_dir, srgb=_srgb):
        def conv(x):
            if dirn == "fwd":
                return _lab_fwd(x, bidx, kind, srgb)
            return _lab_inv(x, bidx, kind, srgb)
        return conv
    _REGISTRY[_code] = _mk_lab()

# ------------------------------------------------ packed 16-bit RGB (5x5)
# RGB2RGB5x5 / RGB5x52RGB (imgproc/src/color_rgb.simd.hpp) — the packed
# pixel is a little-endian uint16 carried as CV_8UC2; all bit surgery is
# int32 VPU lane ops so outputs are bit-exact.


def _pack16(v):
    return jnp.stack([v & 255, (v >> 8) & 255], -1).astype(jnp.uint8)


def _unpack16(x):
    xi = x.astype(jnp.int32)
    return xi[..., 0] | (xi[..., 1] << 8)


def _to565(x, bidx):
    xi = x.astype(jnp.int32)
    b, g, r = xi[..., bidx], xi[..., 1], xi[..., 2 - bidx]
    return _pack16((b >> 3) | ((g & ~3) << 3) | ((r & ~7) << 8))


def _to555(x, bidx):
    xi = x.astype(jnp.int32)
    b, g, r = xi[..., bidx], xi[..., 1], xi[..., 2 - bidx]
    v = (b >> 3) | ((g & ~7) << 2) | ((r & ~7) << 7)
    if x.shape[-1] == 4:  # alpha -> bit 15 (set iff alpha != 0)
        v = v | jnp.where(xi[..., 3] != 0, 0x8000, 0)
    return _pack16(v)


def _from565(x, bidx, acn):
    v = _unpack16(x)
    b = (v << 3) & 0xF8
    g = (v >> 3) & 0xFC
    r = (v >> 8) & 0xF8
    ch = [b, g, r] if bidx == 0 else [r, g, b]
    if acn == 4:
        ch.append(jnp.full_like(b, 255))
    return jnp.stack(ch, -1).astype(jnp.uint8)


def _from555(x, bidx, acn):
    v = _unpack16(x)
    b = (v << 3) & 0xF8
    g = (v >> 2) & 0xF8
    r = (v >> 7) & 0xF8
    ch = [b, g, r] if bidx == 0 else [r, g, b]
    if acn == 4:  # alpha from bit 15
        ch.append(jnp.where((v & 0x8000) != 0, 255, 0))
    return jnp.stack(ch, -1).astype(jnp.uint8)


_REGISTRY[K.COLOR_BGR2BGR565] = lambda x: _to565(x, 0)
_REGISTRY[K.COLOR_RGB2BGR565] = lambda x: _to565(x, 2)
_REGISTRY[K.COLOR_BGRA2BGR565] = lambda x: _to565(x, 0)
_REGISTRY[K.COLOR_RGBA2BGR565] = lambda x: _to565(x, 2)
_REGISTRY[K.COLOR_BGR5652BGR] = lambda x: _from565(x, 0, 3)
_REGISTRY[K.COLOR_BGR5652RGB] = lambda x: _from565(x, 2, 3)
_REGISTRY[K.COLOR_BGR5652BGRA] = lambda x: _from565(x, 0, 4)
_REGISTRY[K.COLOR_BGR5652RGBA] = lambda x: _from565(x, 2, 4)
_REGISTRY[K.COLOR_BGR2BGR555] = lambda x: _to555(x, 0)
_REGISTRY[K.COLOR_RGB2BGR555] = lambda x: _to555(x, 2)
_REGISTRY[K.COLOR_BGRA2BGR555] = lambda x: _to555(x, 0)
_REGISTRY[K.COLOR_RGBA2BGR555] = lambda x: _to555(x, 2)
_REGISTRY[K.COLOR_BGR5552BGR] = lambda x: _from555(x, 0, 3)
_REGISTRY[K.COLOR_BGR5552RGB] = lambda x: _from555(x, 2, 3)
_REGISTRY[K.COLOR_BGR5552BGRA] = lambda x: _from555(x, 0, 4)
_REGISTRY[K.COLOR_BGR5552RGBA] = lambda x: _from555(x, 2, 4)


@_register(K.COLOR_GRAY2BGR565)
def _gray2bgr565(x):
    t = x[..., 0].astype(jnp.int32)
    return _pack16((t >> 3) | ((t & ~3) << 3) | ((t & ~7) << 8))


@_register(K.COLOR_GRAY2BGR555)
def _gray2bgr555(x):
    t = x[..., 0].astype(jnp.int32)
    return _pack16((t >> 3) | ((t & ~7) << 2) | ((t & ~7) << 7))


@_register(K.COLOR_BGR5652GRAY)
def _bgr5652gray(x):
    y = _from565(x, 0, 3).astype(jnp.int32)
    t = descale(y[..., 0] * BY15 + y[..., 1] * GY15 + y[..., 2] * RY15,
                GRAY_SHIFT)
    return t[..., None].astype(jnp.uint8)


@_register(K.COLOR_BGR5552GRAY)
def _bgr5552gray(x):
    y = _from555(x, 0, 3).astype(jnp.int32)
    t = descale(y[..., 0] * BY15 + y[..., 1] * GY15 + y[..., 2] * RY15,
                GRAY_SHIFT)
    return t[..., None].astype(jnp.uint8)


# ---------------------------------------------- YUV 4:2:0 / 4:2:2 families
# ITU-R BT.601 studio-swing integer path (imgproc/src/color_yuv.simd.hpp,
# "ITUR_BT_601" constants): decode is Q20, encode to 4:2:0 is Q20, encode
# to packed 4:2:2 is Q14 with pair-summed chroma.  All products fit int32.

_ITUR_CY, _ITUR_CUB, _ITUR_CUG = 1220542, 2116026, -409993
_ITUR_CVG, _ITUR_CVR, _ITUR_SHIFT = -852492, 1673527, 20
# encoder (RGB -> YUV420): Q20
_ITUR_CRY, _ITUR_CGY, _ITUR_CBY = 269484, 528482, 102760
_ITUR_CRU, _ITUR_CGU, _ITUR_CBU = -155188, -305135, 460324
_ITUR_CGV, _ITUR_CBV = -385875, -74448
# RGB -> packed 4:2:2: Q14 (color_yuv.simd.hpp:1862-1881)
_R2Y422, _G2Y422, _B2Y422 = 4211, 8258, 1606
_R2U422, _G2U422, _B2U422 = -1212, -2384, 3596
_G2V422, _B2V422 = -3015, -582


def _yuv42x_to_rgb(Y, U, V, bidx, acn):
    """Shared BT.601 decode; Y/U/V are (N, H, W) int32 at full resolution."""
    u = U - 128
    v = V - 128
    y = jnp.maximum(Y - 16, 0) * _ITUR_CY
    half = 1 << (_ITUR_SHIFT - 1)
    r = (y + _ITUR_CVR * v + half) >> _ITUR_SHIFT
    g = (y + _ITUR_CVG * v + _ITUR_CUG * u + half) >> _ITUR_SHIFT
    b = (y + _ITUR_CUB * u + half) >> _ITUR_SHIFT
    ch = [b, g, r] if bidx == 0 else [r, g, b]
    if acn == 4:
        ch.append(jnp.full_like(b, 255))
    return jnp.clip(jnp.stack(ch, -1), 0, 255).astype(jnp.uint8)


def _split420(x, uidx, planar):
    """(N, H*3/2, W, 1) uint8 -> full-res int32 Y, U, V planes."""
    Hs = x.shape[1]
    H = Hs * 2 // 3
    W = x.shape[2]
    N = x.shape[0]
    Y = x[:, :H, :, 0].astype(jnp.int32)
    chroma = x[:, H:, :, 0]
    if planar:  # I420 / YV12: quarter planes stacked
        a = chroma[:, : H // 4].reshape(N, H // 2, W // 2)
        bq = chroma[:, H // 4:].reshape(N, H // 2, W // 2)
        U, V = (a, bq) if uidx == 0 else (bq, a)
    else:  # NV12 / NV21: interleaved rows
        uv = chroma.reshape(N, H // 2, W // 2, 2)
        U, V = (uv[..., 0], uv[..., 1]) if uidx == 0 else (uv[..., 1], uv[..., 0])
    up = lambda c: jnp.repeat(jnp.repeat(c.astype(jnp.int32), 2, 1), 2, 2)
    return Y, up(U), up(V)


for _code, _uidx, _planar, _bidx, _acn in [
    (K.COLOR_YUV2RGB_NV12, 0, False, 2, 3), (K.COLOR_YUV2BGR_NV12, 0, False, 0, 3),
    (K.COLOR_YUV2RGB_NV21, 1, False, 2, 3), (K.COLOR_YUV2BGR_NV21, 1, False, 0, 3),
    (K.COLOR_YUV2RGBA_NV12, 0, False, 2, 4), (K.COLOR_YUV2BGRA_NV12, 0, False, 0, 4),
    (K.COLOR_YUV2RGBA_NV21, 1, False, 2, 4), (K.COLOR_YUV2BGRA_NV21, 1, False, 0, 4),
    (K.COLOR_YUV2RGB_IYUV, 0, True, 2, 3), (K.COLOR_YUV2BGR_IYUV, 0, True, 0, 3),
    (K.COLOR_YUV2RGB_YV12, 1, True, 2, 3), (K.COLOR_YUV2BGR_YV12, 1, True, 0, 3),
    (K.COLOR_YUV2RGBA_IYUV, 0, True, 2, 4), (K.COLOR_YUV2BGRA_IYUV, 0, True, 0, 4),
    (K.COLOR_YUV2RGBA_YV12, 1, True, 2, 4), (K.COLOR_YUV2BGRA_YV12, 1, True, 0, 4),
]:
    def _mk420(uidx=_uidx, planar=_planar, bidx=_bidx, acn=_acn):
        def conv(x):
            Y, U, V = _split420(x, uidx, planar)
            return _yuv42x_to_rgb(Y, U, V, bidx, acn)
        return conv
    _REGISTRY[_code] = _mk420()


@_register(K.COLOR_YUV2GRAY_420)
def _yuv2gray420(x):
    H = x.shape[1] * 2 // 3
    return x[:, :H]


def _split422(x, yidx, uidx):
    """(N, H, W, 2) packed 4:2:2 -> full-res int32 Y, U, V."""
    N, H, W = x.shape[0], x.shape[1], x.shape[2]
    quad = x.reshape(N, H, W // 2, 4).astype(jnp.int32)
    Y = quad[..., [yidx, yidx + 2]].reshape(N, H, W)
    # layouts: YUY2 y=0,u=1 -> v=3; YVYU y=0,u=3 -> v=1; UYVY y=1,u=0 -> v=2
    if yidx == 0:
        vidx = 3 if uidx == 1 else 1
    else:
        vidx = 2
    up = lambda c: jnp.repeat(c, 2, -1)
    return Y, up(quad[..., uidx]), up(quad[..., vidx])


for _code, _yidx, _uidx, _bidx, _acn in [
    (K.COLOR_YUV2RGB_YUY2, 0, 1, 2, 3), (K.COLOR_YUV2BGR_YUY2, 0, 1, 0, 3),
    (K.COLOR_YUV2RGB_YVYU, 0, 3, 2, 3), (K.COLOR_YUV2BGR_YVYU, 0, 3, 0, 3),
    (K.COLOR_YUV2RGB_UYVY, 1, 0, 2, 3), (K.COLOR_YUV2BGR_UYVY, 1, 0, 0, 3),
    (K.COLOR_YUV2RGBA_YUY2, 0, 1, 2, 4), (K.COLOR_YUV2BGRA_YUY2, 0, 1, 0, 4),
    (K.COLOR_YUV2RGBA_YVYU, 0, 3, 2, 4), (K.COLOR_YUV2BGRA_YVYU, 0, 3, 0, 4),
    (K.COLOR_YUV2RGBA_UYVY, 1, 0, 2, 4), (K.COLOR_YUV2BGRA_UYVY, 1, 0, 0, 4),
]:
    def _mk422(yidx=_yidx, uidx=_uidx, bidx=_bidx, acn=_acn):
        def conv(x):
            Y, U, V = _split422(x, yidx, uidx)
            return _yuv42x_to_rgb(Y, U, V, bidx, acn)
        return conv
    _REGISTRY[_code] = _mk422()


@_register(K.COLOR_YUV2GRAY_YUY2)
def _yuv2gray_yuy2(x):
    return x[..., 0:1]


@_register(K.COLOR_YUV2GRAY_UYVY)
def _yuv2gray_uyvy(x):
    return x[..., 1:2]


def _rgb_to_yuv420(x, bidx, vfirst):
    """(N, H, W, C) uint8 -> (N, H*3/2, W, 1) planar I420 (or YV12)."""
    N, H, W = x.shape[0], x.shape[1], x.shape[2]
    xi = x.astype(jnp.int32)
    b, g, r = xi[..., bidx], xi[..., 1], xi[..., 2 - bidx]
    sh, half = _ITUR_SHIFT, 1 << (_ITUR_SHIFT - 1)
    y = (_ITUR_CRY * r + _ITUR_CGY * g + _ITUR_CBY * b + half
         + (16 << sh)) >> sh
    # chroma from the top-left pixel of each 2x2 block
    r2, g2, b2 = r[:, ::2, ::2], g[:, ::2, ::2], b[:, ::2, ::2]
    u = (_ITUR_CRU * r2 + _ITUR_CGU * g2 + _ITUR_CBU * b2 + half
         + (128 << sh)) >> sh
    v = (_ITUR_CBU * r2 + _ITUR_CGV * g2 + _ITUR_CBV * b2 + half
         + (128 << sh)) >> sh
    u = jnp.clip(u, 0, 255).reshape(N, H // 4, W)
    v = jnp.clip(v, 0, 255).reshape(N, H // 4, W)
    if vfirst:
        u, v = v, u
    out = jnp.concatenate([jnp.clip(y, 0, 255), u, v], axis=1)
    return out.astype(jnp.uint8)[..., None]


for _code, _bidx, _vfirst in [
    (K.COLOR_RGB2YUV_I420, 2, False), (K.COLOR_BGR2YUV_I420, 0, False),
    (K.COLOR_RGBA2YUV_I420, 2, False), (K.COLOR_BGRA2YUV_I420, 0, False),
    (K.COLOR_RGB2YUV_YV12, 2, True), (K.COLOR_BGR2YUV_YV12, 0, True),
    (K.COLOR_RGBA2YUV_YV12, 2, True), (K.COLOR_BGRA2YUV_YV12, 0, True),
]:
    def _mkenc420(bidx=_bidx, vfirst=_vfirst):
        return lambda x: _rgb_to_yuv420(x, bidx, vfirst)
    _REGISTRY[_code] = _mkenc420()


def _rgb_to_yuv422(x, bidx, yidx, uidx):
    """(N, H, W, C) uint8 -> (N, H, W, 2) packed 4:2:2 (Q14 encoder)."""
    N, H, W = x.shape[0], x.shape[1], x.shape[2]
    xi = x.astype(jnp.int32)
    b, g, r = xi[..., bidx], xi[..., 1], xi[..., 2 - bidx]
    sh = 14
    half = 1 << (sh - 1)
    y = (_R2Y422 * r + _G2Y422 * g + _B2Y422 * b + (16 << sh) + half) >> sh
    sr = r[:, :, ::2] + r[:, :, 1::2]
    sg = g[:, :, ::2] + g[:, :, 1::2]
    sb = b[:, :, ::2] + b[:, :, 1::2]
    u = (_R2U422 * sr + _G2U422 * sg + _B2U422 * sb + (half * 256) + half) >> sh
    v = (_B2U422 * sr + _G2V422 * sg + _B2V422 * sb + (half * 256) + half) >> sh
    y = jnp.clip(y, 0, 255)
    u = jnp.clip(u, 0, 255)
    v = jnp.clip(v, 0, 255)
    quad = jnp.zeros((N, H, W // 2, 4), jnp.int32)
    vidx = (3 if uidx == 1 else 1) if yidx == 0 else 2
    quad = quad.at[..., yidx].set(y[:, :, ::2])
    quad = quad.at[..., yidx + 2].set(y[:, :, 1::2])
    quad = quad.at[..., uidx].set(u)
    quad = quad.at[..., vidx].set(v)
    return quad.reshape(N, H, W, 2).astype(jnp.uint8)


for _code, _yidx, _uidx, _bidx in [
    (K.COLOR_RGB2YUV_YUY2, 0, 1, 2), (K.COLOR_BGR2YUV_YUY2, 0, 1, 0),
    (K.COLOR_RGBA2YUV_YUY2, 0, 1, 2), (K.COLOR_BGRA2YUV_YUY2, 0, 1, 0),
    (K.COLOR_RGB2YUV_YVYU, 0, 3, 2), (K.COLOR_BGR2YUV_YVYU, 0, 3, 0),
    (K.COLOR_RGBA2YUV_YVYU, 0, 3, 2), (K.COLOR_BGRA2YUV_YVYU, 0, 3, 0),
    (K.COLOR_RGB2YUV_UYVY, 1, 0, 2), (K.COLOR_BGR2YUV_UYVY, 1, 0, 0),
    (K.COLOR_RGBA2YUV_UYVY, 1, 0, 2), (K.COLOR_BGRA2YUV_UYVY, 1, 0, 0),
]:
    def _mkenc422(yidx=_yidx, uidx=_uidx, bidx=_bidx):
        return lambda x: _rgb_to_yuv422(x, bidx, yidx, uidx)
    _REGISTRY[_code] = _mkenc422()


# --------------------------------------------------------------- public

def cvtColor(src, code: int, dstCn: int = 0):
    """Convert an image (or NHWC batch) between color spaces.

    Mirrors `cv::cvtColor` (imgproc/src/color.cpp:192).  ``code`` must be a
    static Python int (it selects the program, like the reference's switch).
    """
    if K.COLOR_BayerBG2BGR <= code <= K.COLOR_BayerGR2BGR:
        # Bayer family routes to the demosaicing engine like the
        # reference's cvtColor switch (color.cpp demosaicing cases)
        from .misc import demosaicing
        return demosaicing(src, code, dstCn)
    try:
        fn = _REGISTRY[code]
    except KeyError:
        raise NotImplementedError(f"cvtColor code {code} not implemented yet")
    x, meta = to_batched(src)
    y = fn(x)
    return from_batched(y, meta)


def cvtColorTwoPlane(ysrc, uvsrc, code: int):
    """cv::cvtColorTwoPlane (color.cpp) — NV12/NV21 semi-planar YUV420
    given as separate Y (H,W) and interleaved UV (H/2, W/2, 2) planes.
    Reassembles the single-buffer layout and reuses the fused NV12/NV21
    program (the device conversion is identical)."""
    import numpy as _np
    y = _np.asarray(ysrc)
    uv = _np.asarray(uvsrc)
    H, W = y.shape[:2]
    buf = _np.concatenate([y.reshape(H, W),
                           uv.reshape(H // 2, W)], axis=0)
    return cvtColor(buf, code)
