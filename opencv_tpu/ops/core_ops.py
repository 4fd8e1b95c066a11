"""Core dense-array operations (modules/core: arithm.cpp, matrix ops,
statistics, LUT, norm, convert) — the cv2 surface users touch constantly.

All saturating-integer semantics go through core.fixedpoint.saturate_cast;
everything is batched NHWC-aware elementwise/reduction jnp, fully fusible.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import constants as K
from ..core.arrays import to_batched, from_batched
from ..core.fixedpoint import saturate_cast

__all__ = [
    "add", "subtract", "multiply", "divide", "absdiff", "scaleAdd",
    "addWeighted", "bitwise_and", "bitwise_or", "bitwise_xor", "bitwise_not",
    "min", "max", "compare", "inRange",
    "LUT", "convertScaleAbs", "normalize",
    "split", "merge", "flip", "rotate", "transpose",
    "minMaxLoc", "mean", "meanStdDev", "norm", "countNonZero", "sumElems",
    "magnitude", "phase", "cartToPolar", "polarToCart", "exp", "log",
    "sqrt", "pow",
]


def _pair(a, b):
    x, meta = to_batched(a)
    if np.isscalar(b) or (hasattr(b, "ndim") and np.ndim(b) == 0):
        return x, jnp.asarray(b), meta
    y, _ = to_batched(b)
    return x, y, meta


def _apply_mask(out, orig, mask):
    if mask is None:
        return out
    m, _ = to_batched(mask)
    return jnp.where(m != 0, out, orig)


def add(src1, src2, mask=None, dtype=None):
    x, y, meta = _pair(src1, src2)
    acc = x.astype(jnp.float32) + y.astype(jnp.float32)
    out = saturate_cast(acc, x.dtype if dtype is None else dtype)
    return from_batched(_apply_mask(out, jnp.zeros_like(out), mask), meta)


def subtract(src1, src2, mask=None, dtype=None):
    x, y, meta = _pair(src1, src2)
    acc = x.astype(jnp.float32) - y.astype(jnp.float32)
    out = saturate_cast(acc, x.dtype if dtype is None else dtype)
    return from_batched(_apply_mask(out, jnp.zeros_like(out), mask), meta)


def multiply(src1, src2, scale: float = 1.0, dtype=None):
    x, y, meta = _pair(src1, src2)
    acc = x.astype(jnp.float32) * y.astype(jnp.float32) * jnp.float32(scale)
    return from_batched(saturate_cast(acc, x.dtype if dtype is None else dtype), meta)


def divide(src1, src2, scale: float = 1.0, dtype=None):
    x, y, meta = _pair(src1, src2)
    yf = y.astype(jnp.float32)
    acc = jnp.where(yf != 0, x.astype(jnp.float32) * jnp.float32(scale) / yf, 0.0)
    return from_batched(saturate_cast(acc, x.dtype if dtype is None else dtype), meta)


def absdiff(src1, src2):
    x, y, meta = _pair(src1, src2)
    acc = jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))
    return from_batched(saturate_cast(acc, x.dtype), meta)


def scaleAdd(src1, alpha: float, src2):
    x, y, meta = _pair(src1, src2)
    acc = x.astype(jnp.float32) * jnp.float32(alpha) + y.astype(jnp.float32)
    return from_batched(saturate_cast(acc, x.dtype), meta)


def addWeighted(src1, alpha: float, src2, beta: float, gamma: float,
                dtype=None):
    x, y, meta = _pair(src1, src2)
    acc = (x.astype(jnp.float32) * jnp.float32(alpha)
           + y.astype(jnp.float32) * jnp.float32(beta) + jnp.float32(gamma))
    return from_batched(saturate_cast(acc, x.dtype if dtype is None else dtype), meta)


def _bitwise(op, src1, src2, mask=None):
    x, y, meta = _pair(src1, src2)
    out = op(x, y.astype(x.dtype))
    return from_batched(_apply_mask(out, jnp.zeros_like(out), mask), meta)


def bitwise_and(src1, src2, mask=None):
    return _bitwise(jnp.bitwise_and, src1, src2, mask)


def bitwise_or(src1, src2, mask=None):
    return _bitwise(jnp.bitwise_or, src1, src2, mask)


def bitwise_xor(src1, src2, mask=None):
    return _bitwise(jnp.bitwise_xor, src1, src2, mask)


def bitwise_not(src, mask=None):
    x, meta = to_batched(src)
    out = jnp.bitwise_not(x)
    return from_batched(_apply_mask(out, jnp.zeros_like(out), mask), meta)


def min(src1, src2):  # noqa: A001
    x, y, meta = _pair(src1, src2)
    return from_batched(jnp.minimum(x, y.astype(x.dtype)), meta)


def max(src1, src2):  # noqa: A001
    x, y, meta = _pair(src1, src2)
    return from_batched(jnp.maximum(x, y.astype(x.dtype)), meta)


_CMP = {0: jnp.equal, 1: jnp.greater, 2: jnp.greater_equal,
        3: jnp.less, 4: jnp.less_equal, 5: jnp.not_equal}


def compare(src1, src2, cmpop: int):
    x, y, meta = _pair(src1, src2)
    out = jnp.where(_CMP[cmpop](x.astype(jnp.float32), y.astype(jnp.float32)),
                    jnp.uint8(255), jnp.uint8(0))
    return from_batched(out, meta)


def inRange(src, lowerb, upperb):
    x, meta = to_batched(src)
    lo = jnp.asarray(np.asarray(lowerb, np.float64).reshape(1, 1, 1, -1),
                     jnp.float32)
    hi = jnp.asarray(np.asarray(upperb, np.float64).reshape(1, 1, 1, -1),
                     jnp.float32)
    xf = x.astype(jnp.float32)
    ok = jnp.all((xf >= lo) & (xf <= hi), axis=-1, keepdims=True)
    return from_batched(jnp.where(ok, jnp.uint8(255), jnp.uint8(0)), meta)


def LUT(src, lut):
    x, meta = to_batched(src)
    assert x.dtype == jnp.uint8
    from .hist import _lut_apply_fixed
    table = jnp.asarray(np.asarray(lut).reshape(256, -1))
    if table.shape[1] == 1:
        out = _lut_apply_fixed(x, table[:, 0])
    else:  # per-channel LUT
        C = x.shape[-1]
        out = jnp.stack([_lut_apply_fixed(x[..., c], table[:, c])
                         for c in range(C)], axis=-1)
    return from_batched(out.astype(table.dtype), meta)


def convertScaleAbs(src, alpha: float = 1.0, beta: float = 0.0):
    x, meta = to_batched(src)
    acc = jnp.abs(x.astype(jnp.float32) * jnp.float32(alpha) + jnp.float32(beta))
    return from_batched(saturate_cast(acc, jnp.uint8), meta)


def normalize(src, dst=None, alpha: float = 1.0, beta: float = 0.0,
              norm_type: int = K.NORM_L2, dtype: int = -1, mask=None):
    x, meta = to_batched(src)
    xf = x.astype(jnp.float32)
    if norm_type == K.NORM_MINMAX:
        mn = jnp.min(xf)
        mx = jnp.max(xf)
        lo, hi = (alpha, beta) if alpha < beta else (beta, alpha)
        scale = jnp.where(mx > mn, (hi - lo) / (mx - mn), 0.0)
        out = (xf - mn) * scale + lo
    else:
        if norm_type == K.NORM_L2:
            n = jnp.sqrt(jnp.sum(xf * xf))
        elif norm_type == K.NORM_L1:
            n = jnp.sum(jnp.abs(xf))
        else:  # NORM_INF
            n = jnp.max(jnp.abs(xf))
        out = xf * jnp.where(n > 0, alpha / n, 0.0)
    out_dtype = x.dtype if dtype in (-1, None) else {
        K.CV_8U: jnp.uint8, K.CV_32F: jnp.float32,
        K.CV_16U: jnp.uint16, K.CV_16S: jnp.int16}[dtype]
    return from_batched(saturate_cast(out, out_dtype), meta)


def split(src):
    x, meta = to_batched(src)
    return [from_batched(x[..., i:i + 1], meta) for i in range(x.shape[-1])]


def merge(channels):
    xs = []
    meta = None
    for c in channels:
        x, meta = to_batched(c)
        xs.append(x)
    return from_batched(jnp.concatenate(xs, axis=-1), meta)


def flip(src, flipCode: int):
    x, meta = to_batched(src)
    if flipCode == 0:
        y = x[:, ::-1]
    elif flipCode > 0:
        y = x[:, :, ::-1]
    else:
        y = x[:, ::-1, ::-1]
    return from_batched(y, meta)


def rotate(src, rotateCode: int):
    x, meta = to_batched(src)
    if rotateCode == K.ROTATE_90_CLOCKWISE:
        y = jnp.transpose(x, (0, 2, 1, 3))[:, :, ::-1]
    elif rotateCode == K.ROTATE_180:
        y = x[:, ::-1, ::-1]
    else:
        y = jnp.transpose(x, (0, 2, 1, 3))[:, ::-1]
    return from_batched(y, meta)


def transpose(src):
    x, meta = to_batched(src)
    return from_batched(jnp.transpose(x, (0, 2, 1, 3)), meta)


def minMaxLoc(src, mask=None):
    x, meta = to_batched(src)
    assert x.shape[-1] == 1, "minMaxLoc requires single-channel input"
    v = x[0, :, :, 0]
    if mask is not None:
        m, _ = to_batched(mask)
        mm = m[0, :, :, 0] != 0
        big = jnp.asarray(np.inf, jnp.float32)
        vf = v.astype(jnp.float32)
        vmin_src = jnp.where(mm, vf, big)
        vmax_src = jnp.where(mm, vf, -big)
    else:
        vmin_src = vmax_src = v.astype(jnp.float32)
    mn_i = jnp.argmin(vmin_src.reshape(-1))
    mx_i = jnp.argmax(vmax_src.reshape(-1))
    W = v.shape[1]
    mn = vmin_src.reshape(-1)[mn_i]
    mx = vmax_src.reshape(-1)[mx_i]
    return (float(mn), float(mx),
            (int(mn_i) % W, int(mn_i) // W),
            (int(mx_i) % W, int(mx_i) // W))


def mean(src, mask=None):
    x, meta = to_batched(src)
    xf = x.astype(jnp.float32)
    if mask is not None:
        m, _ = to_batched(mask)
        mm = (m != 0).astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(mm), 1.0)
        vals = [float(jnp.sum(xf[..., c:c + 1] * mm) / cnt)
                for c in range(x.shape[-1])]
    else:
        vals = [float(jnp.mean(xf[..., c])) for c in range(x.shape[-1])]
    return tuple(vals + [0.0] * (4 - len(vals)))


def meanStdDev(src, mask=None):
    x, meta = to_batched(src)
    xf = x.astype(jnp.float32)
    mus, sds = [], []
    for c in range(x.shape[-1]):
        v = xf[..., c]
        mu = jnp.mean(v)
        sd = jnp.sqrt(jnp.mean((v - mu) ** 2))
        mus.append(float(mu))
        sds.append(float(sd))
    return (np.asarray(mus).reshape(-1, 1), np.asarray(sds).reshape(-1, 1))


def norm(src1, normType: int = K.NORM_L2, mask=None):
    x, meta = to_batched(src1)
    xf = x.astype(jnp.float32)
    nt = normType & K.NORM_TYPE_MASK
    if nt == K.NORM_INF:
        return float(jnp.max(jnp.abs(xf)))
    if nt == K.NORM_L1:
        return float(jnp.sum(jnp.abs(xf)))
    if nt == K.NORM_L2:
        return float(jnp.sqrt(jnp.sum(xf * xf)))
    if nt == K.NORM_L2SQR:
        return float(jnp.sum(xf * xf))
    raise ValueError(f"unsupported norm {normType}")


def countNonZero(src):
    x, _ = to_batched(src)
    return int(jnp.count_nonzero(x))


def sumElems(src):
    x, _ = to_batched(src)
    vals = [float(jnp.sum(x[..., c].astype(jnp.float64)
                          if x.dtype.kind in 'ui' else x[..., c].astype(jnp.float32)))
            for c in range(x.shape[-1])]
    return tuple(vals + [0.0] * (4 - len(vals)))


def magnitude(x, y):
    a, b, meta = _pair(x, y)
    return from_batched(jnp.sqrt(a.astype(jnp.float32) ** 2
                                 + b.astype(jnp.float32) ** 2), meta)


def phase(x, y, angleInDegrees: bool = False):
    a, b, meta = _pair(x, y)
    ang = jnp.arctan2(b.astype(jnp.float32), a.astype(jnp.float32))
    ang = jnp.where(ang < 0, ang + 2 * np.pi, ang)
    if angleInDegrees:
        ang = ang * jnp.float32(180.0 / np.pi)
    return from_batched(ang, meta)


def cartToPolar(x, y, angleInDegrees: bool = False):
    return magnitude(x, y), phase(x, y, angleInDegrees)


def polarToCart(mag, angle, angleInDegrees: bool = False):
    m, a, meta = _pair(mag, angle)
    af = a.astype(jnp.float32)
    if angleInDegrees:
        af = af * jnp.float32(np.pi / 180.0)
    mf = m.astype(jnp.float32)
    return from_batched(mf * jnp.cos(af), meta), \
        from_batched(mf * jnp.sin(af), meta)


def exp(src):
    x, meta = to_batched(src)
    return from_batched(jnp.exp(x.astype(jnp.float32)), meta)


def log(src):
    x, meta = to_batched(src)
    return from_batched(jnp.log(x.astype(jnp.float32)), meta)


def sqrt(src):
    x, meta = to_batched(src)
    return from_batched(jnp.sqrt(x.astype(jnp.float32)), meta)


def pow(src, power: float):  # noqa: A001
    x, meta = to_batched(src)
    return from_batched(jnp.power(x.astype(jnp.float32), power), meta)
