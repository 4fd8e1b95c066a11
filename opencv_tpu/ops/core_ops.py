"""Core dense-array operations (modules/core: arithm.cpp, matrix ops,
statistics, LUT, norm, convert) — the cv2 surface users touch constantly.

All saturating-integer semantics go through core.fixedpoint.saturate_cast;
everything is batched NHWC-aware elementwise/reduction jnp, fully fusible.
"""

from __future__ import annotations

import builtins

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
    "mixChannels", "setIdentity", "completeSymm", "solveCubic",
    "solvePoly", "PSNR", "batchDistance",
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


# --------------------------------------------------------------------------
# tail APIs: mixChannels / setIdentity / completeSymm / solveCubic /
# solvePoly / PSNR / batchDistance (core/src/{channels,matrix_ops,
# mathfuncs,norm,batch_distance}.cpp)
# --------------------------------------------------------------------------

def mixChannels(src, dst, fromTo):
    """`cv::mixChannels` (core/src/channels.cpp): scatter channel planes
    from the `src` list into the `dst` list per (from, to) index pairs
    (global channel numbering across the array lists; -1 source fills 0).
    Returns the updated dst list (numpy arrays, cv2-compatible)."""
    srcs = [np.atleast_3d(np.asarray(s)) for s in src]
    outs = [np.atleast_3d(np.asarray(d)).copy() for d in dst]
    pairs = np.asarray(fromTo, np.int64).reshape(-1, 2)
    sbound = np.cumsum([s.shape[2] for s in srcs])
    dbound = np.cumsum([d.shape[2] for d in outs])
    for f, t in pairs:
        di = int(np.searchsorted(dbound, t, side="right"))
        dc = int(t - (dbound[di - 1] if di else 0))
        if f < 0:
            outs[di][:, :, dc] = 0
        else:
            si = int(np.searchsorted(sbound, f, side="right"))
            sc = int(f - (sbound[si - 1] if si else 0))
            outs[di][:, :, dc] = srcs[si][:, :, sc]
    res = []
    for d0, o in zip(dst, outs):
        a = np.asarray(d0)
        res.append(o[:, :, 0] if a.ndim == 2 else o)
    return res


def setIdentity(mtx, s=1.0):
    """`cv::setIdentity` (core/src/matrix_ops.cpp): diagonal = s,
    elsewhere 0.  Returns a new array of mtx's shape/dtype."""
    a = np.asarray(mtx)
    out = np.zeros_like(a)
    n = builtins.min(out.shape[0], out.shape[1])
    val = np.asarray(s)
    val = val.reshape(-1)[0] if val.size else s
    out[np.arange(n), np.arange(n), ...] = np.asarray(val, out.dtype)
    return out


def completeSymm(m, lowerToUpper: bool = False):
    """`cv::completeSymm` (core/src/matrix_ops.cpp): copy one triangle
    onto the other (default: upper -> lower)."""
    a = np.array(m, copy=True)
    lo = np.tril_indices(a.shape[0], -1)
    if lowerToUpper:
        a[lo[1], lo[0]] = a[lo]
    else:
        a[lo] = a[lo[1], lo[0]]
    return a


def solveCubic(coeffs):
    """`cv::solveCubic` (core/src/mathfuncs.cpp:1797): real roots of
    c0 x^3 + c1 x^2 + c2 x + c3 (or the quadratic when len==3).
    Returns (nroots, roots(3,1)) with unused entries 0."""
    c = np.asarray(coeffs, np.float64).reshape(-1)
    roots = np.zeros(3, np.float64)
    if len(c) == 3:
        a0, b0, c0 = 1.0, c[0], None
        # quadratic a x^2 + b x + c
        a, b, cc = c[0], c[1], c[2]
        if a == 0:
            if b == 0:
                n = -1 if cc == 0 else 0
            else:
                roots[0] = -cc / b
                n = 1
        else:
            d = b * b - 4 * a * cc
            if d < 0:
                n = 0
            elif d == 0:
                roots[0] = -b / (2 * a)
                n = 1
            else:
                sd = np.sqrt(d)
                roots[0] = (-b + sd) / (2 * a)
                roots[1] = (-b - sd) / (2 * a)
                n = 2
    else:
        a0, a1, a2, a3 = (c if len(c) == 4 else np.r_[1.0, c])
        if a0 == 0:
            return solveCubic(np.r_[a1, a2, a3])
        r = np.roots([a0, a1, a2, a3])
        real = np.sort(r[np.abs(r.imag) < 1e-9 * np.maximum(1, np.abs(r))].real)
        n = len(real)
        roots[:n] = real[:n]
    return builtins.max(n, 0) if n >= 0 else n, roots.reshape(3, 1)


def solvePoly(coeffs, maxIters: int = 300):
    """`cv::solvePoly` (core/src/mathfuncs.cpp:1944): all complex roots
    of Σ c[i] x^i (note: cv2 coefficient order is LOW to HIGH degree).
    Returns (maxDiff, roots(n,1,2))."""
    c = np.asarray(coeffs, np.float64).reshape(-1)
    n = len(c) - 1
    r = np.roots(c[::-1])
    # refine + report residual like the reference's Durand-Kerner bound
    vals = np.polyval(c[::-1], r)
    md = float(np.max(np.abs(vals))) if len(r) else 0.0
    out = np.zeros((n, 1, 2), np.float64)
    out[:len(r), 0, 0] = r.real
    out[:len(r), 0, 1] = r.imag
    return md, out


def PSNR(src1, src2, R: float = 255.0):
    """`cv::PSNR` (core/src/norm.cpp:1291)."""
    a = np.asarray(src1, np.float64)
    b = np.asarray(src2, np.float64)
    diff = np.sqrt(np.mean((a - b) ** 2))
    return float(20 * np.log10(R / (diff + np.finfo(np.float64).eps)))


def batchDistance(src1, src2, dtype: int = -1, nidx=None,
                  normType: int = K.NORM_L2, K_: int = 0, mask=None,
                  update: int = 0, crosscheck: bool = False, K=None):
    """`cv::batchDistance` (core/src/batch_distance.cpp:265): all-pairs
    distances between row vectors; K>0 additionally returns the K nearest
    src2 rows per src1 row.  MXU formulation: L2/L2SQR ride one matmul
    (|a-b|^2 = |a|^2 + |b|^2 - 2ab); Hamming via popcount table."""
    if K is not None:
        K_ = K
    import jax
    from .. import constants as _K
    a = jnp.asarray(np.asarray(src1))
    b = jnp.asarray(np.asarray(src2))
    if normType in (_K.NORM_L2, _K.NORM_L2SQR):
        af = a.astype(jnp.float32)
        bf = b.astype(jnp.float32)
        g = jax.lax.dot_general(af, bf, (((1,), (1,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
        d2 = (jnp.sum(af * af, axis=1)[:, None]
              + jnp.sum(bf * bf, axis=1)[None, :] - 2 * g)
        d2 = jnp.maximum(d2, 0.0)
        dist = jnp.sqrt(d2) if normType == _K.NORM_L2 else d2
    elif normType == _K.NORM_L1:
        af = a.astype(jnp.float32)
        bf = b.astype(jnp.float32)
        dist = jnp.sum(jnp.abs(af[:, None, :] - bf[None, :, :]), axis=2)
    elif normType in (_K.NORM_HAMMING, _K.NORM_HAMMING2):
        x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])
        pc = jnp.asarray(np.unpackbits(
            np.arange(256, dtype=np.uint8)[:, None],
            axis=1).sum(1).astype(np.int32))
        dist = jnp.sum(jnp.take(pc, x.astype(jnp.int32)), axis=2) \
            .astype(jnp.int32)
        if normType == _K.NORM_HAMMING2:
            dist = dist  # pairwise tally handled by WTA_K path upstream
    else:
        raise ValueError(f"unsupported normType {normType}")
    dist = np.asarray(dist)
    if normType in (_K.NORM_HAMMING, _K.NORM_HAMMING2):
        dist = dist.astype(np.int32)
    else:
        dist = dist.astype(np.float32)
    if K_ > 0:
        order = np.argsort(dist, axis=1, kind="stable")[:, :K_]
        nidx_out = order.astype(np.int32)
        dist_out = np.take_along_axis(dist, order, axis=1)
        return dist_out, nidx_out
    return dist


# --------------------------------------------------------------------------
# core utility surface (round 3 sweep): concat/repeat/reduce/sort/
# findNonZero/checkRange/patchNaNs/channel ops/gemm/covar/divSpectrums/
# scalar math/clipLine (core/src/{matrix_ops,matmul,mathfuncs}.cpp)
# --------------------------------------------------------------------------

def hconcat(src):
    return np.concatenate([np.asarray(s) for s in src], axis=1)


def vconcat(src):
    return np.concatenate([np.asarray(s) for s in src], axis=0)


def repeat(src, ny: int, nx: int):
    a = np.asarray(src)
    reps = (ny, nx) + (1,) * (a.ndim - 2)
    return np.tile(a, reps)


REDUCE_SUM, REDUCE_AVG, REDUCE_MAX, REDUCE_MIN, REDUCE_SUM2 = 0, 1, 2, 3, 4


def reduce(src, dim: int, rtype: int, dtype: int = -1):
    a = np.asarray(src)
    f64 = a.astype(np.float64)
    if rtype == REDUCE_SUM:
        r = f64.sum(axis=dim, keepdims=True)
    elif rtype == REDUCE_AVG:
        r = f64.mean(axis=dim, keepdims=True)
    elif rtype == REDUCE_MAX:
        r = a.max(axis=dim, keepdims=True)
    elif rtype == REDUCE_MIN:
        r = a.min(axis=dim, keepdims=True)
    elif rtype == REDUCE_SUM2:
        r = (f64 * f64).sum(axis=dim, keepdims=True)
    else:
        raise ValueError(rtype)
    if rtype in (REDUCE_MAX, REDUCE_MIN):
        return r
    return r.astype(np.float32) if dtype in (-1, K.CV_32F) else r


def reduceArgMax(src, axis: int, lastIndex: bool = False):
    a = np.asarray(src)
    if lastIndex:
        flipped = np.flip(a, axis)
        idx = a.shape[axis] - 1 - np.argmax(flipped, axis=axis)
    else:
        idx = np.argmax(a, axis=axis)
    return np.expand_dims(idx.astype(np.int32), axis)


def reduceArgMin(src, axis: int, lastIndex: bool = False):
    a = np.asarray(src)
    if lastIndex:
        flipped = np.flip(a, axis)
        idx = a.shape[axis] - 1 - np.argmin(flipped, axis=axis)
    else:
        idx = np.argmin(a, axis=axis)
    return np.expand_dims(idx.astype(np.int32), axis)


SORT_EVERY_ROW, SORT_EVERY_COLUMN = 0, 1
SORT_ASCENDING, SORT_DESCENDING = 0, 16


def _sort_axis(flags):
    return 1 if not (flags & SORT_EVERY_COLUMN) else 0


def sort(src, flags: int):  # noqa: A001
    a = np.asarray(src)
    ax = _sort_axis(flags)
    r = np.sort(a, axis=ax)
    if flags & SORT_DESCENDING:
        r = np.flip(r, axis=ax)
    return r


def sortIdx(src, flags: int):
    a = np.asarray(src)
    ax = _sort_axis(flags)
    r = np.argsort(a, axis=ax, kind="stable")
    if flags & SORT_DESCENDING:
        r = np.flip(r, axis=ax)
    return r.astype(np.int32)


def findNonZero(src):
    a = np.asarray(src)
    ys, xs = np.nonzero(a)
    if len(ys) == 0:
        return None
    return np.stack([xs, ys], axis=1).astype(np.int32)


def hasNonZero(src):
    return bool(np.any(np.asarray(src)))


def checkRange(a, quiet: bool = True, minVal=-np.inf, maxVal=np.inf,
               pos=None):
    arr = np.asarray(a, np.float64)
    bad = ~((arr >= minVal) & (arr < maxVal))
    ok = not bool(bad.any())
    if not ok and not quiet:
        raise ValueError("checkRange failed")
    return ok


def patchNaNs(a, val: float = 0.0):
    arr = np.array(a, copy=True)
    if arr.dtype.kind == "f":
        arr[np.isnan(arr)] = val
    return arr


def extractChannel(src, coi: int):
    a = np.atleast_3d(np.asarray(src))
    return a[:, :, coi].copy()


def insertChannel(src, dst, coi: int):
    d = np.atleast_3d(np.asarray(dst)).copy()
    d[:, :, coi] = np.asarray(src)
    return d


def copyTo(src, mask=None, dst=None):
    a = np.asarray(src)
    if mask is None:
        return a.copy()
    m = np.asarray(mask) != 0
    if m.ndim < a.ndim:
        m = m[..., None]
    base = np.zeros_like(a) if dst is None else np.array(dst, copy=True)
    return np.where(m, a, base)


GEMM_1_T, GEMM_2_T, GEMM_3_T = 1, 2, 4


def gemm(src1, src2, alpha, src3, beta, flags: int = 0):
    a = np.asarray(src1, np.float64)
    b = np.asarray(src2, np.float64)
    if flags & GEMM_1_T:
        a = a.T
    if flags & GEMM_2_T:
        b = b.T
    r = alpha * (a @ b)
    if src3 is not None and np.asarray(src3).size:
        c = np.asarray(src3, np.float64)
        if flags & GEMM_3_T:
            c = c.T
        r = r + beta * c
    dt = np.asarray(src1).dtype
    return r.astype(dt if dt.kind == "f" else np.float64)


COVAR_SCRAMBLED, COVAR_NORMAL = 0, 1
COVAR_USE_AVG, COVAR_SCALE, COVAR_ROWS, COVAR_COLS = 2, 4, 8, 16


def calcCovarMatrix(samples, mean=None, flags: int = 0, ctype=6):
    a = np.asarray(samples, np.float64)
    if flags & COVAR_COLS:
        a = a.T
    n = a.shape[0]
    if flags & COVAR_USE_AVG and mean is not None:
        mu = np.asarray(mean, np.float64).reshape(1, -1)
    else:
        mu = a.mean(axis=0, keepdims=True)
    d = a - mu
    if flags & COVAR_SCRAMBLED and not (flags & COVAR_NORMAL):
        cov = d @ d.T
    else:
        cov = d.T @ d
    if flags & COVAR_SCALE:
        cov = cov / n
    return cov, mu.ravel()


def divSpectrums(a, b, flags: int = 0, conjB: bool = False):
    """CCS-format spectrum division (core/src/dxt.cpp divSpectrums) via
    complex math on the CCS-packed arrays (matches mulSpectrums'
    conventions in ops/transform.py)."""
    from .transform import _to_complex, _from_complex
    import jax.numpy as _jnp
    A = _to_complex(_jnp.asarray(np.asarray(a, np.float32)))
    B = _to_complex(_jnp.asarray(np.asarray(b, np.float32)))
    if conjB:
        B = _jnp.conj(B)
    mag = B.real ** 2 + B.imag ** 2
    mag = _jnp.where(mag == 0, 1.0, mag)
    C = A * _jnp.conj(B) / mag
    return np.asarray(_from_complex(C)).astype(np.asarray(a).dtype)


def fastAtan2(y: float, x: float) -> float:
    """cv::fastAtan2 — the reference's 7th-order polynomial in degrees."""
    import math
    P1 = 0.9997878412794807 * (180 / math.pi)
    P3 = -0.3258083974640975 * (180 / math.pi)
    P5 = 0.1555786518463281 * (180 / math.pi)
    P7 = -0.04432655554792128 * (180 / math.pi)
    ax, ay = abs(x), abs(y)
    eps = 2.220446049250313e-16
    c = ay / (ax + eps) if ax >= ay else ax / (ay + eps)
    c2 = c * c
    a = (((P7 * c2 + P5) * c2 + P3) * c2 + P1) * c
    if ax < ay:
        a = 90.0 - a
    if x < 0:
        a = 180.0 - a
    if y < 0:
        a = 360.0 - a
    return float(np.float32(a))


def cubeRoot(val: float) -> float:
    v = float(val)
    return float(np.float32(np.sign(v) * abs(v) ** (1.0 / 3.0)))


def clipLine(imgRect, pt1, pt2):
    """cv::clipLine (Liang-Barsky on the rect)."""
    if len(imgRect) == 2:   # imgSize form
        x0, y0, w, h = 0, 0, imgRect[0], imgRect[1]
    else:
        x0, y0, w, h = imgRect
    x1, y1 = float(pt1[0]), float(pt1[1])
    x2, y2 = float(pt2[0]), float(pt2[1])
    xmin, ymin, xmax, ymax = x0, y0, x0 + w - 1, y0 + h - 1
    t0, t1 = 0.0, 1.0
    dx, dy = x2 - x1, y2 - y1
    for p, q in ((-dx, x1 - xmin), (dx, xmax - x1),
                 (-dy, y1 - ymin), (dy, ymax - y1)):
        if p == 0:
            if q < 0:
                return False, tuple(map(int, pt1)), tuple(map(int, pt2))
        else:
            r = q / p
            # NB: plain builtins — this module defines cv-style array
            # max/min at module scope which would shadow them.
            if p < 0:
                t0 = r if r > t0 else t0
            else:
                t1 = r if r < t1 else t1
    if t0 > t1:
        return False, tuple(map(int, pt1)), tuple(map(int, pt2))
    nx1 = int(round(x1 + t0 * dx))
    ny1 = int(round(y1 + t0 * dy))
    nx2 = int(round(x1 + t1 * dx))
    ny2 = int(round(y1 + t1 * dy))
    return True, (nx1, ny1), (nx2, ny2)


def flipND(src, axis: int):
    return np.flip(np.asarray(src), axis).copy()


def transposeND(src, order):
    return np.transpose(np.asarray(src), order).copy()


def broadcast(src, shape):
    """cv::broadcast — numpy broadcasting to a 2D shape."""
    a = np.asarray(src)
    tgt = tuple(int(v) for v in np.asarray(shape).ravel())
    return np.ascontiguousarray(np.broadcast_to(a, tgt))


def finiteMask(src):
    """cv::finiteMask — 255 where finite, 0 at NaN/Inf."""
    a = np.asarray(src)
    m = np.isfinite(a)
    if m.ndim == 3:
        m = m.all(axis=-1)
    return (m.astype(np.uint8) * 255)


def solveLP(Func, Constr, constr_eps=1e-12):
    """cv::solveLP (core/src/lpsolver.cpp): maximize c·x subject to
    A·x <= b, x >= 0 — dense two-phase simplex.  Returns
    (status, x) with status in {0 single, 1 multiple, -1 unbounded,
    -2 infeasible} like SOLVELP_*."""
    c = np.asarray(Func, np.float64).ravel()
    Ab = np.asarray(Constr, np.float64)
    A, b = Ab[:, :-1], Ab[:, -1]
    m, n = A.shape
    # standard form with slacks: [A I][x s]^T = b
    # self-contained Dantzig-rule tableau simplex
    T = np.zeros((m + 1, n + m + 1))
    T[:m, :n] = A
    T[:m, n:n + m] = np.eye(m)
    T[:m, -1] = b
    T[m, :n] = -c
    basis = list(range(n, n + m))
    # phase 1 if any b < 0: flip rows (works because x>=0 with slack)
    for i in range(m):
        if T[i, -1] < 0:
            return -2, None   # reference also rejects infeasible starts
    for _ in range(10000):
        j = int(np.argmin(T[m, :-1]))
        if T[m, j] >= -1e-12:
            break
        col = T[:m, j]
        if (col <= 1e-12).all():
            return -1, None
        ratios = np.where(col > 1e-12, T[:m, -1] / np.maximum(col, 1e-12),
                          np.inf)
        i = int(np.argmin(ratios))
        T[i] /= T[i, j]
        for r in range(m + 1):
            if r != i:
                T[r] -= T[r, j] * T[i]
        basis[i] = j
    x = np.zeros(n + m)
    for i, bj in enumerate(basis):
        x[bj] = T[i, -1]
    # multiple solutions: a nonbasic structural var with zero red. cost
    nonbasic = set(range(n)) - set(basis)
    multi = any(abs(T[m, j]) < 1e-12 for j in nonbasic)
    return (1 if multi else 0), x[:n].reshape(-1, 1)


def buildMST(numNodes: int, inputEdges, algorithm: int = 0, root: int = 0):
    """cv::buildMST — Kruskal with duplicate-edge min-reduction and
    self-loop skipping (core graph utility).  Edges are (u, v, w) rows;
    returns (ok, edges) with the MST edge list."""
    edges = np.asarray(inputEdges, np.float64).reshape(-1, 3)
    best = {}
    for u, v, w in edges:
        u, v = int(u), int(v)
        if u == v:
            continue
        if not (0 <= u < numNodes and 0 <= v < numNodes):
            return False, None
        key = (builtins.min(u, v), builtins.max(u, v))
        if key not in best or w < best[key]:
            best[key] = w
    parent = list(range(numNodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for (u, v), w in sorted(best.items(), key=lambda kv: kv[1]):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.append((u, v, w))
    if len(out) != numNodes - 1:
        return False, None
    return True, np.asarray(out, np.float64)
