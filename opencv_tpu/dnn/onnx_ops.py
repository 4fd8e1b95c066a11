"""Extended ONNX operator set for the dnn executor.

The reference backs ~57 layer types with per-layer C++ kernels
(modules/dnn/src/layers/); here each operator lowers to a jnp/XLA
expression (elementwise → VPU, contractions → MXU) registered in
`OPS` and dispatched from Net.forward.  Quantized operators follow the
ONNX integer-math definitions, mirroring the reference's int8 layer set
(modules/dnn/src/int8layers/).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

OPS = {}


def op(*names):
    def deco(fn):
        for n in names:
            OPS[n] = fn
        return fn
    return deco


def _a(v):
    return jnp.asarray(v)


def _axes_arg(ins, at, idx=1):
    axes = at.get("axes")
    if axes is None and len(ins) > idx and ins[idx] is not None:
        axes = [int(v) for v in np.asarray(ins[idx]).ravel()]
    return tuple(axes) if axes else None


# ------------------------------------------------------------ elementwise

@op("Neg")
def _neg(ins, at):
    return -_a(ins[0])


@op("Abs")
def _abs(ins, at):
    return jnp.abs(_a(ins[0]))


@op("Floor")
def _floor(ins, at):
    return jnp.floor(_a(ins[0]))


@op("Ceil")
def _ceil(ins, at):
    return jnp.ceil(_a(ins[0]))


@op("Round")
def _round(ins, at):
    return jnp.round(_a(ins[0]))   # round-half-even like the spec


@op("Reciprocal")
def _recip(ins, at):
    return 1.0 / _a(ins[0])


@op("Log")
def _log(ins, at):
    return jnp.log(_a(ins[0]))


@op("Sign")
def _sign(ins, at):
    return jnp.sign(_a(ins[0]))


@op("Sin")
def _sin(ins, at):
    return jnp.sin(_a(ins[0]))


@op("Cos")
def _cos(ins, at):
    return jnp.cos(_a(ins[0]))


@op("Tan")
def _tan(ins, at):
    return jnp.tan(_a(ins[0]))


@op("Asin")
def _asin(ins, at):
    return jnp.arcsin(_a(ins[0]))


@op("Acos")
def _acos(ins, at):
    return jnp.arccos(_a(ins[0]))


@op("Atan")
def _atan(ins, at):
    return jnp.arctan(_a(ins[0]))


@op("Sinh")
def _sinh(ins, at):
    return jnp.sinh(_a(ins[0]))


@op("Cosh")
def _cosh(ins, at):
    return jnp.cosh(_a(ins[0]))


@op("Atanh")
def _atanh(ins, at):
    return jnp.arctanh(_a(ins[0]))


@op("Asinh")
def _asinh(ins, at):
    return jnp.arcsinh(_a(ins[0]))


@op("Acosh")
def _acosh(ins, at):
    return jnp.arccosh(_a(ins[0]))


@op("Mod")
def _mod(ins, at):
    x, y = _a(ins[0]), _a(ins[1])
    if at.get("fmod", 0):
        return jnp.fmod(x, y)
    return jnp.mod(x, y)


@op("Not")
def _not(ins, at):
    return ~_a(ins[0]).astype(bool)


@op("And")
def _and(ins, at):
    return _a(ins[0]).astype(bool) & _a(ins[1]).astype(bool)


@op("Or")
def _or(ins, at):
    return _a(ins[0]).astype(bool) | _a(ins[1]).astype(bool)


@op("Xor")
def _xor(ins, at):
    return _a(ins[0]).astype(bool) ^ _a(ins[1]).astype(bool)


@op("Equal")
def _eq(ins, at):
    return _a(ins[0]) == _a(ins[1])


@op("Greater")
def _gt(ins, at):
    return _a(ins[0]) > _a(ins[1])


@op("GreaterOrEqual")
def _ge(ins, at):
    return _a(ins[0]) >= _a(ins[1])


@op("Less")
def _lt(ins, at):
    return _a(ins[0]) < _a(ins[1])


@op("LessOrEqual")
def _le(ins, at):
    return _a(ins[0]) <= _a(ins[1])


@op("Where")
def _where(ins, at):
    return jnp.where(_a(ins[0]).astype(bool), _a(ins[1]), _a(ins[2]))


# ------------------------------------------------------------ activations

@op("PRelu")
def _prelu(ins, at):
    x = _a(ins[0])
    s = _a(ins[1])
    if s.ndim and s.ndim < x.ndim:
        s = s.reshape((1, -1) + (1,) * (x.ndim - 2))
    return jnp.where(x >= 0, x, x * s)


@op("Elu")
def _elu(ins, at):
    alpha = at.get("alpha", 1.0)
    x = _a(ins[0])
    return jnp.where(x >= 0, x, alpha * (jnp.exp(x) - 1))


@op("Selu")
def _selu(ins, at):
    alpha = at.get("alpha", 1.6732632423543772)
    gamma = at.get("gamma", 1.0507009873554805)
    x = _a(ins[0])
    return gamma * jnp.where(x >= 0, x, alpha * (jnp.exp(x) - 1))


@op("Celu")
def _celu(ins, at):
    alpha = at.get("alpha", 1.0)
    x = _a(ins[0])
    return jnp.maximum(x, 0) + jnp.minimum(
        0, alpha * (jnp.exp(x / alpha) - 1))


@op("HardSigmoid")
def _hardsigmoid(ins, at):
    alpha = at.get("alpha", 0.2)
    beta = at.get("beta", 0.5)
    return jnp.clip(alpha * _a(ins[0]) + beta, 0, 1)


@op("HardSwish")
def _hardswish(ins, at):
    x = _a(ins[0])
    return x * jnp.clip(x / 6.0 + 0.5, 0, 1)


@op("Softsign")
def _softsign(ins, at):
    x = _a(ins[0])
    return x / (1 + jnp.abs(x))


@op("ThresholdedRelu")
def _threlu(ins, at):
    alpha = at.get("alpha", 1.0)
    x = _a(ins[0])
    return jnp.where(x > alpha, x, 0.0)


@op("Gelu")
def _gelu(ins, at):
    approx = at.get("approximate", "none")
    return jax.nn.gelu(_a(ins[0]), approximate=approx == "tanh")


@op("LogSoftmax")
def _logsoftmax(ins, at):
    return jax.nn.log_softmax(_a(ins[0]), axis=at.get("axis", -1))


# -------------------------------------------------------------- reductions

def _reduce(fn, ins, at):
    axes = _axes_arg(ins, at)
    keep = bool(at.get("keepdims", 1))
    if axes is None and at.get("noop_with_empty_axes", 0) \
            and len(ins) > 1 and ins[1] is None:
        return _a(ins[0])
    return fn(_a(ins[0]), axis=axes, keepdims=keep)


@op("ReduceSum")
def _rsum(ins, at):
    return _reduce(jnp.sum, ins, at)


@op("ReduceMax")
def _rmax(ins, at):
    return _reduce(jnp.max, ins, at)


@op("ReduceMin")
def _rmin(ins, at):
    return _reduce(jnp.min, ins, at)


@op("ReduceProd")
def _rprod(ins, at):
    return _reduce(jnp.prod, ins, at)


@op("ReduceL2")
def _rl2(ins, at):
    return jnp.sqrt(_reduce(jnp.sum, [_a(ins[0]) ** 2] + list(ins[1:]),
                            at))


@op("ReduceL1")
def _rl1(ins, at):
    return _reduce(jnp.sum, [jnp.abs(_a(ins[0]))] + list(ins[1:]), at)


@op("ReduceSumSquare")
def _rss(ins, at):
    return _reduce(jnp.sum, [_a(ins[0]) ** 2] + list(ins[1:]), at)


@op("ReduceLogSum")
def _rls(ins, at):
    return jnp.log(_reduce(jnp.sum, ins, at))


@op("ReduceLogSumExp")
def _rlse(ins, at):
    return jnp.log(_reduce(jnp.sum, [jnp.exp(_a(ins[0]))] + list(ins[1:]),
                           at))


@op("ArgMax")
def _argmax(ins, at):
    ax = at.get("axis", 0)
    keep = bool(at.get("keepdims", 1))
    y = jnp.argmax(_a(ins[0]), axis=ax).astype(jnp.int64)
    return jnp.expand_dims(y, ax) if keep else y


@op("ArgMin")
def _argmin(ins, at):
    ax = at.get("axis", 0)
    keep = bool(at.get("keepdims", 1))
    y = jnp.argmin(_a(ins[0]), axis=ax).astype(jnp.int64)
    return jnp.expand_dims(y, ax) if keep else y


@op("CumSum")
def _cumsum(ins, at):
    ax = int(np.asarray(ins[1]))
    x = _a(ins[0])
    if at.get("reverse", 0):
        x = jnp.flip(x, ax)
    y = jnp.cumsum(x, axis=ax)
    if at.get("exclusive", 0):
        y = jnp.roll(y, 1, ax)
        idx = [slice(None)] * y.ndim
        idx[ax] = 0
        y = y.at[tuple(idx)].set(0)
    if at.get("reverse", 0):
        y = jnp.flip(y, ax)
    return y


@op("TopK")
def _topk(ins, at):
    k = int(np.asarray(ins[1]).ravel()[0])
    ax = at.get("axis", -1)
    largest = at.get("largest", 1)
    x = _a(ins[0])
    xs = jnp.moveaxis(x, ax, -1)
    if largest:
        v, i = jax.lax.top_k(xs, k)
    else:
        v, i = jax.lax.top_k(-xs, k)
        v = -v
    return (jnp.moveaxis(v, -1, ax),
            jnp.moveaxis(i.astype(jnp.int64), -1, ax))


# ----------------------------------------------------------- shape/layout

@op("Split")
def _split(ins, at):
    x = _a(ins[0])
    ax = at.get("axis", 0)
    split = at.get("split")
    if split is None and len(ins) > 1 and ins[1] is not None:
        split = [int(v) for v in np.asarray(ins[1]).ravel()]
    if split is None:
        n = at.get("num_outputs", 2)
        sz = (x.shape[ax] + n - 1) // n
        split = [min(sz, x.shape[ax] - i * sz) for i in range(n)]
    idx = np.cumsum(split[:-1]).tolist()
    return tuple(jnp.split(x, idx, axis=ax))


@op("Expand")
def _expand(ins, at):
    shape = [int(v) for v in np.asarray(ins[1]).ravel()]
    return _a(ins[0]) * jnp.ones(shape, _a(ins[0]).dtype)


@op("Range")
def _range(ins, at):
    s, e, d = (np.asarray(v).ravel()[0] for v in ins[:3])
    return jnp.arange(s, e, d)


@op("DepthToSpace")
def _d2s(ins, at):
    x = _a(ins[0])
    b = at["blocksize"]
    N, C, H, W = x.shape
    if at.get("mode", "DCR") == "DCR":
        t = x.reshape(N, b, b, C // (b * b), H, W)
        t = jnp.transpose(t, (0, 3, 4, 1, 5, 2))
    else:
        t = x.reshape(N, C // (b * b), b, b, H, W)
        t = jnp.transpose(t, (0, 1, 4, 2, 5, 3))
    return t.reshape(N, C // (b * b), H * b, W * b)


@op("SpaceToDepth")
def _s2d(ins, at):
    x = _a(ins[0])
    b = at["blocksize"]
    N, C, H, W = x.shape
    t = x.reshape(N, C, H // b, b, W // b, b)
    t = jnp.transpose(t, (0, 3, 5, 1, 2, 4))
    return t.reshape(N, C * b * b, H // b, W // b)


@op("GatherElements")
def _gather_el(ins, at):
    x = _a(ins[0])
    idx = jnp.asarray(np.asarray(ins[1]).astype(np.int64))
    ax = at.get("axis", 0)
    idx = jnp.where(idx < 0, idx + x.shape[ax], idx)
    return jnp.take_along_axis(x, idx, axis=ax)


@op("GatherND")
def _gather_nd(ins, at):
    x = np.asarray(ins[0])
    idx = np.asarray(ins[1]).astype(np.int64)
    b = at.get("batch_dims", 0)
    assert b == 0, "GatherND batch_dims>0 unsupported"
    return jnp.asarray(x[tuple(np.moveaxis(idx, -1, 0))])


@op("ScatterND")
def _scatter_nd(ins, at):
    x = _a(ins[0])
    idx = np.asarray(ins[1]).astype(np.int64)
    upd = _a(ins[2])
    return x.at[tuple(np.moveaxis(idx, -1, 0))].set(upd)


@op("OneHot")
def _onehot(ins, at):
    idx = np.asarray(ins[0]).astype(np.int64)
    depth = int(np.asarray(ins[1]).ravel()[0])
    vals = np.asarray(ins[2]).ravel()
    ax = at.get("axis", -1)
    # ONNX: indices in [-depth, depth-1] (negatives wrap once); anything
    # outside produces an all-off_value row — map those to -1, which
    # one_hot zeroes out
    valid = (idx >= -depth) & (idx < depth)
    norm = np.where(valid, np.where(idx < 0, idx + depth, idx), -1)
    oh = jax.nn.one_hot(jnp.asarray(norm), depth, axis=ax)
    return oh * (vals[1] - vals[0]) + vals[0]


@op("Trilu")
def _trilu(ins, at):
    x = _a(ins[0])
    k = int(np.asarray(ins[1]).ravel()[0]) if len(ins) > 1 and \
        ins[1] is not None else 0
    if at.get("upper", 1):
        return jnp.triu(x, k)
    return jnp.tril(x, k)


@op("Einsum")
def _einsum(ins, at):
    return jnp.einsum(at["equation"], *[_a(v) for v in ins])


@op("Attention")
def _attention(ins, at):
    """Two dialects, both used by the reference stack:
    - com.microsoft fused-QKV (dnn/src/layers/attention_layer.cpp):
      inputs (x[B,S,Hin], W[Hin,q+k+v], bias) with qkv_hidden_sizes;
      the effective score multiplier is 1/attr_scale, attr default
      sqrt(q_head_size);
    - ONNX opset-23 (the 5.0 wheel): inputs (Q, K, V[, mask]) as 4-D
      (B, heads, S, D) or 3-D (B, S, hidden) + q_num_heads/kv_num_heads,
      multiplier = attr scale, default 1/sqrt(head_size)."""
    import math as _math
    if len(ins) >= 3 and _a(ins[1]).ndim == 2 and "qkv_hidden_sizes" in at:
        x = _a(ins[0]).astype(jnp.float32)        # (B, S, Hin)
        W = _a(ins[1]).astype(jnp.float32)        # (Hin, q+k+v)
        b = _a(ins[2]).astype(jnp.float32)
        nh = int(at["num_heads"])
        qkv = [int(v) for v in at["qkv_hidden_sizes"]]
        qh = qkv[0] // nh
        vh = (W.shape[1] - qkv[0] - qkv[1]) // nh
        scale = 1.0 / float(at.get("scale", _math.sqrt(qh)))
        B, S, _ = x.shape
        g = x @ W + b
        q = g[..., :qkv[0]].reshape(B, S, nh, qh).transpose(0, 2, 1, 3)
        k = g[..., qkv[0]:qkv[0] + qkv[1]].reshape(B, S, nh, qh) \
            .transpose(0, 2, 1, 3)
        v = g[..., qkv[0] + qkv[1]:].reshape(B, S, nh, vh) \
            .transpose(0, 2, 1, 3)
    else:
        q = _a(ins[0]).astype(jnp.float32)
        k = _a(ins[1]).astype(jnp.float32)
        v = _a(ins[2]).astype(jnp.float32)
        three_d = q.ndim == 3
        if three_d:
            B, S, Hq = q.shape
            nh = int(at.get("q_num_heads", 1))
            knh = int(at.get("kv_num_heads", nh))
            q = q.reshape(B, S, nh, Hq // nh).transpose(0, 2, 1, 3)
            k = k.reshape(B, k.shape[1], knh, -1).transpose(0, 2, 1, 3)
            v = v.reshape(B, v.shape[1], knh, -1).transpose(0, 2, 1, 3)
        nh = q.shape[1]
        qh = q.shape[3]
        vh = v.shape[3]
        B, S = q.shape[0], q.shape[2]
        if k.shape[1] != nh:      # grouped-query: repeat kv heads
            rep = nh // k.shape[1]
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        scale = float(at.get("scale", 1.0 / _math.sqrt(qh)))

    scores = jnp.einsum("bhsd,bhtd->bhst", q, k,
                        preferred_element_type=jnp.float32) \
        * jnp.float32(scale)
    if len(ins) > 3 and ins[3] is not None:
        mask = _a(ins[3])
        if mask.dtype == jnp.bool_:
            scores = jnp.where(mask, scores, -jnp.inf)
        else:
            scores = scores + mask.astype(jnp.float32)
    if int(at.get("is_causal", 0)):
        T = scores.shape[-1]
        causal = jnp.tril(jnp.ones((scores.shape[-2], T), bool))
        scores = jnp.where(causal, scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bhst,bhtd->bhsd", p, v,
                   preferred_element_type=jnp.float32)
    if "qkv_hidden_sizes" in at:
        o = o.transpose(0, 2, 1, 3).reshape(B, S, -1)
        if int(at.get("output_ndims", 3)) == 2:
            o = o.reshape(B * S, -1)
    elif _a(ins[0]).ndim == 3:
        o = o.transpose(0, 2, 1, 3).reshape(B, S, -1)
    return o


# ---------------------------------------------------------- normalization

@op("InstanceNormalization")
def _instnorm(ins, at):
    x = _a(ins[0])
    g = _a(ins[1]).reshape((1, -1) + (1,) * (x.ndim - 2))
    b = _a(ins[2]).reshape((1, -1) + (1,) * (x.ndim - 2))
    axes = tuple(range(2, x.ndim))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mu) / jnp.sqrt(var + at.get("epsilon", 1e-5)) * g + b


@op("LayerNormalization")
def _layernorm(ins, at):
    x = _a(ins[0])
    ax = at.get("axis", -1)
    axes = tuple(range(ax % x.ndim, x.ndim))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    y = (x - mu) / jnp.sqrt(var + at.get("epsilon", 1e-5))
    y = y * _a(ins[1])
    if len(ins) > 2 and ins[2] is not None:
        y = y + _a(ins[2])
    return y


@op("GroupNormalization")
def _groupnorm(ins, at):
    x = _a(ins[0])
    G = at["num_groups"]
    N, C = x.shape[:2]
    g = _a(ins[1]).reshape((1, -1) + (1,) * (x.ndim - 2))
    b = _a(ins[2]).reshape((1, -1) + (1,) * (x.ndim - 2))
    t = x.reshape((N, G, C // G) + x.shape[2:])
    axes = tuple(range(2, t.ndim))
    mu = jnp.mean(t, axis=axes, keepdims=True)
    var = jnp.var(t, axis=axes, keepdims=True)
    t = (t - mu) / jnp.sqrt(var + at.get("epsilon", 1e-5))
    return t.reshape(x.shape) * g + b


@op("LpNormalization")
def _lpnorm(ins, at):
    x = _a(ins[0])
    ax = at.get("axis", -1)
    p = at.get("p", 2)
    if p == 1:
        n = jnp.sum(jnp.abs(x), axis=ax, keepdims=True)
    else:
        n = jnp.sqrt(jnp.sum(x * x, axis=ax, keepdims=True))
    return x / n


@op("MeanVarianceNormalization")
def _mvn(ins, at):
    x = _a(ins[0])
    axes = tuple(at.get("axes", [0, 2, 3]))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    sd = jnp.std(x, axis=axes, keepdims=True)
    return (x - mu) / (sd + 1e-9)


# ------------------------------------------------------------ conv family

@op("ConvTranspose")
def _convtranspose(ins, at):
    x = _a(ins[0])
    w = _a(ins[1])                      # (Cin, Cout/g, kH, kW)
    groups = at.get("group", 1)
    strides = at.get("strides", [1, 1])
    pads = at.get("pads", [0, 0, 0, 0])
    outpad = at.get("output_padding", [0, 0])
    kH, kW = w.shape[2], w.shape[3]
    dn = jax.lax.conv_dimension_numbers(x.shape,
                                        (w.shape[1] * groups, w.shape[0]
                                         // groups, kH, kW),
                                        ("NCHW", "OIHW", "NCHW"))
    # gradient-style transposed conv: flip kernel, swap in/out channels
    wt = jnp.flip(w, (2, 3))
    wt = jnp.swapaxes(
        wt.reshape(groups, w.shape[0] // groups, w.shape[1], kH, kW),
        1, 2).reshape(w.shape[1] * groups, w.shape[0] // groups, kH, kW)
    pad_h = (kH - 1 - pads[0], kH - 1 - pads[2] + outpad[0])
    pad_w = (kW - 1 - pads[1], kW - 1 - pads[3] + outpad[1])
    y = jax.lax.conv_general_dilated(
        x, wt, window_strides=(1, 1), padding=[pad_h, pad_w],
        lhs_dilation=strides, dimension_numbers=dn,
        feature_group_count=groups,
        precision=jax.lax.Precision.HIGHEST)
    if len(ins) > 2 and ins[2] is not None:
        y = y + _a(ins[2]).reshape(1, -1, 1, 1)
    return y


# --------------------------------------------------------------- int8 set

def _sat(v, dtype):
    info = np.iinfo(dtype)
    return jnp.clip(v, info.min, info.max).astype(dtype)


def _qparams(scale, zp):
    s = np.asarray(scale, np.float32)
    z = np.asarray(zp) if zp is not None else np.zeros_like(s, np.int8)
    return s, z


@op("QuantizeLinear")
def _quantize(ins, at):
    x = _a(ins[0]).astype(jnp.float32)
    s, z = _qparams(ins[1], ins[2] if len(ins) > 2 else None)
    ax = at.get("axis", 1)
    if s.ndim and s.size > 1:
        shp = [1] * x.ndim
        shp[ax] = -1
        s = s.reshape(shp)
        zr = z.reshape(shp)
    else:
        zr = z
    y = jnp.round(x / s) + jnp.asarray(zr.astype(np.int32))
    return _sat(y, z.dtype.type)


@op("DequantizeLinear")
def _dequantize(ins, at):
    x = _a(ins[0]).astype(jnp.int32)
    s, z = _qparams(ins[1], ins[2] if len(ins) > 2 else None)
    ax = at.get("axis", 1)
    if s.ndim and s.size > 1:
        shp = [1] * x.ndim
        shp[ax] = -1
        s = s.reshape(shp)
        z = z.reshape(shp)
    return (x - jnp.asarray(z.astype(np.int32))).astype(jnp.float32) \
        * jnp.asarray(s)


@op("QLinearConv")
def _qlinearconv(ins, at):
    """int8 conv: int32 accumulation on the MXU, then requantize
    (onnx QLinearConv; reference int8layers/convolution_layer.cpp)."""
    x, xs, xz, w, ws, wz, ys, yz = ins[:8]
    bias = ins[8] if len(ins) > 8 else None
    xq = _a(x).astype(jnp.int32) - int(np.asarray(xz).ravel()[0])
    wz_arr = np.asarray(wz).astype(np.int32).ravel()
    wq = _a(w).astype(jnp.int32)
    if wz_arr.size > 1:
        wq = wq - jnp.asarray(wz_arr.reshape(-1, 1, 1, 1))
    else:
        wq = wq - int(wz_arr[0])
    strides = at.get("strides", [1, 1])
    pads = at.get("pads", [0, 0, 0, 0])
    dil = at.get("dilations", [1, 1])
    groups = at.get("group", 1)
    dn = jax.lax.conv_dimension_numbers(xq.shape, wq.shape,
                                        ("NCHW", "OIHW", "NCHW"))
    acc = jax.lax.conv_general_dilated(
        xq, wq, window_strides=strides,
        padding=[(pads[0], pads[2]), (pads[1], pads[3])],
        rhs_dilation=dil, dimension_numbers=dn,
        feature_group_count=groups)
    if bias is not None:
        acc = acc + _a(bias).astype(jnp.int32).reshape(1, -1, 1, 1)
    xs_f = float(np.asarray(xs).ravel()[0])
    ws_arr = np.asarray(ws, np.float32).ravel()
    ys_f = float(np.asarray(ys).ravel()[0])
    scale = (xs_f * ws_arr / ys_f)
    if ws_arr.size > 1:
        scale = scale.reshape(1, -1, 1, 1)
    else:
        scale = float(scale[0])
    yz_a = np.asarray(yz).ravel()
    y = jnp.round(acc.astype(jnp.float32) * scale) + int(yz_a[0])
    return _sat(y, yz_a.dtype.type)


@op("QLinearMatMul")
def _qlinearmatmul(ins, at):
    x, xs, xz, w, ws, wz, ys, yz = ins[:8]
    xq = _a(x).astype(jnp.int32) - int(np.asarray(xz).ravel()[0])
    wq = _a(w).astype(jnp.int32) - int(np.asarray(wz).ravel()[0])
    acc = xq @ wq
    scale = float(np.asarray(xs).ravel()[0]) \
        * float(np.asarray(ws).ravel()[0]) \
        / float(np.asarray(ys).ravel()[0])
    yz_a = np.asarray(yz).ravel()
    y = jnp.round(acc.astype(jnp.float32) * scale) + int(yz_a[0])
    return _sat(y, yz_a.dtype.type)


@op("MatMulInteger")
def _matmulint(ins, at):
    x = _a(ins[0]).astype(jnp.int32)
    w = _a(ins[1]).astype(jnp.int32)
    if len(ins) > 2 and ins[2] is not None:
        x = x - int(np.asarray(ins[2]).ravel()[0])
    if len(ins) > 3 and ins[3] is not None:
        w = w - int(np.asarray(ins[3]).ravel()[0])
    return x @ w


@op("ConvInteger")
def _convint(ins, at):
    x = _a(ins[0]).astype(jnp.int32)
    w = _a(ins[1]).astype(jnp.int32)
    if len(ins) > 2 and ins[2] is not None:
        x = x - int(np.asarray(ins[2]).ravel()[0])
    if len(ins) > 3 and ins[3] is not None:
        w = w - int(np.asarray(ins[3]).ravel()[0])
    strides = at.get("strides", [1, 1])
    pads = at.get("pads", [0, 0, 0, 0])
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NCHW", "OIHW", "NCHW"))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides,
        padding=[(pads[0], pads[2]), (pads[1], pads[3])],
        rhs_dilation=at.get("dilations", [1, 1]),
        dimension_numbers=dn,
        feature_group_count=at.get("group", 1))


# ---------------------------------------------------------------- sort-of

@op("NonZero")
def _nonzero(ins, at):
    return np.stack(np.nonzero(np.asarray(ins[0]))).astype(np.int64)


@op("Size")
def _size(ins, at):
    return np.int64(np.asarray(ins[0]).size)


@op("NonMaxSuppression")
def _onnx_nms(ins, at):
    """ONNX NonMaxSuppression: boxes (B, N, 4) y1x1y2x2 (center mode via
    attr), scores (B, C, N) → (K, 3) [batch, class, box]."""
    boxes = np.asarray(ins[0], np.float32)
    scores = np.asarray(ins[1], np.float32)
    max_out = int(np.asarray(ins[2]).ravel()[0]) if len(ins) > 2 and \
        ins[2] is not None else 0
    iou_t = float(np.asarray(ins[3]).ravel()[0]) if len(ins) > 3 and \
        ins[3] is not None else 0.0
    score_t = float(np.asarray(ins[4]).ravel()[0]) if len(ins) > 4 and \
        ins[4] is not None else -np.inf
    center = at.get("center_point_box", 0)
    sel = []
    for b in range(boxes.shape[0]):
        bx = boxes[b]
        if center:
            cx, cy, w, h = bx[:, 0], bx[:, 1], bx[:, 2], bx[:, 3]
            y1, x1 = cy - h / 2, cx - w / 2
            y2, x2 = cy + h / 2, cx + w / 2
        else:
            y1, x1, y2, x2 = bx[:, 0], bx[:, 1], bx[:, 2], bx[:, 3]
            y1, y2 = np.minimum(y1, y2), np.maximum(y1, y2)
            x1, x2 = np.minimum(x1, x2), np.maximum(x1, x2)
        area = (y2 - y1) * (x2 - x1)
        for c in range(scores.shape[1]):
            sc = scores[b, c]
            order = np.argsort(-sc, kind="stable")
            order = order[sc[order] > score_t]
            keep = []
            while order.size and (not max_out or len(keep) < max_out):
                i = order[0]
                keep.append(i)
                rest = order[1:]
                yy1 = np.maximum(y1[i], y1[rest])
                xx1 = np.maximum(x1[i], x1[rest])
                yy2 = np.minimum(y2[i], y2[rest])
                xx2 = np.minimum(x2[i], x2[rest])
                inter = np.maximum(0, yy2 - yy1) * np.maximum(0, xx2 - xx1)
                iou = inter / (area[i] + area[rest] - inter + 1e-12)
                order = rest[iou <= iou_t]
            sel += [[b, c, int(i)] for i in keep]
    return np.asarray(sel, np.int64).reshape(-1, 3)


# ------------------------------------------------------------- recurrent
# LSTM/GRU/RNN (the reference's recurrent_layers.cpp) as lax.scan over
# the sequence axis; weights follow the ONNX layouts (gate order iofc
# for LSTM, zrh for GRU).

def _rnn_dir_params(ins, at, ngate):
    hs = int(at["hidden_size"])
    W = _a(ins[1]).astype(jnp.float32)      # (D, ngate*hs, input)
    R = _a(ins[2]).astype(jnp.float32)      # (D, ngate*hs, hs)
    D = W.shape[0]
    if len(ins) > 3 and ins[3] is not None:
        Bx = _a(ins[3]).astype(jnp.float32)  # (D, 2*ngate*hs)
        Wb = Bx[:, :ngate * hs]
        Rb = Bx[:, ngate * hs:]
    else:
        Wb = jnp.zeros((D, ngate * hs), jnp.float32)
        Rb = jnp.zeros((D, ngate * hs), jnp.float32)
    return hs, D, W, R, Wb, Rb


def _rnn_run(X, D, direction, cell, h0s, outs_per_step):
    """Scan `cell` over (seq, batch, input) X for each direction."""
    ys = []
    lasts = []
    for d in range(D):
        rev = (direction == "reverse") or (d == 1)
        xd = X[::-1] if rev else X
        carry, y = jax.lax.scan(cell[d], h0s[d], xd)
        if rev:
            y = y[::-1]
        ys.append(y)
        lasts.append(carry)
    return ys, lasts


@op("LSTM")
def _lstm(ins, at):
    hs, D, W, R, Wb, Rb = _rnn_dir_params(ins, at, 4)
    X = _a(ins[0]).astype(jnp.float32)      # (seq, batch, input)
    B = X.shape[1]
    direction = at.get("direction", b"forward")
    if isinstance(direction, bytes):
        direction = direction.decode()
    h0 = (_a(ins[5]).astype(jnp.float32) if len(ins) > 5
          and ins[5] is not None else jnp.zeros((D, B, hs), jnp.float32))
    c0 = (_a(ins[6]).astype(jnp.float32) if len(ins) > 6
          and ins[6] is not None else jnp.zeros((D, B, hs), jnp.float32))
    P = (_a(ins[7]).astype(jnp.float32) if len(ins) > 7
         and ins[7] is not None else None)  # (D, 3*hs) peepholes

    def make_cell(d):
        Wd = W[d].T
        Rd = R[d].T
        bd = Wb[d] + Rb[d]
        pi = P[d, :hs] if P is not None else None
        po = P[d, hs:2 * hs] if P is not None else None
        pf = P[d, 2 * hs:] if P is not None else None

        def cell(carry, xt):
            h, c = carry
            g = xt @ Wd + h @ Rd + bd
            gi, go, gf, gc = (g[:, :hs], g[:, hs:2 * hs],
                              g[:, 2 * hs:3 * hs], g[:, 3 * hs:])
            if P is not None:
                gi = gi + pi * c
                gf = gf + pf * c
            i = jax.nn.sigmoid(gi)
            f = jax.nn.sigmoid(gf)
            cn = f * c + i * jnp.tanh(gc)
            if P is not None:
                go = go + po * cn
            o = jax.nn.sigmoid(go)
            hn = o * jnp.tanh(cn)
            return (hn, cn), hn
        return cell

    cells = [make_cell(d) for d in range(D)]
    ys, lasts = _rnn_run(X, D, direction, cells,
                         [(h0[d], c0[d]) for d in range(D)], 1)
    Y = jnp.stack(ys, axis=1)               # (seq, D, batch, hs)
    Yh = jnp.stack([l[0] for l in lasts], axis=0)
    Yc = jnp.stack([l[1] for l in lasts], axis=0)
    return (Y, Yh, Yc)


@op("GRU")
def _gru(ins, at):
    hs, D, W, R, Wb, Rb = _rnn_dir_params(ins, at, 3)
    X = _a(ins[0]).astype(jnp.float32)
    B = X.shape[1]
    direction = at.get("direction", b"forward")
    if isinstance(direction, bytes):
        direction = direction.decode()
    lbr = int(at.get("linear_before_reset", 0))
    h0 = (_a(ins[5]).astype(jnp.float32) if len(ins) > 5
          and ins[5] is not None else jnp.zeros((D, B, hs), jnp.float32))

    def make_cell(d):
        Wd = W[d].T
        Rd = R[d].T
        wb = Wb[d]
        rb = Rb[d]

        def cell(h, xt):
            gx = xt @ Wd + wb                   # (batch, 3hs)
            gz = gx[:, :hs]
            gr = gx[:, hs:2 * hs]
            gh = gx[:, 2 * hs:]
            hr = h @ Rd
            z = jax.nn.sigmoid(gz + hr[:, :hs] + rb[:hs])
            r = jax.nn.sigmoid(gr + hr[:, hs:2 * hs] + rb[hs:2 * hs])
            if lbr:
                hh = jnp.tanh(gh + r * (hr[:, 2 * hs:] + rb[2 * hs:]))
            else:
                hh = jnp.tanh(gh + (r * h) @ Rd[:, 2 * hs:]
                              + rb[2 * hs:])
            hn = (1 - z) * hh + z * h
            return hn, hn
        return cell

    cells = [make_cell(d) for d in range(D)]
    ys, lasts = _rnn_run(X, D, direction, cells,
                         [h0[d] for d in range(D)], 1)
    Y = jnp.stack(ys, axis=1)
    Yh = jnp.stack(lasts, axis=0)
    return (Y, Yh)


@op("RNN")
def _rnn_op(ins, at):
    hs, D, W, R, Wb, Rb = _rnn_dir_params(ins, at, 1)
    X = _a(ins[0]).astype(jnp.float32)
    B = X.shape[1]
    direction = at.get("direction", b"forward")
    if isinstance(direction, bytes):
        direction = direction.decode()
    h0 = (_a(ins[5]).astype(jnp.float32) if len(ins) > 5
          and ins[5] is not None else jnp.zeros((D, B, hs), jnp.float32))

    def make_cell(d):
        Wd = W[d].T
        Rd = R[d].T
        bd = Wb[d] + Rb[d]

        def cell(h, xt):
            hn = jnp.tanh(xt @ Wd + h @ Rd + bd)
            return hn, hn
        return cell

    cells = [make_cell(d) for d in range(D)]
    ys, lasts = _rnn_run(X, D, direction, cells,
                         [h0[d] for d in range(D)], 1)
    Y = jnp.stack(ys, axis=1)
    Yh = jnp.stack(lasts, axis=0)
    return (Y, Yh)


# --------------------------------------------------------- spatial samplers

@op("GridSample")
def _grid_sample(ins, at):
    """ONNX GridSample (STN-style warping; the reference implements it in
    dnn/src/layers — here it is device index math + one batched gather).
    X: (N, C, H, W); grid: (N, Ho, Wo, 2) in [-1, 1] xy order."""
    x = _a(ins[0]).astype(jnp.float32)
    grid = _a(ins[1]).astype(jnp.float32)
    mode = at.get("mode", b"linear")
    mode = mode.decode() if isinstance(mode, bytes) else mode
    pad_mode = at.get("padding_mode", b"zeros")
    pad_mode = pad_mode.decode() if isinstance(pad_mode, bytes) else pad_mode
    align = bool(at.get("align_corners", 0))
    N, C, H, W = x.shape
    Ho, Wo = grid.shape[1], grid.shape[2]

    def unnorm(g, size):
        if align:
            return (g + 1.0) * 0.5 * (size - 1)
        return ((g + 1.0) * size - 1.0) * 0.5

    gx = unnorm(grid[..., 0], W)
    gy = unnorm(grid[..., 1], H)

    def resolve(c, size):
        if pad_mode == "border":
            return jnp.clip(c, 0.0, size - 1.0)
        if pad_mode == "reflection":
            if align:
                span = 2.0 * (size - 1)
                if size == 1:
                    return jnp.zeros_like(c)
                m = jnp.mod(c, span)
                return jnp.where(m > size - 1, span - m, m)
            span = 2.0 * size
            m = jnp.mod(c + 0.5, span)
            m = jnp.where(m > size, span - m, m) - 0.5
            return jnp.clip(m, 0.0, size - 1.0)
        return c                      # zeros: mask below

    gx = resolve(gx, W)
    gy = resolve(gy, H)

    flat = x.transpose(0, 2, 3, 1).reshape(N * H * W, C)
    nb = (jnp.arange(N, dtype=jnp.int32) * (H * W))[:, None, None]

    def fetch(iy, ix):
        okx = (ix >= 0) & (ix <= W - 1)
        oky = (iy >= 0) & (iy <= H - 1)
        ic = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        rc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        g = jnp.take(flat, (rc * W + ic + nb).reshape(-1), axis=0)
        g = g.reshape(N, Ho, Wo, C)
        if pad_mode == "zeros":
            g = jnp.where((okx & oky)[..., None], g, 0.0)
        return g

    if mode in ("bicubic", "cubic"):
        raise NotImplementedError("GridSample mode=bicubic")
    if mode in ("nearest",):
        out = fetch(jnp.rint(gy), jnp.rint(gx))
    else:  # linear (bilinear)
        x0 = jnp.floor(gx)
        y0 = jnp.floor(gy)
        fx = (gx - x0)[..., None]
        fy = (gy - y0)[..., None]
        out = (fetch(y0, x0) * (1 - fx) * (1 - fy)
               + fetch(y0, x0 + 1) * fx * (1 - fy)
               + fetch(y0 + 1, x0) * (1 - fx) * fy
               + fetch(y0 + 1, x0 + 1) * fx * fy)
    return out.transpose(0, 3, 1, 2)


@op("RoiAlign")
def _roi_align(ins, at):
    """ONNX RoiAlign (two-stage detector pooling): average of
    sampling_ratio^2 bilinear samples per output bin."""
    x = _a(ins[0]).astype(jnp.float32)       # (N, C, H, W)
    rois = _a(ins[1]).astype(jnp.float32)    # (R, 4) x1 y1 x2 y2
    bidx = _a(ins[2]).astype(jnp.int32)      # (R,)
    oh = int(at.get("output_height", 1))
    ow = int(at.get("output_width", 1))
    # sampling_ratio=0 means ADAPTIVE ceil(roi_size/out_size) per ROI
    # with no spec-side cap; static shapes force a fixed SxS grid with
    # per-ROI sample masking.  Constant ROIs size the grid exactly; for
    # traced ROIs the cap is OPENCV_TPU_ROIALIGN_MAX_SR (default 8) and
    # ROIs whose bins exceed it average fewer samples than the spec —
    # a documented deviation.
    scale = float(at.get("spatial_scale", 1.0))
    sr_attr = int(at.get("sampling_ratio", 0))
    if sr_attr > 0:
        sr = sr_attr
    else:
        import os as _os
        sr = int(_os.environ.get("OPENCV_TPU_ROIALIGN_MAX_SR", "8"))
        if isinstance(ins[1], np.ndarray) and ins[1].size:
            r = np.asarray(ins[1], np.float64)
            oh_ = int(at.get("output_height", 1))
            ow_ = int(at.get("output_width", 1))
            need = max(
                np.ceil((r[:, 3] - r[:, 1]).max() * scale / oh_),
                np.ceil((r[:, 2] - r[:, 0]).max() * scale / ow_), 1.0)
            sr = int(min(64.0, need))
    cmode = at.get("coordinate_transformation_mode", b"half_pixel")
    cmode = cmode.decode() if isinstance(cmode, bytes) else cmode
    off = 0.5 if cmode == "half_pixel" else 0.0
    N, C, H, W = x.shape
    R = rois.shape[0]

    x1 = rois[:, 0] * scale - off
    y1 = rois[:, 1] * scale - off
    x2 = rois[:, 2] * scale - off
    y2 = rois[:, 3] * scale - off
    bw = jnp.maximum(x2 - x1, 1.0 if cmode != "half_pixel" else 0.0)
    bh = jnp.maximum(y2 - y1, 1.0 if cmode != "half_pixel" else 0.0)
    # sample positions: bin (i,j), sub-sample (a,b); adaptive ratio uses
    # nsy/nsx <= sr live samples per ROI (masked below)
    ii = jnp.arange(oh, dtype=jnp.float32)
    jj = jnp.arange(ow, dtype=jnp.float32)
    ar = jnp.arange(sr, dtype=jnp.float32)
    if sr_attr > 0:
        nsy = jnp.full((R,), float(sr))
        nsx = jnp.full((R,), float(sr))
    else:
        nsy = jnp.clip(jnp.ceil(bh / oh), 1.0, float(sr))
        nsx = jnp.clip(jnp.ceil(bw / ow), 1.0, float(sr))
    live_y = ar[None, :] < nsy[:, None]            # (R, sr)
    live_x = ar[None, :] < nsx[:, None]
    aa_y = (ar[None, :] + 0.5) / nsy[:, None]      # (R, sr)
    aa_x = (ar[None, :] + 0.5) / nsx[:, None]
    ys = (y1[:, None, None] + (ii[None, :, None] + aa_y[:, None, :])
          * (bh / oh)[:, None, None])              # (R, oh, sr)
    xs = (x1[:, None, None] + (jj[None, :, None] + aa_x[:, None, :])
          * (bw / ow)[:, None, None])              # (R, ow, sr)

    flat = x.transpose(0, 2, 3, 1).reshape(N * H * W, C)
    nb = (bidx * (H * W))[:, None, None, None, None]

    yv = ys[:, :, None, :, None]                   # (R, oh, 1, sr, 1)
    xv = xs[:, None, :, None, :]                   # (R, 1, ow, 1, sr)
    y0 = jnp.floor(yv)
    x0 = jnp.floor(xv)
    fy = yv - y0
    fx = xv - x0

    # OOB is decided per SAMPLE (bilinear_interpolate returns exactly 0
    # for y < -1 or y > H), not per tap; in-range samples clamp taps
    sample_oob = ((yv < -1) | (yv > H) | (xv < -1) | (xv > W))

    def fetch(iy, ix):
        rc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        ic = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        idx = (rc * W + ic + nb)
        shp = jnp.broadcast_shapes(idx.shape, sample_oob.shape)
        idx = jnp.broadcast_to(idx, shp)
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(shp + (C,))

    # clamp fractional parts like bilinear_interpolate (x<0 -> x=0)
    fx = jnp.where(xv < 0, 0.0, fx)
    fy = jnp.where(yv < 0, 0.0, fy)
    val = (fetch(y0, x0) * ((1 - fx) * (1 - fy))[..., None]
           + fetch(y0, x0 + 1) * (fx * (1 - fy))[..., None]
           + fetch(y0 + 1, x0) * ((1 - fx) * fy)[..., None]
           + fetch(y0 + 1, x0 + 1) * (fx * fy)[..., None])
    live = (live_y[:, None, None, :, None] & live_x[:, None, None, None, :]
            & ~sample_oob)
    val = jnp.where(live[..., None], val, 0.0)
    nlive = (nsy * nsx)[:, None, None]
    out = val.sum(axis=(3, 4)) / nlive[..., None]  # (R, oh, ow, C)
    return out.transpose(0, 3, 1, 2)
