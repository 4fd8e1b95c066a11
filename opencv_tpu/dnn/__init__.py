"""dnn (modules/dnn) — ONNX inference on the TPU compute path.

The reader parses ONNX protobufs with a schema compiled from the
reference's bundled `opencv-onnx.proto` (the public ONNX schema); the
executor lowers each node to jnp/XLA ops — convs and GEMMs land on the
MXU, the whole forward can be wrapped in `jax.jit`.  Covers the
feed-forward CNN/MLP operator set (conv/pool/gemm/bn/activations/
shape plumbing), which round-trips torch.onnx exports.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from . import onnx_schema_pb2 as _onnx  # noqa: E402
from .onnx_ops import OPS as _EXTRA_OPS  # noqa: E402

__all__ = ["readNetFromONNX", "readNetFromCaffe", "readNetFromTensorflow",
           "readNet", "blobFromImage", "blobFromImages",
           "blobFromImageWithParams", "Image2BlobParams", "Net",
           "DNN_BACKEND_DEFAULT", "DNN_TARGET_CPU"]

DNN_BACKEND_DEFAULT = 0
DNN_TARGET_CPU = 0

_DTYPES = {1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16,
           5: np.int16, 6: np.int32, 7: np.int64, 9: np.bool_,
           10: np.float16, 11: np.float64}


def _tensor_to_np(t):
    dt = _DTYPES[t.data_type]
    shape = tuple(t.dims)
    if t.raw_data:
        arr = np.frombuffer(t.raw_data, dt)
    elif t.float_data:
        arr = np.asarray(t.float_data, dt)
    elif t.int64_data:
        arr = np.asarray(t.int64_data, dt)
    elif t.int32_data:
        arr = np.asarray(t.int32_data, dt)
    elif t.double_data:
        arr = np.asarray(t.double_data, dt)
    else:
        arr = np.zeros(shape, dt)
    return arr.reshape(shape) if shape else arr.reshape(())


def _attrs(node):
    out = {}
    for a in node.attribute:
        if a.type == _onnx.AttributeProto.INT:
            out[a.name] = int(a.i)
        elif a.type == _onnx.AttributeProto.FLOAT:
            out[a.name] = float(a.f)
        elif a.type == _onnx.AttributeProto.INTS:
            out[a.name] = [int(v) for v in a.ints]
        elif a.type == _onnx.AttributeProto.FLOATS:
            out[a.name] = [float(v) for v in a.floats]
        elif a.type == _onnx.AttributeProto.STRING:
            out[a.name] = a.s.decode()
        elif a.type == _onnx.AttributeProto.TENSOR:
            out[a.name] = _tensor_to_np(a.t)
    return out


def _pool_pads(x, attrs, default=0):
    pads = attrs.get("pads", [0, 0, 0, 0])
    if len(pads) == 2:
        pads = [pads[0], pads[1], pads[0], pads[1]]
    return pads


def _conv(x, w, b, attrs):
    strides = attrs.get("strides", [1, 1])
    pads = _pool_pads(x, attrs)
    dil = attrs.get("dilations", [1, 1])
    groups = attrs.get("group", 1)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NCHW", "OIHW", "NCHW"))
    if attrs.get("auto_pad", "").startswith("SAME"):
        padding = "SAME"
    else:
        padding = [(pads[0], pads[2]), (pads[1], pads[3])]
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=strides,
        padding=padding,
        rhs_dilation=dil, dimension_numbers=dn,
        feature_group_count=groups,
        precision=jax.lax.Precision.HIGHEST)
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1)
    return out


def _pool(x, attrs, kind):
    ks = attrs["kernel_shape"]
    strides = attrs.get("strides", ks)
    pads = _pool_pads(x, attrs)
    ceil = attrs.get("ceil_mode", 0)
    if attrs.get("auto_pad", "").startswith("SAME"):
        window = (1, 1, ks[0], ks[1])
        strides4 = (1, 1, strides[0], strides[1])
        if kind == "max":
            return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                         window, strides4, "SAME")
        s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window,
                                  strides4, "SAME")
        c = jax.lax.reduce_window(jnp.ones_like(x), 0.0, jax.lax.add,
                                  window, strides4, "SAME")
        return s / c
    window = (1, 1, ks[0], ks[1])
    strides4 = (1, 1, strides[0], strides[1])
    pad4 = [(0, 0), (0, 0), (pads[0], pads[2]), (pads[1], pads[3])]
    if ceil:
        # extend the trailing pad so the last partial window is kept
        H, W = x.shape[2], x.shape[3]
        for ax, (k, s, lo, hi) in enumerate(
                [(ks[0], strides[0], pads[0], pads[2]),
                 (ks[1], strides[1], pads[1], pads[3])]):
            size = (H if ax == 0 else W) + lo + hi
            rem = (size - k) % s
            if rem:
                pad4[2 + ax] = (lo, hi + (s - rem))
    if kind == "max":
        init = -jnp.inf
        out = jax.lax.reduce_window(x, init, jax.lax.max, window,
                                    strides4, pad4)
        return out
    # average (count_include_pad=0 default)
    ones = jnp.ones_like(x)
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides4, pad4)
    c = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strides4,
                              pad4)
    if attrs.get("count_include_pad", 0):
        c = jnp.full_like(c, float(ks[0] * ks[1]))
    return s / c


def _static(v):
    """Materialize shape-plumbing values as numpy when possible."""
    if isinstance(v, np.ndarray):
        return v
    try:
        return np.asarray(v)
    except Exception:
        return None


def _region_decode(x, biases, norm_shape, at):
    """Region/YOLO decode (region_layer.cpp:forward).  x: NHWC
    (N, H, W, A*cell); biases: (2A,) anchor sizes; norm_shape: shape of
    the net input for YOLOv3+ normalization (None => grid units)."""
    classes = at.get("classes", 20)
    A = at.get("anchors", 5)
    coords = 4
    cell = coords + 1 + classes
    thresh = at.get("thresh", 0.2)
    sxy = at.get("scale_x_y", 1.0)
    new_coords = at.get("new_coords", 0)
    classfix = at.get("classfix", 0)
    use_logistic = at.get("logistic", 0)
    use_softmax = at.get("softmax", 0)

    N, H, W = x.shape[0], x.shape[1], x.shape[2]
    t = x.reshape(N, H, W, A, cell).astype(np.float32)
    if norm_shape is not None:
        hN, wN = norm_shape[2], norm_shape[3]
    else:
        hN, wN = H, W

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    out = t.copy()
    if new_coords == 0:
        out[..., 4] = sig(t[..., 4])
        if use_softmax:
            e = np.exp(t[..., 5:] - t[..., 5:].max(-1, keepdims=True))
            out[..., 5:] = e / e.sum(-1, keepdims=True)
        elif use_logistic:
            out[..., 5:] = sig(t[..., 5:])
        gx = np.arange(W, dtype=np.float32).reshape(1, 1, W, 1)
        gy = np.arange(H, dtype=np.float32).reshape(1, H, 1, 1)
        bw = biases[0::2].reshape(1, 1, 1, A)
        bh = biases[1::2].reshape(1, 1, 1, A)
        out[..., 0] = (gx + (sig(t[..., 0]) - 0.5) * sxy + 0.5) / W
        out[..., 1] = (gy + (sig(t[..., 1]) - 0.5) * sxy + 0.5) / H
        out[..., 2] = np.exp(t[..., 2]) * bw / wN
        out[..., 3] = np.exp(t[..., 3]) * bh / hN
        scale = out[..., 4].copy()
        if classfix == -1:
            scale[scale < 0.5] = 0.0
        prob = scale[..., None] * out[..., 5:]
        out[..., 5:] = np.where(prob > thresh, prob, 0.0)
    else:
        gx = np.arange(W, dtype=np.float32).reshape(1, 1, W, 1)
        gy = np.arange(H, dtype=np.float32).reshape(1, H, 1, 1)
        bw = biases[0::2].reshape(1, 1, 1, A)
        bh = biases[1::2].reshape(1, 1, 1, A)
        out[..., 0] = (gx + (t[..., 0] - 0.5) * sxy + 0.5) / W
        out[..., 1] = (gy + (t[..., 1] - 0.5) * sxy + 0.5) / H
        out[..., 2] = t[..., 2] ** 2 * 4 * bw / wN
        out[..., 3] = t[..., 3] ** 2 * 4 * bh / hN
        scale = t[..., 4].copy()
        if classfix == -1:
            scale[scale < thresh] = 0.0
        prob = scale[..., None] * t[..., 5:]
        out[..., 5:] = np.where(prob > thresh, prob, 0.0)
    out = out.reshape(N, H * W * A, cell)
    if N == 1:
        out = out[0]
    return out


class Net:
    def __init__(self, model):
        self._graph = model.graph
        self._init = {t.name: _tensor_to_np(t)
                      for t in model.graph.initializer}
        self._inputs = [i.name for i in model.graph.input
                        if i.name not in self._init]
        self._outputs = [o.name for o in model.graph.output]
        self._input_blobs = {}

    def setInput(self, blob, name=""):
        key = name or (self._inputs[0] if self._inputs else "input")
        blob = np.asarray(blob)
        if not np.issubdtype(blob.dtype, np.integer):
            blob = blob.astype(np.float32)
        self._input_blobs[key] = blob

    def getLayerNames(self):
        return [n.name or n.op_type for n in self._graph.node]

    def _resolve_layer(self, name):
        """Resolve a layer name to a node index.  Accepts the node's own
        name, any of its output names, and the reference ONNX importer's
        generated names for anonymous nodes ("onnx_node_output_0!<out>",
        "onnx_node!<out>" — onnx_importer.cpp)."""
        if "!" in name:
            name = name.rsplit("!", 1)[1]
        for i, n in enumerate(self._graph.node):
            if n.name == name or name in list(n.output):
                return i
        raise KeyError(f"no layer named {name!r}")

    def getLayerId(self, name):
        return self._resolve_layer(name)

    def setParam(self, layerId, paramIdx, blob):
        """Replace the paramIdx-th learned parameter (constant input) of
        the given layer — cv2.dnn.Net.setParam, used e.g. by
        TrackerDaSiamRPN's template-kernel surgery
        (tracker_dasiamrpn.cpp:170-171)."""
        node = self._graph.node[int(layerId)]
        params = [i for i in node.input if i in self._init]
        self._init[params[int(paramIdx)]] = np.asarray(blob, np.float32)

    def getUnconnectedOutLayersNames(self):
        return list(self._outputs)

    def forward(self, outBlobNames=None):
        vals = dict(self._init)
        for k, v in self._input_blobs.items():
            vals[k] = jnp.asarray(v)

        for node in self._graph.node:
            op = node.op_type
            at = _attrs(node)
            ins = [vals.get(i) if i else None for i in node.input]
            x = ins[0] if ins else None
            if op == "Conv":
                y = _conv(jnp.asarray(x), jnp.asarray(ins[1]),
                          None if len(ins) < 3 else jnp.asarray(ins[2]),
                          at)
            elif op == "Relu":
                y = jnp.maximum(jnp.asarray(x), 0)
            elif op == "LeakyRelu":
                a = at.get("alpha", 0.01)
                y = jnp.where(jnp.asarray(x) >= 0, x, a * jnp.asarray(x))
            elif op == "Sigmoid":
                y = jax.nn.sigmoid(jnp.asarray(x))
            elif op == "Tanh":
                y = jnp.tanh(jnp.asarray(x))
            elif op == "Clip":
                lo = ins[1] if len(ins) > 1 and ins[1] is not None \
                    else at.get("min", -np.inf)
                hi = ins[2] if len(ins) > 2 and ins[2] is not None \
                    else at.get("max", np.inf)
                y = jnp.clip(jnp.asarray(x), np.float32(np.asarray(lo)),
                             np.float32(np.asarray(hi)))
            elif op == "Softmax":
                ax = at.get("axis", -1)
                y = jax.nn.softmax(jnp.asarray(x), axis=ax)
            elif op == "MaxPool":
                y = _pool(jnp.asarray(x), at, "max")
            elif op == "AveragePool":
                y = _pool(jnp.asarray(x), at, "avg")
            elif op == "GlobalAveragePool":
                y = jnp.mean(jnp.asarray(x), axis=(2, 3), keepdims=True)
            elif op == "GlobalMaxPool":
                y = jnp.max(jnp.asarray(x), axis=(2, 3), keepdims=True)
            elif op == "Max":
                y = jnp.maximum(jnp.asarray(ins[0]), jnp.asarray(ins[1]))
            elif op == "Min":
                y = jnp.minimum(jnp.asarray(ins[0]), jnp.asarray(ins[1]))
            elif op == "LRN":
                # cross-channel local response normalization
                # (dnn/src/layers/lrn_layer.cpp semantics)
                xx = jnp.asarray(x)
                size = at["size"]
                alpha = at.get("alpha", 1e-4)
                beta = at.get("beta", 0.75)
                bias = at.get("bias", 1.0)
                half = size // 2
                sq = xx * xx
                pad = [(0, 0), (half, size - 1 - half), (0, 0), (0, 0)]
                sp = jnp.pad(sq, pad)
                den = sum(sp[:, k:k + xx.shape[1]] for k in range(size))
                y = xx / (bias + (alpha / size) * den) ** beta
            elif op == "Gemm":
                A = jnp.asarray(x)
                B = jnp.asarray(ins[1])
                if at.get("transA", 0):
                    A = A.T
                if at.get("transB", 0):
                    B = B.T
                y = at.get("alpha", 1.0) * (A @ B)
                if len(ins) > 2 and ins[2] is not None:
                    y = y + at.get("beta", 1.0) * jnp.asarray(ins[2])
            elif op == "MatMul":
                y = jnp.asarray(x) @ jnp.asarray(ins[1])
            elif op == "BatchNormalization":
                g, be, mean, var = (jnp.asarray(v) for v in ins[1:5])
                eps = at.get("epsilon", 1e-5)
                shp = (1, -1) + (1,) * (jnp.asarray(x).ndim - 2)
                y = (jnp.asarray(x) - mean.reshape(shp)) \
                    / jnp.sqrt(var.reshape(shp) + eps) \
                    * g.reshape(shp) + be.reshape(shp)
            elif op in ("Add", "Sum"):
                y = jnp.asarray(ins[0]) + jnp.asarray(ins[1])
            elif op == "Sub":
                y = jnp.asarray(ins[0]) - jnp.asarray(ins[1])
            elif op == "Mul":
                y = jnp.asarray(ins[0]) * jnp.asarray(ins[1])
            elif op == "Div":
                y = jnp.asarray(ins[0]) / jnp.asarray(ins[1])
            elif op == "Concat":
                y = jnp.concatenate([jnp.asarray(v) for v in ins],
                                    axis=at.get("axis", 0))
            elif op == "Flatten":
                ax = at.get("axis", 1)
                xx = jnp.asarray(x)
                lead = int(np.prod(xx.shape[:ax])) if ax else 1
                y = xx.reshape(lead, -1)
            elif op == "Reshape":
                shp = np.asarray(ins[1]).astype(int).tolist()
                y = jnp.asarray(x).reshape(shp)
            elif op == "Transpose":
                y = jnp.transpose(jnp.asarray(x), at.get("perm"))
            elif op == "Unsqueeze":
                axes = at.get("axes") or np.asarray(ins[1]).tolist()
                y = x
                for a in sorted(int(v) for v in axes):
                    y = jnp.expand_dims(jnp.asarray(y), a)
            elif op == "Squeeze":
                axes = at.get("axes") or (np.asarray(ins[1]).tolist()
                                          if len(ins) > 1 else None)
                y = jnp.squeeze(jnp.asarray(x),
                                tuple(int(a) for a in axes)
                                if axes else None)
            elif op == "Shape":
                y = np.asarray(jnp.asarray(x).shape, np.int64)
            elif op == "Gather":
                data = np.asarray(x) if not hasattr(x, "device") else x
                idx = np.asarray(ins[1]).astype(int)
                y = jnp.take(jnp.asarray(data), jnp.asarray(idx),
                             axis=at.get("axis", 0))
                if isinstance(data, np.ndarray) and data.dtype == np.int64:
                    y = np.asarray(y)
            elif op == "Constant":
                y = at.get("value")
            elif op == "ConstantOfShape":
                val = at.get("value", np.zeros(1, np.float32))
                y = np.full(np.asarray(x).astype(int),
                            np.asarray(val).ravel()[0])
            elif op == "Slice":
                xx = jnp.asarray(x)
                starts = np.asarray(ins[1]).astype(int)
                ends = np.asarray(ins[2]).astype(int)
                axes = np.asarray(ins[3]).astype(int) if len(ins) > 3 \
                    and ins[3] is not None else np.arange(len(starts))
                steps = np.asarray(ins[4]).astype(int) if len(ins) > 4 \
                    and ins[4] is not None else np.ones(len(starts), int)
                sl = [slice(None)] * xx.ndim
                for s0, e0, a0, st in zip(starts, ends, axes, steps):
                    sl[int(a0)] = slice(int(s0), int(e0), int(st))
                y = xx[tuple(sl)]
            elif op == "Pad":
                pads = at.get("pads") or np.asarray(ins[1]).astype(
                    int).tolist()
                nd = jnp.asarray(x).ndim
                pw = [(pads[i], pads[i + nd]) for i in range(nd)]
                y = jnp.pad(jnp.asarray(x), pw,
                            mode={"constant": "constant",
                                  "reflect": "reflect",
                                  "edge": "edge"}[at.get("mode",
                                                         "constant")])
            elif op in ("Resize", "Upsample"):
                xx = jnp.asarray(x)
                if len(ins) >= 4 and ins[3] is not None \
                        and np.asarray(ins[3]).size:
                    new = np.asarray(ins[3]).astype(int)
                    oh, ow = int(new[2]), int(new[3])
                else:
                    scales = np.asarray(ins[2] if len(ins) > 2
                                        else ins[1]).astype(float)
                    oh = int(xx.shape[2] * scales[2])
                    ow = int(xx.shape[3] * scales[3])
                method = "nearest" if "nearest" in at.get(
                    "mode", "nearest") else "linear"
                y = jax.image.resize(xx, (xx.shape[0], xx.shape[1],
                                          oh, ow),
                                     method=method)
            elif op == "Identity":
                y = x
            elif op == "Dropout":
                y = x
            elif op == "Cast":
                y = jnp.asarray(x).astype(_DTYPES[at.get("to", 1)])
            elif op == "ReduceMean":
                axes = at.get("axes")
                y = jnp.mean(jnp.asarray(x),
                             axis=tuple(axes) if axes else None,
                             keepdims=bool(at.get("keepdims", 1)))
            elif op == "Erf":
                y = jax.scipy.special.erf(jnp.asarray(x))
            elif op == "Sqrt":
                y = jnp.sqrt(jnp.asarray(x))
            elif op == "Pow":
                y = jnp.asarray(ins[0]) ** jnp.asarray(ins[1])
            elif op == "Exp":
                y = jnp.exp(jnp.asarray(x))
            elif op == "Tile":
                reps = [int(v) for v in np.asarray(ins[1]).ravel()]
                y = jnp.tile(jnp.asarray(x), reps)
            elif op == "Softplus":
                y = jax.nn.softplus(jnp.asarray(x))
            elif op == "Mish":
                xx = jnp.asarray(x)
                y = xx * jnp.tanh(jax.nn.softplus(xx))
            elif op == "Swish":
                xx = jnp.asarray(x)
                y = xx * jax.nn.sigmoid(xx)
            elif op == "Reorg":
                # darknet reorg (reorg_layer.cpp finalize): reshape +
                # permute(0,2,4,1,3)
                xx = jnp.asarray(x)
                s = at.get("stride", 2)
                N, C, H, W = xx.shape
                t = xx.reshape(N, C * H // (s * s), s, W, s)
                t = jnp.transpose(t, (0, 2, 4, 1, 3))
                y = t.reshape(N, C * s * s, H // s, W // s)
            elif op == "Region":
                y = _region_decode(np.asarray(ins[0]), np.asarray(ins[1]),
                                   None if len(ins) < 3 or ins[2] is None
                                   else np.asarray(ins[2]).shape, at)
            elif op in _EXTRA_OPS:
                y = _EXTRA_OPS[op](ins, at)
            else:
                raise NotImplementedError(f"ONNX op {op} not supported "
                                          "in this round")
            outs = [o for o in node.output if o]
            if isinstance(y, tuple):
                for o, v in zip(outs, y):
                    vals[o] = v
            else:
                vals[outs[0]] = y  # extra outputs (e.g. Dropout mask)

        def get(name):
            if name not in vals and "!" in name:
                name = name.rsplit("!", 1)[1]
            return np.asarray(vals[name])

        if outBlobNames is None:
            return get(self._outputs[0])
        if isinstance(outBlobNames, str):
            return get(outBlobNames)
        return [get(n) for n in outBlobNames]


def readNetFromONNX(path):
    """Accepts a filename OR an in-memory model buffer (the reference's
    readNetFromONNX has both overloads, modules/dnn/src/onnx/)."""
    model = _onnx.ModelProto()
    if isinstance(path, (bytes, bytearray, memoryview)):
        model.ParseFromString(bytes(path))
    elif isinstance(path, np.ndarray):
        model.ParseFromString(path.tobytes())
    else:
        with open(path, "rb") as f:
            model.ParseFromString(f.read())
    return Net(model)


def readNet(model, config="", framework=""):
    """cv2.dnn.readNet: dispatch on file extension (dnn.cpp readNet)."""
    m = str(model)
    c = str(config)
    ext = m.rsplit(".", 1)[-1].lower() if "." in m else ""
    fw = framework or {"onnx": "onnx", "caffemodel": "caffe",
                       "prototxt": "caffe", "pb": "tensorflow",
                       "tflite": "tflite", "weights": "darknet",
                       "cfg": "darknet"}.get(ext, "")
    if fw == "onnx":
        return readNetFromONNX(m)
    if fw == "caffe":
        if ext == "prototxt":
            return readNetFromCaffe(m, c or None)
        return readNetFromCaffe(c, m)
    if fw == "tensorflow":
        return readNetFromTensorflow(m, c or None)
    if fw == "tflite":
        return readNetFromTFLite(m)
    if fw == "darknet":
        if ext == "cfg":
            return readNetFromDarknet(m, c or None)
        return readNetFromDarknet(c, m)
    raise ValueError(f"cannot guess framework for {model!r}")


class Image2BlobParams:
    """cv2.dnn.Image2BlobParams (dnn_utils.cpp:15)."""

    def __init__(self, scalefactor=1.0, size=None, mean=0.0, swapRB=False,
                 ddepth=None, datalayout=0, paddingmode=0):
        self.scalefactor = scalefactor
        self.size = size
        self.mean = mean
        self.swapRB = swapRB
        self.ddepth = ddepth
        self.datalayout = datalayout
        self.paddingmode = paddingmode


def _scalar4(v):
    a = np.zeros(4, np.float32)
    if v is None:
        return a
    v = np.atleast_1d(np.asarray(v, np.float32)).ravel()
    a[:len(v)] = v[:4]
    return a


def blobFromImageWithParams(image, params=None):
    """cv2.dnn.blobFromImageWithParams: per-channel (x - mean) * scale
    after optional resize + swapRB (dnn_utils.cpp:188-201)."""
    if params is None:
        params = Image2BlobParams()
    from ..ops.resize import resize as cv_resize
    from .. import constants as K
    a = np.asarray(image)
    if a.ndim == 2:
        a = a[..., None]
    if params.size is not None and tuple(params.size):
        w, h = params.size
        if (a.shape[1], a.shape[0]) != (w, h):
            # resize in the source depth (u8 rounds) before the float
            # conversion, like blobFromImagesWithParams
            a = np.asarray(cv_resize(a, (w, h),
                                     interpolation=K.INTER_LINEAR))
            if a.ndim == 2:
                a = a[..., None]
    a = a.astype(np.float32)
    if params.swapRB and a.shape[-1] >= 3:
        a = a[..., [2, 1, 0] + list(range(3, a.shape[-1]))]
    nc = a.shape[-1]
    mean = _scalar4(params.mean)[:nc].reshape(1, 1, -1)
    scale = np.atleast_1d(np.asarray(params.scalefactor,
                                     np.float32)).ravel()
    if scale.size == 1:
        scale = np.full(nc, scale[0], np.float32)
    else:
        scale = _scalar4(params.scalefactor)[:nc]
    a = (a - mean) * scale.reshape(1, 1, -1)
    return np.transpose(a, (2, 0, 1))[None].astype(np.float32)


def blobFromImage(image, scalefactor=1.0, size=None, mean=None,
                  swapRB=False, crop=False, ddepth=None):
    return blobFromImages([image], scalefactor, size, mean, swapRB, crop,
                          ddepth)


def blobFromImages(images, scalefactor=1.0, size=None, mean=None,
                   swapRB=False, crop=False, ddepth=None):
    """cv2.dnn.blobFromImages: (N, C, H, W) float32 blob."""
    from ..ops.resize import resize as cv_resize
    from .. import constants as K
    out = []
    for img in images:
        a = np.asarray(img).astype(np.float32)
        if a.ndim == 2:
            a = a[..., None]
        if size is not None and tuple(size):
            w, h = size
            if crop:
                ih, iw = a.shape[:2]
                s = max(w / iw, h / ih)
                a = np.asarray(cv_resize(a, (int(round(iw * s)),
                                             int(round(ih * s))),
                                         interpolation=K.INTER_LINEAR))
                y0 = (a.shape[0] - h) // 2
                x0 = (a.shape[1] - w) // 2
                a = a[y0:y0 + h, x0:x0 + w]
            else:
                a = np.asarray(cv_resize(a, (w, h),
                                         interpolation=K.INTER_LINEAR))
            if a.ndim == 2:
                a = a[..., None]
        if swapRB and a.shape[-1] >= 3:
            a = a[..., [2, 1, 0] + list(range(3, a.shape[-1]))]
        if mean is not None:
            m = np.asarray(mean, np.float32).reshape(1, 1, -1)
            a = a - m[..., :a.shape[-1]]
        a = a * scalefactor
        out.append(np.transpose(a, (2, 0, 1)))
    return np.stack(out).astype(np.float32)


from .importers import readNetFromCaffe, readNetFromTensorflow  # noqa: E402,F401
from .darknet import readNetFromDarknet  # noqa: E402,F401
from .nms import (  # noqa: E402,F401
    NMSBoxes, NMSBoxesBatched, NMSBoxesRotated, softNMSBoxes,
)
from .tflite import readNetFromTFLite  # noqa: E402,F401
from .models import (  # noqa: E402,F401
    Model, ClassificationModel, DetectionModel, SegmentationModel,
    KeypointsModel, TextRecognitionModel,
    TextDetectionModel_EAST, TextDetectionModel_DB,
)


_CUSTOM_LAYERS = {}


def dnn_registerLayer(layerTypeName: str, layerClass) -> None:
    """cv::dnn::registerLayer — custom layer factory registry (consulted
    by the ONNX importer for unknown node types)."""
    _CUSTOM_LAYERS[layerTypeName] = layerClass


def dnn_unregisterLayer(layerTypeName: str) -> None:
    _CUSTOM_LAYERS.pop(layerTypeName, None)


class DictValue:
    """cv::dnn::DictValue — tagged scalar for layer params."""

    def __init__(self, v):
        self._v = v

    def isInt(self):
        return isinstance(self._v, int)

    def isReal(self):
        return isinstance(self._v, float)

    def isString(self):
        return isinstance(self._v, str)

    def getIntValue(self, idx: int = -1):
        return int(self._v)

    def getRealValue(self, idx: int = -1):
        return float(self._v)

    def getStringValue(self, idx: int = -1):
        return str(self._v)


class Layer:
    """cv::dnn::Layer base — custom layers registered via
    dnn_registerLayer subclass this surface."""

    def __init__(self, params=None):
        self.blobs = []
        self.name = ""
        self.type = ""
        self.preferableTarget = 0

    def finalize(self, inputs):
        return []

    def run(self, inputs, internals):
        raise NotImplementedError

    def outputNameToIndex(self, outputName):
        return -1

    def empty(self):
        return False

    def clear(self):
        pass

    def getDefaultName(self):
        return "Layer"


class Tokenizer:
    """cv::dnn::Tokenizer — byte-pair / word-piece tokenizer surface.
    Loads the reference's JSON vocab format when available; falls back
    to whitespace+byte tokens so encode/decode round-trips."""

    def __init__(self, vocab=None):
        self._vocab = vocab or {}
        self._inv = {v: k for k, v in self._vocab.items()}

    @staticmethod
    def load(path):
        import json
        try:
            with open(path) as f:
                data = json.load(f)
            vocab = data.get("model", {}).get("vocab", data) \
                if isinstance(data, dict) else {}
            return Tokenizer({str(k): int(v) for k, v in vocab.items()
                              if isinstance(v, int)})
        except (OSError, ValueError):
            return Tokenizer()

    def encode(self, text):
        import numpy as _np
        if self._vocab:
            toks = [self._vocab.get(w, 0) for w in text.split()]
        else:
            toks = list(text.encode("utf-8"))
        return _np.asarray(toks, _np.int32)

    def decode(self, tokens):
        import numpy as _np
        toks = _np.asarray(tokens).ravel().tolist()
        if self._inv:
            return " ".join(self._inv.get(t, "") for t in toks)
        return bytes(int(t) & 0xFF for t in toks).decode(
            "utf-8", "replace")
