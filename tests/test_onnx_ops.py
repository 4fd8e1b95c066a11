"""Extended ONNX operator zoo vs torch / numpy oracles.

Each case builds a genuine ONNX proto, runs it through dnn.Net's XLA
executor, and checks against an independent torch/numpy computation."""

import os
import tempfile

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from opencv_tpu import dnn
from opencv_tpu.dnn import onnx_schema_pb2 as P

from test_dnn_trackers import _tensor, _node, _model, _save


def _run(nodes, inits, feeds, out="y", extra_outputs=()):
    inputs = [(k, v.shape) for k, v in feeds.items()]
    m = _model(inputs, [out] + list(extra_outputs), nodes, inits)
    tmp = os.path.join(tempfile.mkdtemp(), "m.onnx")
    net = dnn.readNetFromONNX(_save(m, tmp))
    for k, v in feeds.items():
        net.setInput(v, k)
    if extra_outputs:
        return net.forward([out] + list(extra_outputs))
    return net.forward(out)


RNG = np.random.default_rng(0)
X = RNG.normal(0, 2, (2, 3, 8, 8)).astype(np.float32)


@pytest.mark.parametrize("op,tfn,attrs", [
    ("Neg", lambda t: -t, {}),
    ("Abs", torch.abs, {}),
    ("Floor", torch.floor, {}),
    ("Ceil", torch.ceil, {}),
    ("Round", torch.round, {}),
    ("Reciprocal", lambda t: 1.0 / t, {}),
    ("Sign", torch.sign, {}),
    ("Sin", torch.sin, {}),
    ("Cos", torch.cos, {}),
    ("Atan", torch.atan, {}),
    ("Elu", lambda t: F.elu(t, 1.3), {"alpha": 1.3}),
    ("Selu", F.selu, {}),
    ("Celu", lambda t: F.celu(t, 1.1), {"alpha": 1.1}),
    ("HardSigmoid", lambda t: torch.clamp(0.2 * t + 0.5, 0, 1),
     {"alpha": 0.2, "beta": 0.5}),
    ("HardSwish", F.hardswish, {}),
    ("Softsign", F.softsign, {}),
    ("Gelu", F.gelu, {}),
    ("LogSoftmax", lambda t: F.log_softmax(t, dim=1), {"axis": 1}),
    ("Softplus", F.softplus, {}),
    ("Mish", F.mish, {}),
])
def test_elementwise_vs_torch(op, tfn, attrs):
    ref = tfn(torch.tensor(X)).numpy()
    out = _run([_node(op, ["x"], ["y"], **attrs)], [], {"x": X})
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_prelu_vs_torch():
    s = RNG.random(3).astype(np.float32)
    ref = F.prelu(torch.tensor(X), torch.tensor(s)).numpy()
    out = _run([_node("PRelu", ["x", "s"], ["y"])],
               [_tensor("s", s)], {"x": X})
    np.testing.assert_allclose(out, ref, rtol=1e-6)


@pytest.mark.parametrize("op,npfn", [
    ("ReduceSum", np.sum), ("ReduceMax", np.max), ("ReduceMin", np.min),
    ("ReduceProd", np.prod),
    ("ReduceL1", lambda a, **k: np.sum(np.abs(a), **k)),
    ("ReduceL2", lambda a, **k: np.sqrt(np.sum(a * a, **k))),
    ("ReduceSumSquare", lambda a, **k: np.sum(a * a, **k)),
    ("ReduceLogSumExp",
     lambda a, **k: np.log(np.sum(np.exp(a), **k))),
])
def test_reductions(op, npfn):
    ref = npfn(X, axis=(1, 2), keepdims=True)
    out = _run([_node(op, ["x"], ["y"], axes=[1, 2], keepdims=1)],
               [], {"x": X})
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_argmax_topk_cumsum():
    out = _run([_node("ArgMax", ["x"], ["y"], axis=1, keepdims=0)],
               [], {"x": X})
    np.testing.assert_array_equal(out, np.argmax(X, 1))

    v, i = _run([_node("TopK", ["x", "k"], ["y", "yi"], axis=-1)],
                [_tensor("k", np.asarray([3], np.int64))], {"x": X},
                extra_outputs=["yi"])
    tv, ti = torch.topk(torch.tensor(X), 3, dim=-1)
    np.testing.assert_allclose(v, tv.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(i, ti.numpy())

    out = _run([_node("CumSum", ["x", "ax"], ["y"])],
               [_tensor("ax", np.asarray(3, np.int64))], {"x": X})
    np.testing.assert_allclose(out, np.cumsum(X, 3), rtol=1e-5,
                               atol=1e-5)


def test_split_expand_range_where():
    outs = _run([_node("Split", ["x"], ["y", "y2"], axis=1,
                       split=[1, 2])], [], {"x": X},
                extra_outputs=["y2"])
    np.testing.assert_allclose(outs[0], X[:, :1])
    np.testing.assert_allclose(outs[1], X[:, 1:])

    out = _run([_node("Expand", ["x", "shp"], ["y"])],
               [_tensor("shp", np.asarray([2, 3, 8, 8], np.int64))],
               {"x": X[:1, :1]})
    np.testing.assert_allclose(out, np.broadcast_to(X[:1, :1],
                                                    (2, 3, 8, 8)))

    out = _run([_node("Greater", ["x", "h"], ["m"]),
                _node("Where", ["m", "x", "h"], ["y"])],
               [_tensor("h", np.zeros((1,), np.float32))], {"x": X})
    np.testing.assert_allclose(out, np.maximum(X, 0.0))


def test_depth_space_roundtrip():
    x = RNG.normal(0, 1, (1, 8, 4, 6)).astype(np.float32)
    # torch.pixel_shuffle implements the CRD layout
    ref = F.pixel_shuffle(torch.tensor(x), 2).numpy()
    out = _run([_node("DepthToSpace", ["x"], ["y"], blocksize=2,
                      mode="CRD")], [], {"x": x})
    np.testing.assert_allclose(out, ref, rtol=1e-6)
    # SpaceToDepth o DepthToSpace(DCR) == identity
    out2 = _run([_node("DepthToSpace", ["x"], ["t"], blocksize=2),
                 _node("SpaceToDepth", ["t"], ["y"], blocksize=2)],
                [], {"x": x})
    np.testing.assert_allclose(out2, x, rtol=1e-6)


def test_normalizations_vs_torch():
    g = RNG.random(3).astype(np.float32)
    b = RNG.random(3).astype(np.float32)
    ref = F.instance_norm(torch.tensor(X), weight=torch.tensor(g),
                          bias=torch.tensor(b), eps=1e-5).numpy()
    out = _run([_node("InstanceNormalization", ["x", "g", "b"], ["y"],
                      epsilon=1e-5)],
               [_tensor("g", g), _tensor("b", b)], {"x": X})
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    w = RNG.random((8,)).astype(np.float32)
    bb = RNG.random((8,)).astype(np.float32)
    ref = F.layer_norm(torch.tensor(X), (8,), torch.tensor(w),
                       torch.tensor(bb)).numpy()
    out = _run([_node("LayerNormalization", ["x", "w", "b"], ["y"],
                      axis=-1)],
               [_tensor("w", w), _tensor("b", bb)], {"x": X})
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    g4 = RNG.random(4).astype(np.float32)
    b4 = RNG.random(4).astype(np.float32)
    x4 = RNG.normal(0, 1, (2, 4, 6, 6)).astype(np.float32)
    ref = F.group_norm(torch.tensor(x4), 2, torch.tensor(g4),
                       torch.tensor(b4)).numpy()
    out = _run([_node("GroupNormalization", ["x", "g", "b"], ["y"],
                      num_groups=2, epsilon=1e-5)],
               [_tensor("g", g4), _tensor("b", b4)], {"x": x4})
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("groups,stride,pad,outpad", [
    (1, 1, 0, 0), (1, 2, 1, 1), (2, 2, 0, 0), (4, 3, 2, 1),
])
def test_conv_transpose_vs_torch(groups, stride, pad, outpad):
    x = RNG.normal(0, 1, (2, 4, 7, 7)).astype(np.float32)
    w = RNG.normal(0, 0.5, (4, 8 // groups, 3, 3)).astype(np.float32)
    b = RNG.normal(0, 0.5, 8).astype(np.float32)
    ref = F.conv_transpose2d(torch.tensor(x), torch.tensor(w),
                             torch.tensor(b), stride=stride,
                             padding=pad, output_padding=outpad,
                             groups=groups).numpy()
    out = _run([_node("ConvTranspose", ["x", "w", "b"], ["y"],
                      kernel_shape=[3, 3], strides=[stride, stride],
                      pads=[pad, pad, pad, pad],
                      output_padding=[outpad, outpad], group=groups)],
               [_tensor("w", w), _tensor("b", b)], {"x": x})
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_quantize_roundtrip():
    s = np.asarray([0.05], np.float32)
    z = np.asarray([10], np.int8)
    q = _run([_node("QuantizeLinear", ["x", "s", "z"], ["y"])],
             [_tensor_i8("s", s, False), _tensor_i8("z", z, True)],
             {"x": X})
    ref = np.clip(np.round(X / 0.05) + 10, -128, 127).astype(np.int8)
    np.testing.assert_array_equal(q, ref)

    d = _run([_node("QuantizeLinear", ["x", "s", "z"], ["q"]),
              _node("DequantizeLinear", ["q", "s", "z"], ["y"])],
             [_tensor_i8("s", s, False), _tensor_i8("z", z, True)],
             {"x": X})
    np.testing.assert_allclose(d, (ref.astype(np.int32) - 10) * 0.05,
                               rtol=1e-6)


def _tensor_i8(name, arr, is_int8):
    t = P.TensorProto()
    t.name = name
    arr = np.asarray(arr)
    t.data_type = 3 if is_int8 else 1
    t.dims.extend(arr.shape)
    t.raw_data = np.ascontiguousarray(arr).tobytes()
    return t


def test_qlinearconv_vs_manual():
    rng = np.random.default_rng(3)
    xq = rng.integers(-100, 100, (1, 3, 8, 8)).astype(np.int8)
    wq = rng.integers(-80, 80, (5, 3, 3, 3)).astype(np.int8)
    bias = rng.integers(-500, 500, 5).astype(np.int32)
    xs, xz = 0.02, 3
    ws, wz = 0.01, -2
    ys, yz = 0.1, 5

    inits = [
        _tensor_i8("xs", np.float32([xs]), False),
        _tensor_i8("xz", np.int8([xz]), True),
        _tensor_i8("w", wq, True),
        _tensor_i8("ws", np.float32([ws]), False),
        _tensor_i8("wz", np.int8([wz]), True),
        _tensor_i8("ys", np.float32([ys]), False),
        _tensor_i8("yz", np.int8([yz]), True),
    ]
    bt = P.TensorProto()
    bt.name = "b"
    bt.data_type = 6
    bt.dims.extend(bias.shape)
    bt.raw_data = bias.tobytes()
    inits.append(bt)

    m = _model([("x", xq.shape)], ["y"],
               [_node("QLinearConv",
                      ["x", "xs", "xz", "w", "ws", "wz", "ys", "yz",
                       "b"], ["y"], kernel_shape=[3, 3],
                      pads=[1, 1, 1, 1], strides=[1, 1])], inits)
    tmp = os.path.join(tempfile.mkdtemp(), "q.onnx")
    net = dnn.readNetFromONNX(_save(m, tmp))
    net.setInput(xq)
    out = net.forward()

    # manual int reference via torch int32 conv
    acc = F.conv2d(torch.tensor(xq.astype(np.int32) - xz),
                   torch.tensor(wq.astype(np.int32) - wz),
                   padding=1).numpy() + bias.reshape(1, -1, 1, 1)
    ref = np.clip(np.round(acc * (xs * ws / ys)) + yz,
                  -128, 127).astype(np.int8)
    np.testing.assert_array_equal(out, ref)


def test_onnx_nms():
    boxes = np.asarray([[
        [0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60],
        [0, 0, 9, 9]]], np.float32)
    scores = np.asarray([[[0.9, 0.8, 0.7, 0.95]]], np.float32)
    out = _run([_node("NonMaxSuppression",
                      ["b", "s", "mo", "it", "st"], ["y"])],
               [_tensor("mo", np.asarray([10], np.int64)),
                _tensor("it", np.asarray([0.5], np.float32)),
                _tensor("st", np.asarray([0.1], np.float32))],
               {"b": boxes, "s": scores})
    # box3 (0.95) suppresses box0/box1; box2 survives
    kept = set(map(tuple, np.asarray(out)))
    assert kept == {(0, 0, 3), (0, 0, 2)}, kept


def test_einsum_gathernd_scatternd():
    a = RNG.normal(0, 1, (3, 4)).astype(np.float32)
    bm = RNG.normal(0, 1, (4, 5)).astype(np.float32)
    out = _run([_node("Einsum", ["x", "b"], ["y"], equation="ij,jk->ik")],
               [_tensor("b", bm)], {"x": a})
    np.testing.assert_allclose(out, a @ bm, rtol=1e-5, atol=1e-6)

    data = RNG.normal(0, 1, (4, 5)).astype(np.float32)
    idx = np.asarray([[0, 1], [3, 4]], np.int64)
    out = _run([_node("GatherND", ["x", "i"], ["y"])],
               [_tensor("i", idx)], {"x": data})
    np.testing.assert_allclose(out, data[[0, 3], [1, 4]])

    upd = np.asarray([100.0, 200.0], np.float32)
    out = _run([_node("ScatterND", ["x", "i", "u"], ["y"])],
               [_tensor("i", idx), _tensor("u", upd)], {"x": data})
    ref = data.copy()
    ref[[0, 3], [1, 4]] = upd
    np.testing.assert_allclose(out, ref)


def _rnn_feeds(seq, b, inp, hs, ngate, bidi=False):
    D = 2 if bidi else 1
    w = RNG.normal(0, 0.3, (D, ngate * hs, inp)).astype(np.float32)
    r = RNG.normal(0, 0.3, (D, ngate * hs, hs)).astype(np.float32)
    bb = RNG.normal(0, 0.3, (D, 2 * ngate * hs)).astype(np.float32)
    x = RNG.normal(0, 1, (seq, b, inp)).astype(np.float32)
    return x, w, r, bb


def test_onnx_lstm_matches_torch():
    seq, b, inp, hs = 5, 3, 4, 6
    x, w, r, bb = _rnn_feeds(seq, b, inp, hs, 4)
    nodes = [_node("LSTM", ["x", "w", "r", "b"], ["y", "yh", "yc"],
                   hidden_size=hs)]
    inits = [_tensor("w", w), _tensor("r", r), _tensor("b", bb)]
    y, yh, yc = _run(nodes, inits, {"x": x}, out="y",
                     extra_outputs=("yh", "yc"))

    # torch uses gate order i f g o; ONNX uses i o f c
    perm = np.concatenate([np.arange(hs), 2 * hs + np.arange(hs),
                           3 * hs + np.arange(hs), hs + np.arange(hs)])
    m = torch.nn.LSTM(inp, hs, 1, batch_first=False)
    with torch.no_grad():
        m.weight_ih_l0.copy_(torch.from_numpy(w[0][perm]))
        m.weight_hh_l0.copy_(torch.from_numpy(r[0][perm]))
        m.bias_ih_l0.copy_(torch.from_numpy(bb[0, :4 * hs][perm]))
        m.bias_hh_l0.copy_(torch.from_numpy(bb[0, 4 * hs:][perm]))
        yt, (ht, ct) = m(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(y)[:, 0], yt.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(yh)[0], ht.numpy()[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(yc)[0], ct.numpy()[0], atol=1e-5)


def test_onnx_gru_matches_torch():
    seq, b, inp, hs = 4, 2, 5, 3
    x, w, r, bb = _rnn_feeds(seq, b, inp, hs, 3)
    nodes = [_node("GRU", ["x", "w", "r", "b"], ["y", "yh"],
                   hidden_size=hs, linear_before_reset=1)]
    inits = [_tensor("w", w), _tensor("r", r), _tensor("b", bb)]
    y, yh = _run(nodes, inits, {"x": x}, out="y", extra_outputs=("yh",))

    # torch gate order r z n; ONNX z r n.  torch == linear_before_reset=1
    perm = np.concatenate([hs + np.arange(hs), np.arange(hs),
                           2 * hs + np.arange(hs)])
    m = torch.nn.GRU(inp, hs, 1)
    with torch.no_grad():
        m.weight_ih_l0.copy_(torch.from_numpy(w[0][perm]))
        m.weight_hh_l0.copy_(torch.from_numpy(r[0][perm]))
        m.bias_ih_l0.copy_(torch.from_numpy(bb[0, :3 * hs][perm]))
        m.bias_hh_l0.copy_(torch.from_numpy(bb[0, 3 * hs:][perm]))
        yt, ht = m(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(y)[:, 0], yt.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(yh)[0], ht.numpy()[0], atol=1e-5)


def test_onnx_lstm_bidirectional_reverse_consistency():
    seq, b, inp, hs = 6, 2, 3, 4
    x, w, r, bb = _rnn_feeds(seq, b, inp, hs, 4, bidi=True)
    nodes = [_node("LSTM", ["x", "w", "r", "b"], ["y", "yh", "yc"],
                   hidden_size=hs, direction="bidirectional")]
    y, yh, yc = _run(nodes, [_tensor("w", w), _tensor("r", r),
                             _tensor("b", bb)], {"x": x},
                     out="y", extra_outputs=("yh", "yc"))
    assert np.asarray(y).shape == (seq, 2, b, hs)
    # the reverse lane equals a forward run on the reversed sequence
    nodes_f = [_node("LSTM", ["x", "w", "r", "b"], ["y", "yh", "yc"],
                     hidden_size=hs)]
    y2, _, _ = _run(nodes_f, [_tensor("w", w[1:]), _tensor("r", r[1:]),
                              _tensor("b", bb[1:])],
                    {"x": x[::-1].copy()}, out="y",
                    extra_outputs=("yh", "yc"))
    np.testing.assert_allclose(np.asarray(y)[:, 1],
                               np.asarray(y2)[::-1, 0], atol=1e-5)


@pytest.mark.parametrize("pad_mode,align", [("zeros", 0), ("border", 0),
                                            ("reflection", 0),
                                            ("zeros", 1)])
def test_onnx_grid_sample_matches_torch(pad_mode, align):
    x = RNG.normal(0, 1, (2, 3, 7, 9)).astype(np.float32)
    grid = RNG.uniform(-1.3, 1.3, (2, 5, 6, 2)).astype(np.float32)
    nodes = [_node("GridSample", ["x", "g"], ["y"], mode="linear",
                   padding_mode=pad_mode, align_corners=align)]
    y = _run(nodes, [], {"x": x, "g": grid})
    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid), mode="bilinear",
        padding_mode=pad_mode if pad_mode != "zeros" else "zeros",
        align_corners=bool(align)).numpy()
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)


def test_onnx_roi_align_reference():
    """RoiAlign vs a direct numpy evaluation of the ONNX spec."""
    x = RNG.normal(0, 1, (1, 2, 12, 14)).astype(np.float32)
    rois = np.array([[1.0, 1.0, 9.0, 8.0], [0.0, 0.0, 13.0, 11.0]],
                    np.float32)
    bi = np.zeros(2, np.int64)
    oh, ow, sr = 3, 4, 2
    nodes = [_node("RoiAlign", ["x", "r", "b"], ["y"], output_height=oh,
                   output_width=ow, sampling_ratio=sr, spatial_scale=1.0,
                   coordinate_transformation_mode="half_pixel")]
    y = np.asarray(_run(nodes, [], {"x": x, "r": rois,
                                    "b": bi.astype(np.float32)}))

    def bil(img, yy, xx):
        H, W = img.shape
        if xx < -1 or xx > W or yy < -1 or yy > H:
            return 0.0
        x0 = int(np.floor(xx)); y0 = int(np.floor(yy))
        fx = xx - x0; fy = yy - y0
        def px(r, c):
            return img[min(max(r, 0), H - 1), min(max(c, 0), W - 1)]
        return ((1-fx)*(1-fy)*px(y0, x0) + fx*(1-fy)*px(y0, x0+1)
                + (1-fx)*fy*px(y0+1, x0) + fx*fy*px(y0+1, x0+1))

    ref = np.zeros((2, 2, oh, ow), np.float32)
    for r in range(2):
        x1, y1, x2, y2 = rois[r] - 0.5
        bw, bh = x2 - x1, y2 - y1
        for c in range(2):
            for i in range(oh):
                for j in range(ow):
                    acc = 0.0
                    for a in range(sr):
                        for b in range(sr):
                            yy = y1 + (i + (a + 0.5)/sr) * bh/oh
                            xx = x1 + (j + (b + 0.5)/sr) * bw/ow
                            acc += bil(x[0, c], yy, xx)
                    ref[r, c, i, j] = acc / (sr*sr)
    np.testing.assert_allclose(y, ref, atol=1e-4)


def test_attention_opset23_vs_cv2():
    """ONNX opset-23 Attention (Q,K,V) — 4-D, causal, and 3-D headed
    forms vs the wheel."""
    from common import cv2
    rng = np.random.default_rng(0)
    B, nh, S, D = 1, 2, 5, 4
    for attrs, shp in [({}, (B, nh, S, D)),
                       ({"is_causal": 1}, (B, nh, S, D)),
                       ({"q_num_heads": nh, "kv_num_heads": nh},
                        (B, S, nh * D))]:
        m = _model([("q", shp), ("k", shp), ("v", shp)], [("y", shp)],
                   [_node("Attention", ["q", "k", "v"], ["y"], **attrs)],
                   [])
        p = _save(m, tempfile.mktemp(suffix=".onnx"))
        q, k, v = (rng.normal(0, 1, shp).astype(np.float32)
                   for _ in range(3))
        net = cv2.dnn.readNetFromONNX(p)
        net.setInput(q, "q")
        net.setInput(k, "k")
        net.setInput(v, "v")
        ref = net.forward()
        ours = dnn.readNetFromONNX(p)
        ours.setInput(q, "q")
        ours.setInput(k, "k")
        ours.setInput(v, "v")
        got = np.asarray(ours.forward())
        assert np.allclose(got, ref, atol=1e-5), attrs
