"""DNN trackers (Nano / DaSiamRPN / ViT / GOTURN) vs the cv2 oracle,
using synthetic ONNX/Caffe models both libraries can load."""

import os
import tempfile

import numpy as np
import pytest

from common import cv2

import opencv_tpu as tcv
from opencv_tpu.dnn import onnx_schema_pb2 as P


def _tensor(name, arr):
    t = P.TensorProto()
    t.name = name
    arr = np.asarray(arr)
    t.data_type = 7 if arr.dtype == np.int64 else 1
    t.dims.extend(arr.shape)
    t.raw_data = np.ascontiguousarray(arr).tobytes()
    return t


def _node(op, inputs, outputs, name="", **attrs):
    n = P.NodeProto()
    n.op_type = op
    n.name = name
    n.input.extend(inputs)
    n.output.extend(outputs)
    for k, v in attrs.items():
        a = n.attribute.add()
        a.name = k
        if isinstance(v, int):
            a.type = P.AttributeProto.INT
            a.i = v
        elif isinstance(v, float):
            a.type = P.AttributeProto.FLOAT
            a.f = v
        elif isinstance(v, (list, tuple)):
            a.type = P.AttributeProto.INTS
            a.ints.extend(v)
        elif isinstance(v, str):
            a.type = P.AttributeProto.STRING
            a.s = v.encode()
    return n


def _model(inputs, outputs, nodes, inits):
    m = P.ModelProto()
    m.ir_version = 7
    m.opset_import.add().version = 13
    g = m.graph
    g.name = "t"
    for name, shape in inputs:
        vi = g.input.add()
        vi.name = name
        vi.type.tensor_type.elem_type = 1
        for d in shape:
            dim = vi.type.tensor_type.shape.dim.add()
            if d:
                dim.dim_value = d
            else:
                dim.dim_param = "d"
    for out in outputs:
        name, shape = out if isinstance(out, tuple) else (out, None)
        vi = g.output.add()
        vi.name = name
        vi.type.tensor_type.elem_type = 1
        if shape is not None:
            for d in shape:
                dim = vi.type.tensor_type.shape.dim.add()
                if d:
                    dim.dim_value = d
                else:
                    dim.dim_param = "d"
    g.node.extend(nodes)
    g.initializer.extend(inits)
    return m


def _save(m, path):
    open(path, "wb").write(m.SerializeToString())
    return path


def _frames(n=4, H=240, W=320, seed=0):
    rng = np.random.default_rng(seed)
    bg = rng.integers(0, 255, (H, W, 3), np.uint8)
    frames = []
    for i in range(n):
        f = bg.copy()
        x = 100 + 6 * i
        y = 80 + 3 * i
        f[y:y + 40, x:x + 50] = (40 + 20 * (i % 2), 220, 90)
        frames.append(f)
    return frames


def _boxes_close(a, b, tol=2):
    return all(abs(int(x) - int(y)) <= tol for x, y in zip(a, b))


def _nano_models(tmp):
    rng = np.random.default_rng(5)
    wb = rng.normal(0, 0.1, (4, 3, 3, 3)).astype(np.float32)
    bb = rng.normal(0, 0.1, 4).astype(np.float32)
    backbone = _model(
        [("input", (1, 3, 0, 0))], [("feat", (1, 4, 0, 0))],
        [_node("Conv", ["input", "wb", "bb"], ["feat"],
               kernel_shape=[3, 3], strides=[16, 16],
               pads=[1, 1, 1, 1])],
        [_tensor("wb", wb), _tensor("bb", bb)])

    wc = rng.normal(0, 0.4, (2, 4, 1, 1)).astype(np.float32)
    bc = rng.normal(0, 0.2, 2).astype(np.float32)
    wr = rng.normal(0, 0.4, (4, 4, 1, 1)).astype(np.float32)
    br = rng.normal(0, 0.2, 4).astype(np.float32)
    neckhead = _model(
        [("input1", (1, 4, 8, 8)), ("input2", (1, 4, 16, 16))],
        [("output1", (1, 2, 16, 16)), ("output2", (1, 4, 16, 16))],
        [_node("GlobalAveragePool", ["input1"], ["ga"]),
         _node("Add", ["input2", "ga"], ["t"]),
         _node("Conv", ["t", "wc", "bc"], ["output1"],
               kernel_shape=[1, 1]),
         _node("Conv", ["t", "wr", "br"], ["bx"], kernel_shape=[1, 1]),
         _node("Sigmoid", ["bx"], ["bxs"]),
         _node("Mul", ["bxs", "sc30"], ["output2"])],
        [_tensor("wc", wc), _tensor("bc", bc), _tensor("wr", wr),
         _tensor("br", br),
         _tensor("sc30", np.float32(30.0).reshape(()))])
    return (_save(backbone, os.path.join(tmp, "nb.onnx")),
            _save(neckhead, os.path.join(tmp, "nh.onnx")))


def test_tracker_nano_vs_cv2():
    tmp = tempfile.mkdtemp()
    bb, nh = _nano_models(tmp)

    rp = cv2.TrackerNano_Params()
    rp.backbone = bb
    rp.neckhead = nh
    ref = cv2.TrackerNano_create(rp)

    op = tcv.TrackerNano.Params()
    op.backbone = bb
    op.neckhead = nh
    ours = tcv.TrackerNano_create(op)

    frames = _frames()
    init = (100, 80, 50, 40)
    ref.init(frames[0], init)
    ours.init(frames[0], init)
    for f in frames[1:]:
        rok, rbox = ref.update(f)
        ook, obox = ours.update(f)
        assert rok == ook
        assert _boxes_close(rbox, obox), (rbox, obox)
    assert abs(ref.getTrackingScore() - ours.getTrackingScore()) < 1e-3


def _dasiam_models(tmp):
    rng = np.random.default_rng(7)
    w1 = rng.normal(0, 0.2, (8, 3, 7, 7)).astype(np.float32)
    b1 = rng.normal(0, 0.1, 8).astype(np.float32)
    w2 = rng.normal(0, 0.05, (256, 8, 13, 13)).astype(np.float32)
    b2 = rng.normal(0, 0.05, 256).astype(np.float32)
    w65 = rng.normal(0, 0.02, (20, 256, 4, 4)).astype(np.float32)
    b65 = rng.normal(0, 0.02, 20).astype(np.float32)
    w68 = rng.normal(0, 0.02, (10, 256, 4, 4)).astype(np.float32)
    b68 = rng.normal(0, 0.02, 10).astype(np.float32)
    model = _model(
        [("input", (1, 3, 0, 0))], [("65", (1, 20, 0, 0)), ("68", (1, 10, 0, 0))],
        [_node("Conv", ["input", "w1", "b1"], ["c1"],
               kernel_shape=[7, 7], strides=[8, 8]),
         _node("Relu", ["c1"], ["62"]),
         _node("Conv", ["62", "w2", "b2"], ["63"],
               kernel_shape=[13, 13]),
         _node("Conv", ["63", "w65", "b65"], ["65"],
               kernel_shape=[4, 4]),
         _node("Conv", ["63", "w68", "b68"], ["68"],
               kernel_shape=[4, 4])],
        [_tensor(n, a) for n, a in
         [("w1", w1), ("b1", b1), ("w2", w2), ("b2", b2),
          ("w65", w65), ("b65", b65), ("w68", w68), ("b68", b68)]])

    kr1 = _model([("input", (1, 256, 4, 4))], [("out", (20, 256, 4, 4))],
                 [_node("Tile", ["input", "r20"], ["out"])],
                 [_tensor("r20", np.asarray([20, 1, 1, 1], np.int64))])
    kcls1 = _model([("input", (1, 256, 4, 4))], [("out", (10, 256, 4, 4))],
                   [_node("Tile", ["input", "r10"], ["out"])],
                   [_tensor("r10", np.asarray([10, 1, 1, 1], np.int64))])
    return (_save(model, os.path.join(tmp, "rpn.onnx")),
            _save(kcls1, os.path.join(tmp, "kc.onnx")),
            _save(kr1, os.path.join(tmp, "kr.onnx")))


def test_tracker_dasiamrpn_vs_cv2():
    tmp = tempfile.mkdtemp()
    mp, kc, kr = _dasiam_models(tmp)

    try:
        rp = cv2.TrackerDaSiamRPN_Params()
        rp.model = mp
        rp.kernel_cls1 = kc
        rp.kernel_r1 = kr
        ref = cv2.TrackerDaSiamRPN_create(rp)
        frames = _frames()
        ref.init(frames[0], (100, 80, 50, 40))
        ref_boxes = [ref.update(f) for f in frames[1:]]
    except cv2.error:
        pytest.skip("cv2 cannot run the synthetic DaSiamRPN model")

    op = tcv.TrackerDaSiamRPN.Params()
    op.model = mp
    op.kernel_cls1 = kc
    op.kernel_r1 = kr
    ours = tcv.TrackerDaSiamRPN_create(op)
    frames = _frames()
    ours.init(frames[0], (100, 80, 50, 40))
    for (rok, rbox), f in zip(ref_boxes, frames[1:]):
        ook, obox = ours.update(f)
        assert rok == ook
        assert _boxes_close(rbox, obox, tol=3), (rbox, obox)


def _vit_model(tmp):
    rng = np.random.default_rng(9)
    ws = rng.normal(0, 0.05, (4, 3, 16, 16)).astype(np.float32)
    bs = rng.normal(0, 0.05, 4).astype(np.float32)
    wt = rng.normal(0, 0.05, (4, 3, 16, 16)).astype(np.float32)
    bt = rng.normal(0, 0.05, 4).astype(np.float32)
    wconf = rng.normal(0, 0.5, (1, 4, 1, 1)).astype(np.float32)
    bconf = np.asarray([0.3], np.float32)
    wsz = rng.normal(0, 0.3, (2, 4, 1, 1)).astype(np.float32)
    bsz = np.asarray([-1.0, -1.0], np.float32)
    woff = rng.normal(0, 0.3, (2, 4, 1, 1)).astype(np.float32)
    boff = np.asarray([0.0, 0.0], np.float32)
    m = _model(
        [("template", (1, 3, 128, 128)), ("search", (1, 3, 256, 256))],
        [("output1", (1, 1, 16, 16)), ("output2", (1, 2, 16, 16)),
         ("output3", (1, 2, 16, 16))],
        [_node("Conv", ["search", "ws", "bs"], ["fs"],
               kernel_shape=[16, 16], strides=[16, 16]),
         _node("Conv", ["template", "wt", "bt"], ["ft"],
               kernel_shape=[16, 16], strides=[16, 16]),
         _node("GlobalAveragePool", ["ft"], ["ga"]),
         _node("Add", ["fs", "ga"], ["t"]),
         _node("Conv", ["t", "wconf", "bconf"], ["cf"],
               kernel_shape=[1, 1]),
         _node("Sigmoid", ["cf"], ["output1"]),
         _node("Conv", ["t", "wsz", "bsz"], ["sz"],
               kernel_shape=[1, 1]),
         _node("Sigmoid", ["sz"], ["output2"]),
         _node("Conv", ["t", "woff", "boff"], ["of"],
               kernel_shape=[1, 1]),
         _node("Sigmoid", ["of"], ["output3"])],
        [_tensor(n, a) for n, a in
         [("ws", ws), ("bs", bs), ("wt", wt), ("bt", bt),
          ("wconf", wconf), ("bconf", bconf), ("wsz", wsz),
          ("bsz", bsz), ("woff", woff), ("boff", boff)]])
    return _save(m, os.path.join(tmp, "vit.onnx"))


def test_tracker_vit_reference_semantics():
    """The installed cv2 wheel (5.0) changed VitTrack internals; the
    oracle here is an independent scalar replication of the 4.12
    reference algorithm (tracker_vit.cpp:175-216) driven by cv2.dnn on
    the same model."""
    tmp = tempfile.mkdtemp()
    mp = _vit_model(tmp)

    op = tcv.TrackerVit.Params()
    op.net = mp
    ours = tcv.TrackerVit_create(op)

    frames = _frames()
    init = (100, 80, 50, 40)
    ours.init(frames[0], init)

    # --- scalar reference replication using cv2.dnn for the forwards
    net = cv2.dnn.readNet(mp)
    mean = np.array([0.485, 0.456, 0.406], np.float32) * 255.0
    scale = 1.0 / (np.array([0.229, 0.224, 0.225], np.float32) * 255.0)

    def crop_image(src, box, factor):
        x, y, w, h = box
        crop_sz = int(np.ceil(np.sqrt(w * h) * factor))
        x1 = x + int((w - crop_sz) / 2)
        x2 = x1 + crop_sz
        y1 = y + int((h - crop_sz) / 2)
        y2 = y1 + crop_sz
        x1p = max(0, -x1)
        y1p = max(0, -y1)
        x2p = max(x2 - src.shape[1] + 1, 0)
        y2p = max(y2 - src.shape[0] + 1, 0)
        roi = src[y1 + y1p:y2 - y2p, x1 + x1p:x2 - x2p]
        out = cv2.copyMakeBorder(roi, y1p, y2p, x1p, x2p,
                                 cv2.BORDER_CONSTANT)
        return out, crop_sz

    def blob(crop, size):
        img = cv2.resize(crop, (size, size))
        a = img.astype(np.float32)
        a = (a - mean.reshape(1, 1, 3)) * scale.reshape(1, 1, 3)
        return np.transpose(a, (2, 0, 1))[None]

    def hann1d(n):
        i = np.arange(n, dtype=np.float32)
        return 0.5 * (1.0 - np.cos(2 * np.pi / (n + 1) * (i + 1)))

    hw = np.outer(hann1d(16), hann1d(16)).astype(np.float32)

    rect = list(init)
    crop, _ = crop_image(frames[0], rect, 2)
    net.setInput(blob(crop, 128), "template")
    ref_boxes = []
    for f in frames[1:]:
        crop, crop_sz = crop_image(f, rect, 4)
        net.setInput(blob(crop, 256), "search")
        conf, szm, offm = net.forward(["output1", "output2", "output3"])
        conf = conf.reshape(16, 16) * hw
        my, mx = np.unravel_index(np.argmax(conf), conf.shape)
        cx = (mx + offm.reshape(2, 16, 16)[0, my, mx]) / 16.0
        cy = (my + offm.reshape(2, 16, 16)[1, my, mx]) / 16.0
        w = szm.reshape(2, 16, 16)[0, my, mx]
        h = szm.reshape(2, 16, 16)[1, my, mx]
        x0 = rect[0] + int((rect[2] - crop_sz) / 2)
        y0 = rect[1] + int((rect[3] - crop_sz) / 2)
        rect = [int(np.floor((cx - w / 2) * crop_sz + x0)),
                int(np.floor((cy - h / 2) * crop_sz + y0)),
                int(np.floor(w * crop_sz)), int(np.floor(h * crop_sz))]
        ref_boxes.append((float(conf[my, mx]), tuple(rect)))

    for (rscore, rbox), f in zip(ref_boxes, frames[1:]):
        ook, obox = ours.update(f)
        assert ook
        assert _boxes_close(rbox, obox, tol=1), (rbox, obox)
        assert abs(ours.getTrackingScore() - rscore) < 1e-3


def _goturn_model(tmp):
    """Caffe GOTURN stub whose 'scale' output is the constant centered
    box => predicted box reproduces the previous box."""
    proto = """
name: "goturn"
input: "data1"
input_shape { dim: 1 dim: 3 dim: 227 dim: 227 }
input: "data2"
input_shape { dim: 1 dim: 3 dim: 227 dim: 227 }
layer {
  name: "concat" type: "Concat" bottom: "data1" bottom: "data2"
  top: "cc" concat_param { axis: 1 }
}
layer {
  name: "scale" type: "InnerProduct" bottom: "cc" top: "scale"
  inner_product_param { num_output: 4 }
}
"""
    ptxt = os.path.join(tmp, "goturn.prototxt")
    open(ptxt, "w").write(proto)

    from opencv_tpu.dnn import opencv_caffe_pb2 as C
    net = C.NetParameter()
    net.name = "goturn"
    lay = net.layer.add()
    lay.name = "scale"
    lay.type = "InnerProduct"
    w = lay.blobs.add()
    w.shape.dim.extend([4, 6 * 227 * 227])
    w.data.extend(np.zeros(4 * 6 * 227 * 227, np.float32))
    b = lay.blobs.add()
    b.shape.dim.extend([4])
    b.data.extend([56.75, 56.75, 170.25, 170.25])
    pbin = os.path.join(tmp, "goturn.caffemodel")
    open(pbin, "wb").write(net.SerializeToString())
    return ptxt, pbin


def test_tracker_goturn_static_box():
    tmp = tempfile.mkdtemp()
    ptxt, pbin = _goturn_model(tmp)
    p = tcv.TrackerGOTURN.Params()
    p.modelTxt = ptxt
    p.modelBin = pbin
    tr = tcv.TrackerGOTURN_create(p)
    frames = _frames()
    init = (100, 80, 50, 40)
    tr.init(frames[0], init)
    ok, box = tr.update(frames[1])
    assert ok
    # constant centered prediction keeps the box in place (+-1 rounding)
    assert _boxes_close(box, init, tol=1), box
