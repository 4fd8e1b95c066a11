"""dnn: ONNX reader + jnp executor vs torch ground truth and the cv2
oracle (models are genuine ONNX protos that cv2.dnn also parses)."""

import os
import tempfile

import numpy as np
import torch
import torch.nn as nn

from common import cv2

import opencv_tpu as tcv
from opencv_tpu import dnn
from opencv_tpu.dnn import onnx_schema_pb2 as P


def _tensor(name, arr):
    t = P.TensorProto()
    t.name = name
    t.data_type = 1
    t.dims.extend(arr.shape)
    t.raw_data = np.ascontiguousarray(arr, np.float32).tobytes()
    return t


def _node(op, inputs, outputs, **attrs):
    n = P.NodeProto()
    n.op_type = op
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


def _vinfo(vi, name, shape):
    vi.name = name
    vi.type.tensor_type.elem_type = 1
    for d in shape:
        vi.type.tensor_type.shape.dim.add().dim_value = d


def _build_small_cnn(path, x):
    torch.manual_seed(0)
    c1 = nn.Conv2d(3, 8, 3, padding=1)
    bn = nn.BatchNorm2d(8)
    bn.eval()
    c2 = nn.Conv2d(8, 16, 3, stride=2, padding=1)
    fc = nn.Linear(16 * 8 * 8, 10)
    with torch.no_grad():
        bn.running_mean.normal_(0, 0.5)
        bn.running_var.uniform_(0.5, 2.0)
        h = torch.relu(bn(c1(x)))
        h = torch.max_pool2d(torch.relu(c2(h)), 2)
        ref = torch.softmax(fc(torch.flatten(h, 1)), dim=1).numpy()

    m = P.ModelProto()
    m.ir_version = 7
    m.opset_import.add().version = 13
    g = m.graph
    g.name = "smallcnn"
    _vinfo(g.input.add(), "input", x.shape)
    _vinfo(g.output.add(), "prob", (x.shape[0], 10))
    g.initializer.extend([
        _tensor("w1", c1.weight.detach().numpy()),
        _tensor("b1", c1.bias.detach().numpy()),
        _tensor("bng", bn.weight.detach().numpy()),
        _tensor("bnb", bn.bias.detach().numpy()),
        _tensor("bnm", bn.running_mean.numpy()),
        _tensor("bnv", bn.running_var.numpy()),
        _tensor("w2", c2.weight.detach().numpy()),
        _tensor("b2", c2.bias.detach().numpy()),
        _tensor("wf", fc.weight.detach().numpy()),
        _tensor("bf", fc.bias.detach().numpy()),
    ])
    g.node.extend([
        _node("Conv", ["input", "w1", "b1"], ["t1"], kernel_shape=[3, 3],
              pads=[1, 1, 1, 1], strides=[1, 1]),
        _node("BatchNormalization", ["t1", "bng", "bnb", "bnm", "bnv"],
              ["t2"], epsilon=1e-5),
        _node("Relu", ["t2"], ["t3"]),
        _node("Conv", ["t3", "w2", "b2"], ["t4"], kernel_shape=[3, 3],
              pads=[1, 1, 1, 1], strides=[2, 2]),
        _node("Relu", ["t4"], ["t5"]),
        _node("MaxPool", ["t5"], ["t6"], kernel_shape=[2, 2],
              strides=[2, 2]),
        _node("Flatten", ["t6"], ["t7"], axis=1),
        _node("Gemm", ["t7", "wf", "bf"], ["t8"], transB=1),
        _node("Softmax", ["t8"], ["prob"], axis=1),
    ])
    open(path, "wb").write(m.SerializeToString())
    return ref


def test_dnn_onnx_cnn_matches_torch_and_cv2():
    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "m.onnx")
    x = torch.randn(2, 3, 32, 32)
    ref = _build_small_cnn(path, x)

    net = dnn.readNetFromONNX(path)
    net.setInput(x.numpy())
    ours = net.forward()
    assert np.abs(ours - ref).max() < 1e-5

    cnet = cv2.dnn.readNetFromONNX(path)
    cnet.setInput(x.numpy())
    cv_out = cnet.forward()
    assert np.abs(ours - cv_out).max() < 1e-5


def test_dnn_blob_from_image():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 64, 3), np.uint8)
    ref = cv2.dnn.blobFromImage(img, 1 / 255.0, (32, 32),
                                (104, 117, 123), swapRB=True, crop=False)
    ours = dnn.blobFromImage(img, 1 / 255.0, (32, 32),
                             (104, 117, 123), swapRB=True, crop=False)
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).max() < 1e-2  # resize path f32 vs exact


def test_read_net_from_caffe():
    """Caffe importer (dnn/src/caffe/caffe_importer.cpp role):
    prototxt+caffemodel forward must match a manual torch computation
    (cv2 5.0 dropped readNetFromCaffe)."""
    import torch
    import torch.nn.functional as F
    from opencv_tpu.dnn import opencv_caffe_pb2 as cpb
    proto = """
name: "tiny"
input: "data"
input_dim: 1
input_dim: 3
input_dim: 8
input_dim: 8
layer { name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 4 kernel_size: 3 pad: 1 stride: 1 } }
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer { name: "pool1" type: "Pooling" bottom: "conv1" top: "pool1"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
layer { name: "fc1" type: "InnerProduct" bottom: "pool1" top: "fc1"
  inner_product_param { num_output: 5 } }
layer { name: "prob" type: "Softmax" bottom: "fc1" top: "prob" }
"""
    rng = np.random.RandomState(0)
    wnet = cpb.NetParameter()

    def add_blob(layer, arr):
        blob = layer.blobs.add()
        blob.shape.dim.extend(arr.shape)
        blob.data.extend(arr.astype(np.float32).ravel().tolist())

    lyr = wnet.layer.add()
    lyr.name = "conv1"
    Wc = rng.randn(4, 3, 3, 3).astype(np.float32) * 0.2
    bc = rng.randn(4).astype(np.float32) * 0.1
    add_blob(lyr, Wc)
    add_blob(lyr, bc)
    lyr = wnet.layer.add()
    lyr.name = "fc1"
    Wf = rng.randn(5, 4 * 4 * 4).astype(np.float32) * 0.1
    bf = rng.randn(5).astype(np.float32) * 0.1
    add_blob(lyr, Wf)
    add_blob(lyr, bf)

    net = tcv.dnn.readNetFromCaffe(proto, wnet.SerializeToString())
    x = rng.randn(1, 3, 8, 8).astype(np.float32)
    net.setInput(x, "data")
    out = np.asarray(net.forward())

    tx = torch.tensor(x)
    y = F.relu(F.conv2d(tx, torch.tensor(Wc), torch.tensor(bc), padding=1))
    y = F.max_pool2d(y, 2, 2, ceil_mode=True)
    y = y.reshape(1, -1) @ torch.tensor(Wf).T + torch.tensor(bf)
    y = F.softmax(y, dim=1)
    assert np.abs(out - y.numpy()).max() < 1e-5


def test_read_net_from_tensorflow(tmp_path):
    """TF importer (dnn/src/tensorflow/tf_importer.cpp role): frozen
    GraphDef with SAME conv, FusedBatchNorm, and pooling must match
    cv2.dnn.readNetFromTensorflow."""
    from opencv_tpu.dnn import graph_pb2 as g2
    rng = np.random.RandomState(0)
    gd = g2.GraphDef()

    def add(op, name, inputs=(), **attrs):
        n = gd.node.add()
        n.op = op
        n.name = name
        n.input.extend(inputs)
        for k, v in attrs.items():
            a = n.attr[k]
            if isinstance(v, bytes):
                a.s = v
            elif isinstance(v, float):
                a.f = v
            elif isinstance(v, list):
                a.list.i.extend(v)
            elif isinstance(v, np.ndarray):
                a.tensor.dtype = 1
                for d in v.shape:
                    a.tensor.tensor_shape.dim.add().size = d
                a.tensor.tensor_content = v.tobytes()
        return n

    W = rng.randn(3, 3, 3, 4).astype(np.float32) * 0.2
    bias = rng.randn(4).astype(np.float32) * 0.1
    gamma = rng.rand(4).astype(np.float32) + 0.5
    beta = rng.randn(4).astype(np.float32) * 0.1
    mean = rng.randn(4).astype(np.float32) * 0.1
    var = rng.rand(4).astype(np.float32) + 0.5
    n = add("Placeholder", "input")
    n.attr["dtype"].type = 1
    add("Const", "W", **{"value": W})
    add("Conv2D", "conv", ["input", "W"], strides=[1, 2, 2, 1],
        padding=b"SAME")
    add("Const", "b", **{"value": bias})
    add("BiasAdd", "bias", ["conv", "b"])
    add("Const", "g", **{"value": gamma})
    add("Const", "be", **{"value": beta})
    add("Const", "m", **{"value": mean})
    add("Const", "v", **{"value": var})
    n = add("FusedBatchNorm", "bn", ["bias", "g", "be", "m", "v"])
    n.attr["epsilon"].f = 1e-3
    add("Relu", "relu", ["bn"])
    add("MaxPool", "pool", ["relu"], ksize=[1, 2, 2, 1],
        strides=[1, 2, 2, 1], padding=b"SAME")
    path = str(tmp_path / "tiny_tf.pb")
    with open(path, "wb") as f:
        f.write(gd.SerializeToString())

    ref_net = cv2.dnn.readNetFromTensorflow(path)
    x = rng.randn(1, 3, 10, 10).astype(np.float32)
    ref_net.setInput(x)
    ref = ref_net.forward()
    our = tcv.dnn.readNetFromTensorflow(path)
    our.setInput(x, "input")
    ours = np.asarray(our.forward())
    assert np.abs(ref - ours.reshape(ref.shape)).max() < 1e-5


def test_tflite_importer_vs_cv2():
    """Round-trip a hand-built .tflite through BOTH readers: our
    flatbuffer writer (tests/tflite_builder.py) -> cv2.dnn and
    opencv_tpu.dnn must produce the same forward outputs."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from tflite_builder import build_tflite_convnet
    import tempfile

    data, ishape, _ = build_tflite_convnet(seed=7)
    with tempfile.NamedTemporaryFile(suffix=".tflite", delete=False) as f:
        f.write(data)
        path = f.name

    rng = np.random.default_rng(2)
    inp = rng.normal(0, 1, (1, 3, 8, 8)).astype(np.float32)

    ref_net = cv2.dnn.readNetFromTFLite(path)
    ref_net.setInput(inp)
    ref = ref_net.forward()

    net = tcv.dnn.readNetFromTFLite(path)
    net.setInput(inp)
    out = np.asarray(net.forward())
    assert np.abs(out - ref).max() < 1e-5, np.abs(out - ref).max()


def test_nms_boxes_vs_cv2():
    rng = np.random.default_rng(0)
    n = 150
    boxes = np.stack([rng.uniform(0, 300, n), rng.uniform(0, 300, n),
                      rng.uniform(5, 80, n), rng.uniform(5, 80, n)],
                     1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    ref = np.asarray(cv2.dnn.NMSBoxes(boxes, scores, 0.3, 0.4)).ravel()
    ours = tcv.dnn.NMSBoxes(boxes, scores, 0.3, 0.4)
    assert np.array_equal(ref, ours)
    cids = rng.integers(0, 5, n).astype(np.int32)
    refb = np.asarray(cv2.dnn.NMSBoxesBatched(
        boxes, scores, cids, 0.3, 0.4)).ravel()
    oursb = tcv.dnn.NMSBoxesBatched(boxes, scores, cids, 0.3, 0.4)
    assert np.array_equal(refb, oursb)


def test_classification_model():
    """High-level ClassificationModel vs cv2 on the same tflite net."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from tflite_builder import build_tflite_convnet
    import tempfile

    data, _, _ = build_tflite_convnet(seed=11)
    with tempfile.NamedTemporaryFile(suffix=".tflite", delete=False) as f:
        f.write(data)
        path = f.name

    rng = np.random.default_rng(3)
    frame = rng.integers(0, 256, (8, 8, 3), np.uint8)

    ref_m = cv2.dnn.ClassificationModel(path)
    ref_m.setInputParams(scale=1 / 255.0, size=(8, 8))
    rid, rconf = ref_m.classify(frame)

    m = tcv.dnn.ClassificationModel(path)
    m.setInputParams(scale=1 / 255.0, size=(8, 8))
    oid, oconf = m.classify(frame)
    assert oid == rid
    assert abs(oconf - rconf) < 1e-5


def _tiny_yolo_cfg_weights(tmp, classes=3):
    """A miniature yolov3-style net: 2 convs (one bn+leaky), maxpool,
    shortcut-free route, upsample, and two [yolo] heads."""
    cfg = """
[net]
width=32
height=32
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
filters=%(c1)d
size=1
stride=1
pad=1
activation=linear

[yolo]
mask=0,1
anchors=10,14, 23,27, 37,58
classes=%(cls)d
scale_x_y=1.05

[route]
layers=-3

[upsample]
stride=2

[convolutional]
filters=%(c1)d
size=1
stride=1
pad=1
activation=linear

[yolo]
mask=2
anchors=10,14, 23,27, 37,58
classes=%(cls)d
""" % {"c1": 2 * (5 + classes), "cls": classes}
    # second head needs 1 anchor * (5+classes) channels; patch filters
    lines = cfg.strip().splitlines()
    # fix the LAST convolutional filters= to 1*(5+classes)
    for i in range(len(lines) - 1, -1, -1):
        if lines[i].startswith("filters="):
            lines[i] = "filters=%d" % (5 + classes)
            break
    cfg = "\n".join(lines) + "\n"
    cfgp = os.path.join(tmp, "tiny.cfg")
    open(cfgp, "w").write(cfg)

    rng = np.random.default_rng(0)
    blobs = [np.asarray([0, 2, 0], np.int32).tobytes(),
             np.asarray([0], np.int64).tobytes()]

    def wf(*shape):
        return (rng.normal(0, 0.3, shape).astype(np.float32))

    # conv1: bias, bn(scale, mean, var), weights
    blobs += [wf(8).tobytes(), (wf(8) * 0.1 + 1).tobytes(), wf(8).tobytes(),
              (np.abs(wf(8)) + 0.5).astype(np.float32).tobytes(),
              wf(8, 3, 3, 3).tobytes()]
    c1 = 2 * (5 + classes)
    blobs += [wf(c1).tobytes(), wf(c1, 8, 1, 1).tobytes()]
    c2 = 5 + classes
    blobs += [wf(c2).tobytes(), wf(c2, 8, 1, 1).tobytes()]
    wp = os.path.join(tmp, "tiny.weights")
    open(wp, "wb").write(b"".join(blobs))
    return cfgp, wp


def test_read_net_from_darknet_vs_cv2():
    """The bundled cv2 wheel has no darknet reader; oracle = torch for
    the conv stack + an independent scalar-loop region decode."""
    import torch
    import torch.nn.functional as F

    tmp = tempfile.mkdtemp()
    cfgp, wp = _tiny_yolo_cfg_weights(tmp)
    rng = np.random.default_rng(1)
    blob = rng.random((1, 3, 32, 32)).astype(np.float32)

    ours = dnn.readNetFromDarknet(cfgp, wp)
    ours.setInput(blob)
    our_outs = ours.forward(ours.getUnconnectedOutLayersNames())
    assert len(our_outs) == 2

    # ---- torch re-execution of the conv part, reading the same weights
    raw = open(wp, "rb").read()[20:]
    f = np.frombuffer(raw, np.float32)
    o = 0

    def take(n):
        nonlocal o
        v = f[o:o + n]
        o += n
        return torch.tensor(np.array(v))

    b1 = take(8); g1 = take(8); m1 = take(8); v1 = take(8)
    w1 = take(8 * 3 * 3 * 3).reshape(8, 3, 3, 3)
    x = torch.tensor(blob)
    h = F.conv2d(x, w1, None, 1, 1)
    h = (h - m1.view(1, -1, 1, 1)) / torch.sqrt(v1.view(1, -1, 1, 1) + 1e-6)
    h = h * g1.view(1, -1, 1, 1) + b1.view(1, -1, 1, 1)
    h = F.leaky_relu(h, 0.1)
    h = F.max_pool2d(F.pad(h, (0, 1, 0, 1), value=-torch.inf), 2, 2)
    route = h  # [route] layers=-3 resolves to the maxpool output
    c1 = 2 * (5 + 3)
    bb2 = take(c1); w2 = take(c1 * 8).reshape(c1, 8, 1, 1)
    head1 = F.conv2d(h, w2, bb2)
    up = F.interpolate(route, scale_factor=2, mode="nearest")
    c2 = 5 + 3
    bb3 = take(c2); w3 = take(c2 * 8).reshape(c2, 8, 1, 1)
    head2 = F.conv2d(up, w3, bb3)

    def region_scalar(head, anchors, sxy, wN, hN, classes=3, thresh=0.2):
        A = len(anchors) // 2
        cell = 5 + classes
        t = head[0].numpy().transpose(1, 2, 0)  # HWC
        H, W = t.shape[:2]
        t = t.reshape(H, W, A, cell)
        out = np.zeros_like(t)
        sig = lambda v: 1.0 / (1.0 + np.exp(-v))
        for y in range(H):
            for xx in range(W):
                for a in range(A):
                    v = t[y, xx, a]
                    ov = out[y, xx, a]
                    ov[0] = (xx + (sig(v[0]) - 0.5) * sxy + 0.5) / W
                    ov[1] = (y + (sig(v[1]) - 0.5) * sxy + 0.5) / H
                    ov[2] = np.exp(v[2]) * anchors[2 * a] / wN
                    ov[3] = np.exp(v[3]) * anchors[2 * a + 1] / hN
                    ov[4] = sig(v[4])
                    for c in range(classes):
                        pr = ov[4] * sig(v[5 + c])
                        ov[5 + c] = pr if pr > thresh else 0.0
        return out.reshape(H * W * A, cell)

    ref1 = region_scalar(head1, [10, 14, 23, 27], 1.05, 32, 32)
    ref2 = region_scalar(head2, [37, 58], 1.0, 32, 32)
    np.testing.assert_allclose(our_outs[0], ref1, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(our_outs[1], ref2, rtol=2e-4, atol=2e-5)


def test_read_net_dispatch(tmp_path):
    tmp = tempfile.mkdtemp()
    cfgp, wp = _tiny_yolo_cfg_weights(tmp)
    net = dnn.readNet(wp, cfgp)
    rng = np.random.default_rng(1)
    net.setInput(rng.random((1, 3, 32, 32)).astype(np.float32))
    outs = net.forward(net.getUnconnectedOutLayersNames())
    assert len(outs) == 2
