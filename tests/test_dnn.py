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
