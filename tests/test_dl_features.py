"""ALIKED / DISK vs the wheel, via synthetic ONNX models.

No official weights are bundled (same as the reference), so both
implementations run the SAME tiny ONNX graph whose outputs follow the
model contracts (DISK: int64 keypoints (1,N,2) in net-input space +
scores + raw descriptors; ALIKED: float keypoints (N,2) in [-1,1]).
The wheel is the oracle for coordinate mapping, filtering and
descriptor handling."""

import os
import tempfile

import numpy as np

from common import cv2

import opencv_tpu as tcv
from test_dnn_trackers import _tensor, _node, _model, _save

N = 6
KP_ABS = np.array([[0, 0], [100, 40], [200, 80], [631, 479],
                   [300, 300], [50, 400]], np.float32)
SCORES = np.array([1.0, 0.9, 0.8, 0.7, 0.6, 0.5], np.float32)
DESC = np.random.default_rng(4).normal(0, 1, (N, 128)).astype(np.float32)
IMG = np.random.default_rng(0).integers(0, 255, (480, 640, 3), np.uint8)


def _disk_model():
    nodes = [
        _node("ReduceMean", ["image"], ["gm"], keepdims=0),
        _node("Mul", ["gm", "zero"], ["z"]),
        _node("Add", ["kp0", "z"], ["kpf"]),
        _node("Cast", ["kpf"], ["keypoints"], to=7),
        _node("Add", ["sc0", "z"], ["scores"]),
        _node("Add", ["de0", "z"], ["descriptors"]),
    ]
    inits = [_tensor("kp0", KP_ABS[None]), _tensor("sc0", SCORES[None]),
             _tensor("de0", DESC[None]),
             _tensor("zero", np.zeros((), np.float32))]
    m = _model([("image", (1, 3, 0, 0))],
               [("keypoints", (1, N, 2)), ("scores", (1, N)),
                ("descriptors", (1, N, 128))], nodes, inits)
    m.graph.output[0].type.tensor_type.elem_type = 7  # int64 kps
    return _save(m, os.path.join(tempfile.mkdtemp(), "disk.onnx"))


def _aliked_model():
    kpn = KP_ABS / np.array([640, 480], np.float32) * 2 - 1
    nodes = [
        _node("ReduceMean", ["image"], ["gm"], keepdims=0),
        _node("Mul", ["gm", "zero"], ["z"]),
        _node("Add", ["kp0", "z"], ["keypoints"]),
        _node("Add", ["sc0", "z"], ["scores"]),
        _node("Add", ["de0", "z"], ["descriptors"]),
    ]
    inits = [_tensor("kp0", kpn), _tensor("sc0", SCORES),
             _tensor("de0", DESC),
             _tensor("zero", np.zeros((), np.float32))]
    m = _model([("image", (1, 3, 0, 0))],
               [("keypoints", (N, 2)), ("scores", (N,)),
                ("descriptors", (N, 128))], nodes, inits)
    return _save(m, os.path.join(tempfile.mkdtemp(), "aliked.onnx"))


def _cmp(wkps, wdesc, okps, odesc, pt_tol=1e-3):
    assert len(wkps) == len(okps)
    for wk, ok in zip(wkps, okps):
        assert abs(wk.pt[0] - ok.pt[0]) <= pt_tol, (wk.pt, ok.pt)
        assert abs(wk.pt[1] - ok.pt[1]) <= pt_tol, (wk.pt, ok.pt)
        assert abs(wk.response - ok.response) <= 1e-5
    np.testing.assert_allclose(np.asarray(wdesc), odesc,
                               rtol=1e-4, atol=1e-5)


def test_disk_matches_wheel():
    p = _disk_model()
    w = cv2.DISK_create(p)
    o = tcv.DISK_create(p)
    wkps, wdesc = w.detectAndCompute(IMG, None)
    okps, odesc = o.detectAndCompute(IMG, None)
    _cmp(wkps, wdesc, okps, odesc)


def test_disk_threshold_and_maxkp():
    p = _disk_model()
    for args in [(3,), (100, 0.75)]:
        w = cv2.DISK_create(p, *args)
        o = tcv.DISK_create(p, *args)
        wkps, wdesc = w.detectAndCompute(IMG, None)
        okps, odesc = o.detectAndCompute(IMG, None)
        _cmp(wkps, wdesc, okps, odesc)


def test_disk_image_size_and_gray():
    p = _disk_model()
    w = cv2.DISK_create(p, 100, 0.0, (320, 240))
    o = tcv.DISK_create(p, 100, 0.0, (320, 240))
    _cmp(*w.detectAndCompute(IMG, None), *o.detectAndCompute(IMG, None))
    g = cv2.cvtColor(IMG, cv2.COLOR_BGR2GRAY)
    w2 = cv2.DISK_create(p)
    o2 = tcv.DISK_create(p)
    _cmp(*w2.detectAndCompute(g, None), *o2.detectAndCompute(g, None))


def test_disk_create_from_memory():
    p = _disk_model()
    buf = np.frombuffer(open(p, "rb").read(), np.uint8)
    o = tcv.DISK_createFromMemory(buf)
    okps, odesc = o.detectAndCompute(IMG, None)
    assert len(okps) == N and odesc.shape == (N, 128)


def test_aliked_matches_wheel():
    p = _aliked_model()
    w = cv2.ALIKED_create(p)
    o = tcv.ALIKED_create(p)
    wkps, wdesc = w.detectAndCompute(IMG, None)
    okps, odesc = o.detectAndCompute(IMG, None)
    _cmp(wkps, wdesc, okps, odesc, pt_tol=1e-2)
