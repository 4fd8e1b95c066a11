"""DL feature detectors (ALIKED / DISK): Feature2D-shaped classes that
run the user-supplied ONNX export through our dnn importer.  No weights
are bundled (same as the reference wheel).

The I/O contracts mirror the 5.x wheel (modules/features/src/disk.cpp,
aliked.cpp — not present in the 4.x reference tree; behavior verified
black-box against the installed wheel with synthetic ONNX graphs, see
tests/test_dl_features.py):

DISK model:   image (1,3,H,W) float →
              keypoints  int64 (1,N,2) absolute pixel coords in
                         net-input space,
              scores     float (1,N),
              descriptors float (1,N,128)   (raw, no re-normalization)
              The image is resized to `imageSize` (default 1024×1024);
              returned pts are scaled by (origW/netW, origH/netH).

ALIKED model: image (1,3,H,W) float →
              keypoints  float (N,2) in [-1,1] normalized coords,
              scores     float (N,),
              descriptors float (N,128)
              Denormalization: pt = (kp + 1)/2 * (W, H).
"""

from __future__ import annotations

import numpy as np

__all__ = ["ALIKED", "ALIKED_Params", "DISK"]


class ALIKED_Params:
    def __init__(self):
        self.inputSize = 640
        self.normalizeDescriptors = True
        self.backend = 0
        self.target = 0
        self.engine = 0


def _to_3ch(image):
    a = np.asarray(image)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    return a


class _DnnFeature2D:
    _desc_size = 128

    def __init__(self, model=None, params=None, from_memory=False):
        self._params = params
        self._net = None
        if model is not None and (from_memory or model):
            from ..dnn import readNetFromONNX
            self._net = readNetFromONNX(model)

    @classmethod
    def create(cls, modelPath="", params=None):
        return cls(modelPath or None, params)

    def detect(self, image, mask=None):
        kps, _ = self.detectAndCompute(image, mask)
        return kps

    def compute(self, image, keypoints):
        _, desc = self.detectAndCompute(image, None)
        return keypoints, desc

    def descriptorSize(self):
        return self._desc_size

    def descriptorType(self):
        return 5   # CV_32F

    def defaultNorm(self):
        return 4   # NORM_L2

    def empty(self):
        return self._net is None

    def clear(self):
        self._net = None

    def _require_net(self):
        if self._net is None:
            raise RuntimeError(
                f"{type(self).__name__} requires the ONNX model "
                "export (pass modelPath to create())")

    @staticmethod
    def _blob(img_resized):
        a = img_resized.astype(np.float32) / 255.0
        return np.ascontiguousarray(a.transpose(2, 0, 1)[None])


class ALIKED(_DnnFeature2D):
    Params = ALIKED_Params
    _desc_size = 128

    def detectAndCompute(self, image, mask=None):
        from .keypoint import KeyPoint
        from ..ops.resize import resize
        self._require_net()
        a = _to_3ch(image)
        h, w = a.shape[:2]
        size = getattr(self._params, "inputSize", 640) if self._params \
            else 640
        net_in = np.asarray(resize(a, (size, size), interpolation=1))
        self._net.setInput(self._blob(net_in), "image")
        kpn, scores, desc = self._net.forward(
            ["keypoints", "scores", "descriptors"])
        kpn = np.asarray(kpn, np.float64).reshape(-1, 2)
        scores = np.asarray(scores, np.float32).reshape(-1)
        desc = np.asarray(desc, np.float32).reshape(-1, self._desc_size)
        if self._params is None or getattr(
                self._params, "normalizeDescriptors", True):
            n = np.linalg.norm(desc, axis=1, keepdims=True)
            desc = desc / np.maximum(n, 1e-12)
        pts = (kpn + 1.0) / 2.0 * np.array([w, h], np.float64)
        kps = [KeyPoint(x, y, 0.0, -1.0, float(s))
               for (x, y), s in zip(pts, scores)]
        return kps, desc


class DISK(_DnnFeature2D):
    _desc_size = 128

    def __init__(self, model=None, maxKeypoints=1024,
                 scoreThreshold=0.0, imageSize=(1024, 1024),
                 backendId=0, targetId=0, from_memory=False):
        super().__init__(model, None, from_memory=from_memory)
        self._max_kp = int(maxKeypoints)
        self._thr = float(scoreThreshold)
        self._net_size = (int(imageSize[0]), int(imageSize[1]))  # (w, h)

    @classmethod
    def create(cls, modelPath="", maxKeypoints=1024, scoreThreshold=0.0,
               imageSize=(1024, 1024), backendId=0, targetId=0):
        return cls(modelPath or None, maxKeypoints, scoreThreshold,
                   imageSize, backendId, targetId)

    @classmethod
    def createFromMemory(cls, bufferModel, maxKeypoints=1024,
                         scoreThreshold=0.0, imageSize=(1024, 1024),
                         backendId=0, targetId=0):
        return cls(bufferModel, maxKeypoints, scoreThreshold,
                   imageSize, backendId, targetId, from_memory=True)

    def detectAndCompute(self, image, mask=None):
        from .keypoint import KeyPoint
        from ..ops.resize import resize
        self._require_net()
        a = _to_3ch(image)
        h, w = a.shape[:2]
        nw, nh = self._net_size
        net_in = np.asarray(resize(a, (nw, nh), interpolation=1))
        self._net.setInput(self._blob(net_in), "image")
        kp, scores, desc = self._net.forward(
            ["keypoints", "scores", "descriptors"])
        kp = np.asarray(kp).reshape(-1, 2).astype(np.float64)
        scores = np.asarray(scores, np.float32).reshape(-1)
        desc = np.asarray(desc, np.float32).reshape(-1, self._desc_size)
        keep = scores >= self._thr
        kp, scores, desc = kp[keep], scores[keep], desc[keep]
        if self._max_kp and len(scores) > self._max_kp:
            order = np.argsort(-scores, kind="stable")[:self._max_kp]
            order = np.sort(order)       # keep model order
            kp, scores, desc = kp[order], scores[order], desc[order]
        pts = kp * np.array([w / nw, h / nh], np.float64)
        kps = [KeyPoint(x, y, 1.0, -1.0, float(s))
               for (x, y), s in zip(pts, scores)]
        return kps, desc
