"""High-level model API (`cv2.dnn.Model` family, modules/dnn/src/model.cpp).

Model wraps a Net with preprocessing params (size/mean/scale/swapRB/crop);
subclasses add task-specific postprocessing:
- ClassificationModel.classify (model.cpp:251)
- DetectionModel.detect — DetectionOutput (1x1xNx7) and YOLO Region
  (Nx(classes+5)) decoders with reference box clipping (model.cpp:495)
- SegmentationModel.segment — per-pixel argmax (model.cpp:406)
"""

from __future__ import annotations

import numpy as np

__all__ = ["Model", "ClassificationModel", "DetectionModel",
           "SegmentationModel"]


def _read_any(path, config=None):
    from . import readNetFromONNX
    from .importers import readNetFromCaffe, readNetFromTensorflow

    p = str(path)
    if p.endswith(".onnx"):
        return readNetFromONNX(p)
    if p.endswith(".caffemodel") or p.endswith(".prototxt"):
        return readNetFromCaffe(config or p, p)
    if p.endswith(".pb"):
        return readNetFromTensorflow(p, config)
    if p.endswith(".tflite"):
        from .tflite import readNetFromTFLite
        return readNetFromTFLite(p)
    raise ValueError(f"cannot infer model format for {p}")


class Model:
    def __init__(self, model, config=None):
        self._net = model if hasattr(model, "forward") else \
            _read_any(model, config)
        self._size = None
        self._mean = (0.0, 0.0, 0.0, 0.0)
        self._scale = 1.0
        self._swapRB = False
        self._crop = False

    # -- preprocessing params (model.cpp setInput*) ------------------------
    def setInputSize(self, size, height=None):
        self._size = (int(size), int(height)) if height is not None \
            else (int(size[0]), int(size[1]))
        return self

    def setInputMean(self, mean):
        self._mean = mean
        return self

    def setInputScale(self, scale):
        self._scale = scale
        return self

    def setInputSwapRB(self, swapRB):
        self._swapRB = bool(swapRB)
        return self

    def setInputCrop(self, crop):
        self._crop = bool(crop)
        return self

    def setInputParams(self, scale=1.0, size=(), mean=(), swapRB=False,
                       crop=False):
        if size:
            self.setInputSize(size)
        self._mean = mean if mean != () else self._mean
        self._scale = scale
        self._swapRB = swapRB
        self._crop = crop
        return self

    def _preprocess(self, frame):
        from . import blobFromImage

        frame = np.asarray(frame)
        size = self._size or (frame.shape[1], frame.shape[0])
        return blobFromImage(frame, scalefactor=self._scale, size=size,
                             mean=self._mean, swapRB=self._swapRB,
                             crop=self._crop)

    def predict(self, frame):
        self._net.setInput(self._preprocess(frame))
        return self._net.forward(self._net.getUnconnectedOutLayersNames())


class ClassificationModel(Model):
    def classify(self, frame):
        outs = self.predict(frame)
        out = np.asarray(outs[0] if isinstance(outs, (list, tuple)) else outs)
        out = out.reshape(-1)
        cls = int(np.argmax(out))
        return cls, float(out[cls])


class SegmentationModel(Model):
    def segment(self, frame):
        outs = self.predict(frame)
        out = np.asarray(outs[0] if isinstance(outs, (list, tuple)) else outs)
        # (1, C, H, W) → per-pixel argmax class id (model.cpp:406)
        return np.argmax(out[0], axis=0).astype(np.uint8)


class DetectionModel(Model):
    def __init__(self, model, config=None):
        super().__init__(model, config)
        self._nms_across_classes = False

    def setNmsAcrossClasses(self, value):
        self._nms_across_classes = bool(value)
        return self

    def getNmsAcrossClasses(self):
        return self._nms_across_classes

    def detect(self, frame, confThreshold=0.5, nmsThreshold=0.0):
        from .nms import NMSBoxes, NMSBoxesBatched

        frame = np.asarray(frame)
        fh, fw = frame.shape[:2]
        outs = self.predict(frame)
        if not isinstance(outs, (list, tuple)):
            outs = [outs]
        outs = [np.asarray(o) for o in outs]

        class_ids, confs, boxes = [], [], []
        is_det_output = outs[0].ndim == 4 and outs[0].shape[-1] == 7

        if is_det_output:
            # [batchId, classId, conf, l, t, r, b] rows (model.cpp:520)
            for out in outs:
                for row in out.reshape(-1, 7):
                    conf = float(row[2])
                    if conf < confThreshold:
                        continue
                    l, t, r, b = (int(row[3]), int(row[4]),
                                  int(row[5]), int(row[6]))
                    w, h = r - l + 1, b - t + 1
                    if w <= 2 or h <= 2:  # normalized coords
                        l = int(row[3] * fw)
                        t = int(row[4] * fh)
                        r = int(row[5] * fw)
                        b = int(row[6] * fh)
                        w, h = r - l + 1, b - t + 1
                    l = max(0, min(l, fw - 1))
                    t = max(0, min(t, fh - 1))
                    w = max(1, min(w, fw - l))
                    h = max(1, min(h, fh - t))
                    boxes.append((l, t, w, h))
                    class_ids.append(int(row[1]))
                    confs.append(conf)
        else:
            # YOLO Region rows: [cx, cy, w, h, obj, class scores...]
            for out in outs:
                for row in out.reshape(-1, out.shape[-1]):
                    scores = row[5:]
                    cid = int(np.argmax(scores))
                    conf = float(scores[cid])
                    if conf < confThreshold:
                        continue
                    cx, cy = int(row[0] * fw), int(row[1] * fh)
                    w, h = int(row[2] * fw), int(row[3] * fh)
                    l = max(0, min(cx - w // 2, fw - 1))
                    t = max(0, min(cy - h // 2, fh - 1))
                    w = max(1, min(w, fw - l))
                    h = max(1, min(h, fh - t))
                    boxes.append((l, t, w, h))
                    class_ids.append(cid)
                    confs.append(conf)
            if nmsThreshold:
                if self._nms_across_classes:
                    keep = NMSBoxes(boxes, confs, confThreshold,
                                    nmsThreshold)
                else:
                    keep = NMSBoxesBatched(boxes, confs, class_ids,
                                           confThreshold, nmsThreshold)
                boxes = [boxes[i] for i in keep]
                confs = [confs[i] for i in keep]
                class_ids = [class_ids[i] for i in keep]

        return (np.asarray(class_ids, np.int32),
                np.asarray(confs, np.float32),
                np.asarray(boxes, np.int32).reshape(-1, 4))
