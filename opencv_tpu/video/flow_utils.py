"""Optical-flow utilities: LK pyramid construction and Middlebury .flo
file IO (video/src/lkpyramid.cpp:747 buildOpticalFlowPyramid,
video/src/optflowgf.cpp + optical_flow_io.cpp read/writeOpticalFlow).

TPU-native notes: pyramid levels are built with the device pyrDown; the
Scharr derivative pair is one fused separable pass per level.  The
returned numpy arrays match the reference's ROI views (the winSize
padding the reference keeps around each level is an implementation
detail of its LK window reads and is not visible through the Python
binding)."""

from __future__ import annotations

import struct

import numpy as np

from .. import constants as K
from ..ops.deriv import Scharr
from ..ops.pyramids import pyrDown

__all__ = ["buildOpticalFlowPyramid", "readOpticalFlow",
           "writeOpticalFlow"]

_FLO_MAGIC = 202021.25  # "PIEH" interpreted as a little-endian float


def buildOpticalFlowPyramid(img, winSize, maxLevel: int,
                            pyramid=None, withDerivatives: bool = True,
                            pyrBorder: int = K.BORDER_REFLECT_101,
                            derivBorder: int = K.BORDER_CONSTANT,
                            tryReuseInputImage: bool = True):
    """cv::buildOpticalFlowPyramid (lkpyramid.cpp:747).

    Returns (retval, pyramid): retval is the deepest level actually
    built; pyramid alternates level images and CV_16SC2 Scharr
    derivative maps when withDerivatives is set.  Levels stop early
    once the next level would not exceed winSize in both dimensions."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        raise ValueError("buildOpticalFlowPyramid expects 8-bit input")
    wx, wy = int(winSize[0]), int(winSize[1])
    out = []
    level_img = a
    sz = (a.shape[1], a.shape[0])
    ret = maxLevel
    for level in range(maxLevel + 1):
        if level != 0:
            level_img = np.asarray(pyrDown(level_img,
                                           borderType=pyrBorder))
        out.append(level_img)
        if withDerivatives:
            # lkpyramid.cpp:59 calcScharrDeriv: unnormalized Scharr
            # (3,10,3)x(-1,0,1), REFLECT_101 borders, dx/dy interleaved
            dx = np.asarray(Scharr(level_img, K.CV_16S, 1, 0,
                                   borderType=K.BORDER_REFLECT_101))
            dy = np.asarray(Scharr(level_img, K.CV_16S, 0, 1,
                                   borderType=K.BORDER_REFLECT_101))
            if dx.ndim == 2:
                deriv = np.stack([dx, dy], axis=-1)
            else:  # interleave per channel: (dx_c0, dy_c0, dx_c1, ...)
                deriv = np.concatenate(
                    [np.stack([dx[..., c], dy[..., c]], axis=-1)
                     for c in range(dx.shape[2])], axis=-1)
            out.append(deriv.astype(np.int16))
        sz = ((sz[0] + 1) // 2, (sz[1] + 1) // 2)
        if sz[0] <= wx or sz[1] <= wy:
            ret = level
            break
    return ret, out


def readOpticalFlow(path: str):
    """cv::readOpticalFlow — Middlebury .flo reader.  Returns an
    (H, W, 2) float32 array or None on malformed input."""
    try:
        with open(path, "rb") as f:
            raw = f.read()
        magic, w, h = struct.unpack("<fii", raw[:12])
        if abs(magic - _FLO_MAGIC) > 1e-3 or w <= 0 or h <= 0:
            return None
        body = np.frombuffer(raw, np.float32, count=h * w * 2, offset=12)
        return body.reshape(h, w, 2).copy()
    except (OSError, struct.error, ValueError):
        return None


def writeOpticalFlow(path: str, flow) -> bool:
    """cv::writeOpticalFlow — Middlebury .flo writer (CV_32FC2)."""
    a = np.asarray(flow, np.float32)
    if a.ndim != 3 or a.shape[2] != 2:
        return False
    h, w = a.shape[:2]
    try:
        with open(path, "wb") as f:
            f.write(struct.pack("<fii", _FLO_MAGIC, w, h))
            f.write(np.ascontiguousarray(a).tobytes())
        return True
    except OSError:
        return False
