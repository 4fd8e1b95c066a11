"""videostab (modules/videostab) — video stabilization.

The reference's pipeline: per-frame global motion estimation
(keypoints + RANSAC), trajectory smoothing (GaussianMotionFilter),
and stabilizing warps.  Here: GFTT + pyramidal LK + similarity RANSAC
feed a Gaussian-smoothed trajectory; the warp chain runs through the
device warpAffine.  (The reference exposes this module in C++ only.)
"""

from __future__ import annotations

import numpy as np

from .ops.corners import goodFeaturesToTrack
from .video.lk import calcOpticalFlowPyrLK
from .calib3d.geometry import estimateAffinePartial2D
from .ops.warp import warpAffine
from . import constants as K

__all__ = ["estimateGlobalMotionRansac", "GaussianMotionFilter",
           "OnePassStabilizer", "MOTION_TRANSLATION", "MOTION_SIMILARITY"]

MOTION_TRANSLATION = 0
MOTION_SIMILARITY = 2


def estimateGlobalMotionRansac(prev, curr, model=MOTION_SIMILARITY):
    """Global inter-frame motion as a 3x3 matrix (videostab
    global_motion.cpp role)."""
    p0 = goodFeaturesToTrack(prev, 300, 0.01, 8)
    if p0 is None or len(p0) < 8:
        return np.eye(3), False
    p1, st, _ = calcOpticalFlowPyrLK(prev, curr, np.asarray(p0, np.float32),
                                     None)
    good = np.asarray(st).ravel() > 0
    a = np.asarray(p0).reshape(-1, 2)[good]
    b = np.asarray(p1).reshape(-1, 2)[good]
    if len(a) < 8:
        return np.eye(3), False
    if model == MOTION_TRANSLATION:
        t = np.median(b - a, axis=0)
        M = np.array([[1, 0, t[0]], [0, 1, t[1]], [0, 0, 1.0]])
        return M, True
    A, _ = estimateAffinePartial2D(a, b)
    if A is None:
        return np.eye(3), False
    return np.vstack([A, [0, 0, 1]]), True


class GaussianMotionFilter:
    def __init__(self, radius=15, stdev=-1.0):
        self.radius = radius
        self.stdev = stdev if stdev > 0 else np.sqrt(radius)

    def stabilize(self, idx, motions, frame_range):
        """Smoothed correction at frame idx given inter-frame motions
        (list of 3x3, motions[i]: frame i -> i+1)."""
        lo, hi = frame_range
        # cumulative positions relative to idx
        weights = []
        mats = []
        for j in range(max(lo, idx - self.radius),
                       min(hi, idx + self.radius + 1)):
            w = np.exp(-0.5 * ((j - idx) / self.stdev) ** 2)
            M = np.eye(3)
            if j > idx:
                for k in range(idx, j):
                    M = motions[k] @ M
            elif j < idx:
                for k in range(j, idx):
                    M = np.linalg.inv(motions[k]) @ M
            weights.append(w)
            mats.append(M)
        weights = np.asarray(weights)
        weights /= weights.sum()
        avg = sum(w * M for w, M in zip(weights, mats))
        return avg


class OnePassStabilizer:
    def __init__(self, radius=15, model=MOTION_SIMILARITY):
        self.filter = GaussianMotionFilter(radius)
        self.model = model

    def stabilize(self, frames):
        """Stabilize a list of frames; returns the warped list."""
        frames = [np.asarray(f) for f in frames]
        n = len(frames)
        motions = []
        for i in range(n - 1):
            M, ok = estimateGlobalMotionRansac(frames[i], frames[i + 1],
                                               self.model)
            motions.append(M if ok else np.eye(3))
        out = []
        H, W = frames[0].shape[:2]
        for i, f in enumerate(frames):
            S = self.filter.stabilize(i, motions, (0, n))
            out.append(np.asarray(warpAffine(
                f, S[:2].astype(np.float32), (W, H),
                borderMode=K.BORDER_REPLICATE)))
        return out
