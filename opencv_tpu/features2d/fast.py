"""FAST keypoint detector (features2d/src/fast.cpp, fast_score.cpp).

TPU-native design: the reference's per-pixel Bresenham-circle test with a
512-entry LUT (fast.cpp:58-82) becomes 16 shifted-slice planes + vectorized
contiguous-arc tests; the corner score (`cornerScore<16>`: the largest
threshold at which the pixel is still a corner, fast_score.cpp) is the same
min/max ring reduction over the 25-entry wrapped difference array, fully
fused on the VPU.  Output is TPU-first: a dense (score, mask) pair; the
KeyPoint list is a thin host tail.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import constants as K
from ..core.arrays import to_batched
from .keypoint import KeyPoint

__all__ = ["FAST", "FastFeatureDetector", "FastFeatureDetector_create",
           "fast_response"]

# circle offsets (x, y), fast_score.cpp makeOffsets offsets16
_OFFSETS16 = [(0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2),
              (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0),
              (-3, 1), (-2, 2), (-1, 3)]


def fast_response(img4d, threshold: int):
    """Dense FAST-16/9 score map.

    Returns (score, is_corner) of shape (N, H, W, 1); score is
    cornerScore<16> where is_corner, else 0.  Border of 3 px never fires
    (fast.cpp loop bounds).
    """
    x = img4d.astype(jnp.int16)
    N, H, W, C = x.shape
    assert C == 1
    pad = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="edge")

    center = x
    # d[k] = v - circle[k], the wrapped 25-entry ring
    ds = []
    for (ox, oy) in _OFFSETS16:
        nb = pad[:, 3 + oy:3 + oy + H, 3 + ox:3 + ox + W, :]
        ds.append((center - nb).astype(jnp.int16))

    t = jnp.int16(threshold)
    darker = [d > t for d in ds]       # circle pixel darker than v - t
    brighter = [d < -t for d in ds]    # circle pixel brighter than v + t

    def has_arc9(flags):
        any_run = None
        for k in range(16):
            run = flags[k % 16]
            for j in range(1, 9):
                run = run & flags[(k + j) % 16]
            any_run = run if any_run is None else (any_run | run)
        return any_run

    is_corner = has_arc9(darker) | has_arc9(brighter)

    # cornerScore<16>: q0 = max_k min(a_k, d[k]), min(a_k, d[k+9]);
    # q1 = min_k max(b_k, d[k]), max(b_k, d[k+9]); score = max(q0,-q1)-1
    q0 = jnp.full(x.shape, -1000, jnp.int16)
    q1 = jnp.full(x.shape, 1000, jnp.int16)
    for k in range(16):
        a = ds[(k + 1) % 16]
        b = ds[(k + 1) % 16]
        for j in range(2, 9):
            v = ds[(k + j) % 16]
            a = jnp.minimum(a, v)
            b = jnp.maximum(b, v)
        d0 = ds[k % 16]
        d9 = ds[(k + 9) % 16]
        q0 = jnp.maximum(q0, jnp.minimum(a, d0))
        q0 = jnp.maximum(q0, jnp.minimum(a, d9))
        q1 = jnp.minimum(q1, jnp.maximum(b, d0))
        q1 = jnp.minimum(q1, jnp.maximum(b, d9))
    score = (jnp.maximum(q0, -q1) - 1).astype(jnp.int32)

    inner = np.zeros((1, H, W, 1), bool)
    if H > 6 and W > 6:
        inner[:, 3:H - 3, 3:W - 3, :] = True
    is_corner = is_corner & jnp.asarray(inner)
    score = jnp.where(is_corner, score, 0)
    return score, is_corner


def fast_keypoint_mask(img4d, threshold: int, nonmax: bool = True):
    """(score, keypoint mask) after optional 3×3 strict NMS on the score
    map (fast.cpp nonmax over per-row score buffers)."""
    score, is_corner = fast_response(img4d, threshold)
    if not nonmax:
        return score, is_corner
    N, H, W, C = score.shape
    p = jnp.pad(score, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = None
    for dy in range(3):
        for dx in range(3):
            if dy == 1 and dx == 1:
                continue
            s = p[:, dy:dy + H, dx:dx + W, :]
            neigh = s if neigh is None else jnp.maximum(neigh, s)
    keep = is_corner & (score > neigh)
    return score, keep


def FAST(image, threshold: int = 10, nonmaxSuppression: bool = True,
         type: int = K.FAST_FEATURE_DETECTOR_TYPE_9_16):
    """cv2-style FAST returning a KeyPoint list."""
    if type != K.FAST_FEATURE_DETECTOR_TYPE_9_16:
        raise NotImplementedError("only TYPE_9_16 implemented")
    x, _ = to_batched(image)
    score, keep = fast_keypoint_mask(x, threshold, nonmaxSuppression)
    s = np.asarray(score[0, :, :, 0])
    m = np.asarray(keep[0, :, :, 0])
    ys, xs = np.nonzero(m)
    return [KeyPoint(float(xx), float(yy), 7.0, -1.0, float(s[yy, xx]))
            for yy, xx in zip(ys, xs)]


class FastFeatureDetector:
    def __init__(self, threshold=10, nonmaxSuppression=True,
                 type=K.FAST_FEATURE_DETECTOR_TYPE_9_16):
        self.threshold = threshold
        self.nonmax = nonmaxSuppression
        self.type = type

    def detect(self, image, mask=None):
        kps = FAST(image, self.threshold, self.nonmax, self.type)
        if mask is not None:
            mk = np.asarray(mask)
            kps = [k for k in kps if mk[int(k.pt[1]), int(k.pt[0])]]
        return kps

    def setThreshold(self, t):
        self.threshold = t

    def getThreshold(self):
        return self.threshold


def FastFeatureDetector_create(threshold=10, nonmaxSuppression=True,
                               type=K.FAST_FEATURE_DETECTOR_TYPE_9_16):
    return FastFeatureDetector(threshold, nonmaxSuppression, type)
