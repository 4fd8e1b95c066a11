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

# circle offsets (x, y), fast_score.cpp makeOffsets
_OFFSETS = {
    16: [(0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2),
         (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0),
         (-3, 1), (-2, 2), (-1, 3)],
    12: [(0, 2), (1, 2), (2, 1), (2, 0), (2, -1), (1, -2), (0, -2),
         (-1, -2), (-2, -1), (-2, 0), (-2, 1), (-1, 2)],
    8: [(0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0),
        (-1, 1)],
}
_RADIUS = {16: 3, 12: 2, 8: 1}


def fast_response(img4d, threshold: int, pattern: int = 16):
    """Dense FAST score map for pattern sizes 16/12/8 (TYPE_9_16 /
    TYPE_7_12 / TYPE_5_8).

    Returns (score, is_corner) of shape (N, H, W, 1); score is
    cornerScore<pattern> where is_corner, else 0.  The circle-radius
    border never fires (fast.cpp loop bounds).
    """
    x = img4d.astype(jnp.int16)
    N, H, W, C = x.shape
    assert C == 1
    offs = _OFFSETS[pattern]
    r = _RADIUS[pattern]
    Kk = pattern // 2        # FAST_t template K; required arc = K + 1
    pad = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)), mode="edge")

    center = x
    # d[k] = v - circle[k], the wrapped ring
    ds = []
    for (ox, oy) in offs:
        nb = pad[:, r + oy:r + oy + H, r + ox:r + ox + W, :]
        ds.append((center - nb).astype(jnp.int16))

    t = jnp.int16(threshold)
    darker = [d > t for d in ds]       # circle pixel darker than v - t
    brighter = [d < -t for d in ds]    # circle pixel brighter than v + t

    def has_arc(flags):
        any_run = None
        for k in range(pattern):
            run = flags[k % pattern]
            for j in range(1, Kk + 1):
                run = run & flags[(k + j) % pattern]
            any_run = run if any_run is None else (any_run | run)
        return any_run

    def precheck(flags):
        # the reference's table pre-gate uses pixel[0..15] pairs, which
        # WRAP for small patterns (makeOffsets pixel[k]=pixel[k-p]) —
        # semantic for TYPE_7_12/TYPE_5_8, a no-op for TYPE_9_16
        # (fast.cpp:205-222)
        gate = None
        for a, b in ((0, 8), (2, 10), (4, 12), (6, 14),
                     (1, 9), (3, 11), (5, 13), (7, 15)):
            pair = flags[a % pattern] | flags[b % pattern]
            gate = pair if gate is None else (gate & pair)
        return gate

    is_corner = (precheck(darker) & has_arc(darker)) \
        | (precheck(brighter) & has_arc(brighter))

    # cornerScore<p>: q0 = max_k min(a_k, d[k]), min(a_k, d[k+K+1]);
    # q1 = min_k max(b_k, d[k]), max(...); score = max(q0,-q1)-1
    q0 = jnp.full(x.shape, -1000, jnp.int16)
    q1 = jnp.full(x.shape, 1000, jnp.int16)
    for k in range(pattern):
        a = ds[(k + 1) % pattern]
        b = ds[(k + 1) % pattern]
        for j in range(2, Kk + 1):
            v = ds[(k + j) % pattern]
            a = jnp.minimum(a, v)
            b = jnp.maximum(b, v)
        d0 = ds[k % pattern]
        dK = ds[(k + Kk + 1) % pattern]
        q0 = jnp.maximum(q0, jnp.minimum(a, d0))
        q0 = jnp.maximum(q0, jnp.minimum(a, dK))
        q1 = jnp.minimum(q1, jnp.maximum(b, d0))
        q1 = jnp.minimum(q1, jnp.maximum(b, dK))
    score = (jnp.maximum(q0, -q1) - 1).astype(jnp.int32)

    # the reference's scan bounds are ALWAYS 3 px regardless of pattern
    # (fast.cpp:99 `for(i = 3; i < rows-2; ...)`, cols 3..cols-4)
    inner = np.zeros((1, H, W, 1), bool)
    if H > 6 and W > 6:
        inner[:, 3:H - 3, 3:W - 3, :] = True
    is_corner = is_corner & jnp.asarray(inner)
    score = jnp.where(is_corner, score, 0)
    return score, is_corner


def fast_keypoint_mask(img4d, threshold: int, nonmax: bool = True,
                       pattern: int = 16):
    """(score, keypoint mask) after optional 3×3 strict NMS on the score
    map (fast.cpp nonmax over per-row score buffers)."""
    score, is_corner = fast_response(img4d, threshold, pattern)
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
    pattern = {K.FAST_FEATURE_DETECTOR_TYPE_9_16: 16,
               K.FAST_FEATURE_DETECTOR_TYPE_7_12: 12,
               K.FAST_FEATURE_DETECTOR_TYPE_5_8: 8}[type]
    x, _ = to_batched(image)
    score, keep = fast_keypoint_mask(x, threshold, nonmaxSuppression,
                                     pattern)
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
