"""AGAST corner detector (features2d/src/agast.cpp, agast_score.cpp).

The reference accelerates the segment test with machine-generated decision
trees (agast.cpp:76+); on TPU the right shape is the dense test itself:
every ring pixel is a shifted slice, the arc test is a vectorized AND-scan
over ring rotations, and the response (the largest threshold at which the
pixel stays a corner, agast_score.cpp bisection loop :2150-2165) is an
8-step vectorized bisection over the same dense predicate — all VPU work,
no per-pixel branching.

Ring geometries from agast_score.cpp makeAgastOffsets:50-74; arc lengths
are the segment-test S of each variant (5 of 8, 7 of 12, 9 of 16).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import functools

from ..core.arrays import to_batched
from .keypoint import KeyPoint

__all__ = ["AGAST", "AgastFeatureDetector", "AgastFeatureDetector_create"]

AGAST_5_8 = 0
AGAST_7_12d = 1
AGAST_7_12s = 2
OAST_9_16 = 3

_RINGS = {
    AGAST_5_8: ([(-1, 0), (-1, -1), (0, -1), (1, -1),
                 (1, 0), (1, 1), (0, 1), (-1, 1)], 5, 1),
    AGAST_7_12d: ([(-3, 0), (-2, -1), (-1, -2), (0, -3), (1, -2), (2, -1),
                   (3, 0), (2, 1), (1, 2), (0, 3), (-1, 2), (-2, 1)], 7, 3),
    AGAST_7_12s: ([(-2, 0), (-2, -1), (-1, -2), (0, -2), (1, -2), (2, -1),
                   (2, 0), (2, 1), (1, 2), (0, 2), (-1, 2), (-2, 1)], 7, 2),
    OAST_9_16: ([(-3, 0), (-3, -1), (-2, -2), (-1, -3), (0, -3), (1, -3),
                 (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3), (0, 3),
                 (-1, 3), (-2, 2), (-3, 1)], 9, 3),
}


@functools.partial(jax.jit, static_argnames=("agast_type", "nonmax"))
def _agast_dense(x, threshold, agast_type, nonmax):
    """x: (N, H, W, 1) uint8. Returns (score, keep) dense maps."""
    offsets, S, r = _RINGS[agast_type]
    n = len(offsets)
    xi = x.astype(jnp.int16)
    N, H, W, _ = x.shape
    pad = jnp.pad(xi, ((0, 0), (r, r), (r, r), (0, 0)), mode="edge")
    ring = jnp.stack([pad[:, r + oy:r + oy + H, r + ox:r + ox + W, :]
                      for (ox, oy) in offsets])          # (n, N, H, W, 1)

    def is_corner(b):
        cb = xi + b
        c_b = xi - b
        bright = ring > cb[None]
        dark = ring < c_b[None]

        def arc(flags):
            hit = jnp.zeros(x.shape, bool)
            for k in range(n):
                run = flags[k % n]
                for j in range(1, S):
                    run = run & flags[(k + j) % n]
                hit = hit | run
            return hit

        return arc(bright) | arc(dark)

    corner0 = is_corner(jnp.int16(threshold))

    # response: bisection for the largest b that keeps the corner
    # (agast_score.cpp: bmin=threshold, bmax=255, return bmin)
    bmin = jnp.full(x.shape, threshold, jnp.int32)
    bmax = jnp.full(x.shape, 255, jnp.int32)
    for _ in range(9):
        btest = (bmin + bmax) // 2
        c = is_corner(btest.astype(jnp.int16))
        bmin = jnp.where(c, btest, bmin)
        bmax = jnp.where(c, bmax, btest)
    score = jnp.where(corner0, bmin, 0)

    inner = np.zeros((1, H, W, 1), bool)
    if H > 2 * r and W > 2 * r:
        inner[:, r:H - r, r:W - r, :] = True
    keep = corner0 & jnp.asarray(inner)
    score = jnp.where(keep, score, 0)

    if nonmax:
        p = jnp.pad(score, ((0, 0), (1, 1), (1, 1), (0, 0)))
        neigh = None
        for dy in range(3):
            for dx in range(3):
                if dy == 1 and dx == 1:
                    continue
                s = p[:, dy:dy + H, dx:dx + W, :]
                neigh = s if neigh is None else jnp.maximum(neigh, s)
        keep = keep & (score > neigh)
    return score, keep


def AGAST(image, threshold: int = 10, nonmaxSuppression: bool = True,
          type: int = OAST_9_16):
    x, _ = to_batched(image)
    score, keep = _agast_dense(x, int(threshold), type, bool(nonmaxSuppression))
    s = np.asarray(score[0, :, :, 0])
    m = np.asarray(keep[0, :, :, 0])
    ys, xs = np.nonzero(m)
    return [KeyPoint(float(xx), float(yy), 7.0, -1.0, float(s[yy, xx]))
            for yy, xx in zip(ys, xs)]


class AgastFeatureDetector:
    AGAST_5_8 = AGAST_5_8
    AGAST_7_12d = AGAST_7_12d
    AGAST_7_12s = AGAST_7_12s
    OAST_9_16 = OAST_9_16

    def __init__(self, threshold=10, nonmaxSuppression=True, type=OAST_9_16):
        self.threshold = threshold
        self.nonmaxSuppression = nonmaxSuppression
        self.type = type

    @staticmethod
    def create(threshold=10, nonmaxSuppression=True, type=OAST_9_16):
        return AgastFeatureDetector(threshold, nonmaxSuppression, type)

    def detect(self, image, mask=None):
        kps = AGAST(image, self.threshold, self.nonmaxSuppression, self.type)
        if mask is not None:
            m = np.asarray(mask)
            kps = [k for k in kps if m[int(k.pt[1]), int(k.pt[0])]]
        return kps

    def setThreshold(self, t):
        self.threshold = t

    def getThreshold(self):
        return self.threshold

    def setNonmaxSuppression(self, b):
        self.nonmaxSuppression = b

    def setType(self, t):
        self.type = t

    def getType(self):
        return self.type


def AgastFeatureDetector_create(threshold=10, nonmaxSuppression=True,
                                type=OAST_9_16):
    return AgastFeatureDetector(threshold, nonmaxSuppression, type)
