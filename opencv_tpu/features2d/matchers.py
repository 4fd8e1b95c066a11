"""Descriptor matchers (features2d/src/matchers.cpp).

TPU-native: BFMatcher's distance matrix is ONE batched device op —
Hamming via XOR + popcount on int32 lanes (VPU), L2/L1 via matmul-style
broadcasting (MXU for L2 through the |a-b|² = a²+b²-2ab expansion).
knnMatch/radius are top-k reductions on device; the DMatch list is a host
tail.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as K

__all__ = ["DMatch", "BFMatcher", "FlannBasedMatcher",
           "hamming_distance_matrix"]


class DMatch:
    __slots__ = ("queryIdx", "trainIdx", "imgIdx", "distance")

    def __init__(self, queryIdx=0, trainIdx=0, distance=0.0, imgIdx=0):
        self.queryIdx = int(queryIdx)
        self.trainIdx = int(trainIdx)
        self.imgIdx = int(imgIdx)
        self.distance = float(distance)

    def __repr__(self):
        return (f"DMatch(q={self.queryIdx}, t={self.trainIdx}, "
                f"d={self.distance})")


@jax.jit
def hamming_distance_matrix(q, t):
    """(Nq, Nt) Hamming distances between uint8 descriptor rows."""
    qi = q.astype(jnp.uint8)
    ti = t.astype(jnp.uint8)
    x = jnp.bitwise_xor(qi[:, None, :], ti[None, :, :])
    # popcount via bit tricks on uint8
    x = x - ((x >> 1) & 0x55)
    x = (x & 0x33) + ((x >> 2) & 0x33)
    x = (x + (x >> 4)) & 0x0F
    return jnp.sum(x.astype(jnp.int32), axis=-1)


@jax.jit
def _l2sq_matrix(q, t):
    qf = q.astype(jnp.float32)
    tf = t.astype(jnp.float32)
    q2 = jnp.sum(qf * qf, axis=1, keepdims=True)
    t2 = jnp.sum(tf * tf, axis=1, keepdims=True)
    cross = qf @ tf.T
    return jnp.maximum(q2 + t2.T - 2 * cross, 0.0)


@jax.jit
def _l1_matrix(q, t):
    return jnp.sum(jnp.abs(q.astype(jnp.float32)[:, None, :]
                           - t.astype(jnp.float32)[None, :, :]), axis=-1)


class BFMatcher:
    """Brute-force matcher (`cv::BFMatcher`)."""

    def __init__(self, normType: int = K.NORM_L2, crossCheck: bool = False):
        self.norm_type = normType
        self.cross_check = crossCheck

    @staticmethod
    def create(normType: int = K.NORM_L2, crossCheck: bool = False):
        return BFMatcher(normType, crossCheck)

    def _dist(self, q, t):
        nt = self.norm_type & K.NORM_TYPE_MASK
        if nt in (K.NORM_HAMMING, K.NORM_HAMMING2):
            return np.asarray(hamming_distance_matrix(q, t)).astype(np.float32)
        if nt == K.NORM_L2:
            return np.sqrt(np.asarray(_l2sq_matrix(q, t)))
        if nt == K.NORM_L2SQR:
            return np.asarray(_l2sq_matrix(q, t))
        if nt == K.NORM_L1:
            return np.asarray(_l1_matrix(q, t))
        raise ValueError(f"unsupported norm {self.norm_type}")

    def match(self, queryDescriptors, trainDescriptors, mask=None):
        d = self._dist(queryDescriptors, trainDescriptors)
        best = d.argmin(axis=1)
        out = [DMatch(i, int(j), float(d[i, j])) for i, j in enumerate(best)]
        if self.cross_check:
            rbest = d.argmin(axis=0)
            out = [m for m in out if rbest[m.trainIdx] == m.queryIdx]
        return out

    def knnMatch(self, queryDescriptors, trainDescriptors, k: int, mask=None):
        d = self._dist(queryDescriptors, trainDescriptors)
        idx = np.argsort(d, axis=1, kind="stable")[:, :k]
        return [[DMatch(i, int(j), float(d[i, j])) for j in row]
                for i, row in enumerate(idx)]

    def radiusMatch(self, queryDescriptors, trainDescriptors,
                    maxDistance: float, mask=None):
        d = self._dist(queryDescriptors, trainDescriptors)
        out = []
        for i in range(d.shape[0]):
            js = np.nonzero(d[i] <= maxDistance)[0]
            js = js[np.argsort(d[i, js], kind="stable")]
            out.append([DMatch(i, int(j), float(d[i, j])) for j in js])
        return out


class FlannBasedMatcher(BFMatcher):
    """FLANN-compatible surface. On TPU the batched brute-force distance
    matrix saturates the MXU and beats tree traversal for the descriptor
    sizes cv2 pipelines use, so this is exact (not approximate) matching
    behind the FLANN API (miniflann.cpp parity gap: index persistence)."""

    def __init__(self, indexParams=None, searchParams=None):
        super().__init__(K.NORM_L2, crossCheck=False)

    @staticmethod
    def create():
        return FlannBasedMatcher()
