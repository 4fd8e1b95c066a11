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
def hamming2_distance_matrix(q, t):
    """(Nq, Nt) NORM_HAMMING2 distances: differing 2-bit cells
    (core norm cellSize=2 — used with ORB WTA_K=3/4)."""
    qi = q.astype(jnp.uint8)
    ti = t.astype(jnp.uint8)
    x = jnp.bitwise_xor(qi[:, None, :], ti[None, :, :])
    cells = (x | (x >> 1)) & 0x55       # 1 bit per differing 2-bit cell
    c = cells - ((cells >> 1) & 0x55)
    c = (c & 0x33) + ((c >> 2) & 0x33)
    c = (c + (c >> 4)) & 0x0F
    return jnp.sum(c.astype(jnp.int32), axis=-1)


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
        if nt == K.NORM_HAMMING:
            return np.asarray(hamming_distance_matrix(q, t)).astype(np.float32)
        if nt == K.NORM_HAMMING2:
            # count differing 2-bit cells (normHamming cellSize=2)
            return np.asarray(hamming2_distance_matrix(q, t)).astype(np.float32)
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


class FlannBasedMatcher:
    """`cv::FlannBasedMatcher` (matchers.cpp) backed by the real ANN
    indexes in `opencv_tpu.flann` (randomized kd-trees by default, like
    the reference's KDTreeIndexParams(4) + SearchParams(32); pass
    {"algorithm": 6, ...} for LSH over binary descriptors)."""

    def __init__(self, indexParams=None, searchParams=None):
        from ..flann import FLANN_INDEX_KDTREE

        self.index_params = dict(indexParams or
                                 {"algorithm": FLANN_INDEX_KDTREE,
                                  "trees": 4})
        self.search_params = dict(searchParams or {"checks": 32})
        self._index = None
        self._train = None

    @staticmethod
    def create():
        return FlannBasedMatcher()

    # -- index management (miniflann train/add semantics) ------------------
    def add(self, descriptors):
        d = np.asarray(descriptors[0] if isinstance(descriptors, (list, tuple))
                       else descriptors)
        self._train = (d if self._train is None
                       else np.vstack([self._train, d]))
        self._index = None

    def clear(self):
        self._train = None
        self._index = None

    def train(self):
        from ..flann import Index, FLANN_INDEX_LSH

        if self._index is None and self._train is not None:
            data = self._train
            algo = int(self.index_params.get("algorithm", 1))
            if data.dtype == np.uint8 and algo != FLANN_INDEX_LSH:
                data = data.astype(np.float32)
            self._index = Index(data, dict(self.index_params))
        return self._index

    def _search(self, query, train, k):
        if train is not None:
            self.clear()
            self.add(train)
        idx_obj = self.train()
        q = np.asarray(query)
        algo = int(self.index_params.get("algorithm", 1))
        from ..flann import FLANN_INDEX_LSH

        if q.dtype == np.uint8 and algo != FLANN_INDEX_LSH:
            q = q.astype(np.float32)
        idx, dst = idx_obj.knnSearch(q, k, self.search_params)
        # FLANN reports squared L2; cv::FlannBasedMatcher exposes L2
        if q.dtype != np.uint8:
            dst = np.sqrt(np.maximum(dst, 0.0))
        return idx, dst

    def match(self, queryDescriptors, trainDescriptors=None, mask=None):
        idx, dst = self._search(queryDescriptors, trainDescriptors, 1)
        return [DMatch(i, int(idx[i, 0]), float(dst[i, 0]))
                for i in range(len(idx)) if idx[i, 0] >= 0]

    def knnMatch(self, queryDescriptors, trainDescriptors=None, k=2,
                 mask=None, compactResult=False):
        idx, dst = self._search(queryDescriptors, trainDescriptors, k)
        return [[DMatch(i, int(j), float(d)) for j, d in zip(row, drow)
                 if j >= 0]
                for i, (row, drow) in enumerate(zip(idx, dst))]

    def radiusMatch(self, queryDescriptors, trainDescriptors=None,
                    maxDistance=0.0, mask=None):
        k = min(64, len(self._train) if self._train is not None
                else len(trainDescriptors))
        idx, dst = self._search(queryDescriptors, trainDescriptors, k)
        out = []
        for i in range(len(idx)):
            out.append([DMatch(i, int(j), float(d))
                        for j, d in zip(idx[i], dst[i])
                        if j >= 0 and d <= maxDistance])
        return out


def DescriptorMatcher_create(matcherType):
    """cv::DescriptorMatcher::create — string/enum factory mapping to
    BFMatcher or FlannBasedMatcher like the reference registry."""
    name = matcherType if isinstance(matcherType, str) else {
        0: "FlannBased", 1: "BruteForce", 2: "BruteForce-L1",
        3: "BruteForce-Hamming", 5: "BruteForce-SL2",
    }.get(int(matcherType), "BruteForce")
    from .. import constants as K
    if name == "FlannBased":
        return FlannBasedMatcher()
    norm = {"BruteForce": K.NORM_L2, "BruteForce-SL2": K.NORM_L2SQR,
            "BruteForce-L1": K.NORM_L1,
            "BruteForce-Hamming": K.NORM_HAMMING,
            "BruteForce-Hamming(2)": K.NORM_HAMMING2}.get(
                name, K.NORM_L2)
    return BFMatcher(norm)


def FlannBasedMatcher_create():
    return FlannBasedMatcher()


class LightGlueMatcher:
    """cv::LightGlueMatcher — transformer-based matcher driven by an
    ONNX model through our dnn importer.  Requires the user-supplied
    LightGlue ONNX export (no weights are bundled, same as the
    reference)."""

    def __init__(self, modelPath=None, modelBuffer=None,
                 scoreThreshold: float = 0.0):
        from ..dnn import readNetFromONNX
        self._thr = float(scoreThreshold)
        if modelPath is not None:
            self._net = readNetFromONNX(modelPath)
        elif modelBuffer is not None:
            self._net = readNetFromONNX(buffer=modelBuffer)
        else:
            raise ValueError("a model path or buffer is required")

    def match(self, kpts0, desc0, kpts1, desc1, imageSize0, imageSize1):
        import numpy as np
        self._net.setInput(np.asarray(desc0, np.float32), "desc0")
        raise NotImplementedError(
            "run the LightGlue ONNX graph via cv.dnn directly; the "
            "fused matcher entry point needs the official export")


def LightGlueMatcher_create(modelPath, scoreThreshold: float = 0.0,
                            backend: int = 0, target: int = 0):
    return LightGlueMatcher(modelPath=modelPath,
                            scoreThreshold=scoreThreshold)


def LightGlueMatcher_createFromMemory(buffer, scoreThreshold: float = 0.0,
                                      backend: int = 0, target: int = 0):
    return LightGlueMatcher(modelBuffer=buffer,
                            scoreThreshold=scoreThreshold)
