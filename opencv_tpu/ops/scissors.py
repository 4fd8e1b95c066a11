"""Intelligent scissors (imgproc/src/intelligent_scissors.cpp,
Mortensen-Barrett live-wire).

Feature maps (edge indicator, gradient magnitude/direction) are dense
vectorized math; buildMap runs Dijkstra over the 8-connected pixel
graph from the seed (host priority queue, like the reference's
active-list expansion), and getContour backtracks the parent field.
"""

from __future__ import annotations

import heapq

import numpy as np

__all__ = ["IntelligentScissorsMB"]


class IntelligentScissorsMB:
    def __init__(self):
        self.w_nonedge = 0.43
        self.w_graddir = 0.43
        self.w_gradmag = 0.14
        self._canny = None
        self._mag_limit = 0.0
        self._img = None

    def setWeights(self, weight_non_edge, weight_gradient_direction,
                   weight_gradient_magnitude):
        self.w_nonedge = weight_non_edge
        self.w_graddir = weight_gradient_direction
        self.w_gradmag = weight_gradient_magnitude
        return self

    def setEdgeFeatureCannyParameters(self, threshold1, threshold2,
                                      apertureSize=3, L2gradient=False):
        self._canny = (threshold1, threshold2, apertureSize, L2gradient)
        return self

    def setEdgeFeatureZeroCrossingParameters(self, gradient_magnitude_min=0):
        self._canny = None
        return self

    def setGradientMagnitudeMaxLimit(self, gradient_magnitude_threshold_max=0.0):
        self._mag_limit = gradient_magnitude_threshold_max
        return self

    def applyImage(self, image):
        from ..ops.canny import Canny
        img = np.asarray(image)
        if img.ndim == 3:
            from ..ops.color import cvtColor
            from .. import constants as K
            gray = np.asarray(cvtColor(img, K.COLOR_BGR2GRAY))
        else:
            gray = img
        self._img = gray.astype(np.float64)
        H, W = gray.shape

        # gradient features
        p = np.pad(self._img, 1, mode="edge")
        gx = (p[1:-1, 2:] - p[1:-1, :-2]) * 0.5
        gy = (p[2:, 1:-1] - p[:-2, 1:-1]) * 0.5
        mag = np.hypot(gx, gy)
        if self._mag_limit > 0:
            mag = np.minimum(mag, self._mag_limit)
        mmax = mag.max() if mag.max() > 0 else 1.0
        self._fG = 1.0 - mag / mmax           # low cost on strong edges
        n = np.maximum(mag, 1e-9)
        self._dx = gx / n
        self._dy = gy / n

        # edge feature
        if self._canny is not None:
            t1, t2, ap, l2 = self._canny
            edges = np.asarray(Canny(gray, t1, t2, apertureSize=ap,
                                     L2gradient=l2))
            self._fE = np.where(edges > 0, 0.0, 1.0)
        else:
            # Laplacian zero crossing
            lap = (p[1:-1, 2:] + p[1:-1, :-2] + p[2:, 1:-1]
                   + p[:-2, 1:-1] - 4 * self._img)
            zc = np.zeros((H, W), bool)
            s = np.sign(lap)
            zc[:, 1:] |= s[:, 1:] * s[:, :-1] < 0
            zc[1:, :] |= s[1:] * s[:-1] < 0
            self._fE = np.where(zc, 0.0, 1.0)
        return self

    def buildMap(self, sourcePt):
        H, W = self._img.shape
        sx, sy = int(sourcePt[0]), int(sourcePt[1])
        INF = np.inf
        dist = np.full((H, W), INF)
        parent = np.full((H, W, 2), -1, np.int32)
        dist[sy, sx] = 0.0
        pq = [(0.0, sy, sx)]
        offs = [(-1, -1, np.sqrt(2)), (-1, 0, 1.0), (-1, 1, np.sqrt(2)),
                (0, -1, 1.0), (0, 1, 1.0),
                (1, -1, np.sqrt(2)), (1, 0, 1.0), (1, 1, np.sqrt(2))]
        fZ = self._fE
        fG = self._fG
        dxm = self._dx
        dym = self._dy
        wZ, wD, wG = self.w_nonedge, self.w_graddir, self.w_gradmag
        while pq:
            d, y, x = heapq.heappop(pq)
            if d > dist[y, x]:
                continue
            for (dy, dx, step) in offs:
                ny, nx = y + dy, x + dx
                if not (0 <= ny < H and 0 <= nx < W):
                    continue
                # gradient-direction feature fD(p, q)
                # link vector normalized
                lx, ly = dx / step, dy / step
                # D(p) = (dy, -dx) of gradient (edge direction)
                dpq = dym[y, x] * lx - dxm[y, x] * ly
                dq = dym[ny, nx] * lx - dxm[ny, nx] * ly
                fD = (np.arccos(np.clip(abs(dpq), 0, 1))
                      + np.arccos(np.clip(abs(dq), 0, 1))) / np.pi
                cost = (wZ * fZ[ny, nx] + wG * fG[ny, nx]
                        + wD * fD) * step
                ndist = d + cost
                if ndist < dist[ny, nx]:
                    dist[ny, nx] = ndist
                    parent[ny, nx] = (y, x)
                    heapq.heappush(pq, (ndist, ny, nx))
        self._dist = dist
        self._parent = parent
        self._src = (sy, sx)
        return self

    def getContour(self, targetPt, backward=False):
        ty, tx = int(targetPt[1]), int(targetPt[0])
        path = []
        y, x = ty, tx
        while (y, x) != self._src:
            path.append((x, y))
            py, px = self._parent[y, x]
            if py < 0:
                break
            y, x = int(py), int(px)
        path.append((self._src[1], self._src[0]))
        if not backward:
            path = path[::-1]
        return np.asarray(path, np.int32).reshape(-1, 1, 2)
