"""IntelligentScissorsMB (imgproc/src/intelligent_scissors.cpp):
live-wire 2-D DP graph search (Mortensen-Barrett).  Faithful port of
the cost model: non-edge feature (Canny or Laplacian zero-crossing),
gradient direction term through the reference's 64-entry acos table,
inverted-normalized gradient magnitude, 8-neighbour Dijkstra with the
same cost accumulation order and tie behavior."""

from __future__ import annotations

import heapq

import numpy as np

from .. import constants as K

__all__ = ["IntelligentScissorsMB"]

_NEIGHBORS = [(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0),
              (-1, 1), (0, 1), (1, 1)]
_ENCODE = [8, 7, 6, 5, 4, 3, 2, 1]
_ACOS_N = 64
_ACOS_TABLE = np.array(
    [np.arccos(np.clip(i / _ACOS_N, -1, 1)) / np.pi
     for i in range(-_ACOS_N, _ACOS_N + 1)], np.float32)
_SQRT2_INV = 0.7071067811865475


class IntelligentScissorsMB:
    def __init__(self):
        self._w_non_edge = 0.43
        self._w_dir = 0.43
        self._w_mag = 0.14
        self._edge_mode = "zero_crossing"
        self._zc_min_mag = 0.0
        self._canny = (10.0, 100.0, 3, False)
        self._mag_max = 0.0
        self._non_edge = None
        self._grad_dir = None
        self._grad_mag = None
        self._w_non_edge_compute = 0.0
        self._paths = None
        self._size = None

    # -- parameters ---------------------------------------------------
    def setWeights(self, weight_non_edge, weight_gradient_direction,
                   weight_gradient_magnitude):
        self._w_non_edge = float(weight_non_edge)
        self._w_dir = float(weight_gradient_direction)
        self._w_mag = float(weight_gradient_magnitude)
        return self

    def setGradientMagnitudeMaxLimit(self, v):
        self._mag_max = float(v)
        return self

    def setEdgeFeatureZeroCrossingParameters(self, v=0.0):
        self._edge_mode = "zero_crossing"
        self._zc_min_mag = float(v)
        return self

    def setEdgeFeatureCannyParameters(self, threshold1, threshold2,
                                      apertureSize: int = 3,
                                      L2gradient: bool = False):
        self._edge_mode = "canny"
        self._canny = (float(threshold1), float(threshold2),
                       int(apertureSize), bool(L2gradient))
        return self

    # -- features -----------------------------------------------------
    def _gray(self, image):
        a = np.asarray(image)
        if a.ndim == 3:
            from .color import cvtColor
            code = K.COLOR_BGR2GRAY if a.shape[2] == 3 \
                else K.COLOR_BGRA2GRAY
            a = np.asarray(cvtColor(a, code))
        return a

    def _derives(self, image):
        from .deriv import Sobel
        g = self._gray(image)
        Ix = np.asarray(Sobel(g, K.CV_32F, 1, 0, ksize=3))
        Iy = np.asarray(Sobel(g, K.CV_32F, 0, 1, ksize=3))
        return Ix, Iy, np.hypot(Ix, Iy)

    def applyImage(self, image):
        Ix, Iy, mag = self._derives(image)
        H, W = mag.shape
        self._size = (H, W)
        # non-edge feature
        if self._edge_mode == "canny":
            from .canny import Canny
            t1, t2, ap, l2 = self._canny
            edges = np.asarray(Canny(self._gray(image), t1, t2,
                                     apertureSize=ap, L2gradient=l2))
            self._non_edge = (255 - edges).astype(np.uint8)
            self._w_non_edge_compute = self._w_non_edge / 255.0
        else:
            from .deriv import Laplacian
            lap = np.asarray(Laplacian(self._gray(image), K.CV_16S,
                                       ksize=3)).astype(np.int32)
            zc = np.ones((H, W), np.uint8)
            # zero-crossing placement: mark the smaller-|v| side
            # (intelligent_scissors.cpp:355 loop)
            for dy, dx in ((0, 1), (1, -1), (1, 0), (1, 1)):
                v = lap[:H - 1, (1 if dx == -1 else 0):
                        W - 1 + (1 if dx == -1 else 0)]
                yn = slice(dy, H - 1 + dy)
                xn = slice((1 if dx == -1 else 0) + dx,
                           W - 1 + (1 if dx == -1 else 0) + dx)
                nb = lap[yn, xn]
                opp = (v < 0) & (nb > 0) | (v > 0) & (nb < 0)
                closer_nb = np.abs(nb) < np.abs(v)
                ys, xs = np.nonzero(opp)
                base_x = xs + (1 if dx == -1 else 0)
                tx = np.where(closer_nb[ys, xs], base_x + dx, base_x)
                ty = np.where(closer_nb[ys, xs], ys + dy, ys)
                zc[ty, tx] = 0
            if self._zc_min_mag > 0:
                zc[mag < self._zc_min_mag] = 1
            self._non_edge = zc
            self._w_non_edge_compute = self._w_non_edge
        # gradient direction (unit vectors)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = np.where(mag > np.finfo(np.float32).eps, 1.0 / mag,
                           0.0)
        self._grad_dir = np.stack([Ix * inv, Iy * inv],
                                  axis=-1).astype(np.float32)
        # inverted normalized magnitude
        if self._mag_max > 0:
            m = np.minimum(mag, self._mag_max)
            max_m = self._mag_max
        else:
            m = mag
            max_m = float(mag.max())
        if max_m <= np.finfo(np.float32).eps:
            self._grad_mag = np.zeros((H, W), np.float32)
        else:
            self._grad_mag = (1.0 - m / max_m).astype(np.float32)
        self._paths = None

    def applyImageFeatures(self, non_edge, gradient_direction,
                           gradient_magnitude, image=None):
        ref = (non_edge if non_edge is not None else
               gradient_magnitude)
        H, W = np.asarray(ref).shape[:2]
        self._size = (H, W)
        self._non_edge = (np.asarray(non_edge, np.uint8)
                          if non_edge is not None
                          else np.zeros((H, W), np.uint8))
        self._w_non_edge_compute = self._w_non_edge
        self._grad_dir = (np.asarray(gradient_direction, np.float32)
                          if gradient_direction is not None
                          else np.zeros((H, W, 2), np.float32))
        self._grad_mag = (np.asarray(gradient_magnitude, np.float32)
                          if gradient_magnitude is not None
                          else np.zeros((H, W), np.float32))
        self._paths = None

    # -- graph search -------------------------------------------------
    def buildMap(self, sourcePt):
        if self._grad_mag is None:
            raise RuntimeError("applyImage() must be called first")
        H, W = self._size
        sx, sy = int(sourcePt[0]), int(sourcePt[1])
        paths = np.zeros((H, W), np.uint8)
        # float32 like the reference, and the heap carries the same
        # float32 values — mixed precision here can invert tie
        # comparisons on zero-cost edge chains and corrupt the path map
        cost_map = np.full((H, W), np.inf, np.float32)
        processed = np.zeros((H, W), bool)
        cost_map[sy, sx] = 0.0
        heap = [(0.0, sx, sy)]
        ne = self._non_edge
        gd = self._grad_dir
        gm = self._grad_mag
        wne = self._w_non_edge_compute
        wd = self._w_dir
        wm = self._w_mag
        at = _ACOS_TABLE
        while heap:
            cq, qx, qy = heapq.heappop(heap)
            if processed[qy, qx]:
                continue
            processed[qy, qx] = True
            for n, (dx, dy) in enumerate(_NEIGHBORS):
                rx, ry = qx + dx, qy + dy
                if not (0 <= rx < W and 0 <= ry < H):
                    continue
                cr = cost_map[ry, rx]
                if cr < cq:
                    continue
                cost = cq + wne * ne[ry, rx]
                if cost < cr:
                    diag = dx != 0 and dy != 0
                    fG = gm[ry, rx]
                    if not diag:
                        fG *= _SQRT2_INV
                    cost += wm * fG
                    if cost < cr:
                        ipx, ipy = gd[qy, qx]
                        iqx, iqy = gd[ry, rx]
                        dp = ipy * dx - ipx * dy
                        dq = iqy * dx - iqx * dy
                        if dp < 0:
                            dp, dq = -dp, -dq
                        if diag:
                            dp *= _SQRT2_INV
                            dq *= _SQRT2_INV
                        dpi = min(_ACOS_N, max(0, int(np.floor(
                            dp * _ACOS_N))))
                        dqi = min(_ACOS_N, max(-_ACOS_N, int(np.floor(
                            dq * _ACOS_N))))
                        fD = at[dpi + _ACOS_N] + at[dqi + _ACOS_N]
                        cost += wd * fD
                cost = np.float32(cost)
                if cost < cr:
                    cost_map[ry, rx] = cost
                    heapq.heappush(heap, (float(cost), rx, ry))
                    paths[ry, rx] = _ENCODE[n]
        self._paths = paths

    def getContour(self, targetPt, backward: bool = False):
        if self._paths is None:
            raise RuntimeError("buildMap() must be called first")
        H, W = self._size
        x, y = int(targetPt[0]), int(targetPt[1])
        out = []
        for _ in range(H * W):
            out.append((x, y))
            d = int(self._paths[y, x])
            if d == 0:
                break
            dx, dy = _NEIGHBORS[d - 1]
            x, y = x + dx, y + dy
        pts = np.asarray(out, np.int32)
        if not backward:
            pts = pts[::-1]
        return pts.reshape(-1, 2)
