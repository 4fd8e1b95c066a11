"""Haar cascade detection (objdetect/src/cascadedetect.cpp).

Loads the reference's new-format cascade XMLs (stump boosted stages)
and evaluates them windows-at-once: per pyramid scale, one integral /
squared-integral pair, every surviving window's feature sums are
batched integral gathers, and stages prune the window set vectorized —
the branchy per-window loop of the reference becomes dense masked math.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np

from .. import constants as K
from ..ops.color import cvtColor
from .hog import groupRectangles

__all__ = ["CascadeClassifier"]


class _Stump:
    __slots__ = ("feat", "thr", "left", "right")


class CascadeClassifier:
    def __init__(self, filename=None):
        self._stages = None
        if filename:
            self.load(filename)

    def empty(self):
        return self._stages is None

    def load(self, filename):
        root = ET.parse(filename).getroot()
        casc = root.find("cascade")
        if casc is None:
            return False
        assert casc.find("featureType").text.strip() == "HAAR", \
            "only HAAR cascades supported"
        self._w = int(casc.find("width").text)
        self._h = int(casc.find("height").text)

        feats = []
        tilts = []
        for f in casc.find("features"):
            rects = []
            for r in f.find("rects"):
                vals = r.text.split()
                x, y, w, h = map(int, vals[:4])
                wt = float(vals[4])
                rects.append((x, y, w, h, wt))
            tilted = f.find("tilted")
            tilts.append(bool(tilted is not None and int(tilted.text)))
            feats.append(rects)
        self._features = feats
        self._tilted = tilts
        self._has_tilted = any(tilts)

        stages = []
        for st in casc.find("stages"):
            thr = float(st.find("stageThreshold").text)
            stumps = []
            for wc in st.find("weakClassifiers"):
                nodes = wc.find("internalNodes").text.split()
                leaves = [float(v) for v in
                          wc.find("leafValues").text.split()]
                s = _Stump()
                s.feat = int(nodes[2])
                s.thr = float(nodes[3])
                s.left = leaves[0]
                s.right = leaves[1]
                stumps.append(s)
            stages.append((thr, stumps))
        self._stages = stages
        return True

    def _detect_single_scale(self, ii, ii2, H, W, step, ti=None):
        """Returns surviving window top-left coords at this scale."""
        w, h = self._w, self._h
        xs = np.arange(0, W - w + 1, step)
        ys = np.arange(0, H - h + 1, step)
        gx, gy = np.meshgrid(xs, ys)
        X = gx.ravel()
        Y = gy.ravel()

        def rect_sum(I, x0, y0, rw, rh):
            return (I[Y + y0 + rh, X + x0 + rw] - I[Y + y0 + rh, X + x0]
                    - I[Y + y0, X + x0 + rw] + I[Y + y0, X + x0])

        # variance normalization over the inner (1,1,w-2,h-2) rect
        area = (w - 2) * (h - 2)
        s1 = rect_sum(ii, 1, 1, w - 2, h - 2)
        s2 = rect_sum(ii2, 1, 1, w - 2, h - 2)
        mean = s1 / area
        var = s2 / area - mean * mean
        nf = np.sqrt(np.maximum(var, 0.0))
        nf = np.where(nf > 1e-10, nf, 1.0) * area

        alive = np.ones(len(X), bool)
        for thr, stumps in self._stages:
            if not alive.any():
                break
            idx = np.nonzero(alive)[0]
            Xa = X[idx]
            Ya = Y[idx]

            def rsum_a(x0, y0, rw, rh):
                return (ii[Ya + y0 + rh, Xa + x0 + rw]
                        - ii[Ya + y0 + rh, Xa + x0]
                        - ii[Ya + y0, Xa + x0 + rw]
                        + ii[Ya + y0, Xa + x0])

            def tsum_a(x0, y0, rw, rh):
                # 45-deg rotated rect sum over the tilted SAT
                # (haar.cpp CV_TILTED_PTRS / HaarEvaluator setImage)
                return (ti[Ya + y0, Xa + x0]
                        - ti[Ya + y0 + rh, Xa + x0 - rh]
                        - ti[Ya + y0 + rw, Xa + x0 + rw]
                        + ti[Ya + y0 + rw + rh, Xa + x0 + rw - rh])

            nfa = nf[idx]
            ssum = np.zeros(len(idx))
            for s in stumps:
                fv = np.zeros(len(idx))
                fsum = tsum_a if self._tilted[s.feat] else rsum_a
                for (x0, y0, rw, rh, wt) in self._features[s.feat]:
                    fv += wt * fsum(x0, y0, rw, rh)
                ssum += np.where(fv < s.thr * nfa, s.left, s.right)
            alive[idx] = ssum > thr - 1e-7
        return X[alive], Y[alive]

    def detectMultiScale(self, image, scaleFactor=1.1, minNeighbors=3,
                         flags=0, minSize=None, maxSize=None):
        from ..ops.resize import resize
        img = np.asarray(image)
        if img.ndim == 3:
            gray = np.asarray(cvtColor(img, K.COLOR_BGR2GRAY))
        else:
            gray = img
        H0, W0 = gray.shape
        rects = []
        scale = 1.0
        while True:
            w = int(round(self._w * scale))
            h = int(round(self._h * scale))
            if w > W0 or h > H0:
                break
            if (maxSize and maxSize[0] and
                    (w > maxSize[0] or h > maxSize[1])):
                break
            if not (minSize and minSize[0] and
                    (w < minSize[0] or h < minSize[1])):
                sw = int(round(W0 / scale))
                sh = int(round(H0 / scale))
                scaled = np.asarray(resize(gray, (sw, sh),
                                           interpolation=K.INTER_LINEAR)
                                    ).astype(np.float64)
                ii = np.zeros((sh + 1, sw + 1))
                ii[1:, 1:] = scaled.cumsum(0).cumsum(1)
                ii2 = np.zeros((sh + 1, sw + 1))
                ii2[1:, 1:] = (scaled ** 2).cumsum(0).cumsum(1)
                ti = None
                if getattr(self, "_has_tilted", False):
                    from ..ops.integral import integral3
                    _, _, t = integral3(scaled.astype(np.uint8))
                    ti = np.asarray(t, np.float64)
                step = 1 if scale < 2 else 2
                X, Y = self._detect_single_scale(ii, ii2, sh, sw, step,
                                                 ti=ti)
                for x, y in zip(X, Y):
                    rects.append((int(round(x * scale)),
                                  int(round(y * scale)), w, h))
            scale *= scaleFactor
        if minNeighbors > 0:
            out, _ = groupRectangles(rects, minNeighbors, 0.2)
            return out
        return np.array(rects, np.int32).reshape(-1, 4)
