"""HOG descriptor + people detection (objdetect/src/hog.cpp).

compute() follows the reference's exact window layout — blocks
column-major within the window, cells column-major within the block
(HOGCache histOfs = (x*nblocks.height + y)), trilinear cell
interpolation and Gaussian block weighting (winSigma=4), L2-Hys — so
the bundled INRIA people SVM (hog_detectors.npz, extracted from
getDefaultPeopleDetector) scores windows exactly as the reference
pipeline expects.  The per-block voting is a fixed (16,16) weight
stencil applied to all blocks at once.
"""

from __future__ import annotations

import os

import numpy as np

from ..core.arrays import to_batched

__all__ = ["HOGDescriptor", "groupRectangles"]

_DETECTORS = None


def _detectors():
    global _DETECTORS
    if _DETECTORS is None:
        path = os.path.join(os.path.dirname(__file__), "hog_detectors.npz")
        _DETECTORS = dict(np.load(path))
    return _DETECTORS


def groupRectangles(rectList, groupThreshold, eps=0.2):
    """cv2.groupRectangles: cluster similar rects, average, drop small
    clusters (objdetect/src/cascadedetect.cpp groupRectangles)."""
    rects = [list(map(float, r)) for r in rectList]
    n = len(rects)
    labels = [-1] * n
    nclass = 0

    def similar(a, b):
        delta = eps * (min(a[2], b[2]) + min(a[3], b[3])) * 0.5
        return (abs(a[0] - b[0]) <= delta and abs(a[1] - b[1]) <= delta
                and abs(a[0] + a[2] - b[0] - b[2]) <= delta
                and abs(a[1] + a[3] - b[1] - b[3]) <= delta)

    for i in range(n):
        if labels[i] >= 0:
            continue
        labels[i] = nclass
        for j in range(n):
            if labels[j] < 0 and similar(rects[i], rects[j]):
                labels[j] = nclass
        nclass += 1
    out = []
    weights = []
    for c in range(nclass):
        grp = [rects[i] for i in range(n) if labels[i] == c]
        if len(grp) <= groupThreshold:
            continue
        m = np.mean(grp, axis=0)
        out.append([int(round(v)) for v in m])
        weights.append(len(grp))
    return np.array(out, np.int32).reshape(-1, 4), \
        np.array(weights, np.int32)


class HOGDescriptor:
    def __init__(self, winSize=(64, 128), blockSize=(16, 16),
                 blockStride=(8, 8), cellSize=(8, 8), nbins=9):
        self.win_size = winSize
        self.block_size = blockSize
        self.block_stride = blockStride
        self.cell_size = cellSize
        self.nbins = nbins
        self.svm = None

    @staticmethod
    def getDefaultPeopleDetector():
        return _detectors()["default"].copy()

    @staticmethod
    def getDaimlerPeopleDetector():
        return _detectors()["daimler"].copy()

    def setSVMDetector(self, detector):
        self.svm = np.asarray(detector, np.float32).ravel()

    def getDescriptorSize(self):
        bw = (self.win_size[0] - self.block_size[0]) \
            // self.block_stride[0] + 1
        bh = (self.win_size[1] - self.block_size[1]) \
            // self.block_stride[1] + 1
        cells = (self.block_size[0] // self.cell_size[0]) \
            * (self.block_size[1] // self.cell_size[1])
        return bw * bh * cells * self.nbins

    # ------------------------------------------------- block histograms

    def _gradients(self, img):
        f = np.asarray(img, np.float32)
        # default gammaCorrection=true: sqrt LUT on intensities (hog.cpp:282)
        f = np.sqrt(f)
        if f.ndim == 3:
            # per-channel gradient, keep the strongest (hog.cpp
            # computeGradient)
            p = np.pad(f, ((1, 1), (1, 1), (0, 0)), mode="edge")
            gx = p[1:-1, 2:] - p[1:-1, :-2]
            gy = p[2:, 1:-1] - p[:-2, 1:-1]
            mag2 = gx * gx + gy * gy
            pick = np.argmax(mag2, axis=-1)
            ii, jj = np.mgrid[0:f.shape[0], 0:f.shape[1]]
            gx = gx[ii, jj, pick]
            gy = gy[ii, jj, pick]
        else:
            p = np.pad(f, 1, mode="edge")
            gx = p[1:-1, 2:] - p[1:-1, :-2]
            gy = p[2:, 1:-1] - p[:-2, 1:-1]
        mag = np.hypot(gx, gy)
        ang = np.arctan2(gy, gx)
        ang = np.where(ang < 0, ang + np.pi, ang)
        return mag, ang

    def _block_hists(self, img):
        """All block histograms over the image: (nby, nbx, bwc, bhc, 9)
        with cells already column-major within the block."""
        bw, bh = self.block_size
        sx, sy = self.block_stride
        cw, ch = self.cell_size
        nb = self.nbins
        mag, ang = self._gradients(img)
        H, W = mag.shape
        binf = ang * (nb / np.pi) - 0.5
        b0 = np.floor(binf)
        wb1 = (binf - b0).astype(np.float32)
        bin0 = (b0.astype(np.int64)) % nb
        bin1 = (bin0 + 1) % nb

        nbx = (W - bw) // sx + 1
        nby = (H - bh) // sy + 1
        bwc = bw // cw
        bhc = bh // ch

        # fixed per-pixel stencil within a block
        sigma = (bw + bh) / 8.0
        jj, ii = np.meshgrid(np.arange(bw), np.arange(bh))
        dj = jj - bw * 0.5
        di = ii - bh * 0.5
        gauss = np.exp(-(di * di + dj * dj) / (2 * sigma * sigma)
                       ).astype(np.float32)
        cxf = (jj - (cw - 1) * 0.5) / cw
        cyf = (ii - (ch - 1) * 0.5) / ch
        icx0 = np.floor(cxf).astype(int)
        icy0 = np.floor(cyf).astype(int)
        fx = (cxf - icx0).astype(np.float32)
        fy = (cyf - icy0).astype(np.float32)

        def windows(a):
            v = np.lib.stride_tricks.sliding_window_view(a, (bh, bw))
            return v[::sy, ::sx][:nby, :nbx]

        magw = windows(mag).astype(np.float32)   # (nby, nbx, bh, bw)
        b0w = windows(bin0)
        b1w = windows(bin1)
        w1w = windows(wb1)

        # one-hot vote volume per block pixel, then a single einsum
        # against the fixed (cell, pixel) trilinear+gaussian stencil
        P = bh * bw
        V = np.zeros((nby, nbx, P, nb), np.float32)
        m0 = (magw * (1 - w1w)).reshape(nby, nbx, P, 1)
        m1 = (magw * w1w).reshape(nby, nbx, P, 1)
        np.put_along_axis(V, b0w.reshape(nby, nbx, P, 1), m0, axis=-1)
        # bin1 != bin0 always, so a second put is safe where bins differ;
        # use add-style accumulation via take/put on a second buffer
        V1 = np.zeros_like(V)
        np.put_along_axis(V1, b1w.reshape(nby, nbx, P, 1), m1, axis=-1)
        V += V1
        # stencil: (bwc, bhc, P)
        S = np.zeros((bwc, bhc, P), np.float32)
        for dyc in (0, 1):
            for dxc in (0, 1):
                tcx = icx0 + dxc
                tcy = icy0 + dyc
                wxy = (fx if dxc else (1 - fx)) * (fy if dyc else (1 - fy))
                valid = (tcx >= 0) & (tcx < bwc) & (tcy >= 0) & (tcy < bhc)
                wmap = (wxy * gauss * valid)
                ys, xs = np.nonzero(valid)
                for i, j in zip(ys, xs):
                    S[tcx[i, j], tcy[i, j], i * bw + j] += wmap[i, j]
        hist = np.einsum("yxpb,cdp->yxcdb", V, S, optimize=True)

        # L2-Hys per block (normalizeBlockHistogram: 1/(sqrt(sum)+sz*0.1),
        # clip 0.2, then 1/(sqrt(sum)+1e-3))
        flat = hist.reshape(nby, nbx, -1)
        sz = flat.shape[-1]
        norm = np.sqrt((flat * flat).sum(-1, keepdims=True)) + sz * 0.1
        flat = np.minimum(flat / norm, 0.2)
        norm = np.sqrt((flat * flat).sum(-1, keepdims=True)) + 1e-3
        flat = flat / norm
        return flat.reshape(nby, nbx, bwc, bhc, nb)

    def _window_descriptors(self, hists, win_grid):
        """Assemble window descriptors; blocks column-major."""
        wbx = (self.win_size[0] - self.block_size[0]) \
            // self.block_stride[0] + 1
        wby = (self.win_size[1] - self.block_size[1]) \
            // self.block_stride[1] + 1
        descs = []
        for (by0, bx0) in win_grid:
            block = hists[by0:by0 + wby, bx0:bx0 + wbx]  # (wby, wbx, ...)
            descs.append(np.transpose(block, (1, 0, 2, 3, 4)).ravel())
        return np.stack(descs) if descs else np.zeros((0, 1), np.float32)

    def compute(self, img, winStride=None, padding=None, locations=None):
        x, _ = to_batched(img)
        arr = np.asarray(x[0, :, :, 0]) if x.shape[-1] == 1 \
            else np.asarray(x[0])
        hists = self._block_hists(arr)
        sx, sy = self.block_stride
        ws = winStride or self.win_size
        H, W = arr.shape[:2]
        grid = []
        if locations:
            for (px, py) in locations:
                grid.append((py // sy, px // sx))
        else:
            for y in range(0, H - self.win_size[1] + 1, ws[1]):
                for xx in range(0, W - self.win_size[0] + 1, ws[0]):
                    grid.append((y // sy, xx // sx))
        d = self._window_descriptors(hists, grid)
        return d.reshape(-1, 1).astype(np.float32)

    def detect(self, img, hitThreshold=0.0, winStride=(8, 8),
               padding=(0, 0)):
        assert self.svm is not None, "call setSVMDetector first"
        x, _ = to_batched(img)
        arr = np.asarray(x[0, :, :, 0]) if x.shape[-1] == 1 \
            else np.asarray(x[0])
        H, W = arr.shape[:2]
        if H < self.win_size[1] or W < self.win_size[0]:
            return [], []
        hists = self._block_hists(arr)
        sx, sy = self.block_stride
        grid = []
        locs = []
        for y in range(0, H - self.win_size[1] + 1, winStride[1]):
            for xx in range(0, W - self.win_size[0] + 1, winStride[0]):
                grid.append((y // sy, xx // sx))
                locs.append((xx, y))
        d = self._window_descriptors(hists, grid)
        w = self.svm[:-1]
        rho = self.svm[-1]
        scores = d @ w + rho
        found = [locs[i] for i in range(len(locs))
                 if scores[i] >= hitThreshold]
        weights = [float(scores[i]) for i in range(len(locs))
                   if scores[i] >= hitThreshold]
        return found, weights

    def detectMultiScale(self, img, hitThreshold=0.0, winStride=(8, 8),
                         padding=(0, 0), scale=1.05, groupThreshold=2.0,
                         useMeanshiftGrouping=False):
        from ..ops.resize import resize
        from .. import constants as K
        arr = np.asarray(img)
        H, W = arr.shape[:2]
        rects = []
        weights = []
        s = 1.0
        while W / s >= self.win_size[0] and H / s >= self.win_size[1]:
            if s == 1.0:
                scaled = arr
            else:
                scaled = np.asarray(resize(
                    arr, (int(W / s), int(H / s)),
                    interpolation=K.INTER_LINEAR))
            locs, ws = self.detect(scaled, hitThreshold, winStride)
            for (xx, y), wgt in zip(locs, ws):
                rects.append((int(xx * s), int(y * s),
                              int(self.win_size[0] * s),
                              int(self.win_size[1] * s)))
                weights.append(wgt)
            s *= scale
        if groupThreshold > 0 and rects:
            grouped, counts = groupRectangles(
                rects, int(groupThreshold) - 1, 0.2)
            return grouped, counts.astype(np.float64)
        return np.array(rects, np.int32).reshape(-1, 4), \
            np.array(weights)
