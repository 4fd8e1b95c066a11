"""GrabCut segmentation (imgproc/src/grabcut.cpp).

TPU/host split: per-pixel GMM likelihoods, component assignment and the
n-link weight fields are dense vectorized math (numpy f64, identical
formulas to GMM::operator() and calcNWeights); the min-cut runs in the
native host-tail library (Dinic on the 8-neighbor grid — the role of
the reference's GCGraph max-flow).
"""

from __future__ import annotations

import numpy as np

from .. import constants as K
from ..native import maxflow_grid
from .cluster import kmeans, KMEANS_PP_CENTERS

__all__ = ["grabCut", "GC_BGD", "GC_FGD", "GC_PR_BGD", "GC_PR_FGD",
           "GC_INIT_WITH_RECT", "GC_INIT_WITH_MASK", "GC_EVAL"]

GC_BGD = 0
GC_FGD = 1
GC_PR_BGD = 2
GC_PR_FGD = 3
GC_INIT_WITH_RECT = 0
GC_INIT_WITH_MASK = 1
GC_EVAL = 2
GC_EVAL_FREEZE_MODEL = 3

_NCOMP = 5


class _GMM:
    """Vectorized 5-component full-covariance GMM (grabcut.cpp:60)."""

    def __init__(self, model=None):
        self.coefs = np.zeros(_NCOMP)
        self.means = np.zeros((_NCOMP, 3))
        self.covs = np.zeros((_NCOMP, 3, 3))
        self.icovs = np.zeros((_NCOMP, 3, 3))
        self.dets = np.ones(_NCOMP)
        if model is not None and np.asarray(model).size == 13 * _NCOMP:
            m = np.asarray(model, np.float64).ravel()
            self.coefs = m[:_NCOMP].copy()
            self.means = m[_NCOMP:4 * _NCOMP].reshape(_NCOMP, 3).copy()
            self.covs = m[4 * _NCOMP:].reshape(_NCOMP, 3, 3).copy()
            for ci in range(_NCOMP):
                if self.coefs[ci] > 0:
                    self._inv(ci, 0.0)

    def _inv(self, ci, fix):
        c = self.covs[ci]
        det = np.linalg.det(c)
        if det <= 1e-6 and fix > 0:
            c = c + np.eye(3) * fix
            self.covs[ci] = c
            det = np.linalg.det(c)
        self.dets[ci] = det
        self.icovs[ci] = np.linalg.inv(c)

    def pdf_comp(self, colors):
        """(N, 3) -> (N, K) per-component likelihoods."""
        out = np.zeros((len(colors), _NCOMP))
        for ci in range(_NCOMP):
            if self.coefs[ci] <= 0:
                continue
            d = colors - self.means[ci]
            mult = np.einsum("ni,ij,nj->n", d, self.icovs[ci], d)
            out[:, ci] = np.exp(-0.5 * mult) / np.sqrt(self.dets[ci])
        return out

    def pdf(self, colors):
        return self.pdf_comp(colors) @ self.coefs

    def which(self, colors):
        return np.argmax(self.pdf_comp(colors), axis=1)

    def learn(self, colors, comp):
        total = len(colors)
        for ci in range(_NCOMP):
            sel = colors[comp == ci]
            n = len(sel)
            if n == 0:
                self.coefs[ci] = 0
                continue
            self.coefs[ci] = n / total
            mu = sel.mean(axis=0)
            self.means[ci] = mu
            self.covs[ci] = sel.T @ sel / n - np.outer(mu, mu)
            self._inv(ci, 0.01)

    def pack(self):
        return np.concatenate([self.coefs, self.means.ravel(),
                               self.covs.reshape(_NCOMP, 9).ravel()]
                              ).reshape(1, -1)


def _nweights(img, beta, gamma):
    c = img.astype(np.float64)
    g2 = gamma / np.sqrt(2.0)
    dif = lambda a, b: np.sum((a - b) ** 2, axis=-1)
    H, W = img.shape[:2]
    left = np.zeros((H, W))
    upleft = np.zeros((H, W))
    up = np.zeros((H, W))
    upright = np.zeros((H, W))
    left[:, 1:] = gamma * np.exp(-beta * dif(c[:, 1:], c[:, :-1]))
    upleft[1:, 1:] = g2 * np.exp(-beta * dif(c[1:, 1:], c[:-1, :-1]))
    up[1:] = gamma * np.exp(-beta * dif(c[1:], c[:-1]))
    upright[1:, :-1] = g2 * np.exp(-beta * dif(c[1:, :-1], c[:-1, 1:]))
    return left, upleft, up, upright


def _calc_beta(img):
    c = img.astype(np.float64)
    H, W = img.shape[:2]
    s = np.sum((c[:, 1:] - c[:, :-1]) ** 2) \
        + np.sum((c[1:, 1:] - c[:-1, :-1]) ** 2) \
        + np.sum((c[1:] - c[:-1]) ** 2) \
        + np.sum((c[1:, :-1] - c[:-1, 1:]) ** 2)
    if s <= np.finfo(np.float64).eps:
        return 0.0
    return 1.0 / (2 * s / (4 * W * H - 3 * W - 3 * H + 2))


def _py_maxflow(srcw, snkw, left, upleft, up, upright):
    """Tiny pure-python Dinic fallback (slow; small images only)."""
    H, W = srcw.shape
    N = H * W
    import collections
    graph = [[] for _ in range(N + 2)]

    def add(a, b, cab, cba):
        graph[a].append([b, cab, len(graph[b])])
        graph[b].append([a, cba, len(graph[a]) - 1])

    S, T = N, N + 1
    for i in range(N):
        if srcw.flat[i] > 0:
            add(S, i, srcw.flat[i], 0)
        if snkw.flat[i] > 0:
            add(i, T, snkw.flat[i], 0)
    for y in range(H):
        for x in range(W):
            i = y * W + x
            if x > 0 and left[y, x] > 0:
                add(i, i - 1, left[y, x], left[y, x])
            if x > 0 and y > 0 and upleft[y, x] > 0:
                add(i, i - W - 1, upleft[y, x], upleft[y, x])
            if y > 0 and up[y, x] > 0:
                add(i, i - W, up[y, x], up[y, x])
            if x < W - 1 and y > 0 and upright[y, x] > 0:
                add(i, i - W + 1, upright[y, x], upright[y, x])

    def bfs():
        level = [-1] * (N + 2)
        level[S] = 0
        q = collections.deque([S])
        while q:
            v = q.popleft()
            for e in graph[v]:
                if e[1] > 1e-12 and level[e[0]] < 0:
                    level[e[0]] = level[v] + 1
                    q.append(e[0])
        return level if level[T] >= 0 else None

    def dfs(level, it, v, f):
        if v == T:
            return f
        while it[v] < len(graph[v]):
            e = graph[v][it[v]]
            if e[1] > 1e-12 and level[v] < level[e[0]]:
                d = dfs(level, it, e[0], min(f, e[1]))
                if d > 0:
                    e[1] -= d
                    graph[e[0]][e[2]][1] += d
                    return d
            it[v] += 1
        return 0

    import sys
    sys.setrecursionlimit(10000 + N)
    while True:
        level = bfs()
        if level is None:
            break
        it = [0] * (N + 2)
        while dfs(level, it, S, float("inf")) > 0:
            pass
    vis = np.zeros(N + 2, bool)
    q = collections.deque([S])
    vis[S] = True
    while q:
        v = q.popleft()
        for e in graph[v]:
            if e[1] > 1e-12 and not vis[e[0]]:
                vis[e[0]] = True
                q.append(e[0])
    return vis[:N].reshape(H, W)


def grabCut(img, mask, rect, bgdModel=None, fgdModel=None, iterCount=1,
            mode=GC_EVAL):
    """cv2.grabCut (imgproc/src/grabcut.cpp:548); mutates and returns
    (mask, bgdModel, fgdModel)."""
    img = np.asarray(img)
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    H, W = img.shape[:2]
    mask = np.asarray(mask) if mask is not None and np.asarray(mask).size \
        else np.zeros((H, W), np.uint8)
    mask = mask.astype(np.uint8).copy()

    colors = img.reshape(-1, 3).astype(np.float64)
    bgd = _GMM(bgdModel if bgdModel is not None
               and np.asarray(bgdModel).size else None)
    fgd = _GMM(fgdModel if fgdModel is not None
               and np.asarray(fgdModel).size else None)

    if mode == GC_INIT_WITH_RECT:
        mask[:] = GC_BGD
        x, y, w, h = rect
        x0, y0 = max(0, x), max(0, y)
        mask[y0:min(H, y + h), x0:min(W, x + w)] = GC_PR_FGD
    if mode in (GC_INIT_WITH_RECT, GC_INIT_WITH_MASK):
        bgd_idx = (mask == GC_BGD) | (mask == GC_PR_BGD)
        fgd_idx = ~bgd_idx
        for gmm, sel in ((bgd, bgd_idx), (fgd, fgd_idx)):
            samples = colors[sel.ravel()]
            kk = min(_NCOMP, len(samples))
            _, labels, _ = kmeans(samples.astype(np.float32), kk, None,
                                  (1, 10, 0.0), 3, KMEANS_PP_CENTERS)
            gmm.learn(samples, labels.ravel())

    if iterCount <= 0:
        return mask, bgd.pack(), fgd.pack()

    gamma = 50.0
    lam = 9 * gamma
    beta = _calc_beta(img)
    left, upleft, up, upright = _nweights(img, beta, gamma)

    for _ in range(max(iterCount, 1)):
        bgd_idx = (mask == GC_BGD) | (mask == GC_PR_BGD)
        if mode != GC_EVAL_FREEZE_MODEL:
            comp = np.where(bgd_idx.ravel(), bgd.which(colors),
                            fgd.which(colors))
            bgd.learn(colors[bgd_idx.ravel()], comp[bgd_idx.ravel()])
            fgd.learn(colors[~bgd_idx.ravel()], comp[~bgd_idx.ravel()])

        pb = np.maximum(bgd.pdf(colors), 1e-300).reshape(H, W)
        pf = np.maximum(fgd.pdf(colors), 1e-300).reshape(H, W)
        src = np.where((mask == GC_PR_BGD) | (mask == GC_PR_FGD),
                       -np.log(pb), np.where(mask == GC_BGD, 0.0, lam))
        snk = np.where((mask == GC_PR_BGD) | (mask == GC_PR_FGD),
                       -np.log(pf), np.where(mask == GC_BGD, lam, 0.0))
        fg = maxflow_grid(src, snk, left, upleft, up, upright)
        if fg is None:
            fg = _py_maxflow(src, snk, left, upleft, up, upright)
        soft = (mask == GC_PR_BGD) | (mask == GC_PR_FGD)
        mask = np.where(soft, np.where(fg, GC_PR_FGD, GC_PR_BGD),
                        mask).astype(np.uint8)

    return mask, bgd.pack(), fgd.pack()
