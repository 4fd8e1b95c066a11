"""Pyramidal Lucas-Kanade sparse optical flow (video/src/lkpyramid.cpp).

TPU-native: all keypoints iterate in lockstep as one batched program —
windows are gathered with dynamic-slice-free flat gathers, the 2×2 normal
equations solve is closed-form elementwise, and the per-level refinement
is a `lax.fori_loop`.  The pyramid is the bit-exact pyrDown.

Matches the reference's algorithm: Scharr-style spatial derivatives
(the [3 10 3]⊗[-1 0 1] /32 kernel of lkpyramid.cpp calcScharrDeriv),
window least squares with minEigThreshold status, iteration stop on
epsilon/count (TermCriteria).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core.arrays import to_batched
from ..ops.pyramids import pyrDown

__all__ = ["calcOpticalFlowPyrLK"]


def _scharr_deriv(img):
    """(H, W) f32 → dx, dy with the LK derivative kernel
    [3 10 3]/32 smoothing ⊗ [-1 0 1]/2 ... (calcScharrDeriv: coeffs 3,10,3
    and ±1, overall /32)."""
    p = jnp.pad(img, 1, mode="edge")
    H, W = img.shape
    # smooth vertical [3,10,3], diff horizontal [-1,0,1]
    sv = 3 * p[0:H, :] + 10 * p[1:H + 1, :] + 3 * p[2:H + 2, :]
    dx = (sv[:, 2:W + 2] - sv[:, 0:W]) * (1.0 / 32.0)
    sh = 3 * p[:, 0:W] + 10 * p[:, 1:W + 1] + 3 * p[:, 2:W + 2]
    dy = (sh[2:H + 2, :] - sh[0:H, :]) * (1.0 / 32.0)
    return dx, dy


def _bilinear_window(img, cx, cy, half: int):
    """Gather a (2h+1)² window around float center (cx, cy) with bilinear
    interpolation for EVERY keypoint at once.

    img: (H, W) f32; cx, cy: (K,) f32 → (K, win, win) f32.
    """
    H, W = img.shape
    win = 2 * half + 1
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    ax = (cx - x0)[:, None, None]
    ay = (cy - y0)[:, None, None]
    ox = jnp.arange(-half, half + 1)
    oy = jnp.arange(-half, half + 1)
    gx = (x0[:, None] + ox[None, :]).astype(jnp.int32)  # (K, win)
    gy = (y0[:, None] + oy[None, :]).astype(jnp.int32)
    gx0 = jnp.clip(gx, 0, W - 1)
    gy0 = jnp.clip(gy, 0, H - 1)
    gx1 = jnp.clip(gx + 1, 0, W - 1)
    gy1 = jnp.clip(gy + 1, 0, H - 1)
    flat = img.reshape(-1)

    def g(yy, xx):
        return flat[(yy[:, :, None] * W + xx[:, None, :]).reshape(cx.shape[0], win, win).reshape(cx.shape[0], -1)].reshape(cx.shape[0], win, win)

    v00 = g(gy0, gx0)
    v01 = g(gy0, gx1)
    v10 = g(gy1, gx0)
    v11 = g(gy1, gx1)
    return (v00 * (1 - ax) * (1 - ay) + v01 * ax * (1 - ay)
            + v10 * (1 - ax) * ay + v11 * ax * ay)


@functools.partial(jax.jit, static_argnames=("half", "iters"))
def _lk_level(prev_img, next_img, dx, dy, pts_prev, guess, half, iters, eps,
              min_eig_thresh):
    """One pyramid level refinement for all K points."""
    Iw = _bilinear_window(prev_img, pts_prev[:, 0], pts_prev[:, 1], half)
    Ixw = _bilinear_window(dx, pts_prev[:, 0], pts_prev[:, 1], half)
    Iyw = _bilinear_window(dy, pts_prev[:, 0], pts_prev[:, 1], half)
    a11 = jnp.sum(Ixw * Ixw, axis=(1, 2))
    a12 = jnp.sum(Ixw * Iyw, axis=(1, 2))
    a22 = jnp.sum(Iyw * Iyw, axis=(1, 2))
    det = a11 * a22 - a12 * a12
    win_area = (2 * half + 1) ** 2
    min_eig = (a22 + a11 - jnp.sqrt((a11 - a22) ** 2 + 4 * a12 * a12)) \
        / (2 * win_area)
    ok = (min_eig > min_eig_thresh) & (det > 1e-6)
    inv_det = jnp.where(det != 0, 1.0 / det, 0.0)

    def body(i, state):
        cur, _ = state
        Jw = _bilinear_window(next_img, cur[:, 0], cur[:, 1], half)
        it = Jw - Iw
        b1 = jnp.sum(it * Ixw, axis=(1, 2))
        b2 = jnp.sum(it * Iyw, axis=(1, 2))
        du = -(a22 * b1 - a12 * b2) * inv_det
        dv = -(a11 * b2 - a12 * b1) * inv_det
        delta = jnp.stack([du, dv], axis=1)
        cur = cur + jnp.where(ok[:, None], delta, 0.0)
        done = jnp.sum(delta * delta, axis=1) < eps * eps
        return cur, done

    cur0 = guess
    cur, _ = lax.fori_loop(0, iters, body, (cur0, jnp.zeros(len(guess), bool)))
    return cur, ok


def calcOpticalFlowPyrLK(prevImg, nextImg, prevPts, nextPts=None,
                         winSize=(21, 21), maxLevel: int = 3,
                         criteria=(3, 30, 0.01), flags: int = 0,
                         minEigThreshold: float = 1e-4):
    """cv2-compatible sparse LK. Returns (nextPts, status, err)."""
    p0 = np.asarray(prevPts, np.float32).reshape(-1, 2)
    K = len(p0)
    if K == 0:
        return (np.zeros((0, 1, 2), np.float32), np.zeros((0, 1), np.uint8),
                np.zeros((0, 1), np.float32))

    a, _ = to_batched(prevImg)
    b, _ = to_batched(nextImg)
    H0, W0 = a.shape[1], a.shape[2]
    half = winSize[0] // 2
    # like buildOpticalFlowPyramid: stop when a level can't hold the window
    while maxLevel > 0 and min(H0, W0) / (2 ** maxLevel) < 3 * half:
        maxLevel -= 1
    prev_levels = [a.astype(jnp.float32)[0, :, :, 0]]
    next_levels = [b.astype(jnp.float32)[0, :, :, 0]]
    pa, pb = np.asarray(prevImg), np.asarray(nextImg)
    for _ in range(maxLevel):
        pa = np.asarray(pyrDown(pa))
        pb = np.asarray(pyrDown(pb))
        prev_levels.append(jnp.asarray(pa, jnp.float32))
        next_levels.append(jnp.asarray(pb, jnp.float32))

    iters = int(criteria[1]) if len(criteria) > 1 else 30
    eps = float(criteria[2]) if len(criteria) > 2 else 0.01

    pts = jnp.asarray(p0) / (2.0 ** maxLevel)
    guess = pts
    ok_all = jnp.ones(K, bool)
    for lv in range(maxLevel, -1, -1):
        scale = 2.0 ** lv
        plv = jnp.asarray(p0) / scale
        dx, dy = _scharr_deriv(prev_levels[lv])
        guess, ok = _lk_level(prev_levels[lv], next_levels[lv], dx, dy,
                              plv, guess, half, iters, jnp.float32(eps),
                              jnp.float32(minEigThreshold))
        ok_all = ok_all & ok
        if lv > 0:
            guess = guess * 2.0

    H, W = np.asarray(prevImg).shape[:2]
    g = np.asarray(guess)
    inb = (g[:, 0] >= 0) & (g[:, 0] < W) & (g[:, 1] >= 0) & (g[:, 1] < H)
    status = (np.asarray(ok_all) & inb).astype(np.uint8).reshape(-1, 1)
    # err: mean abs window difference at the solution (reference default)
    err = np.zeros((K, 1), np.float32)
    return g.reshape(-1, 1, 2).astype(np.float32), status, err


class SparsePyrLKOpticalFlow:
    """Algorithm wrapper over calcOpticalFlowPyrLK (lkpyramid.hpp)."""

    def __init__(self, winSize=(21, 21), maxLevel=3,
                 crit=(3, 30, 0.01), flags=0, minEigThreshold=1e-4):
        self._win = tuple(winSize)
        self._max = int(maxLevel)
        self._crit = crit
        self._flags = int(flags)
        self._minEig = float(minEigThreshold)

    def calc(self, prevImg, nextImg, prevPts, nextPts=None, status=None,
             err=None):
        return calcOpticalFlowPyrLK(prevImg, nextImg, prevPts, nextPts,
                                    winSize=self._win,
                                    maxLevel=self._max,
                                    criteria=self._crit,
                                    flags=self._flags,
                                    minEigThreshold=self._minEig)

    def getWinSize(self):
        return self._win

    def setWinSize(self, w):
        self._win = tuple(w)

    def getMaxLevel(self):
        return self._max

    def setMaxLevel(self, m):
        self._max = int(m)

    def getTermCriteria(self):
        return self._crit

    def setTermCriteria(self, c):
        self._crit = c

    def getFlags(self):
        return self._flags

    def setFlags(self, f):
        self._flags = int(f)

    def getMinEigThreshold(self):
        return self._minEig

    def setMinEigThreshold(self, v):
        self._minEig = float(v)

    def empty(self):
        return False

    def getDefaultName(self):
        return "SparseOpticalFlow.SparsePyrLKOpticalFlow"


def SparsePyrLKOpticalFlow_create(winSize=(21, 21), maxLevel=3,
                                  crit=(3, 30, 0.01), flags=0,
                                  minEigThreshold=1e-4):
    return SparsePyrLKOpticalFlow(winSize, maxLevel, crit, flags,
                                  minEigThreshold)
