"""Stereo block matching (calib3d/src/stereobm.cpp).

TPU-native: the disparity search is a static loop over D candidates —
each candidate's SAD is a box sum of |L - shift(R)| (cumsum windows) and
the winner is a running min — the whole matcher is one fused device
program (the reference's per-row SIMD loops become VPU lanes over the
full image).  Includes the prefilter (x-Sobel clipped) and uniqueness /
texture checks of StereoBM.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.arrays import to_batched

__all__ = ["StereoBM", "StereoBM_create", "StereoSGBM_create"]


def _box(x, k):
    c = jnp.cumsum(jnp.cumsum(x, axis=0), axis=1)
    c = jnp.pad(c, ((1, 0), (1, 0)))
    H = x.shape[0] - k + 1
    W = x.shape[1] - k + 1
    return (c[k:k + H, k:k + W] - c[k:k + H, 0:W]
            - c[0:H, k:k + W] + c[0:H, 0:W])


@functools.partial(jax.jit, static_argnames=("ndisp", "block", "prefilter_cap",
                                             "texture_thresh", "uniqueness"))
def _stereo_bm(left, right, ndisp, block, prefilter_cap, texture_thresh,
               uniqueness):
    L = left.astype(jnp.float32)
    R = right.astype(jnp.float32)
    H, W = L.shape

    # prefilter: clipped x-Sobel (prefilterXSobel)
    def prefilter(img):
        p = jnp.pad(img, 1, mode="edge")
        d = (p[1:H + 1, 2:W + 2] - p[1:H + 1, 0:W]) * 2 \
            + (p[0:H, 2:W + 2] - p[0:H, 0:W]) \
            + (p[2:H + 2, 2:W + 2] - p[2:H + 2, 0:W])
        return jnp.clip(d, -prefilter_cap, prefilter_cap) + prefilter_cap

    Lf = prefilter(L)
    Rf = prefilter(R)

    r = block // 2
    Lp = jnp.pad(Lf, r, mode="edge")
    Rp = jnp.pad(Rf, r, mode="edge")

    INF = jnp.float32(1e18)
    best = jnp.full((H, W), INF)
    best_d = jnp.zeros((H, W), jnp.int32)
    second = jnp.full((H, W), INF)

    sads = []
    for d in range(ndisp):
        Rs = jnp.pad(Rp, ((0, 0), (d, 0)))[:, :Rp.shape[1]]
        sad = _box(jnp.abs(Lp - Rs), block)
        sads.append(sad)
    sadstack = jnp.stack(sads)          # (D, H, W)
    best_d = jnp.argmin(sadstack, axis=0)
    best = jnp.min(sadstack, axis=0)
    # uniqueness: second-best outside ±1 of the winner
    dd = jnp.arange(ndisp)[:, None, None]
    near = jnp.abs(dd - best_d[None]) <= 1
    second = jnp.min(jnp.where(near, INF, sadstack), axis=0)
    unique_ok = best * (100 + uniqueness) <= second * 100

    # texture check: sum of |prefiltered - cap| over the window
    tex = _box(jnp.abs(Lp - prefilter_cap), block)
    tex_ok = tex >= texture_thresh

    # subpixel: parabola fit over (d-1, d, d+1)
    d0 = jnp.clip(best_d, 1, ndisp - 2)
    sm = jnp.take_along_axis(sadstack, (d0 - 1)[None], axis=0)[0]
    s0 = jnp.take_along_axis(sadstack, d0[None], axis=0)[0]
    sp = jnp.take_along_axis(sadstack, (d0 + 1)[None], axis=0)[0]
    denom = jnp.maximum(sm + sp - 2 * s0, 1e-6)
    frac = jnp.clip((sm - sp) / (2 * denom), -0.5, 0.5)
    disp = best_d.astype(jnp.float32) + jnp.where(
        (best_d >= 1) & (best_d <= ndisp - 2), frac, 0.0)

    # invalidate: left strip (no search room), checks
    xs = jnp.arange(W)[None, :]
    valid = unique_ok & tex_ok & (xs >= ndisp + r)
    out = jnp.where(valid, disp * 16.0, -16.0)
    return out.astype(jnp.int16)


class StereoBM:
    def __init__(self, numDisparities=64, blockSize=21):
        self.ndisp = numDisparities
        self.block = blockSize
        self.prefilter_cap = 31
        self.texture_threshold = 10
        self.uniqueness = 15

    @staticmethod
    def create(numDisparities=64, blockSize=21):
        return StereoBM(numDisparities, blockSize)

    def setNumDisparities(self, n):
        self.ndisp = n

    def setBlockSize(self, b):
        self.block = b

    def setTextureThreshold(self, t):
        self.texture_threshold = t

    def setUniquenessRatio(self, u):
        self.uniqueness = u

    def compute(self, left, right):
        lx, _ = to_batched(left)
        rx, _ = to_batched(right)
        out = _stereo_bm(lx[0, :, :, 0], rx[0, :, :, 0], self.ndisp,
                         self.block, self.prefilter_cap,
                         self.texture_threshold, self.uniqueness)
        return np.asarray(out)


def StereoBM_create(numDisparities=64, blockSize=21):
    return StereoBM(numDisparities, blockSize)


def StereoSGBM_create(minDisparity=0, numDisparities=64, blockSize=11,
                      **kwargs):
    """Round-1 placeholder: SGBM's path aggregation is a scan-based
    follow-up; block matching serves the API meanwhile."""
    return StereoBM(numDisparities, blockSize)
