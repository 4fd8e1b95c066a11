"""Background subtraction — Zivkovic adaptive GMM (MOG2)
(video/src/bgfg_gaussmix2.cpp).

TPU-native: the per-pixel mixture state lives as (N, H, W, K) device
arrays and the whole update is ONE fused elementwise program per frame —
the reference's per-pixel scalar loop is exactly the kind of code the VPU
eats. The apply() step is jitted once and reused.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.arrays import to_batched, from_batched

__all__ = ["BackgroundSubtractorMOG2", "createBackgroundSubtractorMOG2"]


@functools.partial(jax.jit, static_argnames=("nmixtures", "detect_shadows"))
def _mog2_step(frame, weights, means, variances, nmixtures,
               lr, var_thresh, var_thresh_gen, var_init, var_min, var_max,
               back_ratio, shadow_thresh, detect_shadows, ct):
    """One MOG2 update. frame: (N,H,W,C) f32; state: (N,H,W,K[,C])."""
    x = frame[..., None, :]                       # (N,H,W,1,C)
    d = x - means                                  # (N,H,W,K,C)
    dist2 = jnp.sum(d * d, axis=-1)                # (N,H,W,K)

    # sort order is maintained incrementally in the reference; we keep
    # modes sorted by weight after each update (equivalent steady state)
    fits_gen = dist2 < var_thresh_gen * variances
    fits_bg = dist2 < var_thresh * variances

    # first fitting mode (by current order)
    fit_any = jnp.any(fits_gen, axis=-1)
    first_fit = jnp.argmax(fits_gen, axis=-1)      # (N,H,W)
    K = nmixtures
    onehot = jax.nn.one_hot(first_fit, K, dtype=frame.dtype) \
        * fit_any[..., None]

    # weight update: w += lr*(o - w) - lr*ct  (prune term)
    w = weights + lr * (onehot - weights) - lr * ct
    # mean/var update for the matched mode
    k_rate = (lr / jnp.maximum(weights, 1e-6)) * onehot
    k_rate = jnp.minimum(k_rate, 1.0)[..., None]
    means_new = means + k_rate * d
    var_new = variances + k_rate[..., 0] * (dist2 - variances)
    var_new = jnp.clip(var_new, var_min, var_max)

    # no fit → replace weakest mode with a new one centered at x
    weakest = jnp.argmin(w, axis=-1)
    repl = jax.nn.one_hot(weakest, K, dtype=frame.dtype) \
        * (~fit_any)[..., None]
    w = jnp.where(repl > 0, lr, w)
    means_new = jnp.where(repl[..., None] > 0, x, means_new)
    var_new = jnp.where(repl > 0, var_init, var_new)

    # prune negative weights, renormalize
    w = jnp.maximum(w, 0.0)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-6)

    # resort modes by weight/sqrt(var) significance (descending weight)
    order = jnp.argsort(-w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    var_new = jnp.take_along_axis(var_new, order, axis=-1)
    means_new = jnp.take_along_axis(
        means_new, order[..., None].repeat(means.shape[-1], -1), axis=-2)

    # background = strongest modes summing to back_ratio
    cumw = jnp.cumsum(w, axis=-1)
    is_bg_mode = (cumw - w) < back_ratio           # modes before threshold
    d2 = jnp.sum((x - means_new) ** 2, axis=-1)
    match_bg = (d2 < var_thresh * var_new) & is_bg_mode
    is_bg = jnp.any(match_bg, axis=-1)

    fg = jnp.where(is_bg, 0, 255).astype(jnp.uint8)

    if detect_shadows:
        # shadow: darker version of the background mode (Prati et al.)
        num = jnp.sum(frame * means_new[..., 0, :], axis=-1)
        den = jnp.sum(means_new[..., 0, :] ** 2, axis=-1)
        tau = num / jnp.maximum(den, 1e-6)
        dist_sh = jnp.sum((frame - tau[..., None] * means_new[..., 0, :]) ** 2,
                          axis=-1)
        shadow = (~is_bg) & (tau > shadow_thresh) & (tau <= 1.0) \
            & (dist_sh < var_thresh * var_new[..., 0])
        fg = jnp.where(shadow, jnp.uint8(127), fg)

    return fg, w, means_new, var_new


class BackgroundSubtractorMOG2:
    """cv2.BackgroundSubtractorMOG2-compatible (Zivkovic GMM)."""

    def __init__(self, history=500, varThreshold=16.0, detectShadows=True):
        self.history = history
        self.var_threshold = float(varThreshold)
        self.detect_shadows = bool(detectShadows)
        self.nmixtures = 5
        self.background_ratio = 0.9
        self.var_init = 15.0
        self.var_min = 4.0
        self.var_max = 5 * 15.0
        self.var_threshold_gen = 9.0
        self.shadow_threshold = 0.5
        self.ct = 0.05
        self.frame_count = 0
        self._state = None

    def apply(self, image, learningRate: float = -1.0):
        x, meta = to_batched(image)
        f = x.astype(jnp.float32)
        N, H, W, C = f.shape
        K = self.nmixtures
        if self._state is None:
            w = jnp.zeros((N, H, W, K), jnp.float32)
            m = jnp.zeros((N, H, W, K, C), jnp.float32)
            v = jnp.full((N, H, W, K), self.var_init, jnp.float32)
            self._state = (w, m, v)
        self.frame_count += 1
        if learningRate < 0:
            lr = 1.0 / min(2 * self.frame_count, self.history)
        else:
            lr = learningRate
        w, m, v = self._state
        fg, w, m, v = _mog2_step(
            f, w, m, v, self.nmixtures,
            jnp.float32(lr), jnp.float32(self.var_threshold),
            jnp.float32(self.var_threshold_gen), jnp.float32(self.var_init),
            jnp.float32(self.var_min), jnp.float32(self.var_max),
            jnp.float32(self.background_ratio),
            jnp.float32(self.shadow_threshold), self.detect_shadows,
            jnp.float32(self.ct))
        self._state = (w, m, v)
        return from_batched(fg[..., None], meta)

    def getBackgroundImage(self):
        if self._state is None:
            return None
        w, m, v = self._state
        bg = m[..., 0, :]
        return from_batched(jnp.clip(jnp.rint(bg), 0, 255).astype(jnp.uint8),
                            "nhwc")[0]

    # cv2 setters/getters subset
    def setHistory(self, h):
        self.history = h

    def getHistory(self):
        return self.history

    def setVarThreshold(self, t):
        self.var_threshold = t

    def getVarThreshold(self):
        return self.var_threshold

    def setDetectShadows(self, b):
        self.detect_shadows = bool(b)

    def getDetectShadows(self):
        return self.detect_shadows


def createBackgroundSubtractorMOG2(history=500, varThreshold=16.0,
                                   detectShadows=True):
    return BackgroundSubtractorMOG2(history, varThreshold, detectShadows)
