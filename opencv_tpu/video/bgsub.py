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

__all__ = ["BackgroundSubtractorMOG2", "createBackgroundSubtractorMOG2",
           "BackgroundSubtractorKNN", "createBackgroundSubtractorKNN"]


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


# --------------------------------------------------------------- KNN

@functools.partial(jax.jit, static_argnames=("nN", "nkNN", "detect_shadows"))
def _knn_step(data, samples, flags, idxS, idxM, idxL, nextS, nextM, nextL,
              cS, cM, cL, fTb, fTau, nN, nkNN, detect_shadows, shadow_val):
    """One KNN background step (video/src/bgfg_KNN.cpp:345-482).

    data: (H, W, C) f32; samples: (3nN, H, W, C) f32; flags: (3nN, H, W);
    idx*/next*: (H, W) int32; c* scalars. Returns (mask, new state...).
    """
    d = samples - data[None]                        # (S,H,W,C)
    dist2 = jnp.sum(d * d, axis=-1)                 # (S,H,W)
    close = dist2 < fTb
    Pbf = jnp.sum(close, axis=0)
    Pb = jnp.sum(close & (flags > 0), axis=0)
    is_bg = Pb >= nkNN
    include = (is_bg | (Pbf >= nkNN)).astype(samples.dtype)

    if detect_shadows:
        num = jnp.sum(samples * data[None], axis=-1)
        den = jnp.sum(samples * samples, axis=-1)
        bgflag = flags > 0
        bad = jnp.any(bgflag & (den == 0), axis=0)
        a = num / jnp.maximum(den, 1e-12)
        cond = bgflag & (num <= den) & (num >= fTau * den)
        dd = a[..., None] * samples - data[None]
        dist2a = jnp.sum(dd * dd, axis=-1)
        Ps = jnp.sum(cond & (dist2a < fTb * a * a), axis=0)
        is_shadow = (~is_bg) & (~bad) & (Ps >= nkNN)
    else:
        is_shadow = jnp.zeros_like(is_bg)

    mask = jnp.where(is_bg, 0,
                     jnp.where(is_shadow, shadow_val, 255)).astype(jnp.uint8)

    # ---- model update (old values gathered first, like the sequential
    # long<-mid<-short copy order of _cvUpdatePixelBackgroundNP)
    S = 3 * nN
    gather = lambda arr, idx: jnp.take_along_axis(
        arr, idx[None, ..., None] if arr.ndim == 4 else idx[None], axis=0)[0]
    old_mid = gather(samples, idxM + nN)
    old_mid_flag = gather(flags, idxM + nN)
    old_short = gather(samples, idxS)
    old_short_flag = gather(flags, idxS)

    upL = nextL == cL
    upM = nextM == cM
    upS = nextS == cS

    slots = jnp.arange(S)[:, None, None]
    selL = (slots == (idxL + 2 * nN)[None]) & upL[None]
    selM = (slots == (idxM + nN)[None]) & upM[None]
    selS = (slots == idxS[None]) & upS[None]

    samples = jnp.where(selL[..., None], old_mid[None], samples)
    flags = jnp.where(selL, old_mid_flag[None], flags)
    samples = jnp.where(selM[..., None], old_short[None], samples)
    flags = jnp.where(selM, old_short_flag[None], flags)
    samples = jnp.where(selS[..., None], data[None], samples)
    flags = jnp.where(selS, include[None], flags)

    bump = lambda idx, up: jnp.where(up, jnp.where(idx >= nN - 1, 0, idx + 1),
                                     idx)
    return (mask, samples, flags, bump(idxS, upS), bump(idxM, upM),
            bump(idxL, upL))


class BackgroundSubtractorKNN:
    """KNN background subtractor (video/src/bgfg_KNN.cpp).

    TPU-native: the (3*nN) per-pixel sample history is a dense
    (S, H, W, C) device tensor; classification is one reduction over the
    sample axis and the three-cadence circular-buffer update is a lane-wise
    select — the whole frame step is a single jitted program.
    """

    def __init__(self, history=500, dist2Threshold=400.0,
                 detectShadows=True):
        self.history = history
        self.fTb = float(dist2Threshold)
        self.detectShadows = detectShadows
        self.nN = 7
        self.nkNN = max(1, int(round(0.1 * self.nN * 3 + 0.40)))
        self.fTau = 0.5
        self.shadow_val = 127
        self._state = None
        self._nframes = 0
        self._rng = np.random.default_rng(12345)

    def _init_state(self, shape, C):
        H, W = shape
        S = 3 * self.nN
        z32 = lambda: jnp.zeros((H, W), jnp.int32)
        self._state = dict(
            samples=jnp.zeros((S, H, W, C), jnp.float32),
            flags=jnp.zeros((S, H, W), jnp.float32),
            idxS=z32(), idxM=z32(), idxL=z32(),
            nextS=z32(), nextM=z32(), nextL=z32(),
        )
        self._cS = self._cM = self._cL = 0
        self._nframes = 0
        self._hw = (H, W)
        self._C = C

    def apply(self, image, learningRate=-1.0):
        img = np.asarray(image)
        if img.ndim == 2:
            img = img[..., None]
        H, W, C = img.shape
        if self._state is None or self._hw != (H, W) or self._C != C \
                or learningRate >= 1:
            self._init_state((H, W), C)
        self._nframes += 1
        lr = learningRate if (learningRate >= 0 and self._nframes > 1) \
            else 1.0 / min(2 * self._nframes, self.history)

        # cadences from the exponential learning curve (bgfg_KNN.cpp:766-775)
        Kshort = int(np.log(0.7) / np.log(1 - lr)) + 1
        Kmid = int(np.log(0.4) / np.log(1 - lr)) - Kshort + 1
        Klong = int(np.log(0.1) / np.log(1 - lr)) - Kshort - Kmid + 1
        nShortUpdate = Kshort // self.nN + 1
        nMidUpdate = Kmid // self.nN + 1
        nLongUpdate = Klong // self.nN + 1

        st = self._state
        mask, samples, flags, idxS, idxM, idxL = _knn_step(
            jnp.asarray(img, jnp.float32), st["samples"], st["flags"],
            st["idxS"], st["idxM"], st["idxL"],
            st["nextS"], st["nextM"], st["nextL"],
            self._cS, self._cM, self._cL,
            jnp.float32(self.fTb), jnp.float32(self.fTau),
            self.nN, self.nkNN, self.detectShadows,
            jnp.int32(self.shadow_val))
        st.update(samples=samples, flags=flags, idxS=idxS, idxM=idxM,
                  idxL=idxL)

        self._cS += 1
        self._cM += 1
        self._cL += 1
        randu = lambda hi: jnp.asarray(
            self._rng.integers(0, max(hi, 1), self._hw, np.int32))
        if self._cS >= nShortUpdate:
            self._cS = 0
            st["nextS"] = randu(nShortUpdate)
        if self._cM >= nMidUpdate:
            self._cM = 0
            st["nextM"] = randu(nMidUpdate)
        if self._cL >= nLongUpdate:
            self._cL = 0
            st["nextL"] = randu(nLongUpdate)
        return np.asarray(mask)

    def getBackgroundImage(self):
        st = self._state
        if st is None:
            return None
        flags = np.asarray(st["flags"]) > 0            # (S,H,W)
        samples = np.asarray(st["samples"])
        first = np.argmax(flags, axis=0)               # (H,W)
        any_bg = flags.any(axis=0)
        bg = np.take_along_axis(
            samples, first[None, ..., None], axis=0)[0]
        bg = np.where(any_bg[..., None], bg, 0).astype(np.uint8)
        return bg[..., 0] if bg.shape[-1] == 1 else bg

    # parameter accessors mirroring the reference API
    def setHistory(self, h):
        self.history = h

    def getHistory(self):
        return self.history

    def setDist2Threshold(self, t):
        self.fTb = float(t)

    def getDist2Threshold(self):
        return self.fTb

    def setkNNSamples(self, k):
        self.nkNN = k

    def getkNNSamples(self):
        return self.nkNN

    def setNSamples(self, n):
        self.nN = n
        self._state = None

    def getNSamples(self):
        return self.nN

    def setDetectShadows(self, b):
        self.detectShadows = bool(b)

    def getDetectShadows(self):
        return self.detectShadows

    def setShadowValue(self, v):
        self.shadow_val = int(v)

    def getShadowValue(self):
        return self.shadow_val

    def setShadowThreshold(self, t):
        self.fTau = float(t)

    def getShadowThreshold(self):
        return self.fTau


def createBackgroundSubtractorKNN(history=500, dist2Threshold=400.0,
                                  detectShadows=True):
    return BackgroundSubtractorKNN(history, dist2Threshold, detectShadows)
