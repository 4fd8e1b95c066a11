"""Non-local means denoising (photo/src/fast_nlmeans_denoising_invoker.hpp).

TPU-native: instead of the reference's per-pixel sliding window loops,
the search window is unrolled into static offsets; per-offset patch
SSDs are box sums (cumsum windows) and the weighted average is a fused
elementwise accumulate — the whole denoise is one XLA program over the
batch. Weights use the reference's exponential kernel on patch distance.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import constants as K
from ..core.arrays import to_batched, from_batched
from ..core.borders import pad_nhwc
from ..core.fixedpoint import saturate_cast

__all__ = ["fastNlMeansDenoising", "fastNlMeansDenoisingColored",
           "fastNlMeansDenoisingMulti", "denoise_TVL1"]


def _box_sum_f32(x, k):
    """(N,H,W,C) valid box sums of size k (cumsum trick)."""
    c = jnp.cumsum(jnp.cumsum(x, axis=1), axis=2)
    c = jnp.pad(c, ((0, 0), (1, 0), (1, 0), (0, 0)))
    H = x.shape[1] - k + 1
    W = x.shape[2] - k + 1
    return (c[:, k:k + H, k:k + W] - c[:, k:k + H, 0:W]
            - c[:, 0:H, k:k + W] + c[:, 0:H, 0:W])


def fastNlMeansDenoising(src, h: float = 3.0, templateWindowSize: int = 7,
                         searchWindowSize: int = 21):
    x, meta = to_batched(src)
    tw = templateWindowSize
    sw = searchWindowSize
    tr = tw // 2
    sr = sw // 2
    xf = x.astype(jnp.float32)
    # pad once for both patch and search reach
    pad = tr + sr
    xp = pad_nhwc(xf, pad, pad, pad, pad, K.BORDER_REFLECT)
    N, Hp, Wp, C = xp.shape
    H, W = x.shape[1], x.shape[2]

    # reference weight: w = exp(-max(d2 - 2σ², 0) / h²) with σ=h? The
    # fast path uses a LUT on patch SSD; we use the documented kernel
    # w = exp(-d2 / (h² * patch_area)) per channel sum
    inv_h2 = 1.0 / (h * h * tw * tw * C)

    center = xp[:, sr:sr + H + 2 * tr, sr:sr + W + 2 * tr, :]
    wsum = None
    acc = None
    for dy in range(-sr, sr + 1):
        for dx in range(-sr, sr + 1):
            nb = xp[:, sr + dy:sr + dy + H + 2 * tr,
                    sr + dx:sr + dx + W + 2 * tr, :]
            diff = (center - nb) ** 2
            d2 = _box_sum_f32(diff.sum(axis=-1, keepdims=True), tw)
            wgt = jnp.exp(-d2 * inv_h2)
            v = nb[:, tr:tr + H, tr:tr + W, :]
            acc = v * wgt if acc is None else acc + v * wgt
            wsum = wgt if wsum is None else wsum + wgt
    out = acc / wsum
    return from_batched(saturate_cast(out, x.dtype), meta)


def fastNlMeansDenoisingColored(src, h: float = 3.0, hColor: float = 3.0,
                                templateWindowSize: int = 7,
                                searchWindowSize: int = 21):
    """Reference converts to CIELab and denoises L with h and ab with
    hColor (fast_nlmeans denoising_colored)."""
    from ..ops.color import cvtColor

    lab = cvtColor(src, K.COLOR_BGR2Lab)
    lab_np = np.asarray(lab)
    L = fastNlMeansDenoising(lab_np[..., 0], h, templateWindowSize,
                             searchWindowSize)
    a = fastNlMeansDenoising(lab_np[..., 1], hColor, templateWindowSize,
                             searchWindowSize)
    b = fastNlMeansDenoising(lab_np[..., 2], hColor, templateWindowSize,
                             searchWindowSize)
    out = np.stack([np.asarray(L), np.asarray(a), np.asarray(b)], axis=-1)
    return cvtColor(out.astype(np.uint8), K.COLOR_Lab2BGR)


def denoise_TVL1(observations, result=None, lambda_=1.0, niters=30):
    """Primal-dual TV-L1 denoising (photo/src/denoise_tvl1.cpp:59).

    Chambolle-Pock with the reference's constants (tau=0.02,
    sigma=1/(8 tau), theta=1) and its boundary conventions: the dual
    x-component vanishes on the last column, and the x-divergence term
    is dropped at x=0.  Fully vectorized over the image."""
    obs = [np.asarray(o, np.float64) / 255.0 for o in observations]
    tau = 0.02
    sigma = 1.0 / (8.0 * tau)
    clambda = float(lambda_)
    X = obs[0].copy()
    H, W = X.shape
    Px = np.zeros((H, W))
    Py = np.zeros((H, W))
    Rs = [np.zeros((H, W)) for _ in obs]
    for it in range(niters):
        cs = (1 + sigma) if it == 0 else sigma
        dx = np.zeros((H, W))
        dx[:, :-1] = (X[:, 1:] - X[:, :-1]) * cs + Px[:, :-1]
        dy = (np.vstack([X[1:], X[-1:]]) - X) * cs + Py
        m = np.maximum(np.hypot(dx, dy), 1.0)
        # last column: x-component forced to 0, y normalized alone
        m[:, -1] = np.maximum(np.abs(dy[:, -1]), 1.0)
        Px = dx / m
        Px[:, -1] = 0.0
        Py = dy / m
        s = np.zeros((H, W))
        for k, ob in enumerate(obs):
            Rs[k] = np.clip(Rs[k] + sigma * (X - ob), -clambda, clambda)
            s += Rs[k]
        divx = np.zeros((H, W))
        divx[:, 1:] = Px[:, 1:] - Px[:, :-1]
        divy = Py - np.vstack([Py[:1] * 0 + Py[:1], Py[:-1]])
        divy[0] = Py[0] - Py[0]   # p_prev = row 0 itself -> zero
        x_new = X + tau * (divx + divy) - tau * s
        X = 2.0 * x_new - X
    return np.clip(X * 255.0 + 0.5, 0, 255).astype(np.uint8)


def fastNlMeansDenoisingMulti(srcImgs, imgToDenoiseIndex,
                              temporalWindowSize, h=3.0,
                              templateWindowSize=7, searchWindowSize=21):
    """Temporal NL-means (photo/src/denoising.cpp
    fastNlMeansDenoisingMulti): candidate patches come from every
    frame in the temporal window, weighted against the target frame's
    patches with the same kernel as the single-frame path."""
    half_t = temporalWindowSize // 2
    lo = imgToDenoiseIndex - half_t
    hi = imgToDenoiseIndex + half_t + 1
    frames = [np.asarray(srcImgs[i]) for i in range(lo, hi)]
    base = frames[half_t]
    tw = templateWindowSize
    sw = searchWindowSize
    tr = tw // 2
    sr = sw // 2
    x, meta = to_batched(base)
    xf = x.astype(jnp.float32)
    pad = tr + sr
    bp = pad_nhwc(xf, pad, pad, pad, pad, K.BORDER_REFLECT)
    H, W = x.shape[1], x.shape[2]
    C = bp.shape[3]
    inv_h2 = 1.0 / (h * h * tw * tw * C)
    center = bp[:, sr:sr + H + 2 * tr, sr:sr + W + 2 * tr, :]
    acc = None
    wsum = None
    for f in frames:
        ff, _ = to_batched(f)
        fp = pad_nhwc(ff.astype(jnp.float32), pad, pad, pad, pad,
                      K.BORDER_REFLECT)
        for dy in range(-sr, sr + 1):
            for dx in range(-sr, sr + 1):
                nb = fp[:, sr + dy:sr + dy + H + 2 * tr,
                        sr + dx:sr + dx + W + 2 * tr, :]
                diff = (center - nb) ** 2
                d2 = _box_sum_f32(diff.sum(axis=-1, keepdims=True), tw)
                wgt = jnp.exp(-d2 * inv_h2)
                v = nb[:, tr:tr + H, tr:tr + W, :]
                acc = v * wgt if acc is None else acc + v * wgt
                wsum = wgt if wsum is None else wsum + wgt
    out = acc / wsum
    return from_batched(saturate_cast(out, x.dtype), meta)


def fastNlMeansDenoisingColoredMulti(srcImgs, imgToDenoiseIndex,
                                     temporalWindowSize, h=3.0,
                                     hColor=3.0, templateWindowSize=7,
                                     searchWindowSize=21):
    """Temporal colored NL-means (photo/src/denoising.cpp): convert the
    window to CIELab, denoise the L sequence with h and the a/b
    sequences with hColor via fastNlMeansDenoisingMulti, convert back."""
    from ..ops.color import cvtColor

    labs = [np.asarray(cvtColor(np.asarray(f), K.COLOR_BGR2Lab))
            for f in srcImgs]
    chans = []
    for c, hc in ((0, h), (1, hColor), (2, hColor)):
        seq = [lab[..., c] for lab in labs]
        chans.append(np.asarray(fastNlMeansDenoisingMulti(
            seq, imgToDenoiseIndex, temporalWindowSize, hc,
            templateWindowSize, searchWindowSize)))
    out = np.stack(chans, axis=-1).astype(np.uint8)
    return cvtColor(out, K.COLOR_Lab2BGR)
