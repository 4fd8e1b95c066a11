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

__all__ = ["StereoBM", "StereoBM_create", "StereoSGBM",
           "StereoSGBM_create"]


def _xsobel_prefilter(img, ftzero):
    """prefilterXSobel (stereobm.cpp:210): x-Sobel over reflected rows,
    clamped to [0, 2*ftzero].  Border columns get ftzero; when the
    height is odd the unpaired last row is entirely ftzero (the
    reference processes rows in pairs)."""
    x = np.asarray(img, np.int32)
    H, W = x.shape
    out = np.full((H, W), ftzero, np.int32)
    if H < 2 or W < 3:
        return out
    rows = np.arange(H)
    up = np.abs(rows - 1)                       # reflect-101 top
    dn = (H - 1) - np.abs(H - 2 - rows)         # reflect-101 bottom
    d = np.zeros((H, W), np.int32)
    d[:, 1:-1] = x[:, 2:] - x[:, :-2]
    sob = d[up] + 2 * d + d[dn]
    out[:, 1:-1] = np.clip(sob + ftzero, 0, 2 * ftzero)[:, 1:-1]
    out[:, 0] = out[:, -1] = ftzero
    if H % 2 == 1:
        out[-1, :] = ftzero
    return out


def _norm_prefilter(img, winsize, ftzero):
    """prefilterNorm (stereobm.cpp:128): response of the 5-point
    Laplacian-ish kernel normalized by the local window mean, clamped
    to [0, 2*ftzero]."""
    x = np.asarray(img, np.int64)
    H, W = x.shape
    wsz2 = winsize // 2
    scale_g = winsize * winsize // 8
    scale_s = (1024 + scale_g) // (scale_g * 2)
    scale_g *= scale_s
    # replicate-border winsize x winsize window sum (the reference's
    # running vsum/sum scheme)
    p = np.pad(x, ((wsz2, wsz2), (wsz2, wsz2)), mode="edge")
    c = np.cumsum(np.cumsum(p, 0), 1)
    c = np.pad(c, ((1, 0), (1, 0)))
    k = 2 * wsz2 + 1
    s = c[k:k + H, k:k + W] - c[k:k + H, 0:W] - c[0:H, k:k + W] + c[0:H, 0:W]
    prev = x[np.maximum(np.arange(H) - 1, 0)]
    nxt = x[np.minimum(np.arange(H) + 1, H - 1)]
    left = np.pad(x, ((0, 0), (1, 0)), mode="edge")[:, :-1]
    right = np.pad(x, ((0, 0), (0, 1)), mode="edge")[:, 1:]
    val = ((x * 4 + left + right + prev + nxt) * scale_g
           - s * scale_s) >> 10
    return np.clip(val + ftzero, 0, 2 * ftzero).astype(np.int32)


def _box_hw(x, r):
    """Replicate-border (2r+1)^2 box sum over leading two axes."""
    pad = ((r, r), (r, r)) + ((0, 0),) * (x.ndim - 2)
    p = jnp.pad(x, pad, mode="edge")
    c = jnp.cumsum(jnp.cumsum(p, axis=0), axis=1)
    c = jnp.pad(c, ((1, 0), (1, 0)) + ((0, 0),) * (x.ndim - 2))
    k = 2 * r + 1
    H, W = x.shape[:2]
    return (c[k:k + H, k:k + W] - c[k:k + H, 0:W]
            - c[0:H, k:k + W] + c[0:H, 0:W])


@functools.partial(jax.jit, static_argnames=("ndisp", "wsz", "ftzero",
                                             "tex_thresh", "uniq", "minD"))
def _bm_core(L, R, ndisp, wsz, ftzero, tex_thresh, uniq, minD):
    """findStereoCorrespondenceBM (stereobm.cpp:669) as one device
    program over the full image: reversed-d SAD volume + replicate box,
    first-min winner, texture/uniqueness checks, the mirrored-end
    integer subpixel, and the valid-ROI blanking of the invoker."""
    H, W = L.shape
    wsz2 = wsz // 2
    lofs = max(ndisp - 1 + minD, 0)
    rofs = -min(ndisp - 1 + minD, 0)
    width1 = W - rofs - ndisp + 1
    FILT = (minD - 1) * 16

    ds = jnp.arange(ndisp)
    # window columns extended by wsz2 each side, with the reference's
    # ASYMMETRIC clamps: the left pointer clamps to width-1-lofs, the
    # right BASE clamps to width-ndisp-rofs (stereobm.cpp:787-789) —
    # these differ when minD != 0, so cost cannot just replicate-pad
    wext = jnp.arange(-wsz2, width1 + wsz2)
    lcol = lofs + jnp.clip(wext, -lofs, W - 1 - lofs)
    rbase = rofs + jnp.clip(wext, -rofs, W - ndisp - rofs)
    lv = L[:, lcol]                                       # (H, we)
    cost = jnp.abs(lv[:, :, None] - R[:, rbase[:, None] + ds[None, :]])

    def box_sep(x):
        # horizontal: valid mode over the extended axis; vertical:
        # replicate (hsad row indices are clamped in the reference)
        k = 2 * wsz2 + 1
        tail = ((0, 0),) * (x.ndim - 2)
        ch = jnp.pad(jnp.cumsum(x, axis=1), ((0, 0), (1, 0)) + tail)
        hh = ch[:, k:] - ch[:, :-k]                       # (H, width1, ...)
        pv = jnp.pad(hh, ((wsz2, wsz2), (0, 0)) + tail, mode="edge")
        cv_ = jnp.pad(jnp.cumsum(pv, axis=0), ((1, 0), (0, 0)) + tail)
        return cv_[k:] - cv_[:-k]                         # (H, width1, ...)

    sad = box_sep(cost)
    minsad = jnp.min(sad, -1)
    mind = jnp.argmin(sad, -1)                            # first minimum

    # texture: window sum of |prefiltered L - ftzero|
    texs = box_sep(jnp.abs(lv - ftzero))
    tex_ok = texs >= tex_thresh

    if uniq > 0:
        thresh = minsad + minsad * uniq // 100
        far = jnp.abs(ds[None, None, :] - mind[..., None]) > 1
        unique_ok = ~jnp.any(far & (sad <= thresh[..., None]), -1)
    else:
        unique_ok = jnp.ones_like(tex_ok)

    # subpixel: sad[-1] = sad[1], sad[ndisp] = sad[ndisp-2] mirror,
    # then dispDescale with C truncating division
    sadp = jnp.concatenate([sad[..., 1:2], sad,
                            sad[..., ndisp - 2:ndisp - 1]], -1)
    g = lambda i: jnp.take_along_axis(sadp, i[..., None], -1)[..., 0]
    s0 = g(mind + 1)
    p = g(mind + 2)
    n = g(mind)
    denom = p + n - 2 * s0 + jnp.abs(p - n)           # >= 0
    num = (p - n) * 256
    q = jnp.where(denom > 0,
                  jnp.sign(num) * (jnp.abs(num) // jnp.maximum(denom, 1)),
                  0)
    val = ((ndisp - mind - 1 + minD) * 256 + q + 15) >> 4

    # valid-ROI blanking (FindStereoCorrespInvoker + getValidDisparityROI)
    maxD = minD + ndisp - 1
    x0 = max(0, maxD) + wsz2
    x1 = W - wsz2
    gx = lofs + jnp.arange(width1)
    keep = (tex_ok & unique_ok
            & (gx[None, :] >= x0) & (gx[None, :] < x1)
            & (jnp.arange(H)[:, None] >= wsz2)
            & (jnp.arange(H)[:, None] < H - wsz2))
    vals = jnp.where(keep, val, FILT).astype(jnp.int16)
    out = jnp.full((H, W), FILT, jnp.int16)
    # for minD > 0 the x range extends past the image (the reference
    # computes-then-blanks those columns); clip to what fits
    nvis = min(width1, W - lofs)
    out = jax.lax.dynamic_update_slice(out, vals[:, :nvis], (0, lofs))
    # reproduce the reference's row-overflow artifact: its x loop for
    # minD > 0 writes the last ROI row's rightmost (computed, un-ROI'd)
    # values into row H-wsz2 columns [0, minD); that row is below the
    # ROI and is never re-blanked (stereobm.cpp:780 dptr stride walk)
    novf = lofs + width1 - W
    if novf > 0 and wsz2 <= H - wsz2 - 1:
        raw = jnp.where(tex_ok[H - wsz2 - 1] & unique_ok[H - wsz2 - 1],
                        val[H - wsz2 - 1], FILT).astype(jnp.int16)
        out = out.at[H - wsz2, 0:novf].set(raw[width1 - novf:width1])
    return out


class StereoBM:
    """StereoBM (stereobm.cpp) — bit-exact vs the wheel: paired-row
    XSobel / normalized-response prefilter, reversed-d SAD matching,
    texture + uniqueness checks, integer subpixel, valid-ROI blanking,
    optional speckle filtering."""

    PREFILTER_NORMALIZED_RESPONSE = 0
    PREFILTER_XSOBEL = 1

    def __init__(self, numDisparities=64, blockSize=21):
        self.ndisp = numDisparities if numDisparities > 0 else 64
        self.block = blockSize
        self.minDisparity = 0
        self.prefilter_type = self.PREFILTER_XSOBEL
        self.prefilter_size = 9
        self.prefilter_cap = 31
        self.texture_threshold = 10
        self.uniqueness = 15
        self.speckleWindowSize = 0
        self.speckleRange = 0
        self.disp12MaxDiff = -1

    @staticmethod
    def create(numDisparities=64, blockSize=21):
        return StereoBM(numDisparities, blockSize)

    def setNumDisparities(self, n):
        self.ndisp = n

    def setBlockSize(self, b):
        self.block = b

    def setMinDisparity(self, m):
        self.minDisparity = m

    def setPreFilterType(self, t):
        self.prefilter_type = t

    def setPreFilterSize(self, s):
        self.prefilter_size = s

    def setPreFilterCap(self, c):
        self.prefilter_cap = c

    def setTextureThreshold(self, t):
        self.texture_threshold = t

    def setUniquenessRatio(self, u):
        self.uniqueness = u

    def setSpeckleWindowSize(self, w):
        self.speckleWindowSize = w

    def setSpeckleRange(self, r):
        self.speckleRange = r

    def setDisp12MaxDiff(self, d):
        self.disp12MaxDiff = d

    def getNumDisparities(self):
        return self.ndisp

    def getBlockSize(self):
        return self.block

    def getMinDisparity(self):
        return self.minDisparity

    def compute(self, left, right):
        lx = np.asarray(left)
        rx = np.asarray(right)
        if lx.ndim == 3:
            lx = lx[..., 0]
            rx = rx[..., 0]
        if self.prefilter_type == self.PREFILTER_NORMALIZED_RESPONSE:
            lp = _norm_prefilter(lx, self.prefilter_size,
                                 self.prefilter_cap)
            rp = _norm_prefilter(rx, self.prefilter_size,
                                 self.prefilter_cap)
        else:
            lp = _xsobel_prefilter(lx, self.prefilter_cap)
            rp = _xsobel_prefilter(rx, self.prefilter_cap)
        out = np.asarray(_bm_core(
            jnp.asarray(lp), jnp.asarray(rp), int(self.ndisp),
            int(self.block), int(self.prefilter_cap),
            int(self.texture_threshold), int(self.uniqueness),
            int(self.minDisparity)))
        if self.speckleRange >= 0 and self.speckleWindowSize > 0:
            from .misc3d import filterSpeckles
            out = filterSpeckles(out, (self.minDisparity - 1) * 16,
                                 self.speckleWindowSize,
                                 self.speckleRange)
        return out


def StereoBM_create(numDisparities=64, blockSize=21):
    return StereoBM(numDisparities, blockSize)


def StereoSGBM_create(minDisparity=0, numDisparities=16, blockSize=3,
                      P1=0, P2=0, disp12MaxDiff=0, preFilterCap=0,
                      uniquenessRatio=0, speckleWindowSize=0,
                      speckleRange=0, mode=0):
    return StereoSGBM(minDisparity, numDisparities, blockSize, P1, P2,
                      disp12MaxDiff, preFilterCap, uniquenessRatio,
                      speckleWindowSize, speckleRange, mode)


# ------------------------------------------------------------------ SGBM

MAX_COST = np.int32(1 << 28)


def _bt_prow(img, ftzero):
    """Clipped x-Sobel plane + raw plane (calcPixelCostBT,
    stereosgbm.cpp:173).  img: (H, W) f32/int. Returns (2, H, W) int32
    with border columns set to tab[0]=ftzero (sobel) / raw borders."""
    x = jnp.asarray(img, jnp.int32)
    H, W = x.shape
    up = jnp.concatenate([x[:1], x[:-1]], axis=0)      # row y-1 (clamp)
    dn = jnp.concatenate([x[1:], x[-1:]], axis=0)      # row y+1 (clamp)
    l = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    r = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    lu = jnp.concatenate([up[:, :1], up[:, :-1]], axis=1)
    ru = jnp.concatenate([up[:, 1:], up[:, -1:]], axis=1)
    ld = jnp.concatenate([dn[:, :1], dn[:, :-1]], axis=1)
    rd = jnp.concatenate([dn[:, 1:], dn[:, -1:]], axis=1)
    sob = (r - l) * 2 + (ru - lu) + (rd - ld)
    sob = jnp.clip(sob, -ftzero, ftzero) + ftzero
    cols = jnp.arange(W)
    border = (cols == 0) | (cols == W - 1)
    sob = jnp.where(border[None, :], ftzero, sob)
    # the raw plane's border columns are preset to tab[0] = ftzero too
    # (stereosgbm.cpp:195-196 covers ALL cn*2 channels)
    raw = jnp.where(border[None, :], ftzero, x)
    return sob, raw


def _bt_cost_plane(p1, p2, minD, maxD):
    """BT sampling-insensitive |p1(x) - p2(x-d)| for one plane.
    Returns (H, width1, D) int32 where width1 = W - maxD + min(minD,0)."""
    H, W = p1.shape
    minX1 = max(maxD, 0)
    width1 = W + min(minD, 0) - minX1
    D = maxD - minD

    half_l1 = (p1 + jnp.concatenate([p1[:, :1], p1[:, :-1]], axis=1)) // 2
    half_r1 = (p1 + jnp.concatenate([p1[:, 1:], p1[:, -1:]], axis=1)) // 2
    u0 = jnp.minimum(jnp.minimum(half_l1, half_r1), p1)
    u1 = jnp.maximum(jnp.maximum(half_l1, half_r1), p1)
    half_l2 = (p2 + jnp.concatenate([p2[:, :1], p2[:, :-1]], axis=1)) // 2
    half_r2 = (p2 + jnp.concatenate([p2[:, 1:], p2[:, -1:]], axis=1)) // 2
    v0 = jnp.minimum(jnp.minimum(half_l2, half_r2), p2)
    v1 = jnp.maximum(jnp.maximum(half_l2, half_r2), p2)

    xs = minX1 + jnp.arange(width1)                    # (width1,)
    ds = minD + jnp.arange(D)                          # (D,)
    xr = xs[:, None] - ds[None, :]                     # (width1, D)
    u = p1[:, xs][:, :, None]
    uu0 = u0[:, xs][:, :, None]
    uu1 = u1[:, xs][:, :, None]
    v = p2[:, xr]
    vv0 = v0[:, xr]
    vv1 = v1[:, xr]
    c0 = jnp.maximum(jnp.maximum(u - vv1, vv0 - u), 0)
    c1 = jnp.maximum(jnp.maximum(v - uu1, uu0 - v), 0)
    return jnp.minimum(c0, c1)


def _box_volume(cost, sw2, sh2):
    """Replicate-border (2*sw2+1)x(2*sh2+1) box sum over (H, W1, D)."""
    p = jnp.pad(cost, ((sh2, sh2), (sw2, sw2), (0, 0)), mode="edge")
    c = jnp.cumsum(jnp.cumsum(p, axis=0), axis=1)
    c = jnp.pad(c, ((1, 0), (1, 0), (0, 0)))
    kh, kw = 2 * sh2 + 1, 2 * sw2 + 1
    H, W1 = cost.shape[:2]
    return (c[kh:kh + H, kw:kw + W1] - c[kh:kh + H, 0:W1]
            - c[0:H, kw:kw + W1] + c[0:H, 0:W1])


def _lr_step(Lprev, minLprev, Cp, P1, P2):
    """One SGM recurrence: L = C + min(Lp[d], Lp[d-1]+P1, Lp[d+1]+P1,
    minLp+P2) - (minLp+P2).  Lprev: (..., D)."""
    pad = jnp.full(Lprev.shape[:-1] + (1,), MAX_COST, Lprev.dtype)
    lm = jnp.concatenate([pad, Lprev[..., :-1]], axis=-1) + P1
    lp = jnp.concatenate([Lprev[..., 1:], pad], axis=-1) + P1
    delta = (minLprev + P2)[..., None]
    L = Cp + jnp.minimum(jnp.minimum(Lprev, lm),
                         jnp.minimum(lp, delta)) - delta
    return L, jnp.min(L, axis=-1)


@functools.partial(jax.jit, static_argnames=("minD", "maxD", "sw2", "P1",
                                             "P2", "ftzero", "uniq",
                                             "disp12", "mode_hh"))
def _sgbm(left, right, minD, maxD, sw2, P1, P2, ftzero, uniq, disp12,
          mode_hh):
    """Semi-global matching (stereosgbm.cpp computeDisparitySGBM:495).

    TPU-native: the cost volume is dense (H, W1, D); the four forward
    path directions are one `lax.scan` over rows carrying three (W1, D)
    Lr planes plus a nested scan over columns for the horizontal path;
    the backward horizontal path is a reversed scan fused into the
    final selection.  MODE_HH adds the reverse row scan (8 paths).
    """
    sob1, raw1 = _bt_prow(left, ftzero)
    sob2, raw2 = _bt_prow(right, ftzero)
    cost = _bt_cost_plane(sob1, sob2, minD, maxD) \
        + (_bt_cost_plane(raw1, raw2, minD, maxD) >> 2)
    C = _box_volume(cost, sw2, sw2) + P2      # P2 pre-added like initCBuf
    H, W1, D = C.shape

    # --- horizontal left->right path: scan over columns
    def hstep(carry, Cp):                      # Cp: (H, D)
        Lp, mp = carry
        L, m = _lr_step(Lp, mp, Cp, P1, P2)
        return (L, m), L

    zero = jnp.zeros((H, D), jnp.int32)
    zmin = jnp.zeros((H,), jnp.int32)
    _, L_w = jax.lax.scan(hstep, (zero, zmin), jnp.moveaxis(C, 1, 0))
    L_w = jnp.moveaxis(L_w, 0, 1)              # (H, W1, D)

    # --- vertical + diagonal paths: scan over rows
    def vstep(carry, Crow):                    # Crow: (W1, D)
        (Ln, mn), (Lnw, mnw), (Lne, mne) = carry
        L_n, m_n = _lr_step(Ln, mn, Crow, P1, P2)
        # NW: previous row at x-1
        sh = lambda a, fill: jnp.concatenate(
            [jnp.full(a[:1].shape, fill, a.dtype), a[:-1]], axis=0)
        shr = lambda a, fill: jnp.concatenate(
            [a[1:], jnp.full(a[:1].shape, fill, a.dtype)], axis=0)
        L_nw, m_nw = _lr_step(sh(Lnw, 0), sh(mnw, 0), Crow, P1, P2)
        L_ne, m_ne = _lr_step(shr(Lne, 0), shr(mne, 0), Crow, P1, P2)
        out = L_n + L_nw + L_ne
        return ((L_n, m_n), (L_nw, m_nw), (L_ne, m_ne)), out

    zw = jnp.zeros((W1, D), jnp.int32)
    zwm = jnp.zeros((W1,), jnp.int32)
    init = ((zw, zwm), (zw, zwm), (zw, zwm))
    _, S_v = jax.lax.scan(vstep, init, C)      # (H, W1, D)

    S = L_w + S_v

    if mode_hh:
        _, L_e = jax.lax.scan(hstep, (zero, zmin),
                              jnp.moveaxis(C, 1, 0)[::-1])
        S = S + jnp.moveaxis(L_e[::-1], 0, 1)
        _, S_v2 = jax.lax.scan(vstep, init, C[::-1])
        S = S + S_v2[::-1]
        # 8th path pair handled by the reversed scans above (S,SE,SW,E)
    else:
        # backward horizontal path (the right-to-left selection loop)
        _, L_e = jax.lax.scan(hstep, (zero, zmin),
                              jnp.moveaxis(C, 1, 0)[::-1])
        S = S + jnp.moveaxis(L_e[::-1], 0, 1)

    best = jnp.argmin(S, axis=-1)              # (H, W1)
    minS = jnp.min(S, axis=-1)

    # uniqueness: any d with S[d]*(100-uniq) < minS*100 and |d-best|>1
    ds = jnp.arange(D)
    bad = (S * (100 - uniq) < minS[..., None] * 100) \
        & (jnp.abs(ds[None, None, :] - best[..., None]) > 1)
    unique_ok = ~jnp.any(bad, axis=-1)

    # subpixel
    d0 = jnp.clip(best, 1, D - 2)
    gather = lambda idx: jnp.take_along_axis(S, idx[..., None], axis=-1)[..., 0]
    sm = gather(d0 - 1)
    sp = gather(d0 + 1)
    s0 = gather(d0)
    denom2 = jnp.maximum(sm + sp - 2 * s0, 1)
    # C integer division truncates toward zero (stereosgbm.cpp:936);
    # adjust the floor division on negative numerators
    num = (sm - sp) * 16 + denom2
    den = denom2 * 2
    frac = num // den + jnp.where((num < 0) & (num % den != 0), 1, 0)
    dq = jnp.where((best > 0) & (best < D - 1), best * 16 + frac, best * 16)

    # LR consistency: disp2 = per-right-pixel min over x of (minS, d)
    minX1 = max(maxD, 0)
    W = left.shape[1]
    xs = jnp.arange(W1)
    x2 = xs[None, :] + minX1 - best - minD     # (H, W1) right-image coords
    big = jnp.where(unique_ok, minS, MAX_COST)
    rows = jnp.broadcast_to(jnp.arange(H)[:, None], x2.shape)
    cols = jnp.clip(x2, 0, W - 1)
    # scatter-min the winning cost per right-image column...
    d2cost = jnp.full((H, W), MAX_COST, jnp.int32)
    d2cost = d2cost.at[rows, cols].min(big)
    # ...then, among equal-cost writers, pick the largest x (the
    # reference's descending-x scan keeps the first, i.e. largest, x)
    won = big == d2cost[rows[..., 0:W1], cols] if False else         big == jnp.take_along_axis(d2cost, cols, axis=1)
    selx = jnp.full((H, W), -1, jnp.int32)
    selx = selx.at[rows, cols].max(jnp.where(won, xs[None, :], -1))
    d2valid = (d2cost < MAX_COST) & (selx >= 0)
    bestx = jnp.take_along_axis(best, jnp.clip(selx, 0, W1 - 1), axis=1)
    disp2 = jnp.where(d2valid, bestx + minD, minD - 1)

    dall = dq + minD * 16
    _d = dall >> 4
    d_ = (dall + 15) >> 4
    xfull = xs[None, :] + minX1
    gx = lambda off: jnp.clip(xfull - off, 0, W - 1)
    d2a = jnp.take_along_axis(disp2, gx(_d), axis=1)
    d2b = jnp.take_along_axis(disp2, gx(d_), axis=1)
    in_a = (xfull - _d >= 0) & (xfull - _d < W)
    in_b = (xfull - d_ >= 0) & (xfull - d_ < W)
    lr_bad = in_a & (d2a >= minD) & (jnp.abs(d2a - _d) > disp12) \
        & in_b & (d2b >= minD) & (jnp.abs(d2b - d_) > disp12)

    INVALID = (minD - 1) * 16
    dfinal = jnp.where(unique_ok & ~lr_bad, dall, INVALID)
    out = jnp.full((H, W), INVALID, jnp.int32)
    out = out.at[:, minX1:minX1 + W1].set(dfinal)
    return out.astype(jnp.int16)


class StereoSGBM:
    """StereoSGBM (calib3d/src/stereosgbm.cpp).  Default MODE_SGBM
    aggregates 5 paths (W, NW, N, NE, E); MODE_HH aggregates 8."""

    MODE_SGBM = 0
    MODE_HH = 1

    def __init__(self, minDisparity=0, numDisparities=16, blockSize=3,
                 P1=0, P2=0, disp12MaxDiff=0, preFilterCap=0,
                 uniquenessRatio=0, speckleWindowSize=0, speckleRange=0,
                 mode=0):
        self.minDisparity = minDisparity
        self.numDisparities = numDisparities
        self.blockSize = max(blockSize, 1)
        self.P1 = P1
        self.P2 = P2
        self.disp12MaxDiff = disp12MaxDiff
        self.preFilterCap = preFilterCap
        self.uniquenessRatio = uniquenessRatio
        self.speckleWindowSize = speckleWindowSize
        self.speckleRange = speckleRange
        self.mode = mode

    def compute(self, left, right):
        lx = np.asarray(left)
        rx = np.asarray(right)
        if lx.ndim == 3:
            lx = lx[..., 0]
            rx = rx[..., 0]
        P1 = self.P1 if self.P1 > 0 else 2
        P2 = max(self.P2 if self.P2 > 0 else 5, P1 + 1)
        ftzero = max(self.preFilterCap, 15) | 1
        uniq = self.uniquenessRatio if self.uniquenessRatio >= 0 else 10
        # SGBM clamps disp12MaxDiff<=0 to 1 (stereosgbm.cpp:499) —
        # unlike StereoBM, the LR check is never disabled
        disp12 = self.disp12MaxDiff if self.disp12MaxDiff > 0 else 1
        out = _sgbm(jnp.asarray(lx), jnp.asarray(rx),
                    self.minDisparity, self.minDisparity
                    + self.numDisparities, self.blockSize // 2,
                    int(P1), int(P2), int(ftzero),
                    int(uniq), int(disp12),
                    self.mode == self.MODE_HH)
        out = np.asarray(out)
        # the reference post-filters every SGBM result with a 3x3
        # median, then speckle filtering (stereosgbm.cpp:2225-2229)
        from ..ops.smooth import medianBlur
        out = np.asarray(medianBlur(out, 3))
        if self.speckleWindowSize > 0:
            from .misc3d import filterSpeckles
            out = filterSpeckles(out, (self.minDisparity - 1) * 16,
                                 self.speckleWindowSize,
                                 16 * self.speckleRange)
        return out
