"""ORB detector + descriptor (features2d/src/orb.cpp).

TPU-native split: per pyramid level ONE fused device program — bit-exact
INTER_LINEAR_EXACT level resize (orb.cpp:1126), FAST score maps with a
lossless 1x2 pre-pool feeding top_k, sparse per-candidate Harris rescore
(HarrisResponses, orb.cpp:131) and intensity-centroid moments (ICAngles,
orb.cpp:181) computed from row-payload patch gathers, the 7×7 σ=2
descriptor blur (orb.cpp:1228), and rotated-BRIEF packing on the MXU.
The data-dependent tails — retainBest ties, keypoint lists — run on host
over the shipped top rows (SURVEY §7 hard part #2).

Numeric contracts: scale per level `scaleFactor^level`, level sizes
`cvRound(dim/scale)`; per-level feature budget `nfeatures(1-f)/(1-f^n)`;
Harris blockSize=7, k=0.04, scale=(4*blockSize*255)^-1 to the 4th power;
descriptor pattern = the learned 256-pair bit_pattern_31_ (orb.cpp:380,
shipped as orb_pattern.npy), sampled after rotation by cos/sin(angle) with
cvRound; angle = fastAtan2 (the reference's 7th-order atan polynomial).
"""

from __future__ import annotations

import math
import os

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as K
from ..core.arrays import to_batched
from ..ops.resize import resize
from ..ops.filter import GaussianBlur
from .fast import fast_keypoint_mask
from .keypoint import KeyPoint

__all__ = ["ORB", "ORB_create"]

HARRIS_K = 0.04
_PATTERN = np.load(os.path.join(os.path.dirname(__file__), "orb_pattern.npy"))


class _CvRNG:
    """cv::RNG — multiply-with-carry LCG (core/include/opencv2/core.hpp,
    A = 4164903690), needed to reproduce initializeOrbPattern exactly."""

    A = 4164903690

    def __init__(self, state=0xFFFFFFFF):
        self.state = state & 0xFFFFFFFFFFFFFFFF

    def next(self):
        self.state = ((self.state & 0xFFFFFFFF) * self.A
                      + (self.state >> 32)) & 0xFFFFFFFFFFFFFFFF
        return self.state & 0xFFFFFFFF

    def uniform(self, a, b):
        return a + self.next() % (b - a)


def _orb_pattern_for_wta(wta_k: int):
    """(P, 2) sampling points: the learned 256-pair pattern for WTA_K=2,
    or the RNG(0x12345678)-randomized tuples (initializeOrbPattern,
    orb.cpp:353) for WTA_K=3/4."""
    pat0 = _PATTERN.reshape(512, 2)
    if wta_k == 2:
        return pat0.astype(np.float32)
    ntuples = 32 * 4
    pool = 512
    rng = _CvRNG(0x12345678)
    out = np.zeros((ntuples * wta_k, 2), np.float32)
    for i in range(ntuples):
        for k in range(wta_k):
            while True:
                idx = rng.uniform(0, pool)
                pt = pat0[idx]
                dup = any((out[wta_k * i + k1] == pt).all()
                          for k1 in range(k))
                if not dup:
                    out[wta_k * i + k] = pt
                    break
    return out


def _fast_atan2(y, x):
    """cv::fastAtan2 (mathfuncs_core.simd.hpp:36-70): 7th-order polynomial,
    degrees in [0, 360)."""
    p1 = np.float32(0.9997878412794807 * (180 / math.pi))
    p3 = np.float32(-0.3258083974640975 * (180 / math.pi))
    p5 = np.float32(0.1555786518463281 * (180 / math.pi))
    p7 = np.float32(-0.04432655554792128 * (180 / math.pi))
    eps = np.float32(2.220446049250313e-16)
    ax, ay = np.abs(x), np.abs(y)
    c = np.where(ax >= ay, ay / (ax + eps), ax / (ay + eps)).astype(np.float32)
    c2 = c * c
    a = (((p7 * c2 + p5) * c2 + p3) * c2 + p1) * c
    a = np.where(ax >= ay, a, np.float32(90.0) - a)
    a = np.where(x < 0, np.float32(180.0) - a, a)
    a = np.where(y < 0, np.float32(360.0) - a, a)
    return a


def _umax_table(half_patch: int) -> np.ndarray:
    """ICAngles circular-patch column bounds (orb.cpp:855-875)."""
    umax = np.zeros(half_patch + 2, np.int64)
    vmax = int(np.floor(half_patch * math.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(half_patch * math.sqrt(2.0) / 2))
    for v in range(vmax + 1):
        umax[v] = int(np.rint(math.sqrt(half_patch * half_patch - v * v)))
    v0 = 0
    for v in range(half_patch, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax


def _level_maps(img4d, fast_threshold: int, half_patch: int):
    """One fused device program per level: FAST score/mask + blurred
    image.  Harris terms and IC moments are computed SPARSELY at the
    top-k candidates in _level_cand_desc — dense per-pixel Sobel +
    7x7 box maps measured ~20ms/level and 99.98% of them were never
    read (HarrisResponses is per-keypoint in the reference too,
    orb.cpp:131)."""
    score, keep = fast_keypoint_mask(img4d, fast_threshold, True)
    from ..core.arrays import from_batched
    blurred, _ = to_batched(GaussianBlur(from_batched(img4d, "nhwc"), (7, 7),
                                         2.0, 2.0, K.BORDER_REFLECT_101))
    return score, keep, blurred


def _fast_atan2_jnp(y, x):
    """Device twin of _fast_atan2 (f32 polynomial, degrees [0, 360))."""
    f32 = jnp.float32
    p1 = f32(0.9997878412794807 * (180 / math.pi))
    p3 = f32(-0.3258083974640975 * (180 / math.pi))
    p5 = f32(0.1555786518463281 * (180 / math.pi))
    p7 = f32(-0.04432655554792128 * (180 / math.pi))
    eps = f32(2.220446049250313e-16)
    ax, ay = jnp.abs(x), jnp.abs(y)
    c = jnp.where(ax >= ay, ay / (ax + eps), ax / (ay + eps)).astype(f32)
    c2 = c * c
    a = (((p7 * c2 + p5) * c2 + p3) * c2 + p1) * c
    a = jnp.where(ax >= ay, a, f32(90.0) - a)
    a = jnp.where(x < 0, f32(180.0) - a, a)
    a = jnp.where(y < 0, f32(360.0) - a, a)
    return a


def _ref101(i, L):
    """REFLECT_101 index fold for |overhang| < L (the reference's flat
    pyramid buffer carries BORDER_REFLECT_101 margins, orb.cpp:1109+)."""
    return jnp.where(i < 0, -i, jnp.where(i >= L, 2 * L - 2 - i, i))


def _ic_weight_mats(half_patch: int):
    """(31, 32) du/dv centroid weight matrices masked by the umax disk
    (IC_Angle, orb.cpp:99) for the sliding-window moment dot."""
    umax = _umax_table(half_patch)
    rows = 2 * half_patch + 1
    w10 = np.zeros((rows, 32), np.float32)
    w01 = np.zeros((rows, 32), np.float32)
    for r in range(rows):
        dv = r - half_patch
        lim = umax[abs(dv)]
        for j in range(32):
            du = j - half_patch
            if abs(du) <= lim:
                w10[r, j] = du
                w01[r, j] = dv
    return w10.reshape(-1), w01.reshape(-1)


def _level_cand_desc(img4d, fast_threshold: int, half_patch: int,
                     et: int, n2: int, cap: int, wta_k: int = 2,
                     dcap: int = None, nper: int = None,
                     is_harris: bool = True):
    """Batched device candidate extraction + descriptors for one level.

    img4d: (B, H, W, 1) u8.  TPU shape of the stage (vs the reference's
    per-keypoint loops, orb.cpp:826):
    - top-`cap` FAST candidates per image via one top_k;
    - Harris RESCORE ON DEVICE (HarrisResponses, orb.cpp:131): a second
      top_k over the tie-masked responses, so IC moments and descriptors
      run on only the top-`dcap` retained rows (~3x fewer);
    - IC moments via 31 row-payload gathers against a sliding-window
      operand (XLA gather on TPU costs per INDEX, so 31 row-segments of
      32 bytes beat 709 scalar disk taps ~20x);
    - host transfer is (dcap, 4) floats + (dcap, 32) bytes per image.
    n_ge / n_ge2 report tie counts at the two retainBest boundaries so
    the host can verify cap coverage (regrow-and-rerun on overflow).
    """
    score, keep, blurred = _level_maps(img4d, fast_threshold, half_patch)
    B, H, W = img4d.shape[0], img4d.shape[1], img4d.shape[2]
    s = score[..., 0].astype(jnp.float32)
    k = keep[..., 0]
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = (xs >= et) & (xs < W - et) & (ys >= et) & (ys < H - et)
    masked = jnp.where(k & inside[None], s, -jnp.inf)

    # lossless 1x2 pre-pool: the strict 3x3 NMS (score > all neighbors)
    # means two horizontally adjacent survivors are impossible, so the
    # pair-max keeps every candidate while halving top_k's input (top_k
    # cost on TPU is linear in BOTH n and k; ~57ms at n=2M, k=476)
    if W % 2:
        masked = jnp.pad(masked, ((0, 0), (0, 0), (0, 1)),
                         constant_values=-jnp.inf)
    W2 = masked.shape[2] // 2
    m0 = masked[:, :, 0::2]
    m1 = masked[:, :, 1::2]
    win1 = m1 > m0
    pooled = jnp.where(win1, m1, m0).reshape(B, -1)
    cap = min(cap, H * W)
    # bf16 top_k: FAST scores are integers <= 255, exact in bf16, and
    # top_k cost is bandwidth-bound (linear in n AND k)
    valsh, pidx = jax.lax.top_k(pooled.astype(jnp.bfloat16), cap)
    vals = valsh.astype(jnp.float32)
    bbase = (jnp.arange(B, dtype=jnp.int32) * (H * W2))[:, None]
    off = jnp.take(win1.reshape(-1), pidx + bbase).astype(jnp.int32)
    iy = pidx // W2
    ix = (pidx % W2) * 2 + off

    if dcap is None:
        dcap = cap
    dcap = min(dcap, cap)
    if nper is None:
        nper = n2

    # tie count at the retainBest(n2) boundary, counted over the KEPT
    # top-k rows only (a full-map count measured 17ms/level): if every
    # tie fits inside cap the count is exact; n_ge == cap means ties may
    # extend past the pool, which the host treats as regrow-and-rerun.
    boundary = vals[:, min(n2, cap) - 1]
    n_ge = jnp.where(
        jnp.isfinite(boundary),
        jnp.sum(vals >= boundary[:, None], axis=1),
        jnp.sum(jnp.isfinite(vals), axis=1)).astype(jnp.int32)

    # patch fetch shared by sparse Harris and IC moments: ONE 2-D WINDOW
    # GATHER per keypoint (slice_sizes=(1, rows, 32)) from the reflect-
    # padded image.  Measured on v5e at 32k keypoints x (31,32) windows:
    # window gather 83 ms vs 383 ms for 32 shifted scalar gathers vs
    # 112 ms for a prebuilt (B*H*W, 32) row operand (which also costs
    # 2.1 GB of HBM at 1080p batch 32) — the per-INDEX cost dominates
    # XLA's TPU gather, so one index per PATCH wins.  Vertical REFLECT_101
    # padding by hp replaces the old per-row _ref101 index folding with
    # identical semantics (numpy "reflect" == BORDER_REFLECT_101).
    hp = half_patch
    imgp = jnp.pad(img4d[..., 0], ((0, 0), (hp, hp), (hp, 32 - hp)),
                   mode="reflect")

    def _gather_win(row0, col0, nrows):
        """(B, N) padded-image start coords -> (B, N, nrows, 32) int32."""
        nb, nk = row0.shape
        b_idx = jnp.broadcast_to(
            jnp.arange(nb, dtype=jnp.int32)[:, None], (nb, nk))
        starts = jnp.stack([b_idx, row0, col0], axis=-1).reshape(-1, 3)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1, 2))
        out = jax.lax.gather(imgp, starts, dn, slice_sizes=(1, nrows, 32),
                             mode=jax.lax.GatherScatterMode.CLIP)
        return out[:, 0].astype(jnp.int32).reshape(nb, nk, nrows, 32)

    if is_harris:
        # sparse HarrisResponses (orb.cpp:131): 9-row patches around each
        # candidate; Sobel 3x3 + 7x7 box sums as exact int32 vector math
        # on (B, cap, 9, 32) patches (the dense maps this replaces cost
        # ~20ms/level and were read at 0.02% of pixels)
        # padded row of source row (iy+dr) is iy+dr+hp; window starts at
        # dr=-4 -> row0 = iy+hp-4 (in bounds for any iy in [0, H))
        hpat = _gather_win(iy + hp - 4, ix, 9)      # (B, cap, 9, 32) i32
        # dx/dy at patch rows 1..7, img cols x-14..x+15 -> need x-3..x+3
        right = hpat[:, :, :, 2:]
        left = hpat[:, :, :, :-2]
        gx = ((right[:, :, :7] + 2 * right[:, :, 1:8] + right[:, :, 2:9])
              - (left[:, :, :7] + 2 * left[:, :, 1:8] + left[:, :, 2:9]))
        top = hpat[:, :, :7, 1:-1]
        bot = hpat[:, :, 2:9, 1:-1]
        gy = ((bot[:, :, :, :-2] + 2 * bot[:, :, :, 1:-1]
               + bot[:, :, :, 2:])
              - (top[:, :, :, :-2] + 2 * top[:, :, :, 1:-1]
                 + top[:, :, :, 2:]))
        # gx[..., r, j] sits at img col x + j - 14, gy[..., r, c] at
        # x + c - 13; keep the 7x7 box (col offsets -3..3) of each
        gxw = gx[:, :, :, 11:18]
        gyw = gy[:, :, :, 10:17]
        aa = (gxw * gxw).sum(axis=(2, 3)).astype(jnp.float32)
        bb = (gyw * gyw).sum(axis=(2, 3)).astype(jnp.float32)
        cc = (gxw * gyw).sum(axis=(2, 3)).astype(jnp.float32)
        scale_h = np.float32(1.0 / ((1 << 2) * 7 * 255.0))
        s4 = np.float32(scale_h ** 4)
        resp = (aa * bb - cc * cc
                - np.float32(HARRIS_K) * (aa + bb) * (aa + bb)) * s4
        # rescore only the tie-extended retainBest(n2) set (orb.cpp:899)
        resp = jnp.where(vals >= boundary[:, None], resp, -jnp.inf)
        resp = jnp.where(jnp.isfinite(vals), resp, -jnp.inf)
        rvals, rord = jax.lax.top_k(resp, dcap)     # (B, dcap)
        iy_d = jnp.take_along_axis(iy, rord, axis=1)
        ix_d = jnp.take_along_axis(ix, rord, axis=1)
        out_score = rvals
        boundary2 = rvals[:, min(nper, dcap) - 1]
        n_ge2 = jnp.sum(jnp.where(jnp.isfinite(boundary2)[:, None],
                                  resp >= boundary2[:, None],
                                  resp > -jnp.inf), axis=1) \
            .astype(jnp.int32)
    else:
        iy_d = iy[:, :dcap]
        ix_d = ix[:, :dcap]
        out_score = vals[:, :dcap]
        n_ge2 = n_ge

    # IC moments over the same window-gather payloads: source rows
    # iy_d-hp .. iy_d+hp live at padded rows iy_d .. iy_d+2hp
    patches = _gather_win(iy_d, ix_d, 2 * hp + 1) \
        .reshape(B * dcap, (2 * hp + 1) * 32).astype(jnp.float32)
    w10, w01 = _ic_weight_mats(hp)
    mm = patches @ jnp.stack([jnp.asarray(w10), jnp.asarray(w01)], axis=1)
    m10g = mm[:, 0].reshape(B, dcap)
    m01g = mm[:, 1].reshape(B, dcap)
    angle = _fast_atan2_jnp(m01g, m10g)

    cand = jnp.stack([out_score, iy_d.astype(jnp.float32),
                      ix_d.astype(jnp.float32), angle], axis=-1)

    # rotated-BRIEF for every candidate (computeOrbDescriptors, orb.cpp:220)
    # 2-D (B*cap, 512) layout throughout: 3-D layouts with a 512-minor dim
    # plus strided lane slices made XLA relayout-bound (~17x slower);
    # bit packing rides the MXU as an exact 0/1 matmul.
    pat = _orb_pattern_for_wta(wta_k)
    P = pat.shape[0]
    px = jnp.asarray(pat[:, 0])
    py = jnp.asarray(pat[:, 1])
    R = B * dcap
    ang = (angle * jnp.float32(math.pi / 180.0)).reshape(R, 1)
    ca = jnp.cos(ang)
    sa = jnp.sin(ang)
    rx = jnp.round(px[None, :] * ca - py[None, :] * sa).astype(jnp.int32)
    ry = jnp.round(px[None, :] * sa + py[None, :] * ca).astype(jnp.int32)
    cy = _ref101(iy_d.reshape(R, 1) + ry, H)
    cx = _ref101(ix_d.reshape(R, 1) + rx, W)
    base = (jnp.arange(B, dtype=jnp.int32) * (H * W)) \
        .repeat(dcap).reshape(R, 1)
    gidx = cy * W + cx + base
    flat = blurred[..., 0].reshape(-1).astype(jnp.int32)
    v = jnp.take(flat, gidx)                        # (R, P)
    if wta_k == 2:
        lo = v.reshape(R, 256, 2)
        codes = (lo[..., 0] < lo[..., 1]).astype(jnp.float32)  # (R, 256)
        group, radix = 8, 2.0
    elif wta_k == 3:
        lo = v.reshape(R, 128, 3)
        t0, t1, t2 = lo[..., 0], lo[..., 1], lo[..., 2]
        codes = jnp.where(t2 > t1, jnp.where(t2 > t0, 2, 0),
                          (t1 > t0).astype(jnp.int32)) \
            .astype(jnp.float32)                    # (R, 128) in 0..2
        group, radix = 4, 4.0
    else:  # wta_k == 4 — tournament of 4 (orb.cpp:307)
        lo = v.reshape(R, 128, 4)
        t0, t1, t2, t3 = (lo[..., i] for i in range(4))
        u = (t1 > t0).astype(jnp.int32)
        m01 = jnp.maximum(t0, t1)
        vv = 2 + (t3 > t2).astype(jnp.int32)
        m23 = jnp.maximum(t2, t3)
        codes = jnp.where(m01 > m23, u, vv).astype(jnp.float32)
        group, radix = 4, 4.0
    ncodes = codes.shape[1]
    packw = ((np.arange(ncodes)[:, None] // group
              == np.arange(32)[None, :])
             * (radix ** (np.arange(ncodes) % group))[:, None]) \
        .astype(np.float32)
    d = jnp.dot(codes, jnp.asarray(packw),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    desc = d.astype(jnp.int32).astype(jnp.uint8).reshape(B, dcap, 32)
    return cand, n_ge, n_ge2, desc


class ORB:
    """cv2.ORB-compatible detector/descriptor."""

    def __init__(self, nfeatures=500, scaleFactor=1.2, nlevels=8,
                 edgeThreshold=31, firstLevel=0, WTA_K=2,
                 scoreType=K.ORB_HARRIS_SCORE, patchSize=31,
                 fastThreshold=20):
        assert WTA_K in (2, 3, 4), "WTA_K must be 2, 3 or 4"
        assert firstLevel == 0, "firstLevel != 0 not implemented"
        self.wta_k = WTA_K
        self.nfeatures = nfeatures
        self.scale_factor = scaleFactor
        self.nlevels = nlevels
        self.edge_threshold = edgeThreshold
        self.patch_size = patchSize
        self.fast_threshold = fastThreshold
        self.score_type = scoreType
        self._maps_jit = jax.jit(_level_maps, static_argnums=(1, 2))
        self._detect_cache = {}

    # -- cv2 API ------------------------------------------------------
    def detect(self, image, mask=None):
        return self.detectAndCompute(image, mask, compute_desc=False)[0]

    def compute(self, image, keypoints):
        return keypoints, self._describe(image, keypoints)

    def _budget(self):
        """Per-level feature budget (orb.cpp:841-849, float32 arithmetic)."""
        nlevels = self.nlevels
        factor = np.float32(1.0 / self.scale_factor)
        ndesired = np.float32(self.nfeatures * (1 - factor)
                              / (1 - factor ** np.float32(nlevels)))
        nper = []
        sumf = 0
        for lv in range(nlevels - 1):
            nper.append(int(np.rint(ndesired)))
            sumf += nper[-1]
            ndesired = np.float32(ndesired * factor)
        nper.append(max(self.nfeatures - sumf, 0))
        return nper

    def _detect_fn(self, H, W, caps, dcaps):
        """ONE fused device program for the whole detect: pyramid resizes,
        FAST, Harris terms, IC moments, blur, per-level top-k candidate
        extraction AND descriptors.  A single dispatch per batch — the
        per-level round trips are what made ORB tunnel-latency-bound."""
        key = (H, W, tuple(caps), tuple(dcaps), self.wta_k)
        if key in self._detect_cache:
            return self._detect_cache[key]
        nlevels = self.nlevels
        layer_scale = [float(np.float32(self.scale_factor) ** lv)
                       for lv in range(nlevels)]
        sizes = [(int(np.rint(W / layer_scale[lv])),
                  int(np.rint(H / layer_scale[lv]))) for lv in range(nlevels)]
        half_patch = self.patch_size // 2
        et = self.edge_threshold
        is_harris = self.score_type == K.ORB_HARRIS_SCORE
        nper = self._budget()

        dcapmax = max(min(dcaps[lv], caps[lv],
                          sizes[lv][1] * sizes[lv][0])
                      for lv in range(nlevels))

        def fn(x4):
            cands, nges, nge2s, descs = [], [], [], []
            cur = x4
            for lv in range(nlevels):
                if lv:
                    cur = resize(cur, sizes[lv],
                                 interpolation=K.INTER_LINEAR_EXACT)
                n2 = max(2 * nper[lv] if is_harris else nper[lv], 1)
                h, w = sizes[lv][1], sizes[lv][0]
                cand, n_ge, n_ge2, desc = _level_cand_desc(
                    cur, self.fast_threshold, half_patch, et, n2,
                    min(caps[lv], h * w), self.wta_k,
                    dcap=min(dcaps[lv], caps[lv], h * w),
                    nper=max(nper[lv], 1), is_harris=is_harris)
                # pad to the common cap so ALL levels ship home in one
                # stacked transfer (a few readbacks total instead of a
                # few per level — the axon tunnel is round-trip bound)
                pad = dcapmax - cand.shape[1]
                if pad:
                    cand = jnp.pad(cand, ((0, 0), (0, pad), (0, 0)),
                                   constant_values=-jnp.inf)
                    desc = jnp.pad(desc, ((0, 0), (0, pad), (0, 0)))
                cands.append(cand)
                nges.append(n_ge)
                nge2s.append(n_ge2)
                descs.append(desc)
            return (jnp.stack(cands), jnp.stack(nges), jnp.stack(nge2s),
                    jnp.stack(descs))

        jitted = jax.jit(fn)
        self._detect_cache[key] = jitted
        return jitted

    def detect_and_compute_batch(self, images, compute_desc=True):
        """(B, H, W) u8 batch → list of (keypoints, descriptors).

        The TPU-native entry point: one fused XLA program per batch, all
        levels; the host tail is vectorized numpy (retainBest tie cuts,
        Harris rescoring, final packing)."""
        # keep device arrays resident (np.asarray would round-trip the
        # whole batch through the host transport)
        imgs = images if hasattr(images, "devices") else np.asarray(images)
        if imgs.ndim == 2:
            imgs = imgs[None]
        B, H, W = imgs.shape
        nlevels = self.nlevels
        nper = self._budget()
        is_harris = self.score_type == K.ORB_HARRIS_SCORE
        layer_scale = [float(np.float32(self.scale_factor) ** lv)
                       for lv in range(nlevels)]
        # rows shipped home: retained budget + tie headroom; the n_ge /
        # n_ge2 checks below regrow (and recompile) only on pathological
        # score-tie storms.  The device rescores by Harris response and
        # returns only the top-dcap retained rows (4 floats + 32 bytes
        # each), so both the descriptor gathers and the tunnel readback
        # scale with the RETAINED count, not the candidate pool.
        caps = [max((2 if is_harris else 1) * nper[lv] + 128, 256)
                for lv in range(nlevels)]
        dcaps = [min(nper[lv] + 64, caps[lv]) for lv in range(nlevels)]

        x4 = jnp.asarray(imgs)[..., None]
        while True:
            cand_all, nge_all, nge2_all, desc_all = \
                self._detect_fn(H, W, caps, dcaps)(x4)
            n_ge = np.asarray(nge_all)                     # (L, B)
            n_ge2 = np.asarray(nge2_all)                   # (L, B)
            over = [lv for lv in range(nlevels)
                    if (n_ge[lv] >= caps[lv]).any()]
            over2 = [lv for lv in range(nlevels)
                     if (n_ge2[lv] > dcaps[lv]).any()]
            if not over and not over2:
                break
            for lv in over:  # FAST tie storm: grow the candidate pool
                caps[lv] = int(max(2 * n_ge[lv].max(), 2 * caps[lv]))
            for lv in over2:  # response ties past the shipped rows
                dcaps[lv] = int(max(2 * n_ge2[lv].max(), 2 * dcaps[lv]))
                caps[lv] = max(caps[lv], dcaps[lv])

        cand_np = np.asarray(cand_all)             # (L, B, dcapmax, 4)
        desc_np = np.asarray(desc_all)             # (L, B, dcapmax, 32)

        # vectorized tail: per-(level, image) retained counts via one
        # searchsorted pass, then a single fancy-index per image — the
        # per-keypoint Python loop was ~6% of the batch pipeline
        finite = np.isfinite(cand_np[:, :, :, 0])          # (L, B, cap)
        ncand = finite.sum(axis=2)                          # (L, B)
        m_lb = np.zeros((nlevels, B), np.int64)
        for lv in range(nlevels):
            nl = nper[lv]
            for b in range(B):
                n = int(ncand[lv, b])
                if n == 0:
                    continue
                resp = cand_np[lv, b, :n, 0]               # sorted desc
                if n > nl:
                    cut = resp[nl - 1]
                    m_lb[lv, b] = np.searchsorted(-resp, -cut,
                                                  side="right")
                else:
                    m_lb[lv, b] = n
        scales = np.asarray(layer_scale, np.float32)
        results = []
        for b in range(B):
            ms = m_lb[:, b]
            lv_idx = np.repeat(np.arange(nlevels), ms)
            row_idx = np.concatenate(
                [np.arange(m) for m in ms]) if ms.sum() else \
                np.zeros(0, np.int64)
            fin = cand_np[lv_idx, b, row_idx]               # (M, 4)
            sf = scales[lv_idx]
            xs = fin[:, 2] * sf
            ys = fin[:, 1] * sf
            szs = self.patch_size * sf
            all_kps = [KeyPoint(float(xs[i]), float(ys[i]), float(szs[i]),
                                float(fin[i, 3]), float(fin[i, 0]),
                                int(lv_idx[i]))
                       for i in range(len(lv_idx))]
            desc = desc_np[lv_idx, b, row_idx]
            results.append((all_kps, desc if compute_desc else None))
        return results

    def detectAndCompute(self, image, mask=None, compute_desc=True):
        img = np.asarray(image)
        if img.ndim == 3:
            from ..ops.color import cvtColor
            img = np.asarray(cvtColor(img, K.COLOR_BGR2GRAY))
        return self.detect_and_compute_batch(img[None],
                                             compute_desc=compute_desc)[0]

    # -- descriptors ---------------------------------------------------
    def _describe_levels(self, kps, blurred_levels, layer_scale):
        if not kps:
            return np.zeros((0, 32), np.uint8)
        pat = _PATTERN.reshape(512, 2).astype(np.float32)  # (x, y) pairs
        out = np.zeros((len(kps), 32), np.uint8)
        for i, k in enumerate(kps):
            lv = k.octave
            img = blurred_levels[lv]
            scale = np.float32(1.0 / layer_scale[lv])
            x0 = int(np.rint(k.pt[0] * scale))
            y0 = int(np.rint(k.pt[1] * scale))
            # reference: float angle *= (float)(CV_PI/180.f); a=(float)cos
            ang = np.float32(k.angle) * np.float32(math.pi / 180.0)
            a = np.float32(math.cos(float(ang)))
            b = np.float32(math.sin(float(ang)))
            rx = np.rint(pat[:, 0] * a - pat[:, 1] * b).astype(np.int64)
            ry = np.rint(pat[:, 0] * b + pat[:, 1] * a).astype(np.int64)
            vals = img[np.clip(y0 + ry, 0, img.shape[0] - 1),
                       np.clip(x0 + rx, 0, img.shape[1] - 1)]
            t0 = vals[0::2].astype(np.int32)
            t1 = vals[1::2].astype(np.int32)
            bits = (t0 < t1).astype(np.uint8)
            out[i] = np.packbits(bits, bitorder="little")
        return out

    def _describe(self, image, keypoints):
        img = np.asarray(image)
        if img.ndim == 3:
            from ..ops.color import cvtColor
            img = np.asarray(cvtColor(img, K.COLOR_BGR2GRAY))
        H, W = img.shape
        layer_scale = [float(np.float32(self.scale_factor) ** lv)
                       for lv in range(self.nlevels)]
        levels = []
        prev = img
        for lv in range(self.nlevels):
            if lv == 0:
                cur = img
            else:
                sz = (int(np.rint(W / layer_scale[lv])),
                      int(np.rint(H / layer_scale[lv])))
                cur = np.asarray(resize(prev, sz,
                                        interpolation=K.INTER_LINEAR_EXACT))
            levels.append(np.asarray(GaussianBlur(cur, (7, 7), 2.0, 2.0,
                                                  K.BORDER_REFLECT_101)))
            prev = cur
        return self._describe_levels(keypoints, levels, layer_scale)


def ORB_create(nfeatures=500, scaleFactor=1.2, nlevels=8, edgeThreshold=31,
               firstLevel=0, WTA_K=2, scoreType=K.ORB_HARRIS_SCORE,
               patchSize=31, fastThreshold=20):
    return ORB(nfeatures, scaleFactor, nlevels, edgeThreshold, firstLevel,
               WTA_K, scoreType, patchSize, fastThreshold)
