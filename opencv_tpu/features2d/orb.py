"""ORB detector + descriptor (features2d/src/orb.cpp).

TPU-native split: everything dense runs on device per pyramid level —
bit-exact INTER_LINEAR_EXACT level resize (orb.cpp:1126), FAST score maps,
the Harris rescoring response as a dense Sobel-product box sum
(HarrisResponses, orb.cpp:131, computed densely instead of per-keypoint),
the intensity-centroid moment maps m01/m10 as two disk-kernel MXU convs
(ICAngles, orb.cpp:181), and the 7×7 σ=2 descriptor blur (orb.cpp:1228).
The data-dependent tails — retainBest ties, keypoint lists, descriptor
bit packing — run on host over the gathered maps (SURVEY §7 hard part #2).

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
from ..ops.filter import GaussianBlur, _box_sum_int
from ..ops.deriv import Sobel
from .fast import fast_keypoint_mask
from .keypoint import KeyPoint, retain_best

__all__ = ["ORB", "ORB_create"]

HARRIS_K = 0.04
_PATTERN = np.load(os.path.join(os.path.dirname(__file__), "orb_pattern.npy"))


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


def _ic_kernels(half_patch: int):
    """Disk-masked u and v coordinate kernels for dense m10/m01 maps."""
    umax = _umax_table(half_patch)
    k = 2 * half_patch + 1
    ku = np.zeros((k, k), np.float32)
    kv = np.zeros((k, k), np.float32)
    c = half_patch
    # v = 0 line
    for u in range(-half_patch, half_patch + 1):
        ku[c, c + u] = u
    for v in range(1, half_patch + 1):
        d = int(umax[v])
        for u in range(-d, d + 1):
            ku[c + v, c + u] = u
            ku[c - v, c + u] = u
            kv[c + v, c + u] = v
            kv[c - v, c + u] = -v
    return ku, kv


def _level_maps(img4d, fast_threshold: int, half_patch: int):
    """One fused device program per level: FAST score/mask, dense Harris
    a/b/c sums, IC moment maps, blurred image."""
    score, keep = fast_keypoint_mask(img4d, fast_threshold, True)

    # dense Harris building blocks (int32-exact sums over 7x7 blocks)
    src = img4d
    from ..core.arrays import from_batched
    dx, _ = to_batched(Sobel(from_batched(src, "nhwc"), K.CV_16S, 1, 0, 3,
                             borderType=K.BORDER_REPLICATE))
    dy, _ = to_batched(Sobel(from_batched(src, "nhwc"), K.CV_16S, 0, 1, 3,
                             borderType=K.BORDER_REPLICATE))
    dxi = dx.astype(jnp.int32)
    dyi = dy.astype(jnp.int32)
    a = _box_sum_int(dxi * dxi, (7, 7), (-1, -1), K.BORDER_REPLICATE)
    b = _box_sum_int(dyi * dyi, (7, 7), (-1, -1), K.BORDER_REPLICATE)
    c = _box_sum_int(dxi * dyi, (7, 7), (-1, -1), K.BORDER_REPLICATE)

    # IC moment maps via two disk-kernel convs (MXU)
    ku, kv = _ic_kernels(half_patch)
    from jax import lax
    kk = ku.shape[0]
    pad = jnp.pad(img4d.astype(jnp.float32),
                  ((0, 0), (half_patch, half_patch),
                   (half_patch, half_patch), (0, 0)))
    kern = jnp.stack([jnp.asarray(ku), jnp.asarray(kv)], axis=-1)[:, :, None, :]
    m = lax.conv_general_dilated(
        pad, kern, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
    m10 = m[..., 0:1]
    m01 = m[..., 1:2]

    blurred, _ = to_batched(GaussianBlur(from_batched(img4d, "nhwc"), (7, 7),
                                         2.0, 2.0, K.BORDER_REFLECT_101))
    return score, keep, a, b, c, m10, m01, blurred


class ORB:
    """cv2.ORB-compatible detector/descriptor."""

    def __init__(self, nfeatures=500, scaleFactor=1.2, nlevels=8,
                 edgeThreshold=31, firstLevel=0, WTA_K=2,
                 scoreType=K.ORB_HARRIS_SCORE, patchSize=31,
                 fastThreshold=20):
        assert WTA_K == 2, "only WTA_K=2 implemented"
        assert firstLevel == 0, "firstLevel != 0 not implemented"
        self.nfeatures = nfeatures
        self.scale_factor = scaleFactor
        self.nlevels = nlevels
        self.edge_threshold = edgeThreshold
        self.patch_size = patchSize
        self.fast_threshold = fastThreshold
        self.score_type = scoreType
        self._maps_jit = jax.jit(_level_maps, static_argnums=(1, 2))

    # -- cv2 API ------------------------------------------------------
    def detect(self, image, mask=None):
        return self.detectAndCompute(image, mask, compute_desc=False)[0]

    def compute(self, image, keypoints):
        return keypoints, self._describe(image, keypoints)

    def detectAndCompute(self, image, mask=None, compute_desc=True):
        img = np.asarray(image)
        if img.ndim == 3:
            from ..ops.color import cvtColor
            img = np.asarray(cvtColor(img, K.COLOR_BGR2GRAY))
        H, W = img.shape

        nlevels = self.nlevels
        layer_scale = [float(np.float32(self.scale_factor) ** lv)
                       for lv in range(nlevels)]
        # per-level feature budget (orb.cpp:841-849, float32 arithmetic)
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

        # pyramid: level L resized from level L-1 with INTER_LINEAR_EXACT
        levels = []
        prev = img
        for lv in range(nlevels):
            if lv == 0:
                cur = img
            else:
                sz = (int(np.rint(W / layer_scale[lv])),
                      int(np.rint(H / layer_scale[lv])))
                cur = np.asarray(resize(prev, sz,
                                        interpolation=K.INTER_LINEAR_EXACT))
            levels.append(cur)
            prev = cur

        half_patch = self.patch_size // 2
        all_kps = []
        per_level_counts = []
        blurred_levels = []
        for lv, cur in enumerate(levels):
            x4, _ = to_batched(cur)
            score, keep, a, b, c, m10, m01, blurred = self._maps_jit(
                x4, self.fast_threshold, half_patch)
            blurred_levels.append(np.asarray(blurred)[0, :, :, 0])
            s = np.asarray(score)[0, :, :, 0]
            m = np.asarray(keep)[0, :, :, 0]
            an = np.asarray(a)[0, :, :, 0].astype(np.float32)
            bn = np.asarray(b)[0, :, :, 0].astype(np.float32)
            cn = np.asarray(c)[0, :, :, 0].astype(np.float32)
            m10n = np.asarray(m10)[0, :, :, 0]
            m01n = np.asarray(m01)[0, :, :, 0]

            ys, xs = np.nonzero(m)
            kps = [KeyPoint(float(xx), float(yy), 7.0, -1.0, float(s[yy, xx]),
                            lv)
                   for yy, xx in zip(ys, xs)]
            # runByImageBorder with edgeThreshold
            h, w = cur.shape
            et = self.edge_threshold
            kps = [k for k in kps
                   if et <= k.pt[0] < w - et and et <= k.pt[1] < h - et]
            # retainBest(2N) by FAST score
            if self.score_type == K.ORB_HARRIS_SCORE:
                kps = retain_best(kps, 2 * nper[lv])
                # Harris rescore (dense lookup) then retainBest(N)
                scale = np.float32(1.0 / ((1 << 2) * 7 * 255.0))
                s4 = scale * scale * scale * scale
                for k in kps:
                    x0 = int(np.rint(k.pt[0]))
                    y0 = int(np.rint(k.pt[1]))
                    aa, bb, cc = an[y0, x0], bn[y0, x0], cn[y0, x0]
                    k.response = float((aa * bb - cc * cc
                                        - HARRIS_K * (aa + bb) * (aa + bb)) * s4)
                kps = retain_best(kps, nper[lv])
            else:
                kps = retain_best(kps, nper[lv])
            # angle from IC moments
            for k in kps:
                x0 = int(np.rint(k.pt[0]))
                y0 = int(np.rint(k.pt[1]))
                k.angle = float(_fast_atan2(np.float32(m01n[y0, x0]),
                                            np.float32(m10n[y0, x0])))
            sf = layer_scale[lv]
            for k in kps:
                k.size = self.patch_size * sf
                k.octave = lv
                k.pt = (k.pt[0] * sf, k.pt[1] * sf)
            per_level_counts.append(len(kps))
            all_kps.extend(kps)

        if not compute_desc:
            return all_kps, None

        desc = self._describe_levels(all_kps, blurred_levels, layer_scale)
        return all_kps, desc

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
