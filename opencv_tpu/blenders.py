"""stitching blenders (stitching/src/blenders.cpp).

MultiBandBlender: Burt-Adelson Laplacian-pyramid blending — built from
this framework's pyrDown/pyrUp device ops, so each band is one fused
XLA program.  FeatherBlender: distance-transform weighted averaging.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .ops.pyramids import pyrDown, pyrUp
from .ops.shape import distanceTransform
from . import constants as K

__all__ = ["MultiBandBlender", "FeatherBlender", "blend_multiband"]


def _gauss_pyr(img, levels):
    pyr = [img]
    for _ in range(levels):
        pyr.append(np.asarray(pyrDown(pyr[-1])))
    return pyr


def _lap_pyr(img, levels):
    g = _gauss_pyr(img.astype(np.float32), levels)
    lap = []
    for i in range(levels):
        up = np.asarray(pyrUp(g[i + 1]))
        lap.append(g[i] - up)
    lap.append(g[levels])
    return lap


def blend_multiband(images, masks, num_bands=5):
    """Blend len(images) aligned images with weights from masks
    (float in [0,1], same HxW)."""
    H, W = images[0].shape[:2]
    levels = min(num_bands, int(np.log2(max(min(H, W) // 16, 2))))
    # pad to a multiple of 2^levels so every pyrUp doubles exactly
    mult = 1 << levels
    Hp = (H + mult - 1) // mult * mult
    Wp = (W + mult - 1) // mult * mult
    if (Hp, Wp) != (H, W):
        pad = lambda a: np.pad(a, ((0, Hp - H), (0, Wp - W))
                               + ((0, 0),) * (a.ndim - 2), mode="edge")
        images = [pad(np.asarray(i)) for i in images]
        masks = [pad(np.asarray(m)) for m in masks]
        return blend_multiband(images, masks, num_bands)[:H, :W]
    acc = None
    wacc = None
    for img, m in zip(images, masks):
        lap = _lap_pyr(np.asarray(img, np.float32), levels)
        wpyr = _gauss_pyr(np.asarray(m, np.float32), levels)
        if acc is None:
            acc = [np.zeros_like(l) for l in lap]
            wacc = [np.zeros_like(w) for w in wpyr]
        for i in range(levels + 1):
            w = wpyr[i][..., None] if lap[i].ndim == 3 else wpyr[i]
            acc[i] += lap[i] * w
            wacc[i] += wpyr[i]
    out = None
    for i in range(levels, -1, -1):
        w = wacc[i][..., None] if acc[i].ndim == 3 else wacc[i]
        band = acc[i] / np.maximum(w, 1e-6)
        if out is None:
            out = band
        else:
            out = np.asarray(pyrUp(out)) + band
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


class MultiBandBlender:
    def __init__(self, try_gpu=False, num_bands=5, weight_type=None):
        self.num_bands = num_bands
        self._imgs = []
        self._masks = []
        self._size = None

    def prepare(self, roi_or_corners, sizes=None):
        if sizes is None:
            x, y, w, h = roi_or_corners
            self._size = (h, w)
        self._imgs = []
        self._masks = []

    def feed(self, img, mask, tl=(0, 0)):
        H, W = self._size
        canvas = np.zeros((H, W) + np.asarray(img).shape[2:], np.float32)
        m = np.zeros((H, W), np.float32)
        x, y = tl
        ih, iw = np.asarray(img).shape[:2]
        canvas[y:y + ih, x:x + iw] = np.asarray(img)
        m[y:y + ih, x:x + iw] = (np.asarray(mask) > 0).astype(np.float32)
        self._imgs.append(canvas)
        self._masks.append(m)

    def blend(self, dst=None, dst_mask=None):
        out = blend_multiband(self._imgs, self._masks, self.num_bands)
        mask = (np.sum(self._masks, axis=0) > 0).astype(np.uint8) * 255
        return out, mask


class FeatherBlender:
    def __init__(self, sharpness=0.02):
        self.sharpness = sharpness
        self._imgs = []
        self._weights = []
        self._size = None

    def prepare(self, roi, sizes=None):
        x, y, w, h = roi
        self._size = (h, w)
        self._imgs = []
        self._weights = []

    def feed(self, img, mask, tl=(0, 0)):
        H, W = self._size
        canvas = np.zeros((H, W) + np.asarray(img).shape[2:], np.float32)
        m = np.zeros((H, W), np.uint8)
        x, y = tl
        ih, iw = np.asarray(img).shape[:2]
        canvas[y:y + ih, x:x + iw] = np.asarray(img)
        m[y:y + ih, x:x + iw] = (np.asarray(mask) > 0).astype(np.uint8) * 255
        dist = np.asarray(distanceTransform(m, K.DIST_L1, 3))
        w_ = np.minimum(dist * self.sharpness, 1.0)
        self._imgs.append(canvas)
        self._weights.append(w_.astype(np.float32))

    def blend(self, dst=None, dst_mask=None):
        wsum = np.sum(self._weights, axis=0)
        acc = np.zeros_like(self._imgs[0])
        for img, w_ in zip(self._imgs, self._weights):
            acc += img * (w_[..., None] if img.ndim == 3 else w_)
        out = acc / np.maximum(wsum[..., None] if acc.ndim == 3 else wsum,
                               1e-6)
        mask = (wsum > 0).astype(np.uint8) * 255
        return np.clip(np.rint(out), 0, 255).astype(np.uint8), mask
