"""Panorama stitching (modules/stitching) — the full pipeline composed
from this framework's own stages: ORB features → Hamming matches →
RANSAC homography → device warpPerspective → feather blending
(stitcher.cpp's detail pipeline, simplified to the two-image planar
case; exposure compensation and graph-cut seams are round-2 gaps).
"""

from __future__ import annotations

import numpy as np

from . import constants as K
from .calib3d import RANSAC
from .features2d import ORB, BFMatcher
from .calib3d import findHomography
from .ops.warp import warpPerspective

__all__ = ["Stitcher", "Stitcher_create"]

STITCHER_OK = 0
STITCHER_ERR_NEED_MORE_IMGS = 1


class Stitcher:
    OK = STITCHER_OK
    ERR_NEED_MORE_IMGS = STITCHER_ERR_NEED_MORE_IMGS

    def __init__(self, mode=0):
        self.orb = ORB(nfeatures=1000)
        self.matcher = BFMatcher(K.NORM_HAMMING, crossCheck=True)

    @staticmethod
    def create(mode=0):
        return Stitcher(mode)

    def stitch(self, images, pano=None):
        if len(images) < 2:
            return STITCHER_ERR_NEED_MORE_IMGS, None
        base = np.asarray(images[0])
        for nxt in images[1:]:
            base = self._stitch_pair(base, np.asarray(nxt))
            if base is None:
                return STITCHER_ERR_NEED_MORE_IMGS, None
        return STITCHER_OK, base

    def _stitch_pair(self, a, b):
        k1, d1 = self.orb.detectAndCompute(a, None)
        k2, d2 = self.orb.detectAndCompute(b, None)
        if d1 is None or d2 is None or len(d1) < 8 or len(d2) < 8:
            return None
        matches = self.matcher.match(d2, d1)  # b → a
        matches = sorted(matches, key=lambda m: m.distance)[:200]
        if len(matches) < 8:
            return None
        src = np.float32([k2[m.queryIdx].pt for m in matches])
        dst = np.float32([k1[m.trainIdx].pt for m in matches])
        H, mask = findHomography(src, dst, RANSAC, 3.0)
        if H is None:
            return None
        ha, wa = a.shape[:2]
        hb, wb = b.shape[:2]
        # output canvas bounds
        corners = np.array([[0, 0], [wb, 0], [wb, hb], [0, hb]], np.float64)
        ch = np.column_stack([corners, np.ones(4)]) @ H.T
        ch = ch[:, :2] / ch[:, 2:3]
        minx = min(0.0, ch[:, 0].min())
        miny = min(0.0, ch[:, 1].min())
        maxx = max(float(wa), ch[:, 0].max())
        maxy = max(float(ha), ch[:, 1].max())
        T = np.array([[1, 0, -minx], [0, 1, -miny], [0, 0, 1]])
        W = int(np.ceil(maxx - minx))
        Hh = int(np.ceil(maxy - miny))
        warped_b = np.asarray(warpPerspective(b, T @ H, (W, Hh)))
        canvas = np.zeros_like(warped_b)
        ox, oy = int(round(-minx)), int(round(-miny))
        canvas[oy:oy + ha, ox:ox + wa] = a
        mask_a = np.zeros((Hh, W), bool)
        mask_a[oy:oy + ha, ox:ox + wa] = True
        mask_b = warped_b.sum(axis=-1) > 0 if warped_b.ndim == 3 \
            else warped_b > 0
        both = mask_a & mask_b
        if not both.any():
            out = canvas.copy()
            out[mask_b] = warped_b[mask_b]
            return out
        # multiband (Burt-Adelson) blending over the full canvas
        from .blenders import blend_multiband
        from .ops.shape import distanceTransform
        from . import constants as K2
        da = np.asarray(distanceTransform(
            (mask_a.astype(np.uint8)) * 255, K2.DIST_L1, 3))
        db = np.asarray(distanceTransform(
            (mask_b.astype(np.uint8)) * 255, K2.DIST_L1, 3))
        wa = np.where(mask_a, np.where(both, (da >= db).astype(np.float32),
                                       1.0), 0.0)
        wb = np.where(mask_b, 1.0 - wa, 0.0)
        out = blend_multiband([canvas, warped_b], [wa, wb], num_bands=4)
        out[~(mask_a | mask_b)] = 0
        return out


def Stitcher_create(mode=0):
    return Stitcher(mode)
