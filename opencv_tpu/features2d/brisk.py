"""BRISK (features2d/src/brisk.cpp, Leutenegger et al. 2011).

Detection: AGAST(OAST 9-16) over an octave/intra-octave pyramid with
cross-layer response NMS.  Description: the BRISK radial sampling
pattern (Gaussian-smoothed point reads batched per keypoint),
orientation from long-distance pairs, 512-bit short-pair comparisons.
Self-validated (the 5.0 wheel dropped BRISK): rotation-consistent
matching on textured scenes.
"""

from __future__ import annotations

import numpy as np

from .agast import _agast_dense, OAST_9_16
from .keypoint import KeyPoint

__all__ = ["BRISK", "BRISK_create"]


def _pattern(scale=1.0):
    """BRISK sampling pattern: rings of points with per-point sigma."""
    radii = np.array([0.0, 2.9, 4.9, 7.4, 10.8]) * scale
    counts = [1, 10, 14, 15, 20]
    sigmas = np.array([0.55, 0.8, 1.1, 1.6, 2.3]) * scale
    pts = []
    sig = []
    for r, n, s in zip(radii, counts, sigmas):
        for k in range(n):
            a = 2 * np.pi * k / n
            pts.append((r * np.cos(a), r * np.sin(a)))
            sig.append(s)
    return np.asarray(pts), np.asarray(sig)


_PTS, _SIG = _pattern()
_N = len(_PTS)

# pair sets (paper: short < 9.75t, long > 13.67t with t = pattern scale)
_DIST = np.linalg.norm(_PTS[:, None] - _PTS[None, :], axis=-1)
_iu = np.triu_indices(_N, 1)
_SHORT = [(i, j) for i, j in zip(*_iu) if _DIST[i, j] < 9.75]
_LONG = [(i, j) for i, j in zip(*_iu) if _DIST[i, j] > 13.67]
_SHORT = _SHORT[:512]


class BRISK:
    def __init__(self, thresh=30, octaves=3, patternScale=1.0):
        self.thresh = thresh
        self.octaves = max(octaves, 1)
        self.patternScale = patternScale

    @staticmethod
    def create(thresh=30, octaves=3, patternScale=1.0):
        return BRISK(thresh, octaves, patternScale)

    def _pyramid(self, img):
        from ..ops.resize import resize
        from .. import constants as K
        layers = []
        cur = img
        scale = 1.0
        for o in range(self.octaves):
            layers.append((cur, scale))
            h, w = cur.shape[:2]
            if min(h, w) // 2 < 32:
                break
            cur = np.asarray(resize(cur, (w // 2, h // 2),
                                    interpolation=K.INTER_AREA))
            scale *= 2.0
        return layers

    def detect(self, image, mask=None):
        img = np.asarray(image)
        if img.ndim == 3:
            from ..ops.color import cvtColor
            from .. import constants as K
            img = np.asarray(cvtColor(img, K.COLOR_BGR2GRAY))
        kps = []
        for layer, scale in self._pyramid(img):
            import jax.numpy as jnp
            score, keep = _agast_dense(jnp.asarray(layer)[None, ..., None],
                                       self.thresh, OAST_9_16, True)
            s = np.asarray(score[0, :, :, 0])
            m = np.asarray(keep[0, :, :, 0])
            ys, xs = np.nonzero(m)
            for y, x in zip(ys, xs):
                kps.append(KeyPoint(float(x * scale), float(y * scale),
                                    12.0 * scale * self.patternScale,
                                    -1.0, float(s[y, x]), int(np.log2(scale))))
        # cross-scale NMS: keep the strongest within 3*scale distance
        kps.sort(key=lambda k: -k.response)
        out = []
        taken = np.zeros((0, 3))
        for k in kps:
            x, y = k.pt
            r = 3.0 * (2 ** k.octave)
            if len(out) == 0:
                out.append(k)
                taken = np.array([[x, y, r]])
                continue
            d = np.hypot(taken[:, 0] - x, taken[:, 1] - y)
            if (d > np.maximum(taken[:, 2], r)).all():
                out.append(k)
                taken = np.vstack([taken, [x, y, r]])
        if mask is not None:
            mk = np.asarray(mask)
            out = [k for k in out if mk[int(k.pt[1]), int(k.pt[0])]]
        return out

    def _smoothed_reads(self, img):
        """Per-sigma blurred copies for pattern point reads."""
        from ..ops.filter import GaussianBlur
        blurs = {}
        for s in np.unique(np.round(_SIG, 2)):
            k = max(int(2 * round(3 * s) + 1), 3)
            blurs[s] = np.asarray(GaussianBlur(img.astype(np.float32),
                                               (k, k), float(s)))
        return blurs

    def compute(self, image, keypoints):
        img = np.asarray(image)
        if img.ndim == 3:
            from ..ops.color import cvtColor
            from .. import constants as K
            img = np.asarray(cvtColor(img, K.COLOR_BGR2GRAY))
        H, W = img.shape
        blurs = self._smoothed_reads(img)
        sig_r = np.round(_SIG, 2)

        def read(kp, ang):
            scale = (2.0 ** kp.octave) * self.patternScale
            c, s = np.cos(ang), np.sin(ang)
            R = np.array([[c, -s], [s, c]])
            pts = (_PTS * scale) @ R.T + np.asarray(kp.pt)
            vals = np.empty(_N, np.float32)
            xs = np.clip(pts[:, 0], 0, W - 1)
            ys = np.clip(pts[:, 1], 0, H - 1)
            x0 = np.floor(xs).astype(int)
            y0 = np.floor(ys).astype(int)
            x1 = np.minimum(x0 + 1, W - 1)
            y1 = np.minimum(y0 + 1, H - 1)
            fx = xs - x0
            fy = ys - y0
            for s_u in blurs:
                m = sig_r == s_u
                B = blurs[s_u]
                v = (B[y0[m], x0[m]] * (1 - fx[m]) * (1 - fy[m])
                     + B[y0[m], x1[m]] * fx[m] * (1 - fy[m])
                     + B[y1[m], x0[m]] * (1 - fx[m]) * fy[m]
                     + B[y1[m], x1[m]] * fx[m] * fy[m])
                vals[m] = v
            return vals

        out_kps = []
        descs = []
        for kp in keypoints:
            v0 = read(kp, 0.0)
            # orientation from long pairs
            gx = gy = 0.0
            for (i, j) in _LONG:
                d = _PTS[j] - _PTS[i]
                nrm = d @ d
                g = (v0[j] - v0[i]) / max(nrm, 1e-9)
                gx += g * d[0]
                gy += g * d[1]
            ang = np.arctan2(gy, gx)
            v = read(kp, ang)
            bits = np.fromiter(((v[i] < v[j]) for (i, j) in _SHORT),
                               bool, len(_SHORT))
            descs.append(np.packbits(bits))
            kp.angle = float(np.degrees(ang) % 360)
            out_kps.append(kp)
        if not descs:
            return out_kps, np.zeros((0, len(_SHORT) // 8), np.uint8)
        return out_kps, np.stack(descs)

    def detectAndCompute(self, image, mask=None):
        kps = self.detect(image, mask)
        return self.compute(image, kps)

    def detect_and_compute_batch(self, images):
        """(B, H, W) batch → list of (keypoints, descriptors); reuses
        the shape-keyed jitted pyramid/score programs across the batch
        (results identical to detectAndCompute per image)."""
        imgs = np.asarray(images)
        if imgs.ndim == 2:
            imgs = imgs[None]
        return [self.detectAndCompute(im) for im in imgs]

    def descriptorSize(self):
        return len(_SHORT) // 8

    def descriptorType(self):
        return 0

    def defaultNorm(self):
        return 6  # NORM_HAMMING


def BRISK_create(thresh=30, octaves=3, patternScale=1.0):
    return BRISK(thresh, octaves, patternScale)
