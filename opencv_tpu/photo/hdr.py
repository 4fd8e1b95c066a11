"""HDR: exposure merging and tonemapping (photo/src/merge.cpp,
calibrate.cpp, tonemap.cpp).

TPU-native: Mertens exposure fusion is weights + Laplacian pyramid
blending — built from this library's bit-exact pyrDown/pyrUp; Debevec
merging and the tonemappers are fused elementwise math over the batch.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import constants as K
from ..core.arrays import to_batched, from_batched
from ..ops.pyramids import pyrDown, pyrUp

__all__ = ["MergeMertens", "createMergeMertens", "MergeDebevec",
           "createMergeDebevec", "CalibrateDebevec",
           "createCalibrateDebevec", "Tonemap", "createTonemap",
           "TonemapDrago", "createTonemapDrago", "TonemapReinhard",
           "createTonemapReinhard"]


class MergeMertens:
    """Exposure fusion (Mertens et al.; merge.cpp MergeMertensImpl)."""

    def __init__(self, contrast_weight=1.0, saturation_weight=1.0,
                 exposure_weight=0.0):
        self.wc = contrast_weight
        self.ws = saturation_weight
        self.we = exposure_weight

    def process(self, images, dst=None):
        imgs = [np.asarray(im).astype(np.float32) / 255.0 for im in images]
        n = len(imgs)
        H, W = imgs[0].shape[:2]
        C = imgs[0].shape[2] if imgs[0].ndim == 3 else 1

        weights = []
        for im in imgs:
            gray = im.mean(axis=-1) if im.ndim == 3 else im
            # contrast: |laplacian|
            from ..ops.deriv import Laplacian
            lap = np.abs(np.asarray(Laplacian(gray.astype(np.float32),
                                              K.CV_32F)))
            contrast = lap ** self.wc if self.wc != 1.0 else lap
            if im.ndim == 3:
                mean = im.mean(axis=-1, keepdims=True)
                sat = np.sqrt(((im - mean) ** 2).mean(axis=-1))
            else:
                sat = np.zeros_like(gray)
            saturation = sat ** self.ws if self.ws != 1.0 else sat
            wexp = np.exp(-((im - 0.5) ** 2).sum(axis=-1 if im.ndim == 3 else None)
                          / (2 * 0.2 * 0.2) / (C if im.ndim == 3 else 1))
            exposure = wexp ** self.we if self.we != 0.0 else 1.0
            w = contrast * saturation * exposure + 1e-12
            weights.append(w)
        wsum = np.sum(weights, axis=0)
        weights = [w / wsum for w in weights]

        # pyramid blending
        levels = max(int(np.floor(np.log2(min(H, W)))) - 1, 1)
        out_pyr = None
        for im, w in zip(imgs, weights):
            # gaussian pyramid of weights, laplacian pyramid of image
            wp = [w.astype(np.float32)]
            ip = [im.astype(np.float32)]
            for _ in range(levels):
                wp.append(np.asarray(pyrDown(wp[-1])))
                ip.append(np.asarray(pyrDown(ip[-1])))
            lap = []
            for lv in range(levels):
                up = np.asarray(pyrUp(ip[lv + 1]))
                up = up[:ip[lv].shape[0], :ip[lv].shape[1]]
                lap.append(ip[lv] - up)
            lap.append(ip[-1])
            contrib = [lap[lv] * (wp[lv][..., None] if im.ndim == 3 else wp[lv])
                       for lv in range(levels + 1)]
            if out_pyr is None:
                out_pyr = contrib
            else:
                out_pyr = [a + b for a, b in zip(out_pyr, contrib)]

        res = out_pyr[-1]
        for lv in range(levels - 1, -1, -1):
            up = np.asarray(pyrUp(res))
            up = up[:out_pyr[lv].shape[0], :out_pyr[lv].shape[1]]
            res = up + out_pyr[lv]
        return res


def createMergeMertens(contrast_weight=1.0, saturation_weight=1.0,
                       exposure_weight=0.0):
    return MergeMertens(contrast_weight, saturation_weight, exposure_weight)


class MergeDebevec:
    """HDR radiance merge (merge.cpp MergeDebevecImpl): weighted average
    of ln(response⁻¹(Z)) - ln(dt) with the triangle weight."""

    def process(self, images, times, response=None, dst=None):
        times = np.asarray(times, np.float64).reshape(-1)
        if response is None:
            response = np.arange(256, dtype=np.float32).reshape(256, 1, 1)
            response = np.tile(response, (1, 1, 3)) / 128.0
            response = np.maximum(response, 1e-4)
        resp = np.asarray(response, np.float32).reshape(256, -1)
        w = np.minimum(np.arange(256), 255 - np.arange(256)).astype(np.float32)
        w = np.maximum(w, 0.02 * 255)
        acc = None
        wacc = None
        for im, t in zip(images, times):
            z = np.asarray(im)
            C = z.shape[2] if z.ndim == 3 else 1
            lres = np.log(resp[:, :C])  # (256, C)
            lnE = lres[z.astype(np.int64), np.arange(C)[None, None]] \
                - np.log(t)
            wz = w[z.astype(np.int64)]
            acc = wz * lnE if acc is None else acc + wz * lnE
            wacc = wz if wacc is None else wacc + wz
        return np.exp(acc / np.maximum(wacc, 1e-9)).astype(np.float32)


def createMergeDebevec():
    return MergeDebevec()


class CalibrateDebevec:
    """Response curve recovery (calibrate.cpp): least squares on sampled
    pixels with smoothness prior (Debevec & Malik)."""

    def __init__(self, samples=70, lambda_=10.0, random=False):
        self.samples = samples
        self.lam = lambda_

    def process(self, images, times, dst=None):
        times = np.asarray(times, np.float64).reshape(-1)
        z0 = np.asarray(images[0])
        C = z0.shape[2] if z0.ndim == 3 else 1
        H, W = z0.shape[:2]
        rng = np.random.default_rng(0)
        ys = rng.integers(0, H, self.samples)
        xs = rng.integers(0, W, self.samples)
        out = np.zeros((256, 1, C), np.float32)
        w = np.minimum(np.arange(256), 255 - np.arange(256)).astype(np.float64) + 1
        for c in range(C):
            Zs = np.stack([np.asarray(im)[ys, xs, c] if z0.ndim == 3
                           else np.asarray(im)[ys, xs] for im in images])
            P, S = Zs.shape[0], Zs.shape[1]
            A = np.zeros((P * S + 255, 256 + S))
            b = np.zeros(P * S + 255)
            k = 0
            for i in range(S):
                for j in range(P):
                    z = int(Zs[j, i])
                    A[k, z] = w[z]
                    A[k, 256 + i] = -w[z]
                    b[k] = w[z] * np.log(times[j])
                    k += 1
            A[k, 128] = 1.0
            k += 1
            for z in range(1, 255):
                A[k, z - 1] = self.lam * w[z]
                A[k, z] = -2 * self.lam * w[z]
                A[k, z + 1] = self.lam * w[z]
                k += 1
            g = np.linalg.lstsq(A, b, rcond=None)[0][:256]
            out[:, 0, c] = np.exp(g)
        return out


def createCalibrateDebevec(samples=70, lambda_=10.0, random=False):
    return CalibrateDebevec(samples, lambda_, random)


class Tonemap:
    def __init__(self, gamma=1.0):
        self.gamma = gamma

    def process(self, src, dst=None):
        x = np.asarray(src, np.float32)
        mn, mx = x.min(), x.max()
        if mx > mn:
            x = (x - mn) / (mx - mn)
        return np.power(x, 1.0 / self.gamma).astype(np.float32)


def createTonemap(gamma=1.0):
    return Tonemap(gamma)


class TonemapDrago(Tonemap):
    def __init__(self, gamma=1.0, saturation=1.0, bias=0.85):
        super().__init__(gamma)
        self.saturation = saturation
        self.bias = bias

    def process(self, src, dst=None):
        img = np.asarray(src, np.float32)
        gray = img.mean(axis=-1) if img.ndim == 3 else img
        Lwa = np.exp(np.mean(np.log(np.maximum(gray, 1e-6))))
        Lw = gray / Lwa
        Lmax = Lw.max()
        c = np.log(self.bias) / np.log(0.5)
        Ld = (np.log1p(Lw) /
              np.log1p(Lmax)) / np.log(2 + 8 * ((Lw / max(Lmax, 1e-9)) ** c))
        ratio = Ld / np.maximum(gray / Lwa, 1e-9)
        out = img * (ratio[..., None] if img.ndim == 3 else ratio)
        mn, mx = out.min(), out.max()
        if mx > mn:
            out = (out - mn) / (mx - mn)
        return np.power(out, 1.0 / self.gamma).astype(np.float32)


def createTonemapDrago(gamma=1.0, saturation=1.0, bias=0.85):
    return TonemapDrago(gamma, saturation, bias)


class TonemapReinhard(Tonemap):
    def __init__(self, gamma=1.0, intensity=0.0, light_adapt=1.0,
                 color_adapt=0.0):
        super().__init__(gamma)
        self.intensity = intensity
        self.light_adapt = light_adapt
        self.color_adapt = color_adapt

    def process(self, src, dst=None):
        img = np.asarray(src, np.float32)
        gray = img.mean(axis=-1) if img.ndim == 3 else img
        logmean = np.exp(np.mean(np.log(np.maximum(gray, 1e-6))))
        key = np.float32(0.18 * (2.0 ** self.intensity))
        L = key * gray / max(logmean, 1e-9)
        Ld = L / (1 + L)
        ratio = Ld / np.maximum(gray, 1e-9)
        out = img * (ratio[..., None] if img.ndim == 3 else ratio)
        out = np.clip(out, 0, 1)
        return np.power(out, 1.0 / self.gamma).astype(np.float32)


def createTonemapReinhard(gamma=1.0, intensity=0.0, light_adapt=1.0,
                          color_adapt=0.0):
    return TonemapReinhard(gamma, intensity, light_adapt, color_adapt)
