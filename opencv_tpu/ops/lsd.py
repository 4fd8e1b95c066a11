"""Line Segment Detector (imgproc/src/lsd.cpp, von Gioi et al. LSD).

The dense stages — downscale blur, level-line angle field, gradient
magnitude, ordering — are vectorized; the angle-aligned region growing
that the reference does with pixel linked-lists is a host BFS per seed.
Validation uses the aligned-density / size rule (a practical stand-in
for the full NFA test).
"""

from __future__ import annotations

import numpy as np

__all__ = ["LineSegmentDetector", "createLineSegmentDetector",
           "LSD_REFINE_NONE", "LSD_REFINE_STD", "LSD_REFINE_ADV"]

LSD_REFINE_NONE = 0
LSD_REFINE_STD = 1
LSD_REFINE_ADV = 2


class LineSegmentDetector:
    def __init__(self, refine=LSD_REFINE_STD, scale=0.8, sigma_scale=0.6,
                 quant=2.0, ang_th=22.5, log_eps=0.0, density_th=0.7,
                 n_bins=1024):
        self.scale = scale
        self.sigma_scale = sigma_scale
        self.quant = quant
        self.ang_th = ang_th
        self.density_th = density_th

    def detect(self, image):
        from ..ops.filter import GaussianBlur
        from ..ops.resize import resize
        from .. import constants as K

        img = np.asarray(image)
        if img.ndim == 3:
            from ..ops.color import cvtColor
            img = np.asarray(cvtColor(img, K.COLOR_BGR2GRAY))
        H0, W0 = img.shape

        # downscale with Gaussian prefilter (lsd.cpp:LOG_NT scale step)
        s = self.scale
        if s != 1.0:
            sigma = self.sigma_scale / s
            ksz = int(np.ceil(sigma * 6)) | 1
            f = np.asarray(GaussianBlur(img.astype(np.float32),
                                        (ksz, ksz), sigma))
            img_s = np.asarray(resize(f, (int(round(W0 * s)),
                                          int(round(H0 * s))),
                                      interpolation=K.INTER_LINEAR))
        else:
            img_s = img.astype(np.float32)
        H, W = img_s.shape

        # level-line field: angle orthogonal to gradient (2x2 scheme)
        a = img_s
        gx = np.zeros((H, W))
        gy = np.zeros((H, W))
        gx[:-1, :-1] = (a[:-1, 1:] - a[:-1, :-1]
                        + a[1:, 1:] - a[1:, :-1]) / 2.0
        gy[:-1, :-1] = (a[1:, :-1] - a[:-1, :-1]
                        + a[1:, 1:] - a[:-1, 1:]) / 2.0
        mag = np.hypot(gx, gy)
        ang = np.arctan2(gx, -gy)        # level-line angle

        rho = self.quant / np.sin(np.deg2rad(self.ang_th))
        usable = mag > rho
        prec = np.deg2rad(self.ang_th)

        order = np.argsort(-mag, axis=None)
        used = np.zeros((H, W), bool)
        segs = []

        def angle_diff(t1, t2):
            d = t1 - t2
            return np.abs(np.arctan2(np.sin(d), np.cos(d)))

        min_size = int(-2.5 * (np.log10(H) + np.log10(W)) / np.log10(prec
                       / np.pi)) if False else max(
            int(0.04 * min(H, W)) + 5, 10)
        for flat in order:
            yx = np.unravel_index(flat, (H, W))
            if used[yx] or not usable[yx]:
                continue
            # region grow
            theta = ang[yx]
            sx = np.sin(theta)
            cx = np.cos(theta)
            region = [yx]
            used[yx] = True
            head = 0
            while head < len(region):
                y, x = region[head]
                head += 1
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        ny, nx = y + dy, x + dx
                        if 0 <= ny < H and 0 <= nx < W and \
                                not used[ny, nx] and usable[ny, nx] and \
                                angle_diff(ang[ny, nx], theta) < prec:
                            used[ny, nx] = True
                            region.append((ny, nx))
                            # update region angle (running mean direction)
                            sx += np.sin(ang[ny, nx])
                            cx += np.cos(ang[ny, nx])
                            theta = np.arctan2(sx, cx)
            if len(region) < min_size:
                continue
            pts = np.array(region, np.float64)      # (n, 2) y, x
            w = mag[pts[:, 0].astype(int), pts[:, 1].astype(int)]
            cy, cxm = np.average(pts, axis=0, weights=w)
            d = pts - (cy, cxm)
            cov = (d * w[:, None]).T @ d / w.sum()
            evals, evecs = np.linalg.eigh(cov)
            main = evecs[:, np.argmax(evals)]        # (dy, dx)
            t = d @ main
            t0, t1 = t.min(), t.max()
            p0 = np.array([cxm, cy]) + t0 * main[::-1]
            p1 = np.array([cxm, cy]) + t1 * main[::-1]
            length = t1 - t0
            if length < 1:
                continue
            # density check (lsd.cpp refine step)
            perp = np.abs(d @ evecs[:, np.argmin(evals)])
            width = max(2 * np.percentile(perp, 95), 1.0)
            density = len(region) / (length * width)
            if density < self.density_th:
                continue
            segs.append([p0[0], p0[1], p1[0], p1[1], width])

        if not segs:
            return None, None, None, None
        segs = np.asarray(segs)
        lines = (segs[:, :4] / s).astype(np.float32).reshape(-1, 1, 4)
        widths = (segs[:, 4] / s).astype(np.float32).reshape(-1, 1)
        precs = np.full((len(segs), 1), self.ang_th / 180.0, np.float32)
        nfa = np.zeros((len(segs), 1), np.float64)
        return lines, widths, precs, nfa

    def drawSegments(self, image, lines):
        from ..ops.drawing import line as draw_line
        img = np.asarray(image)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        if lines is not None:
            for l in np.asarray(lines).reshape(-1, 4):
                draw_line(img, (int(round(l[0])), int(round(l[1]))),
                          (int(round(l[2])), int(round(l[3]))),
                          (0, 0, 255), 1)
        return img


def createLineSegmentDetector(refine=LSD_REFINE_STD, scale=0.8,
                              sigma_scale=0.6, quant=2.0, ang_th=22.5,
                              log_eps=0.0, density_th=0.7, n_bins=1024):
    return LineSegmentDetector(refine, scale, sigma_scale, quant, ang_th,
                               log_eps, density_th, n_bins)
