"""Hough transforms (imgproc/src/hough.cpp).

TPU-native: the vote accumulator is built as a stack of per-angle
histograms — for each θ the rho indices of all edge pixels are a fused
elementwise computation and the voting is one `bincount` (sorted-segment
reduction); the (θ, ρ) local-maximum test is a vectorized neighbor
comparison with the reference's exact >/>= tie rules
(hough.cpp findLocalMaximums).  Peak ordering is votes-desc with
smaller-index-first ties (hough_cmp_gt).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..core.arrays import to_batched

__all__ = ["HoughLines", "HoughLinesP", "HoughCircles"]


def _hough_accum(edges, rho: float, theta: float, min_theta, max_theta):
    H, W = edges.shape
    numangle = max(int(np.rint((max_theta - min_theta) / theta)), 1)
    numrho = int(np.rint(((W + H) * 2 + 1) / rho))
    ys, xs = jnp.nonzero(edges, size=edges.size, fill_value=-1)
    valid = ys >= 0
    angs = min_theta + np.arange(numangle) * theta
    tabs = np.stack([np.cos(angs) / rho, np.sin(angs) / rho], 1)  # like irho

    def one_angle(tab):
        r = jnp.rint(xs * tab[0] + ys * tab[1]).astype(jnp.int32) \
            + (numrho - 1) // 2
        r = jnp.where(valid, r, numrho)  # dump invalid into overflow bin
        return jnp.bincount(r, length=numrho + 1)[:numrho]

    acc = jax.lax.map(one_angle, jnp.asarray(tabs))
    return np.asarray(acc), numangle, numrho


def HoughLines(image, rho: float, theta: float, threshold: int,
               srn: float = 0, stn: float = 0,
               min_theta: float = 0.0, max_theta: float = math.pi,
               _with_votes: bool = False):
    """Standard Hough line transform → (N, 1, 2) of (rho, theta)."""
    x, _ = to_batched(image)
    edges = x[0, :, :, 0] != 0
    acc, numangle, numrho = _hough_accum(edges, rho, theta, min_theta,
                                         max_theta)
    # local maxima (findLocalMaximums): > rho neighbors? exact reference:
    # acc > acc[r-1] && acc >= acc[r+1] && acc > acc[angle-1] && acc >= acc[angle+1]
    A = np.pad(acc, 1)
    c = A[1:-1, 1:-1]
    keep = ((c > threshold)
            & (c > A[1:-1, :-2]) & (c >= A[1:-1, 2:])
            & (c > A[:-2, 1:-1]) & (c >= A[2:, 1:-1]))
    ai, ri = np.nonzero(keep)
    votes = c[ai, ri]
    order = np.lexsort((ai * numrho + ri, -votes))
    lines = []
    for k in order:
        r = (ri[k] - (numrho - 1) / 2) * rho
        a = min_theta + ai[k] * theta
        if _with_votes:
            lines.append((r, a, votes[k]))
        else:
            lines.append((r, a))
    if not lines:
        return None
    if _with_votes:   # the 5.x binding returns (N, 3) for this variant
        return np.asarray(lines, np.float32).reshape(-1, 3)
    return np.asarray(lines, np.float32).reshape(-1, 1, 2)


def HoughLinesWithAccumulator(image, rho: float, theta: float,
                              threshold: int, srn: float = 0,
                              stn: float = 0, min_theta: float = 0.0,
                              max_theta: float = math.pi,
                              use_edgeval: bool = False):
    """cv::HoughLinesWithAccumulator — (rho, theta, votes) triples
    (hough.cpp HoughLinesStandard with returnVotes)."""
    return HoughLines(image, rho, theta, threshold, srn, stn,
                      min_theta, max_theta, _with_votes=True)


def HoughLinesP(image, rho: float, theta: float, threshold: int,
                minLineLength: float = 0, maxLineGap: float = 0):
    """Probabilistic Hough — returns line segments (x1,y1,x2,y2).

    Deterministic variant: strongest standard-Hough peaks, then segment
    extraction along each line with the gap/length rules of
    HoughLinesProbabilistic."""
    lines = HoughLines(image, rho, theta, threshold)
    if lines is None:
        return None
    img = np.asarray(image)
    if img.ndim == 3:
        img = img[:, :, 0]
    H, W = img.shape
    segs = []
    for r, a in lines.reshape(-1, 2)[:100]:
        c, s = math.cos(a), math.sin(a)
        # walk along the line
        if abs(s) > abs(c):  # mostly horizontal direction of x
            xs = np.arange(W)
            ys = np.rint((r - xs * c) / s).astype(int)
            m = (ys >= 0) & (ys < H)
            pts = np.stack([xs[m], ys[m]], 1)
        else:
            ys = np.arange(H)
            xs = np.rint((r - ys * s) / c).astype(int)
            m = (xs >= 0) & (xs < W)
            pts = np.stack([xs[m], ys[m]], 1)
        on = img[pts[:, 1], pts[:, 0]] != 0
        # extract runs with gap tolerance
        start = None
        gap = 0
        last_on = None
        for i, o in enumerate(on):
            if o:
                if start is None:
                    start = i
                last_on = i
                gap = 0
            elif start is not None:
                gap += 1
                if gap > maxLineGap:
                    if math.dist(pts[start], pts[last_on]) >= minLineLength:
                        segs.append((*pts[start], *pts[last_on]))
                    start = None
        if start is not None and last_on is not None \
                and math.dist(pts[start], pts[last_on]) >= minLineLength:
            segs.append((*pts[start], *pts[last_on]))
    if not segs:
        return None
    return np.asarray(segs, np.int32).reshape(-1, 1, 4)


def HoughCircles(image, method: int, dp: float, minDist: float,
                 param1: float = 100, param2: float = 100,
                 minRadius: int = 0, maxRadius: int = 0,
                 _with_votes: bool = False):
    """HOUGH_GRADIENT: Canny edges + gradient-direction center voting
    (hough.cpp HoughCirclesGradient), then radius estimation."""
    from .canny import Canny
    from .deriv import Sobel
    from .. import constants as K

    img = np.asarray(image)
    H, W = img.shape[:2]
    if maxRadius <= 0:
        maxRadius = max(H, W)
    edges = np.asarray(Canny(img, param1 / 2, param1)) != 0
    dx = np.asarray(Sobel(img, K.CV_16S, 1, 0)).astype(np.float64)
    dy = np.asarray(Sobel(img, K.CV_16S, 0, 1)).astype(np.float64)
    mag = np.hypot(dx, dy)
    ys, xs = np.nonzero(edges & (mag > 0))
    nx = dx[ys, xs] / mag[ys, xs]
    ny = dy[ys, xs] / mag[ys, xs]
    ah = int(np.ceil(H / dp))
    aw = int(np.ceil(W / dp))
    acc = np.zeros((ah, aw), np.int32)
    for sgn in (1, -1):
        for r in range(max(minRadius, 1), maxRadius, max(int(dp), 1)):
            cx = np.rint((xs + sgn * r * nx) / dp).astype(int)
            cy = np.rint((ys + sgn * r * ny) / dp).astype(int)
            m = (cx >= 0) & (cx < aw) & (cy >= 0) & (cy < ah)
            np.add.at(acc, (cy[m], cx[m]), 1)
    # center candidates: local maxima above param2
    A = np.pad(acc, 1)
    c = A[1:-1, 1:-1]
    keep = ((c > param2) & (c >= A[1:-1, :-2]) & (c >= A[1:-1, 2:])
            & (c >= A[:-2, 1:-1]) & (c >= A[2:, 1:-1]))
    cy, cx = np.nonzero(keep)
    votes = c[cy, cx]
    order = np.argsort(-votes)
    centers = []
    for k in order:
        px, py = cx[k] * dp, cy[k] * dp
        if all((px - c_[0]) ** 2 + (py - c_[1]) ** 2 >= minDist ** 2
               for c_ in centers):
            # radius: mode of edge distances
            d = np.hypot(xs - px, ys - py)
            sel = (d >= max(minRadius, 1)) & (d <= maxRadius)
            if not sel.any():
                continue
            hist, be = np.histogram(d[sel], bins=min(64, maxRadius))
            rad = (be[hist.argmax()] + be[hist.argmax() + 1]) / 2
            if _with_votes:
                centers.append((px, py, rad, float(votes[k])))
            else:
                centers.append((px, py, rad))
    if not centers:
        return None
    w = 4 if _with_votes else 3
    return np.asarray(centers, np.float32).reshape(1, -1, w)


def HoughCirclesWithAccumulator(image, method: int, dp: float,
                                minDist: float, param1: float = 100,
                                param2: float = 100, minRadius: int = 0,
                                maxRadius: int = 0):
    """cv::HoughCirclesWithAccumulator — (x, y, radius, votes)."""
    return HoughCircles(image, method, dp, minDist, param1, param2,
                        minRadius, maxRadius, _with_votes=True)


def HoughLinesPointSet(point, lines_max, threshold, min_rho, max_rho,
                       rho_step, min_theta, max_theta, theta_step):
    """cv2.HoughLinesPointSet (hough.cpp): vote a (rho, theta) grid from
    a 2-D point set; returns (N, 1, 3) [votes, rho, theta] sorted by
    votes descending."""
    pts = np.asarray(point, np.float64).reshape(-1, 2)
    thetas = np.arange(min_theta, max_theta, theta_step)
    nrho = int(round((max_rho - min_rho) / rho_step)) + 1
    rho = pts[:, 0:1] * np.cos(thetas)[None, :] \
        + pts[:, 1:2] * np.sin(thetas)[None, :]
    ri = np.round((rho - min_rho) / rho_step).astype(int)
    valid = (ri >= 0) & (ri < nrho)
    acc = np.zeros((nrho, len(thetas)), np.int64)
    ti = np.broadcast_to(np.arange(len(thetas))[None, :], ri.shape)
    np.add.at(acc, (ri[valid], ti[valid]), 1)
    flat = acc.ravel()
    order = np.argsort(-flat, kind="stable")
    out = []
    for k in order[:max(lines_max, 0)]:
        v = flat[k]
        if v < threshold:
            break
        r_i, t_i = divmod(k, len(thetas))
        out.append([float(v), min_rho + r_i * rho_step,
                    min_theta + t_i * theta_step])
    return np.asarray(out, np.float32).reshape(-1, 1, 3)


class GeneralizedHoughBallard:
    """imgproc/src/generalized_hough.cpp (Ballard R-table voting).
    Template edge displacements grouped by gradient orientation; scene
    votes accumulate per-bin via broadcast scatter-adds."""

    def __init__(self):
        self.canny_low = 50
        self.canny_high = 100
        self.levels = 360
        self.votes_threshold = 100
        self.min_dist = 1.0
        self.dp = 1.0
        self._rtable = None

    def setCannyLowThresh(self, v):
        self.canny_low = int(v)

    def setCannyHighThresh(self, v):
        self.canny_high = int(v)

    def setLevels(self, v):
        self.levels = int(v)

    def setVotesThreshold(self, v):
        self.votes_threshold = int(v)

    def setMinDist(self, v):
        self.min_dist = float(v)

    def setDp(self, v):
        self.dp = float(v)

    def _edges_angles(self, img):
        from .canny import Canny
        from .deriv import Sobel
        from .. import constants as K
        g = np.asarray(img)
        if g.ndim == 3:
            from .color import cvtColor
            g = np.asarray(cvtColor(g, K.COLOR_BGR2GRAY))
        edges = np.asarray(Canny(g, self.canny_low, self.canny_high))
        gx = np.asarray(Sobel(g, K.CV_32F, 1, 0, ksize=3))
        gy = np.asarray(Sobel(g, K.CV_32F, 0, 1, ksize=3))
        ang = np.arctan2(gy, gx) % (2 * np.pi)
        return edges, ang

    def setTemplate(self, templ, templCenter=None):
        edges, ang = self._edges_angles(templ)
        ys, xs = np.nonzero(edges)
        h, w = edges.shape
        if templCenter is None:
            cx, cy = w // 2, h // 2
        else:
            cx, cy = templCenter
        bins = (ang[ys, xs] * self.levels / (2 * np.pi)).astype(int) \
            % self.levels
        self._rtable = {}
        for b, x, y in zip(bins, xs, ys):
            self._rtable.setdefault(b, []).append((cx - x, cy - y))
        self._rtable = {b: np.asarray(v) for b, v in self._rtable.items()}

    def detect(self, image):
        edges, ang = self._edges_angles(image)
        H, W = edges.shape
        ys, xs = np.nonzero(edges)
        bins = (ang[ys, xs] * self.levels / (2 * np.pi)).astype(int) \
            % self.levels
        aw = int(np.ceil(W / self.dp))
        ah = int(np.ceil(H / self.dp))
        acc = np.zeros((ah, aw), np.int32)
        for b, disp in self._rtable.items():
            sel = bins == b
            if not sel.any():
                continue
            vx = (xs[sel][:, None] + disp[None, :, 0]) / self.dp
            vy = (ys[sel][:, None] + disp[None, :, 1]) / self.dp
            vxi = np.round(vx).astype(int).ravel()
            vyi = np.round(vy).astype(int).ravel()
            ok = (vxi >= 0) & (vxi < aw) & (vyi >= 0) & (vyi < ah)
            np.add.at(acc, (vyi[ok], vxi[ok]), 1)
        # peaks
        order = np.argsort(-acc.ravel(), kind="stable")
        out = []
        votes = []
        for k in order:
            v = acc.flat[k]
            if v < self.votes_threshold:
                break
            y, x = divmod(k, aw)
            px, py = x * self.dp, y * self.dp
            if any(np.hypot(px - o[0], py - o[1]) < self.min_dist
                   for o in out):
                continue
            out.append((px, py))
            votes.append(int(v))
        if not out:
            return None, None
        pos = np.asarray([[x, y, 1.0, 0.0] for (x, y) in out],
                         np.float32).reshape(1, -1, 4)
        vt = np.asarray([[v, 0, 0] for v in votes],
                        np.int32).reshape(1, -1, 3)
        return pos, vt


def createGeneralizedHoughBallard():
    return GeneralizedHoughBallard()


class GeneralizedHoughGuil(GeneralizedHoughBallard):
    """Guil rotation/scale-invariant GHT (generalized_hough.cpp
    GeneralizedHoughGuilImpl): discretized search over (angle, scale),
    re-voting the R-table displacements rotated and scaled per
    hypothesis.  Peaks return (x, y, scale, angle_deg)."""

    def __init__(self):
        super().__init__()
        self.min_angle, self.max_angle = 0.0, 360.0
        self.angle_step = 5.0
        self.angle_thresh = 1000
        self.min_scale, self.max_scale = 0.5, 2.0
        self.scale_step = 0.05
        self.scale_thresh = 1000
        self.xi = 90.0
        self.angle_epsilon = 1.0
        self.max_buffer_size = 1000
        self.pos_thresh = 100

    # extra Guil knobs (setters return None like the wheel's)
    def setMinAngle(self, v):
        self.min_angle = float(v)

    def setMaxAngle(self, v):
        self.max_angle = float(v)

    def setAngleStep(self, v):
        self.angle_step = float(v)

    def setAngleThresh(self, v):
        self.angle_thresh = int(v)

    def setMinScale(self, v):
        self.min_scale = float(v)

    def setMaxScale(self, v):
        self.max_scale = float(v)

    def setScaleStep(self, v):
        self.scale_step = float(v)

    def setScaleThresh(self, v):
        self.scale_thresh = int(v)

    def setXi(self, v):
        self.xi = float(v)

    def setAngleEpsilon(self, v):
        self.angle_epsilon = float(v)

    def setMaxBufferSize(self, v):
        self.max_buffer_size = int(v)

    def setPosThresh(self, v):
        self.pos_thresh = int(v)

    def getMinAngle(self):
        return self.min_angle

    def getMaxAngle(self):
        return self.max_angle

    def getAngleStep(self):
        return self.angle_step

    def getMinScale(self):
        return self.min_scale

    def getMaxScale(self):
        return self.max_scale

    def getScaleStep(self):
        return self.scale_step

    def detect(self, image):
        edges, ang = self._edges_angles(image)
        H, W = edges.shape
        ys, xs = np.nonzero(edges)
        bins = (ang[ys, xs] * self.levels / (2 * np.pi)).astype(int) \
            % self.levels
        aw = int(np.ceil(W / self.dp))
        ah = int(np.ceil(H / self.dp))
        best = []
        angles = np.arange(self.min_angle, self.max_angle + 1e-9,
                           self.angle_step)
        scales = np.arange(self.min_scale, self.max_scale + 1e-9,
                           self.scale_step)
        for adeg in angles:
            arad = np.deg2rad(adeg)
            ca, sa = np.cos(arad), np.sin(arad)
            shift = int(round(adeg / 360.0 * self.levels)) % self.levels
            for sc in scales:
                acc = np.zeros((ah, aw), np.int32)
                for b, disp in self._rtable.items():
                    sel = bins == ((b + shift) % self.levels)
                    if not sel.any():
                        continue
                    dx = sc * (ca * disp[:, 0] - sa * disp[:, 1])
                    dy = sc * (sa * disp[:, 0] + ca * disp[:, 1])
                    vx = (xs[sel][:, None] + dx[None, :]) / self.dp
                    vy = (ys[sel][:, None] + dy[None, :]) / self.dp
                    vxi = np.round(vx).astype(int).ravel()
                    vyi = np.round(vy).astype(int).ravel()
                    ok = (vxi >= 0) & (vxi < aw) & (vyi >= 0) & (vyi < ah)
                    np.add.at(acc, (vyi[ok], vxi[ok]), 1)
                k = int(acc.argmax())
                v = int(acc.flat[k])
                if v >= self.pos_thresh:
                    y, x = divmod(k, aw)
                    best.append((v, x * self.dp, y * self.dp, sc, adeg))
        if not best:
            return None, None
        best.sort(key=lambda t: -t[0])
        out, votes = [], []
        for v, px, py, sc, adeg in best:
            if any(np.hypot(px - o[0], py - o[1]) < self.min_dist
                   for o in out):
                continue
            out.append((px, py, sc, adeg))
            votes.append((v, v, v))
        pos = np.asarray(out, np.float32).reshape(1, -1, 4)
        vt = np.asarray(votes, np.int32).reshape(1, -1, 3)
        return pos, vt


def createGeneralizedHoughGuil():
    return GeneralizedHoughGuil()
