"""AKAZE (features2d/src/kaze/AKAZEFeatures.cpp, Alcantarilla et al.
ICCV 2013 "Fast Explicit Diffusion for Accelerated Features in
Nonlinear Scale Spaces").

TPU-native split: the nonlinear scale space (FED diffusion cycles,
Scharr-family derivatives, Hessian determinant) is dense elementwise /
stencil math batched over sublevels and jitted per octave shape — the
diffusion stencil vectorizes with replicate padding, which reproduces
the reference's interior + edge update rules exactly
(nldiffusion_functions.cpp:426 nld_step_scalar). The sparse tail
(scale-space extrema bookkeeping AKAZEFeatures.cpp:723, subpixel
refinement :872, SURF-window orientation :1362, MLDB descriptor
:1854) runs as vectorized host numpy over the keypoint list.

Parameter parity with AKAZEConfig.h: omax=4, nsublevels=4,
soffset=1.6, derivative_factor=1.5, diffusivity=PM_G2,
dthreshold=0.001, descriptor_channels=3, descriptor_pattern_size=10,
kcontrast percentile 0.7 over 300 bins.  Self-validated (the cv2 5.0
wheel dropped AKAZE): repeatability + rotation-matching tests.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .keypoint import KeyPoint

__all__ = ["AKAZE", "AKAZE_create",
           "DESCRIPTOR_KAZE_UPRIGHT", "DESCRIPTOR_KAZE",
           "DESCRIPTOR_MLDB_UPRIGHT", "DESCRIPTOR_MLDB",
           "DIFF_PM_G1", "DIFF_PM_G2", "DIFF_WEICKERT", "DIFF_CHARBONNIER"]

DESCRIPTOR_KAZE_UPRIGHT = 2
DESCRIPTOR_KAZE = 3
DESCRIPTOR_MLDB_UPRIGHT = 4
DESCRIPTOR_MLDB = 5

DIFF_PM_G1 = 0
DIFF_PM_G2 = 1
DIFF_WEICKERT = 2
DIFF_CHARBONNIER = 3


# ---------------------------------------------------------------- FED

def _fed_tau(T, tau_max=0.25, reordering=True):
    """FED step sizes for one cycle of total time T (fed.cpp:50)."""
    n = int(math.ceil(math.sqrt(3.0 * T / tau_max + 0.25) - 0.5 - 1e-8))
    scale = 3.0 * T / (tau_max * n * (n + 1))
    c = 1.0 / (4.0 * n + 2.0)
    d = scale * tau_max / 2.0
    tauh = [d / (math.cos(math.pi * (2.0 * k + 1.0) * c) ** 2)
            for k in range(n)]
    if not reordering:
        return tauh
    kappa = n // 2
    prime = n + 1
    while not _is_prime(prime):
        prime += 1
    tau = [0.0] * n
    k = 0
    for l in range(n):
        while True:
            index = ((k + 1) * kappa) % prime - 1
            if index < n:
                break
            k += 1
        tau[l] = tauh[index]
        k += 1
    return tau


def _is_prime(m):
    if m < 2:
        return False
    if m in (2, 3, 5, 7, 11, 13):
        return True
    if m % 2 == 0 or m % 3 == 0 or m % 5 == 0 or m % 7 == 0:
        return False
    i = 11
    while i * i <= m:
        if m % i == 0 or m % (i + 2) == 0:
            return False
        i += 6
    return True


# ------------------------------------------------------- dense kernels

def _gauss_ksize(sigma):
    k = int(math.ceil(2.0 * (1.0 + (sigma - 0.8) / 0.3)))
    return k | 1


def _gaussian(img, sigma, ksize=None):
    from ..ops.filter import GaussianBlur
    from .. import constants as K
    if ksize is None:
        ksize = _gauss_ksize(sigma)
    return GaussianBlur(img, (ksize, ksize), sigma,
                        borderType=K.BORDER_REPLICATE)


def _deriv_kernels(order_x, scale):
    """Scale-adapted Scharr-family separable kernels
    (nldiffusion_functions.cpp:329 compute_derivative_kernels)."""
    ksize = 3 + 2 * (scale - 1)
    w = 10.0 / 3.0
    norm = 1.0 / (2.0 * scale * (w + 2.0))
    smooth = np.zeros(ksize, np.float32)
    smooth[0] = norm
    smooth[ksize // 2] = w * norm
    smooth[-1] = norm
    deriv = np.zeros(ksize, np.float32)
    deriv[0] = -1.0
    deriv[-1] = 1.0
    if order_x:
        return deriv, smooth   # kx (horizontal), ky (vertical)
    return smooth, deriv


def _sep_filter(x, kx, ky):
    """Separable filter with reflect-101 border on (B, H, W)."""
    rx = len(kx) // 2
    ry = len(ky) // 2
    x = jnp.pad(x, ((0, 0), (ry, ry), (0, 0)), mode="reflect")
    x = _conv1d(x, jnp.asarray(ky), axis=1)
    x = jnp.pad(x, ((0, 0), (0, 0), (rx, rx)), mode="reflect")
    return _conv1d(x, jnp.asarray(kx), axis=2)


def _conv1d(x, k, axis):
    n = k.shape[0]
    out = None
    for i in range(n):
        sl = [slice(None)] * 3
        sl[axis] = slice(i, x.shape[axis] - (n - 1 - i))
        # correlation: kernel applied left-to-right
        term = x[tuple(sl)] * k[i]
        out = term if out is None else out + term
    return out


def _scharr(x):
    """Unnormalized 3x3 Scharr pair on (B, H, W) (BORDER_DEFAULT)."""
    sm = jnp.asarray([3.0, 10.0, 3.0], jnp.float32)
    dv = jnp.asarray([-1.0, 0.0, 1.0], jnp.float32)
    return _sep_filter(x, dv, sm), _sep_filter(x, sm, dv)


@partial(jax.jit, static_argnames=("diffusivity",))
def _diffusivity(Lx, Ly, k, diffusivity):
    """Conductivity g(|∇L|; k) (nldiffusion_functions.cpp pm_g1/g2/
    weickert/charbonnier)."""
    s = (Lx * Lx + Ly * Ly) / (k * k)
    if diffusivity == DIFF_PM_G1:
        return jnp.exp(-s)
    if diffusivity == DIFF_PM_G2:
        return 1.0 / (1.0 + s)
    if diffusivity == DIFF_WEICKERT:
        return 1.0 - jnp.exp(-3.315 / jnp.maximum(s, 1e-12) ** 4)
    return 1.0 / jnp.sqrt(1.0 + s)


@jax.jit
def _nld_steps(Lt, c, taus):
    """FED cycle: repeated explicit diffusion steps with per-step tau.
    Replicate padding zeroes the cross-boundary differences, which
    reproduces the reference's edge/interior stencils in one rule."""

    def step(L, tau):
        cp = jnp.pad(c, ((1, 1), (1, 1)), mode="edge")
        Lp = jnp.pad(L, ((1, 1), (1, 1)), mode="edge")
        cc = cp[1:-1, 1:-1]
        xpos = (cc + cp[1:-1, 2:]) * (Lp[1:-1, 2:] - L)
        xneg = (cp[1:-1, :-2] + cc) * (L - Lp[1:-1, :-2])
        ypos = (cc + cp[2:, 1:-1]) * (Lp[2:, 1:-1] - L)
        yneg = (cp[:-2, 1:-1] + cc) * (L - Lp[:-2, 1:-1])
        return L + 0.5 * tau * (xpos - xneg + ypos - yneg), None

    Lt, _ = jax.lax.scan(step, Lt, taus)
    return Lt


@partial(jax.jit, static_argnames=("sigma_size",))
def _hessian_response(Lsmooth, sigma_size):
    """Scale-normalized det-of-Hessian + first derivatives for a batch
    of sublevels sharing a sigma_size (AKAZEFeatures.cpp:590)."""
    kx_d, ky_d = _deriv_kernels(1, sigma_size)
    Lx = _sep_filter(Lsmooth, kx_d, ky_d)
    Lxx = _sep_filter(Lx, kx_d, ky_d)
    kx_y, ky_y = _deriv_kernels(0, sigma_size)
    Lxy = _sep_filter(Lx, kx_y, ky_y)
    Ly = _sep_filter(Lsmooth, kx_y, ky_y)
    Lyy = _sep_filter(Ly, kx_y, ky_y)
    s4 = float(sigma_size) ** 4
    Ldet = (Lxx * Lyy - Lxy * Lxy) * s4
    return Lx, Ly, Ldet


def _compute_kcontrast(img, perc=0.7, nbins=300):
    """70th-percentile gradient contrast factor
    (nldiffusion_functions.cpp:229)."""
    g = np.asarray(_gaussian(img, 1.0, 5), np.float32)
    gx, gy = (np.asarray(v[0]) for v in _scharr(jnp.asarray(g)[None]))
    modg = gx[1:-1, 1:-1] ** 2 + gy[1:-1, 1:-1] ** 2
    hmax = math.sqrt(modg.max()) if modg.size else 1.0
    if hmax == 0:
        return 0.03
    m = np.sqrt(modg[modg != 0.0])
    nbin = np.minimum((nbins * (m / hmax)).astype(np.int64), nbins - 1)
    hist = np.bincount(nbin, minlength=nbins)
    npoints = m.size
    nthreshold = int(npoints * perc)
    cumsum = np.cumsum(hist)
    idx = np.searchsorted(cumsum, nthreshold)
    if cumsum[-1] < nthreshold:
        return 0.03
    return hmax * float(idx + 1) / nbins


# ------------------------------------------------------- sparse logic

def _suppress_same_scale(cand_yx, values, radius, shape):
    """Raster-order greedy radius suppression
    (AKAZEFeatures.cpp:695 find_neighbor_point semantics)."""
    H, W = shape
    mask = np.full((H, W), -1, np.int64)   # index of accepted point
    accepted = []
    r2 = radius * radius
    for (y, x), v in zip(cand_yx, values):
        y0 = max(y - radius, 0)
        y1 = min(y + radius, H)
        x0 = max(x - radius, 0)
        x1 = min(x + radius, W)
        sub = mask[y0:y1, x0:x1]
        hit = np.argwhere(sub >= 0)
        replaced = False
        for (dy, dx) in hit:
            ny, nx = y0 + dy, x0 + dx
            if (nx - x) ** 2 + (ny - y) ** 2 <= r2:
                j = mask[ny, nx]
                if v > accepted[j][2]:
                    mask[ny, nx] = -1
                    accepted[j] = None
                    replaced = True
                else:
                    replaced = None
                break
        if replaced is None:
            continue
        mask[y, x] = len(accepted)
        accepted.append((y, x, v))
    return [(y, x, v) for t in accepted if t is not None
            for (y, x, v) in [t]]


def _cross_scale_filter(layers):
    """Two sweeps clearing weaker duplicates in adjacent levels
    (AKAZEFeatures.cpp:808)."""
    def neighbor(pts, px, py, radius):
        for j, (y, x, v) in enumerate(pts):
            if v is None:
                continue
            if (x - px) ** 2 + (y - py) ** 2 <= radius * radius:
                return j
        return -1

    # lower-scale sweep
    for i in range(1, len(layers)):
        pts, ratio, ssize = layers[i]
        pts_prev, ratio_prev, _ = layers[i - 1]
        diff = int(ratio // ratio_prev)
        radius = ssize * diff
        for (y, x, v) in pts:
            if v is None:
                continue
            j = neighbor(pts_prev, x * diff, y * diff, radius)
            if j >= 0 and v > pts_prev[j][2]:
                pts_prev[j] = (pts_prev[j][0], pts_prev[j][1], None)
    # upper-scale sweep
    for i in range(len(layers) - 2, -1, -1):
        pts, ratio, _ = layers[i]
        pts_next, ratio_next, ssize_next = layers[i + 1]
        diff = int(ratio_next // ratio)
        for (y, x, v) in pts:
            if v is None:
                continue
            j = neighbor(pts_next, x // diff, y // diff, ssize_next)
            if j >= 0 and v > pts_next[j][2]:
                pts_next[j] = (pts_next[j][0], pts_next[j][1], None)
    return layers


# gauss25 sampling table for the SURF-style orientation window
# (AKAZEFeatures.cpp:1260): radius-6 disc, sigma-2.5 weights.
def _orient_table():
    xs, ys, ws = [], [], []
    s = 2.5
    for i in range(-6, 7):
        for j in range(-6, 7):
            if i * i + j * j < 36:
                ys.append(i)
                xs.append(j)
                ws.append(math.exp(-(i * i + j * j) / (2 * s * s))
                          / (2 * math.pi * s * s))
    return (np.asarray(xs), np.asarray(ys), np.asarray(ws, np.float32))

_OX, _OY, _OW = _orient_table()


def _main_orientations(Lx, Ly, xs, ys, scales):
    """SURF sliding-window dominant orientation, batched over the
    keypoints of one level (AKAZEFeatures.cpp:1362)."""
    H, W = Lx.shape
    px = xs[:, None] + _OX[None, :] * scales[:, None]      # (N,109)
    py = ys[:, None] + _OY[None, :] * scales[:, None]
    px = np.clip(px, 0, W - 1)
    py = np.clip(py, 0, H - 1)
    rx = _OW[None, :] * Lx[py, px]
    ry = _OW[None, :] * Ly[py, px]
    ang = np.arctan2(ry, rx) % (2 * np.pi)                 # (N,109)
    slices = 42
    sl = np.minimum((ang / (2 * np.pi / slices)).astype(np.int64),
                    slices - 1)
    N = len(xs)
    sx = np.zeros((N, slices), np.float64)
    sy = np.zeros((N, slices), np.float64)
    np.add.at(sx, (np.arange(N)[:, None], sl), rx)
    np.add.at(sy, (np.arange(N)[:, None], sl), ry)
    # circular window sums of width 7
    idx = (np.arange(slices)[:, None] + np.arange(7)[None, :]) % slices
    wx = sx[:, idx].sum(axis=2)                            # (N,42)
    wy = sy[:, idx].sum(axis=2)
    best = np.argmax(wx * wx + wy * wy, axis=1)
    bx = wx[np.arange(N), best]
    by = wy[np.arange(N), best]
    return np.degrees(np.arctan2(by, bx)) % 360.0


def _mldb_grids(pattern_size=10):
    """Cell sample offsets for the 3 MLDB grid levels
    (AKAZEFeatures.cpp:1953): per level a list of cells, each a
    (k, l) sample offset array."""
    out = []
    for lvl in range(3):
        if lvl == 0:
            step = pattern_size
        elif lvl == 1:
            step = -(-pattern_size * 2 // 3)
        else:
            step = -(-pattern_size // 2)
        cells = []
        for i in range(-pattern_size, pattern_size, step):
            for j in range(-pattern_size, pattern_size, step):
                ks, ls = np.meshgrid(np.arange(i, i + step),
                                     np.arange(j, j + step), indexing="ij")
                cells.append((ks.ravel(), ls.ravel()))
        out.append(cells)
    return out

_MLDB_GRIDS = _mldb_grids()


def _mldb_descriptors(levels, kpts, upright=False, channels=3,
                      pattern_size=10):
    """486-bit MLDB descriptors, batched per evolution level
    (AKAZEFeatures.cpp:1953 Get_MLDB_Full_Descriptor)."""
    nbits = sum((lvl + 2) ** 2 * ((lvl + 2) ** 2 - 1) // 2 * channels
                for lvl in range(3))
    desc = np.zeros((len(kpts), (nbits + 7) // 8), np.uint8)
    by_level = {}
    for i, kp in enumerate(kpts):
        by_level.setdefault(kp.class_id, []).append(i)
    for lvl_id, idxs in by_level.items():
        Lt, Lx, Ly, ratio = levels[lvl_id]
        H, W = Lt.shape
        sel = [kpts[i] for i in idxs]
        xf = np.asarray([kp.pt[0] / ratio for kp in sel])
        yf = np.asarray([kp.pt[1] / ratio for kp in sel])
        scale = np.asarray([round(0.5 * kp.size / ratio) for kp in sel],
                           np.float64)
        if upright:
            co = np.ones(len(sel))
            si = np.zeros(len(sel))
        else:
            a = np.radians([kp.angle for kp in sel])
            co = np.cos(a)
            si = np.sin(a)
        allbits = []
        for lvl in range(3):
            cells = _MLDB_GRIDS[lvl]
            vals = np.empty((len(sel), len(cells), channels))
            for ci, (ks, ls) in enumerate(cells):
                # rotated sample positions (N, S)
                sy = yf[:, None] + (ls[None] * co[:, None]
                                    + ks[None] * si[:, None]) * scale[:, None]
                sx = xf[:, None] + (-ls[None] * si[:, None]
                                    + ks[None] * co[:, None]) * scale[:, None]
                iy = np.floor(sy + 0.5).astype(np.int64)
                ix = np.floor(sx + 0.5).astype(np.int64)
                ok = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
                iy = np.clip(iy, 0, H - 1)
                ix = np.clip(ix, 0, W - 1)
                n = np.maximum(ok.sum(axis=1), 1)
                di = np.where(ok, Lt[iy, ix], 0).sum(axis=1) / n
                vals[:, ci, 0] = di
                if channels > 1:
                    rx = np.where(ok, Lx[iy, ix], 0)
                    ry = np.where(ok, Ly[iy, ix], 0)
                    if channels == 2:
                        vals[:, ci, 1] = np.hypot(rx, ry).sum(axis=1) / n
                    else:
                        rrx = (-rx * si[:, None] + ry * co[:, None])
                        rry = (rx * co[:, None] + ry * si[:, None])
                        vals[:, ci, 1] = rrx.sum(axis=1) / n
                        vals[:, ci, 2] = rry.sum(axis=1) / n
            nc = len(cells)
            iu, ju = np.triu_indices(nc, 1)
            for ch in range(channels):
                allbits.append(vals[:, iu, ch] > vals[:, ju, ch])
        bits = np.concatenate(allbits, axis=1)
        packed = np.packbits(bits, axis=1, bitorder="little")
        for k, i in enumerate(idxs):
            desc[i] = packed[k]
    return desc


# --------------------------------------------------------------- AKAZE

class AKAZE:
    """cv::AKAZE (features2d/src/akaze.cpp)."""

    def __init__(self, descriptor_type=DESCRIPTOR_MLDB, descriptor_size=0,
                 descriptor_channels=3, threshold=0.001, nOctaves=4,
                 nOctaveLayers=4, diffusivity=DIFF_PM_G2):
        self.descriptor_type = descriptor_type
        self.descriptor_size = descriptor_size
        self.descriptor_channels = descriptor_channels
        self.threshold = threshold
        self.nOctaves = nOctaves
        self.nOctaveLayers = nOctaveLayers
        self.diffusivity = diffusivity
        self.soffset = 1.6
        self.derivative_factor = 1.5

    @staticmethod
    def create(descriptor_type=DESCRIPTOR_MLDB, descriptor_size=0,
               descriptor_channels=3, threshold=0.001, nOctaves=4,
               nOctaveLayers=4, diffusivity=DIFF_PM_G2):
        return AKAZE(descriptor_type, descriptor_size, descriptor_channels,
                     threshold, nOctaves, nOctaveLayers, diffusivity)

    # getters mirroring the cv2 API
    def getThreshold(self):
        return self.threshold

    def setThreshold(self, t):
        self.threshold = t

    def getNOctaves(self):
        return self.nOctaves

    def getNOctaveLayers(self):
        return self.nOctaveLayers

    def getDiffusivity(self):
        return self.diffusivity

    def getDescriptorType(self):
        return self.descriptor_type

    def getDescriptorSize(self):
        return self.descriptor_size

    def getDescriptorChannels(self):
        return self.descriptor_channels

    def descriptorSize(self):
        if self.descriptor_type in (DESCRIPTOR_KAZE, DESCRIPTOR_KAZE_UPRIGHT):
            return 64
        return 61 if self.descriptor_channels == 3 else \
            (486 // 3 * self.descriptor_channels + 7) // 8

    def descriptorType(self):
        return 0 if self.descriptor_type >= DESCRIPTOR_MLDB_UPRIGHT else 5

    def defaultNorm(self):
        return 6 if self.descriptor_type >= DESCRIPTOR_MLDB_UPRIGHT else 4

    # ------------------------------------------------------ pipeline
    def _evolution_plan(self, H, W):
        """Level descriptors (octave, sublevel, size, esigma, sigma_size,
        etime, border) — AKAZEFeatures.cpp:46."""
        smax = 10.0 * math.sqrt(2.0)
        levels = []
        omax = self.nOctaves
        power = 1
        for i in range(omax):
            lh, lw = int(H / power), int(W / power)
            if (lw < 80 or lh < 40) and i != 0:
                break
            for j in range(self.nOctaveLayers):
                esigma = self.soffset * 2.0 ** (j / self.nOctaveLayers + i)
                sigma_size = int(round(esigma * self.derivative_factor
                                       / power))
                levels.append(dict(
                    octave=i, sublevel=j, size=(lh, lw), esigma=esigma,
                    sigma_size=sigma_size, etime=0.5 * esigma * esigma,
                    ratio=float(power),
                    border=int(round(smax * sigma_size)) + 1))
            power *= 2
        return levels

    def _scale_space(self, img_f):
        """Nonlinear scale space via FED (AKAZEFeatures.cpp:432)."""
        from ..ops.resize import resize
        from .. import constants as K
        H, W = img_f.shape
        plan = self._evolution_plan(H, W)
        Lt_list = []
        Lsm_list = []
        Lt = np.asarray(_gaussian(img_f, self.soffset), np.float32)
        Lt_list.append(Lt)
        Lsm_list.append(Lt.copy())
        if len(plan) > 1:
            kcontrast = _compute_kcontrast(img_f)
            for i in range(1, len(plan)):
                e = plan[i]
                prev = Lt_list[i - 1]
                if e["octave"] > plan[i - 1]["octave"]:
                    lh, lw = e["size"]
                    Lt = np.asarray(resize(prev, (lw, lh),
                                           interpolation=K.INTER_AREA),
                                    np.float32)
                    kcontrast *= 0.75
                else:
                    Lt = prev.copy()
                Lsmooth = np.asarray(_gaussian(Lt, 1.0, 5), np.float32)
                Lxj, Lyj = _scharr(jnp.asarray(Lsmooth)[None])
                c = _diffusivity(Lxj[0], Lyj[0], jnp.float32(kcontrast),
                                 self.diffusivity)
                taus = _fed_tau(e["etime"] - plan[i - 1]["etime"])
                Lt = np.asarray(_nld_steps(
                    jnp.asarray(Lt), c,
                    jnp.asarray(taus, jnp.float32)), np.float32)
                Lt_list.append(Lt)
                Lsm_list.append(Lsmooth)
        # derivatives + Hessian response, batched by (shape, sigma_size)
        out = []
        for i, e in enumerate(plan):
            Lx, Ly, Ldet = _hessian_response(
                jnp.asarray(Lsm_list[i])[None], e["sigma_size"])
            out.append(dict(e, Lt=Lt_list[i], Lx=np.asarray(Lx[0]),
                            Ly=np.asarray(Ly[0]),
                            Ldet=np.asarray(Ldet[0])))
        return out

    def _detect_levels(self, levels):
        layer_pts = []
        for e in levels:
            Ldet = e["Ldet"]
            Hh, Ww = Ldet.shape
            b = e["border"]
            pts = []
            if b + 1 < Hh and b < Ww:
                interior = Ldet[b:Hh - b, b:Ww - b]
                c = Ldet
                nbr = np.stack([
                    c[b:Hh - b, b - 1:Ww - b - 1], c[b:Hh - b, b + 1:Ww - b + 1],
                    c[b - 1:Hh - b - 1, b - 1:Ww - b - 1],
                    c[b - 1:Hh - b - 1, b:Ww - b],
                    c[b - 1:Hh - b - 1, b + 1:Ww - b + 1],
                    c[b + 1:Hh - b + 1, b - 1:Ww - b - 1],
                    c[b + 1:Hh - b + 1, b:Ww - b],
                    c[b + 1:Hh - b + 1, b + 1:Ww - b + 1]])
                keep = (interior > self.threshold) & \
                    (interior > nbr).all(axis=0)
                ys, xs = np.nonzero(keep)
                order = np.lexsort((xs, ys))   # raster order
                cand = [(int(ys[k]) + b, int(xs[k]) + b) for k in order]
                vals = [float(interior[ys[k], xs[k]]) for k in order]
                pts = _suppress_same_scale(cand, vals, e["sigma_size"],
                                           (Hh, Ww))
            layer_pts.append([list(p) for p in pts])
        packed = [(pts, lev["ratio"], lev["sigma_size"])
                  for pts, lev in zip(layer_pts, levels)]
        packed = _cross_scale_filter(
            [(p, r, s) for (p, r, s) in packed])
        return [p for (p, _, _) in packed]

    def _refine(self, levels, layer_pts):
        kpts = []
        for li, (e, pts) in enumerate(zip(levels, layer_pts)):
            Ldet = e["Ldet"]
            ratio = e["ratio"]
            for (y, x, v) in pts:
                if v is None:
                    continue
                Dx = 0.5 * (Ldet[y, x + 1] - Ldet[y, x - 1])
                Dy = 0.5 * (Ldet[y + 1, x] - Ldet[y - 1, x])
                Dxx = Ldet[y, x + 1] + Ldet[y, x - 1] - 2 * Ldet[y, x]
                Dyy = Ldet[y + 1, x] + Ldet[y - 1, x] - 2 * Ldet[y, x]
                Dxy = 0.25 * (Ldet[y + 1, x + 1] + Ldet[y - 1, x - 1]
                              - Ldet[y - 1, x + 1] - Ldet[y + 1, x - 1])
                det = Dxx * Dyy - Dxy * Dxy
                if abs(det) < 1e-12:
                    continue
                dx = (-Dx * Dyy + Dy * Dxy) / det
                dy = (Dx * Dxy - Dy * Dxx) / det
                if abs(dx) > 1.0 or abs(dy) > 1.0:
                    continue
                kp = KeyPoint(x * ratio + dx * ratio + 0.5 * (ratio - 1),
                              y * ratio + dy * ratio + 0.5 * (ratio - 1),
                              e["esigma"] * self.derivative_factor * 2.0,
                              0.0, float(v), e["octave"], li)
                kpts.append(kp)
        return kpts

    def detect(self, image, mask=None):
        kpts, _ = self._run(image, mask, need_desc=False)
        return kpts

    def compute(self, image, keypoints):
        img_f = self._prepare(image)
        levels = self._scale_space(img_f)
        return self._describe(levels, keypoints)

    def detectAndCompute(self, image, mask=None):
        return self._run(image, mask, need_desc=True)

    def detect_and_compute_batch(self, images):
        """(B, H, W) batch → list of (keypoints, descriptors).

        AKAZE's FED diffusion steps and sparse tails are data-dependent
        per image, so batching here amortizes the shape-keyed jitted
        programs (compiled once, reused for every image) rather than
        fusing images into one dispatch; results match detectAndCompute
        exactly."""
        imgs = np.asarray(images)
        if imgs.ndim == 2:
            imgs = imgs[None]
        return [self._run(im, None, need_desc=True) for im in imgs]

    def _prepare(self, image):
        img = np.asarray(image)
        if img.ndim == 3:
            from ..ops.color import cvtColor
            from .. import constants as K
            img = np.asarray(cvtColor(img, K.COLOR_BGR2GRAY))
        if img.dtype == np.uint8:
            return img.astype(np.float32) / 255.0
        if img.dtype == np.uint16:
            return img.astype(np.float32) / 65535.0
        return img.astype(np.float32)

    def _run(self, image, mask, need_desc):
        img_f = self._prepare(image)
        levels = self._scale_space(img_f)
        layer_pts = self._detect_levels(levels)
        kpts = self._refine(levels, layer_pts)
        if mask is not None:
            mk = np.asarray(mask)
            kpts = [k for k in kpts
                    if mk[int(k.pt[1]), int(k.pt[0])]]
        if not need_desc:
            return kpts, None
        return self._describe(levels, kpts)

    def _describe(self, levels, kpts):
        if not kpts:
            return kpts, np.zeros((0, self.descriptorSize()), np.uint8)
        upright = self.descriptor_type == DESCRIPTOR_MLDB_UPRIGHT
        if not upright:
            by_level = {}
            for i, kp in enumerate(kpts):
                by_level.setdefault(kp.class_id, []).append(i)
            for li, idxs in by_level.items():
                e = levels[li]
                ratio = e["ratio"]
                xs = np.asarray([round(kpts[i].pt[0] / ratio)
                                 for i in idxs], np.int64)
                ys = np.asarray([round(kpts[i].pt[1] / ratio)
                                 for i in idxs], np.int64)
                sc = np.asarray([round(0.5 * kpts[i].size / ratio)
                                 for i in idxs], np.int64)
                angles = _main_orientations(e["Lx"], e["Ly"], xs, ys, sc)
                for k, i in enumerate(idxs):
                    kpts[i].angle = float(angles[k])
        lv = {li: (levels[li]["Lt"], levels[li]["Lx"], levels[li]["Ly"],
                   levels[li]["ratio"]) for li in range(len(levels))}
        desc = _mldb_descriptors(lv, kpts, upright,
                                 self.descriptor_channels)
        return kpts, desc


def AKAZE_create(descriptor_type=DESCRIPTOR_MLDB, descriptor_size=0,
                 descriptor_channels=3, threshold=0.001, nOctaves=4,
                 nOctaveLayers=4, diffusivity=DIFF_PM_G2):
    return AKAZE(descriptor_type, descriptor_size, descriptor_channels,
                 threshold, nOctaves, nOctaveLayers, diffusivity)
