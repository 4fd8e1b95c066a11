"""Dense optical flow, Farnebäck polynomial-expansion method.

Behavioral reference: `video/src/optflowgf.cpp` (FarnebackPolyExp:117,
FarnebackUpdateMatrices:218, FarnebackUpdateFlow_Blur:344, calc:1100).

TPU-native design: every stage is dense NHWC math —

- polynomial expansion = two separable correlations with the {g, xg, xxg}
  kernel bank (pure jnp convs the XLA fuses; the reference's hand-rolled
  row pipeline becomes a 6-tap tensor contraction),
- the displaced-coefficient update is a bilinear gather (one
  `map_coordinates`-style fetch instead of per-pixel pointer chasing),
- the (winsize+1)-wide replicate box blur of the 5-channel M tensor is a
  pair of cumulative sums,
- the 2x2 solve is elementwise.

The whole per-level iteration is one jitted program; the pyramid loop
runs at trace time (static shapes per level, like the reference's
per-level Mats).  Matches the reference to sub-pixel tolerance; the
only semantic divergence is the stripe-interleaved matrix refresh of
`FarnebackUpdateFlow_Blur` (we refresh M from the fully-updated flow,
the reference refreshes in ~winsize row stripes).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["calcOpticalFlowFarneback", "FarnebackOpticalFlow_create"]

_BORDER = np.array([0.14, 0.14, 0.4472, 0.4472, 0.4472], np.float32)


def _prepare_gaussian(n: int, sigma: float):
    """g / xg / xxg kernels and the four inverse-Gram entries
    (optflowgf.cpp FarnebackPrepareGaussian:60)."""
    if sigma < 1e-7:
        sigma = n * 0.3
    x = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-x * x / (2 * sigma * sigma)).astype(np.float32)
    g = (g / g.sum()).astype(np.float32)
    xg = (x * g).astype(np.float32)
    xxg = (x * x * g).astype(np.float32)

    G = np.zeros((6, 6))
    gy = g[:, None].astype(np.float64)
    gx = g[None, :].astype(np.float64)
    xx = x[None, :] ** 2
    yy = x[:, None] ** 2
    w = gy * gx
    G[0, 0] = w.sum()
    G[1, 1] = (w * xx).sum()
    G[3, 3] = (w * xx * xx).sum()
    G[5, 5] = (w * xx * yy).sum()
    G[2, 2] = G[0, 3] = G[0, 4] = G[3, 0] = G[4, 0] = G[1, 1]
    G[4, 4] = G[3, 3]
    G[3, 4] = G[4, 3] = G[5, 5]
    invG = np.linalg.inv(G)
    return g, xg, xxg, invG[1, 1], invG[0, 3], invG[3, 3], invG[5, 5]


def _poly_exp(img, n, sigma):
    """(H, W) f32 -> (H, W, 5) expansion coefficients.

    Channel order matches the reference (optflowgf.cpp:195-200):
    0 ~ y, 1 ~ x, 2 ~ y^2, 3 ~ x^2, 4 ~ xy.
    """
    g, xg, xxg, ig11, ig03, ig33, ig55 = _prepare_gaussian(n, sigma)
    g = jnp.asarray(g)
    xg = jnp.asarray(xg)
    xxg = jnp.asarray(xxg)

    H, W = img.shape
    # vertical pass with replicated rows (srow index clamping)
    pv = jnp.pad(img, ((n, n), (0, 0)), mode="edge")
    rows = jnp.stack([pv[k:k + H] for k in range(2 * n + 1)])  # (2n+1, H, W)
    t0 = jnp.einsum("k,khw->hw", g, rows)
    t1 = jnp.einsum("k,khw->hw", xg, rows)
    t2 = jnp.einsum("k,khw->hw", xxg, rows)

    # horizontal pass with replicated cols
    def hpass(t, kern):
        ph = jnp.pad(t, ((0, 0), (n, n)), mode="edge")
        cols = jnp.stack([ph[:, k:k + W] for k in range(2 * n + 1)])
        return jnp.einsum("k,khw->hw", kern, cols)

    b1 = hpass(t0, g)
    b2 = hpass(t0, xg)
    b4 = hpass(t0, xxg)
    b3 = hpass(t1, g)
    b6 = hpass(t1, xg)
    b5 = hpass(t2, g)

    return jnp.stack([
        b3 * ig11,                 # y
        b2 * ig11,                 # x
        b1 * ig03 + b5 * ig33,     # y^2
        b1 * ig03 + b4 * ig33,     # x^2
        b6 * ig55,                 # xy
    ], axis=-1).astype(jnp.float32)


def _update_matrices(R0, R1, flow):
    """FarnebackUpdateMatrices (optflowgf.cpp:218): build the 5-channel
    normal-equation tensor M from the two expansions and the current flow."""
    H, W = flow.shape[:2]
    ys, xs = jnp.mgrid[0:H, 0:W]
    dx = flow[..., 0]
    dy = flow[..., 1]
    fx = xs + dx
    fy = ys + dy
    x1 = jnp.floor(fx)
    y1 = jnp.floor(fy)
    rx = fx - x1
    ry = fy - y1
    x1i = x1.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)
    valid = (x1i >= 0) & (x1i < W - 1) & (y1i >= 0) & (y1i < H - 1)
    x1c = jnp.clip(x1i, 0, W - 2)
    y1c = jnp.clip(y1i, 0, H - 2)

    p00 = R1[y1c, x1c]
    p01 = R1[y1c, x1c + 1]
    p10 = R1[y1c + 1, x1c]
    p11 = R1[y1c + 1, x1c + 1]
    a00 = ((1 - rx) * (1 - ry))[..., None]
    a01 = (rx * (1 - ry))[..., None]
    a10 = ((1 - rx) * ry)[..., None]
    a11 = (rx * ry)[..., None]
    fetched = a00 * p00 + a01 * p01 + a10 * p10 + a11 * p11

    r2 = jnp.where(valid, fetched[..., 0], 0.0)
    r3 = jnp.where(valid, fetched[..., 1], 0.0)
    r4 = jnp.where(valid, (R0[..., 2] + fetched[..., 2]) * 0.5, R0[..., 2])
    r5 = jnp.where(valid, (R0[..., 3] + fetched[..., 3]) * 0.5, R0[..., 3])
    r6 = jnp.where(valid, (R0[..., 4] + fetched[..., 4]) * 0.25,
                   R0[..., 4] * 0.5)

    r2 = (R0[..., 0] - r2) * 0.5
    r3 = (R0[..., 1] - r3) * 0.5
    r2 = r2 + r4 * dy + r6 * dx
    r3 = r3 + r6 * dy + r5 * dx

    # border down-weighting (optflowgf.cpp:295-302)
    border = jnp.asarray(_BORDER)
    k = min(5, H)
    bscale_y = jnp.ones((H,), jnp.float32)
    bscale_y = bscale_y.at[:k].set(border[:k])
    bscale_y = bscale_y.at[H - k:].set(border[:k][::-1])
    bscale_x = jnp.ones((W,), jnp.float32)
    kx = min(5, W)
    bscale_x = bscale_x.at[:kx].set(border[:kx])
    bscale_x = bscale_x.at[W - kx:].set(border[:kx][::-1])
    scale = bscale_y[:, None] * bscale_x[None, :]
    r2, r3, r4, r5, r6 = (r * scale for r in (r2, r3, r4, r5, r6))

    return jnp.stack([
        r4 * r4 + r6 * r6,
        (r4 + r5) * r6,
        r5 * r5 + r6 * r6,
        r4 * r2 + r6 * r3,
        r6 * r2 + r5 * r3,
    ], axis=-1)


def _box_blur_m(M, m):
    """Replicate-border running box of FarnebackUpdateFlow_Blur: the
    window is [i-m-1, i+m] x [j-m-1, j+m] (width 2m+2), scaled by
    1/(2m+1)^2 exactly like the reference."""
    pad_lo, pad_hi = m + 1, m
    P = jnp.pad(M, ((pad_lo, pad_hi), (pad_lo, pad_hi), (0, 0)), mode="edge")
    c = jnp.cumsum(jnp.cumsum(P, axis=0), axis=1)
    c = jnp.pad(c, ((1, 0), (1, 0), (0, 0)))
    k = 2 * m + 2
    H, W = M.shape[:2]
    s = (c[k:k + H, k:k + W] - c[k:k + H, 0:W]
         - c[0:H, k:k + W] + c[0:H, 0:W])
    return s / float((2 * m + 1) ** 2)


def _solve_flow(Mb):
    g11 = Mb[..., 0]
    g12 = Mb[..., 1]
    g22 = Mb[..., 2]
    h1 = Mb[..., 3]
    h2 = Mb[..., 4]
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    return jnp.stack([(g11 * h2 - g12 * h1) * idet,
                      (g22 * h1 - g12 * h2) * idet], axis=-1)


@functools.partial(jax.jit, static_argnames=("winsize", "iters", "poly_n",
                                             "poly_sigma"))
def _flow_level(I0, I1, flow, winsize, iters, poly_n, poly_sigma):
    R0 = _poly_exp(I0, poly_n, poly_sigma)
    R1 = _poly_exp(I1, poly_n, poly_sigma)
    m = winsize // 2
    M = _update_matrices(R0, R1, flow)
    for i in range(iters):
        flow = _solve_flow(_box_blur_m(M, m))
        if i < iters - 1:
            M = _update_matrices(R0, R1, flow)
    return flow


def _resize_linear(img, w, h):
    """float bilinear resize matching the reference's INTER_LINEAR
    pixel-center convention (used only inside the pyramid)."""
    H, W = img.shape[:2]
    sx, sy = W / w, H / h
    xs = (jnp.arange(w) + 0.5) * sx - 0.5
    ys = (jnp.arange(h) + 0.5) * sy - 0.5
    x0 = jnp.clip(jnp.floor(xs), 0, W - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(ys), 0, H - 1).astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    ax = jnp.clip(xs - x0, 0.0, 1.0)
    ay = jnp.clip(ys - y0, 0.0, 1.0)
    i00 = img[jnp.ix_(y0, x0)]
    i01 = img[jnp.ix_(y0, x1)]
    i10 = img[jnp.ix_(y1, x0)]
    i11 = img[jnp.ix_(y1, x1)]
    if img.ndim == 2:
        axx = ax[None, :]
        ayy = ay[:, None]
    else:
        axx = ax[None, :, None]
        ayy = ay[:, None, None]
    return (i00 * (1 - axx) + i01 * axx) * (1 - ayy) \
        + (i10 * (1 - axx) + i11 * axx) * ayy


def _gaussian_blur_f32(img, ksize, sigma):
    n = ksize // 2
    x = np.arange(-n, n + 1, dtype=np.float64)
    k = np.exp(-x * x / (2 * sigma * sigma))
    k = jnp.asarray((k / k.sum()).astype(np.float32))
    p = jnp.pad(img, ((n, n), (0, 0)), mode="reflect")
    H, W = img.shape
    v = jnp.einsum("k,khw->hw",
                   k, jnp.stack([p[i:i + H] for i in range(2 * n + 1)]))
    p = jnp.pad(v, ((0, 0), (n, n)), mode="reflect")
    return jnp.einsum("k,khw->hw",
                      k, jnp.stack([p[:, i:i + W] for i in range(2 * n + 1)]))


def calcOpticalFlowFarneback(prev, next, flow=None, pyr_scale=0.5, levels=5,
                             winsize=13, iterations=10, poly_n=5,
                             poly_sigma=1.1, flags=0):
    """Dense Farnebäck flow (video/src/optflowgf.cpp:1100).

    Returns (H, W, 2) float32 flow mapping prev -> next.
    """
    p = jnp.asarray(np.asarray(prev)).astype(jnp.float32)
    nx = jnp.asarray(np.asarray(next)).astype(jnp.float32)
    if p.ndim == 3:
        p = p[..., 0]
        nx = nx[..., 0]
    H0, W0 = p.shape
    min_size = 32

    nlevels = 0
    scale = 1.0
    for k in range(levels):
        scale *= pyr_scale
        if W0 * scale < min_size or H0 * scale < min_size:
            break
        nlevels = k + 1

    prev_flow = None
    for k in range(nlevels, -1, -1):
        scale = pyr_scale ** k
        sigma = (1.0 / scale - 1) * 0.5
        smooth_sz = max(int(round(sigma * 5)) | 1, 3)
        w = int(round(W0 * scale))
        h = int(round(H0 * scale))

        if prev_flow is None:
            if flags & 4 and flow is not None:  # OPTFLOW_USE_INITIAL_FLOW
                f = jnp.asarray(np.asarray(flow), jnp.float32)
                f = _resize_linear(f, w, h) * scale
            else:
                f = jnp.zeros((h, w, 2), jnp.float32)
        else:
            f = _resize_linear(prev_flow, w, h) * (1.0 / pyr_scale)

        if k > 0:
            I0 = _resize_linear(_gaussian_blur_f32(p, smooth_sz, sigma), w, h)
            I1 = _resize_linear(_gaussian_blur_f32(nx, smooth_sz, sigma), w, h)
        else:
            I0, I1 = p, nx

        f = _flow_level(I0, I1, f, winsize, iterations, poly_n,
                        float(poly_sigma))
        prev_flow = f

    return np.asarray(prev_flow)


class _FarnebackOpticalFlow:
    def __init__(self, numLevels=5, pyrScale=0.5, fastPyramids=False,
                 winSize=13, numIters=10, polyN=5, polySigma=1.1, flags=0):
        self.numLevels = numLevels
        self.pyrScale = pyrScale
        self.winSize = winSize
        self.numIters = numIters
        self.polyN = polyN
        self.polySigma = polySigma
        self.flags = flags

    def calc(self, I0, I1, flow=None):
        return calcOpticalFlowFarneback(
            I0, I1, flow, self.pyrScale, self.numLevels, self.winSize,
            self.numIters, self.polyN, self.polySigma, self.flags)


def FarnebackOpticalFlow_create(numLevels=5, pyrScale=0.5, fastPyramids=False,
                                winSize=13, numIters=10, polyN=5,
                                polySigma=1.1, flags=0):
    return _FarnebackOpticalFlow(numLevels, pyrScale, fastPyramids, winSize,
                                 numIters, polyN, polySigma, flags)
