"""moments / connectedComponents / distanceTransform
(imgproc/src/moments.cpp, connectedcomponents.cpp, distransform.cpp).

TPU-native designs:
- moments: per-row power sums reduce on device (f32, exact for row
  extents), combined across rows on host in float64 — full f64 accuracy
  without f64 on device.
- connectedComponents: the reference's BBDT/Spaghetti decision forests
  are branchy scalar code; the TPU formulation is iterative min-label
  propagation (`lax.while_loop` to fixpoint) — SURVEY §7 hard part #4 —
  followed by a host compaction pass for cv2's compact label ids.
- distanceTransform: chamfer masks relax to the same fixed point as the
  reference's two-pass scan, so we run min-plus relaxation under a
  while_loop with the reference's exact mask weights (a=0.955, b=1.3693
  for L2/3×3 etc., distransform.cpp DIST constants).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .. import constants as K
from ..core.arrays import to_batched, from_batched

__all__ = ["moments", "connectedComponents", "connectedComponentsWithStats",
           "distanceTransformWithLabels",
           "distanceTransform"]


def _contour_moments(pts):
    """Polygon moments via the boundary Green's-theorem accumulation
    (imgproc/src/moments.cpp contourMoments) — host f64, exact."""
    p = np.asarray(pts, np.float64).reshape(-1, 2)
    x, y = p[:, 0], p[:, 1]
    xp = np.roll(x, 1)
    yp = np.roll(y, 1)
    t = xp * y - x * yp
    a00 = np.sum(t)
    a10 = np.sum(t * (xp + x))
    a01 = np.sum(t * (yp + y))
    a20 = np.sum(t * (xp * xp + xp * x + x * x))
    a11 = np.sum(t * (xp * (2 * yp + y) + x * (yp + 2 * y)))
    a02 = np.sum(t * (yp * yp + yp * y + y * y))
    a30 = np.sum(t * (xp + x) * (xp * xp + x * x))
    a03 = np.sum(t * (yp + y) * (yp * yp + y * y))
    a21 = np.sum(t * (xp * xp * (3 * yp + y) + 2 * x * xp * (yp + y)
                      + x * x * (yp + 3 * y)))
    a12 = np.sum(t * (yp * yp * (3 * xp + x) + 2 * y * yp * (xp + x)
                      + y * y * (xp + 3 * x)))
    sgn = -1.0 if a00 < 0 else 1.0
    m = {
        "m00": a00 * sgn / 2, "m10": a10 * sgn / 6, "m01": a01 * sgn / 6,
        "m20": a20 * sgn / 12, "m11": a11 * sgn / 24, "m02": a02 * sgn / 12,
        "m30": a30 * sgn / 20, "m21": a21 * sgn / 60, "m12": a12 * sgn / 60,
        "m03": a03 * sgn / 20,
    }
    if m["m00"] != 0:
        cx = m["m10"] / m["m00"]
        cy = m["m01"] / m["m00"]
    else:
        cx = cy = 0.0
    mu20 = m["m20"] - m["m10"] * cx
    mu11 = m["m11"] - m["m10"] * cy
    mu02 = m["m02"] - m["m01"] * cy
    mu30 = m["m30"] - cx * (3 * mu20 + cx * m["m10"])
    mu21 = m["m21"] - cx * (2 * mu11 + cx * m["m01"]) - cy * mu20
    mu12 = m["m12"] - cy * (2 * mu11 + cy * m["m10"]) - cx * mu02
    mu03 = m["m03"] - cy * (3 * mu02 + cy * m["m01"])
    m.update(mu20=mu20, mu11=mu11, mu02=mu02, mu30=mu30, mu21=mu21,
             mu12=mu12, mu03=mu03)
    s2 = m["m00"] ** 2 if m["m00"] else 1.0
    s3 = m["m00"] ** 2.5 if m["m00"] else 1.0
    m.update(nu20=mu20 / s2, nu11=mu11 / s2, nu02=mu02 / s2,
             nu30=mu30 / s3, nu21=mu21 / s3, nu12=mu12 / s3,
             nu03=mu03 / s3)
    return m


def moments(array, binaryImage: bool = False):
    """`cv::moments`: dense single-channel images on device; point
    contours (N,1,2)/(N,2) via the polygon path."""
    arr = np.asarray(array)
    is_pts3 = arr.ndim == 3 and arr.shape[1] == 1 and arr.shape[2] == 2
    # (N,2) int32/f32 is a point set (cv2 images there are u8/u16/f32 HxW)
    is_pts2 = arr.ndim == 2 and arr.shape[1] == 2 \
        and arr.dtype in (np.int32, np.int64)
    if is_pts3 or is_pts2:
        return _contour_moments(arr)
    x, _ = to_batched(array)
    assert x.shape[0] == 1 and x.shape[-1] == 1
    img = x[0, :, :, 0]
    if binaryImage:
        img = (img != 0).astype(jnp.float32)
    H, W = img.shape

    xs = jnp.arange(W, dtype=jnp.float32)
    f = img.astype(jnp.float32)
    # per-row power sums (device): S_p[y] = Σ_x x^p I(x, y)
    S0 = jnp.sum(f, axis=1)
    S1 = jnp.sum(f * xs, axis=1)
    S2 = jnp.sum(f * xs * xs, axis=1)
    S3 = jnp.sum(f * xs * xs * xs, axis=1)
    S = np.asarray(jnp.stack([S0, S1, S2, S3]), np.float64)  # (4, H)

    ys = np.arange(H, dtype=np.float64)
    m = {}
    for q in range(4):
        for p in range(4):
            if p + q > 3:
                continue
            m[f"m{p}{q}"] = float(np.sum((ys ** q) * S[p]))

    m00 = m["m00"]
    if m00 != 0:
        cx = m["m10"] / m00
        cy = m["m01"] / m00
    else:
        cx = cy = 0.0
    # central moments (moments.cpp completeMomentState)
    mu = {}
    mu["mu20"] = m["m20"] - m["m10"] * cx
    mu["mu11"] = m["m11"] - m["m10"] * cy
    mu["mu02"] = m["m02"] - m["m01"] * cy
    mu["mu30"] = m["m30"] - cx * (3 * mu["mu20"] + cx * m["m10"])
    mu["mu21"] = m["m21"] - cx * (2 * mu["mu11"] + cx * m["m01"]) - cy * mu["mu20"]
    mu["mu12"] = m["m12"] - cy * (2 * mu["mu11"] + cy * m["m10"]) - cx * mu["mu02"]
    mu["mu03"] = m["m03"] - cy * (3 * mu["mu02"] + cy * m["m01"])
    m.update(mu)
    inv_sqrt_m00 = m00 ** -0.5 if m00 > 0 else 0.0
    s2 = inv_sqrt_m00 ** 2 / max(m00, 1e-300) if m00 > 0 else 0.0
    # nu_pq = mu_pq / m00^((p+q)/2 + 1)
    for name in ["mu20", "mu11", "mu02"]:
        m["nu" + name[2:]] = m[name] / (m00 * m00) if m00 != 0 else 0.0
    for name in ["mu30", "mu21", "mu12", "mu03"]:
        m["nu" + name[2:]] = (m[name] / (m00 * m00 * (m00 ** 0.5))
                              if m00 > 0 else 0.0)
    return m


def _propagate_labels(fg, conn: int):
    """Min-label flood to fixpoint. fg: (H, W) bool."""
    H, W = fg.shape
    idx = (jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) + 1)
    big = jnp.int32(H * W + 2)
    lab = jnp.where(fg, idx, big)

    if conn == 8:
        offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1),
                (1, 0), (1, 1)]
    else:
        offs = [(-1, 0), (0, -1), (0, 1), (1, 0)]

    def nb_min(l):
        p = jnp.pad(l, 1, constant_values=big)
        best = l
        for (dy, dx) in offs:
            best = jnp.minimum(best, p[1 + dy:1 + dy + H, 1 + dx:1 + dx + W])
        return jnp.where(fg, best, big)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        l, _ = state
        nl = nb_min(l)
        return nl, jnp.any(nl != l)

    lab, _ = lax.while_loop(cond, body, (lab, jnp.asarray(True)))
    return jnp.where(fg, lab, 0)


def connectedComponents(image, connectivity: int = 8, ltype: int = 4):
    """`cv::connectedComponents` — labels 0 (bg) and 1..N, assigned in
    raster order of each component's first pixel (matches the reference's
    label order)."""
    x, _ = to_batched(image)
    fg = x[0, :, :, 0] != 0
    raw = np.asarray(_propagate_labels(fg, connectivity))
    H, W = raw.shape
    # compact label ids match the reference's scan order: the 8-conn BBDT
    # labels per 2×2 block in block-raster order; 4-conn SAUF is
    # pixel-raster order
    ys, xs = np.mgrid[0:H, 0:W]
    if connectivity == 8:
        scan_key = (ys // 2) * ((W + 1) // 2 + 1) + (xs // 2)
    else:
        scan_key = ys * W + xs
    flat = raw.ravel()
    keys = scan_key.ravel()
    nz = flat != 0
    out = np.zeros(flat.shape, np.int32)
    if nz.any():
        order = np.lexsort((keys[nz],))
        labs = flat[nz][order]
        uniq, first = np.unique(labs, return_index=True)
        comp_order = np.argsort(first)  # by earliest scan key
        lut = np.zeros(int(flat.max()) + 1, np.int32)
        for i, o in enumerate(comp_order):
            lut[int(uniq[o])] = i + 1
        out = lut[flat]
        n = len(uniq)
    else:
        n = 0
    return n + 1, out.reshape(H, W).astype(np.int32)


def connectedComponentsWithStats(image, connectivity: int = 8, ltype: int = 4):
    n, labels = connectedComponents(image, connectivity, ltype)
    stats = np.zeros((n, 5), np.int32)
    centroids = np.zeros((n, 2), np.float64)
    H, W = labels.shape
    ys, xs = np.mgrid[0:H, 0:W]
    for i in range(n):
        m = labels == i
        if not m.any():
            continue
        yy, xx = ys[m], xs[m]
        stats[i] = [xx.min(), yy.min(), xx.max() - xx.min() + 1,
                    yy.max() - yy.min() + 1, m.sum()]
        centroids[i] = [xx.mean(), yy.mean()]
    return n, labels, stats, centroids


# chamfer mask weights (distransform.cpp initTopBottom/getDistanceTransformMask)
_DIST_WEIGHTS = {
    (K.DIST_L1, 3): (1.0, 2.0),
    (K.DIST_C, 3): (1.0, 1.0),
    (K.DIST_L2, 3): (0.955, 1.3693),
    (K.DIST_L1, 5): (1.0, 2.0, 3.0),
    (K.DIST_C, 5): (1.0, 1.0, 2.0),
    (K.DIST_L2, 5): (1.0, 1.4, 2.1969),
}


def distanceTransform(src, distanceType: int, maskSize: int,
                      dstType: int = K.CV_32F):
    """`cv::distanceTransform` — chamfer masks 3/5 via min-plus relaxation
    to fixpoint (identical fixed point to the reference's two-pass scan)."""
    x, meta = to_batched(src)
    fg = x[..., 0:1] != 0
    N, H, W, C = fg.shape
    if maskSize == K.DIST_MASK_PRECISE and distanceType == K.DIST_L2:
        # exact EDT: vertical nearest-zero sweep, then a per-row
        # parabola min over columns — a (H, W, W) min-reduce on device
        # (the reference's Felzenszwalb lower envelopes, distransform.cpp)
        g = jnp.where(fg[..., 0], jnp.float32(1e9), 0.0)   # (N, H, W)
        def vpass(gi):
            def fwd(carry, row):
                c = jnp.minimum(row, carry + 1.0)
                return c, c
            _, down = jax.lax.scan(fwd, jnp.full(gi.shape[-1:], 1e9), gi)
            _, up = jax.lax.scan(fwd, jnp.full(gi.shape[-1:], 1e9),
                                 gi[::-1])
            return jnp.minimum(down, up[::-1])
        g = jax.vmap(vpass)(g)
        xs = jnp.arange(W, dtype=jnp.float32)
        dx2 = (xs[:, None] - xs[None, :]) ** 2           # (W, W)
        d2 = jnp.min(g[..., None, :] ** 2 + dx2[None, None], axis=-1)
        out = jnp.sqrt(d2)[..., None]
        return from_batched(out.astype(jnp.float32), meta)
    if maskSize == K.DIST_MASK_PRECISE or distanceType not in (
            K.DIST_L1, K.DIST_L2, K.DIST_C):
        maskSize = 5
        distanceType = K.DIST_L2
    w = _DIST_WEIGHTS[(distanceType, maskSize)]

    INF = jnp.float32(1e9)
    d0 = jnp.where(fg, INF, 0.0)

    if maskSize == 3:
        offs = [(-1, 0, w[0]), (1, 0, w[0]), (0, -1, w[0]), (0, 1, w[0]),
                (-1, -1, w[1]), (-1, 1, w[1]), (1, -1, w[1]), (1, 1, w[1])]
    else:
        offs = [(-1, 0, w[0]), (1, 0, w[0]), (0, -1, w[0]), (0, 1, w[0]),
                (-1, -1, w[1]), (-1, 1, w[1]), (1, -1, w[1]), (1, 1, w[1]),
                (-2, -1, w[2]), (-2, 1, w[2]), (2, -1, w[2]), (2, 1, w[2]),
                (-1, -2, w[2]), (-1, 2, w[2]), (1, -2, w[2]), (1, 2, w[2])]

    pad_r = 2 if maskSize == 5 else 1

    def relax(d):
        p = jnp.pad(d, ((0, 0), (pad_r, pad_r), (pad_r, pad_r), (0, 0)),
                    constant_values=INF)
        best = d
        for (dy, dx, ww) in offs:
            nb = p[:, pad_r + dy:pad_r + dy + H, pad_r + dx:pad_r + dx + W, :]
            best = jnp.minimum(best, nb + jnp.float32(ww))
        return best

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        d, _ = state
        nd = relax(d)
        return nd, jnp.any(nd != d)

    d, _ = lax.while_loop(cond, body, (d0, jnp.asarray(True)))
    return from_batched(d.astype(jnp.float32), meta)


def distanceTransformWithLabels(src, distanceType: int, maskSize: int,
                                labelType: int = K.DIST_LABEL_CCOMP):
    """cv::distanceTransform labeled overload (distransform.cpp:744 +
    distanceTransformEx_5x5): 5×5 chamfer in 16.16 fixed point with
    Voronoi label propagation.  Rows are processed sequentially but each
    row is vectorized: upper-window candidates argmin in the reference's
    check order, then the within-row chain is a running-min accumulate
    (prefer-later on ties == the reference's strict-> update with the
    row neighbor checked last).  Labels are bit-exact for
    DIST_LABEL_PIXEL; DIST_LABEL_CCOMP matches up to the component
    numbering of the seeding connectedComponents pass."""
    a = np.asarray(src)
    if a.ndim == 3:
        a = a[:, :, 0]
    H, W = a.shape
    SHIFT = 16
    m = {K.DIST_C: (1.0, 1.0, 2.0), K.DIST_L1: (1.0, 2.0, 3.0),
         K.DIST_L2: (1.0, 1.4, 2.1969)}[distanceType]
    HV = int(round(m[0] * (1 << SHIFT)))
    DG = int(round(m[1] * (1 << SHIFT)))
    LG = int(round(m[2] * (1 << SHIFT)))
    DIST_MAX = (1 << 32) - 1 - LG

    zero = a == 0
    labels = np.zeros((H, W), np.int32)
    if labelType == K.DIST_LABEL_CCOMP:
        _n, lab = connectedComponents(zero.astype(np.uint8) * 255, 8)
        labels = np.asarray(lab).astype(np.int32)
        labels[~zero] = 0
    else:
        labels[zero] = np.arange(1, int(zero.sum()) + 1)

    B = 2
    dist = np.full((H + 2 * B, W + 2 * B), DIST_MAX, np.int64)
    lab = np.zeros((H + 2 * B, W + 2 * B), np.int32)
    js = np.arange(W, dtype=np.int64)

    def _row_chain(cand, cl, step_w, reverse):
        """tmp[j] = min(cand[j], tmp[j±1]+step_w), candidate wins ties;
        running-min accumulate preferring the nearest previous index."""
        if reverse:
            cand, cl = cand[::-1], cl[::-1]
        v = cand - js * step_w
        mrun = np.minimum.accumulate(v)
        marked = np.where(v == mrun, js, -1)
        ksel = np.maximum.accumulate(marked)
        out = mrun + js * step_w
        outl = cl[ksel]
        if reverse:
            return out[::-1], outl[::-1]
        return out, outl

    # forward pass (top→bottom, candidates from the two rows above)
    for i in range(H):
        r, c = i + B, slice(B, B + W)
        up1d, up1l = dist[r - 1], lab[r - 1]
        up2d, up2l = dist[r - 2], lab[r - 2]
        offs = [(up2d[B - 1:B - 1 + W], up2l[B - 1:B - 1 + W], LG),
                (up2d[B + 1:B + 1 + W], up2l[B + 1:B + 1 + W], LG),
                (up1d[B - 2:B - 2 + W], up1l[B - 2:B - 2 + W], LG),
                (up1d[B - 1:B - 1 + W], up1l[B - 1:B - 1 + W], DG),
                (up1d[B:B + W], up1l[B:B + W], HV),
                (up1d[B + 1:B + 1 + W], up1l[B + 1:B + 1 + W], DG),
                (up1d[B + 2:B + 2 + W], up1l[B + 2:B + 2 + W], LG)]
        cands = np.stack([np.full(W, DIST_MAX, np.int64)]
                         + [d + w for d, _l, w in offs])
        clabs = np.stack([np.zeros(W, np.int32)]
                         + [_l for _d, _l, _w in offs])
        pick = np.argmin(cands, axis=0)   # first minimum == check order
        cand = cands[pick, js]
        cl = clabs[pick, js]
        z = zero[i]
        cand = np.where(z, 0, np.minimum(cand, DIST_MAX))
        cl = np.where(z, labels[i], cl)
        rowd, rowl = _row_chain(cand, cl, HV, reverse=False)
        rowd = np.where(z, 0, rowd)
        rowl = np.where(z, labels[i], rowl)
        dist[r, c] = rowd
        lab[r, c] = rowl

    # backward pass (bottom→top, candidates from the two rows below)
    for i in range(H - 1, -1, -1):
        r, c = i + B, slice(B, B + W)
        dn1d, dn1l = dist[r + 1], lab[r + 1]
        dn2d, dn2l = dist[r + 2], lab[r + 2]
        offs = [(dn2d[B + 1:B + 1 + W], dn2l[B + 1:B + 1 + W], LG),
                (dn2d[B - 1:B - 1 + W], dn2l[B - 1:B - 1 + W], LG),
                (dn1d[B + 2:B + 2 + W], dn1l[B + 2:B + 2 + W], LG),
                (dn1d[B + 1:B + 1 + W], dn1l[B + 1:B + 1 + W], DG),
                (dn1d[B:B + W], dn1l[B:B + W], HV),
                (dn1d[B - 1:B - 1 + W], dn1l[B - 1:B - 1 + W], DG),
                (dn1d[B - 2:B - 2 + W], dn1l[B - 2:B - 2 + W], LG)]
        cands = np.stack([dist[r, c]] + [d + w for d, _l, w in offs])
        clabs = np.stack([lab[r, c]] + [_l for _d, _l, _w in offs])
        pick = np.argmin(cands, axis=0)   # current value checked first
        cand = cands[pick, js]
        cl = clabs[pick, js]
        rowd, rowl = _row_chain(cand[::-1], cl[::-1], HV,
                                reverse=False)
        dist[r, c] = rowd[::-1]
        lab[r, c] = rowl[::-1]

    out = (dist[B:B + H, B:B + W].astype(np.float64)
           / float(1 << SHIFT)).astype(np.float32)
    return out, lab[B:B + H, B:B + W].copy()


def connectedComponentsWithAlgorithm(image, connectivity: int, ltype: int,
                                     ccltype: int):
    """cv::connectedComponentsWithAlgorithm — the algorithm selector
    (CCL_WU/GRANA/BOLELLI...) only changes the internal scan strategy in
    the reference; the labeling contract is identical, and our device
    label-propagation produces the same canonical first-touch order."""
    return connectedComponents(image, connectivity, ltype)


def connectedComponentsWithStatsWithAlgorithm(image, connectivity: int,
                                              ltype: int, ccltype: int):
    return connectedComponentsWithStats(image, connectivity, ltype)
