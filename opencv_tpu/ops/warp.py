"""Geometric warps: warpAffine / warpPerspective / remap + transform builders.

TPU-native design: warpAffine/warpPerspective compute their coordinate
planes ON DEVICE from rank-1 decompositions of the map — per-row and
per-column double vectors built on the host (O(dh+dw) work, exactly the
reference's per-block `adelta`/`X0` idea, imgwarp.cpp:2686) and
reassembled per pixel in double-float (two-float32) arithmetic, so the
XLA program carries no dh*dw constants and retains double precision on
f32 hardware.  Border resolution (`borderInterpolate`) is closed-form
device index math; the taps are batched gathers + int32 (u8) or f32
weighted sums; batch is the parallel axis instead of the reference's
`parallel_for_` row blocks.  remap() with user maps ships the maps as
data and shares the same tap cores.

Numeric contracts reproduced:
- NN: `AB_BITS=10` integer grid, `adelta[x] = saturate_cast<int>(M[0]*x*
  1024)`, `round_delta = 512` (imgwarp.cpp:2686, blockline NN);
- LINEAR: the 4.x Q5/Q15 table scheme was replaced in the reference line
  by an exact floating-point bilinear (verified: cv2 5.0 output ==
  double-precision bilinear with round-half-even for both warpAffine and
  remap).  We compute source coordinates on the host in double and
  interpolate on device in float32 (documented tolerance: ±1 on ties);
- fixed-point CV_16SC2(+CV_16UC1) remap maps keep the classic Q15 table
  accumulate `(v + 16384) >> 15` (initInterTab2D sum-corrected tables,
  imgwarp.cpp:247-257 — including its flat-memory correction quirk);
- border semantics of remapNearest/remapBilinear (imgwarp.cpp:330,820):
  CONSTANT fills fully-outside windows with the border value and resolves
  per-tap otherwise; REPLICATE clamps; other modes use borderInterpolate.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from .. import constants as K
from ..core.arrays import to_batched, from_batched
from ..core.borders import border_interpolate
from ..core.fixedpoint import saturate_cast

__all__ = [
    "warpAffine", "warpPerspective", "remap",
    "invertAffineTransform", "getRotationMatrix2D",
    "getAffineTransform", "getPerspectiveTransform",
]

INTER_BITS = 5
INTER_TAB_SIZE = 1 << INTER_BITS          # 32
INTER_TAB_SIZE2 = INTER_TAB_SIZE ** 2     # 1024
REMAP_COEF_BITS = 15
REMAP_COEF_SCALE = 1 << REMAP_COEF_BITS   # 32768
AB_BITS = max(10, INTER_BITS)
AB_SCALE = 1 << AB_BITS                   # 1024


# --------------------------------------------------------------------------
# transform builders (host, double precision — matches the reference)
# --------------------------------------------------------------------------

def invertAffineTransform(M):
    """`cv::invertAffineTransform` (imgwarp.cpp)."""
    M = np.asarray(M, np.float64).reshape(2, 3)
    D = M[0, 0] * M[1, 1] - M[0, 1] * M[1, 0]
    D = 1.0 / D if D != 0 else 0.0
    A11 = M[1, 1] * D
    A22 = M[0, 0] * D
    A12 = -M[0, 1] * D
    A21 = -M[1, 0] * D
    b1 = -A11 * M[0, 2] - A12 * M[1, 2]
    b2 = -A21 * M[0, 2] - A22 * M[1, 2]
    return np.array([[A11, A12, b1], [A21, A22, b2]], np.float64)


def getRotationMatrix2D(center, angle, scale):
    angle = angle * math.pi / 180.0
    a = scale * math.cos(angle)
    b = scale * math.sin(angle)
    cx, cy = float(center[0]), float(center[1])
    return np.array([
        [a, b, (1 - a) * cx - b * cy],
        [-b, a, b * cx + (1 - a) * cy],
    ], np.float64)


def getAffineTransform(src, dst):
    src = np.asarray(src, np.float64).reshape(3, 2)
    dst = np.asarray(dst, np.float64).reshape(3, 2)
    A = np.zeros((6, 6))
    b = np.zeros(6)
    for i in range(3):
        A[i * 2, 0:2] = src[i]
        A[i * 2, 2] = 1
        A[i * 2 + 1, 3:5] = src[i]
        A[i * 2 + 1, 5] = 1
        b[i * 2] = dst[i, 0]
        b[i * 2 + 1] = dst[i, 1]
    x = np.linalg.solve(A, b)
    return x.reshape(2, 3)


def getPerspectiveTransform(src, dst, solveMethod: int = K.DECOMP_LU):
    src = np.asarray(src, np.float64).reshape(4, 2)
    dst = np.asarray(dst, np.float64).reshape(4, 2)
    A = np.zeros((8, 8))
    b = np.zeros(8)
    for i in range(4):
        A[i, 0:2] = src[i]
        A[i, 2] = 1
        A[i, 6] = -src[i, 0] * dst[i, 0]
        A[i, 7] = -src[i, 1] * dst[i, 0]
        A[i + 4, 3:5] = src[i]
        A[i + 4, 5] = 1
        A[i + 4, 6] = -src[i, 0] * dst[i, 1]
        A[i + 4, 7] = -src[i, 1] * dst[i, 1]
        b[i] = dst[i, 0]
        b[i + 4] = dst[i, 1]
    x = np.linalg.solve(A, b)
    return np.append(x, 1.0).reshape(3, 3)


# --------------------------------------------------------------------------
# interpolation tables (initInterTab2D, imgwarp.cpp:216)
# --------------------------------------------------------------------------

_TAB_CACHE = {}


def _inter_tab(ksize: int):
    """(1024, k*k) float32 and sum-corrected Q15 int32 tables."""
    if ksize in _TAB_CACHE:
        return _TAB_CACHE[ksize]
    from .resize import _interpolate_cubic, _interpolate_lanczos4
    scale = np.float32(1.0) / INTER_TAB_SIZE
    xs = (np.arange(INTER_TAB_SIZE, dtype=np.float32) * scale)
    if ksize == 2:
        tab1 = np.stack([np.float32(1.0) - xs, xs], axis=1)
    elif ksize == 4:
        tab1 = _interpolate_cubic(xs)
    else:
        # warp lanczos: x < FLT_EPSILON shortcut (imgwarp.cpp:162)
        tab1 = _interpolate_lanczos4(xs)
        tab1[0] = 0.0
        tab1[0, 3] = 1.0
    ftab = np.empty((INTER_TAB_SIZE2, ksize * ksize), np.float32)
    itab = np.empty((INTER_TAB_SIZE2, ksize * ksize), np.int32)
    for i in range(INTER_TAB_SIZE):
        for j in range(INTER_TAB_SIZE):
            v = np.outer(tab1[i], tab1[j]).astype(np.float32)  # vy * vx
            idx = i * INTER_TAB_SIZE + j
            ftab[idx] = v.ravel()
            iv = np.clip(np.rint(v.astype(np.float64) * REMAP_COEF_SCALE),
                         -32768, 32767).astype(np.int32).reshape(ksize, ksize)
            isum = int(iv.sum())
            if isum != REMAP_COEF_SCALE:
                # Faithful to initInterTab2D's correction, INCLUDING its
                # flat-memory quirk: for ksize=2 the search window
                # (k1,k2 ∈ [k2c, k2c+2)) indexes past the 2x2 block —
                # C++ reads zeros from the not-yet-filled next block and
                # writes there are overwritten by the next block's fill.
                diff = isum - REMAP_COEF_SCALE
                k2c = ksize // 2
                kk = ksize * ksize
                flat = np.zeros(max(kk, (k2c + 1) * ksize + k2c + 2),
                                np.int64)
                flat[:kk] = iv.ravel()
                Mo = mo = k2c * ksize + k2c
                for k1 in range(k2c, k2c + 2):
                    for kx in range(k2c, k2c + 2):
                        o = k1 * ksize + kx
                        if flat[o] < flat[mo]:
                            mo = o
                        elif flat[o] > flat[Mo]:
                            Mo = o
                if diff < 0:
                    flat[Mo] -= diff
                else:
                    flat[mo] -= diff
                iv = flat[:kk].reshape(ksize, ksize).astype(np.int32)
            itab[idx] = iv.ravel()
    _TAB_CACHE[ksize] = (ftab, itab)
    return ftab, itab


# --------------------------------------------------------------------------
# core: gather-based remap given host-side integer coords
# --------------------------------------------------------------------------

def _resolve_tap(coord, length, border_type):
    """Vectorized borderInterpolate: returns (index ≥ 0, use_cval mask)."""
    bt = border_type & ~K.BORDER_ISOLATED
    inside = (coord >= 0) & (coord < length)
    if bt == K.BORDER_REPLICATE:
        return np.clip(coord, 0, length - 1), np.zeros_like(inside)
    if bt == K.BORDER_CONSTANT or bt == K.BORDER_TRANSPARENT:
        return np.clip(coord, 0, length - 1), ~inside
    out = coord.copy()
    bad = ~inside
    if bad.any():
        vals = np.unique(out[bad])
        lut = {int(v): border_interpolate(int(v), length, bt) for v in vals}
        rep = np.array([lut[int(v)] for v in out[bad]])
        out[bad] = rep
    return np.clip(out, 0, length - 1), np.zeros_like(inside)


def _remap_fixed(x, sx, sy, fxy, interpolation, border_type, border_value):
    """remap core with host integer coords.

    x: (N,H,W,C); sx/sy: (dh,dw) int arrays (top-left tap); fxy: (dh,dw)
    Q5 fraction index or None for NN.
    """
    N, H, W, C = x.shape
    dh, dw = sx.shape
    is_u8 = x.dtype == jnp.uint8
    bval = np.zeros(4, np.float64)
    bv = np.asarray(border_value, np.float64).reshape(-1) if border_value is not None else np.zeros(1)
    bval[:min(4, bv.size)] = bv[:4]
    if np.dtype(x.dtype).kind in "ui":
        info = np.iinfo(x.dtype)
        cval = np.clip(np.rint(bval), info.min, info.max)
    else:
        cval = bval
    cval_dev = jnp.asarray(cval[[k & 3 for k in range(C)]],
                           jnp.int32 if is_u8 else jnp.float32)

    if fxy is None:  # nearest: batch+channels ride the gathered row
        xi, xmask = _resolve_tap(sx, W, border_type)
        yi, ymask = _resolve_tap(sy, H, border_type)
        use_c = xmask | ymask
        idx = (yi * W + xi).astype(np.int32)
        flatp = x.transpose(1, 2, 0, 3).reshape(H * W, N * C)
        g = jnp.take(flatp, jnp.asarray(idx.ravel()), axis=0)
        g = g.reshape(dh, dw, N, C).transpose(2, 0, 1, 3)
        if use_c.any():
            m = jnp.asarray(use_c[None, :, :, None])
            g = jnp.where(m, cval_dev.astype(x.dtype).reshape(1, 1, 1, C), g)
        return g

    bt = border_type & ~K.BORDER_ISOLATED
    acc_dtype = jnp.int32 if is_u8 else jnp.float32
    # fully-outside windows under BORDER_CONSTANT → cval
    # (remapBilinear, imgwarp.cpp:823-827)
    fully_out = ((sx >= W) | (sx + 1 < 0) | (sy >= H) | (sy + 1 < 0))

    # BilinearTab weights computed arithmetically: the ksize=2 table
    # entries are exact products (32-fy)(32-fx)*32 in Q15 / vy*vx in f32
    # (initInterTab2D's sum-correction never fires for LINEAR), so the
    # (dh*dw)-index table gather is unnecessary
    fq = jnp.asarray(fxy.astype(np.int32).ravel()[:, None])
    fyq = fq >> 5
    fxq = fq & 31
    if is_u8:
        w00 = (32 - fxq) * (32 - fyq) * 32
        w01 = fxq * (32 - fyq) * 32
        w10 = (32 - fxq) * fyq * 32
        w11 = fxq * fyq * 32
    else:
        sc = jnp.float32(1.0 / INTER_TAB_SIZE)
        vx0 = jnp.float32(1.0) - fxq.astype(jnp.float32) * sc
        vx1 = fxq.astype(jnp.float32) * sc
        vy0 = jnp.float32(1.0) - fyq.astype(jnp.float32) * sc
        vy1 = fyq.astype(jnp.float32) * sc
        w00 = vy0 * vx0
        w01 = vy0 * vx1
        w10 = vy1 * vx0
        w11 = vy1 * vx1

    if bt == K.BORDER_WRAP:
        # wrap seams break tap adjacency: per-tap gathers
        flat = x.reshape(N, H * W, C)
        wts = [w00, w01, w10, w11]
        acc = None
        for t, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            xi, xmask = _resolve_tap(sx + dx, W, border_type)
            yi, ymask = _resolve_tap(sy + dy, H, border_type)
            use_c = xmask | ymask
            idx = (yi * W + xi).astype(np.int32)
            g = jnp.take(flat, jnp.asarray(idx.ravel()), axis=1)                 .astype(acc_dtype)
            if use_c.any():
                m = jnp.asarray(use_c.ravel()[None, :, None])
                g = jnp.where(m, cval_dev.reshape(1, 1, C), g)
            acc = (g * wts[t][None] if acc is None
                   else acc + g * wts[t][None])
        acc = acc.reshape(N, dh * dw, C).transpose(1, 0, 2)             .reshape(dh * dw, N * C)
    else:
        rx0, xm0 = _resolve_tap(sx, W, border_type)
        rx1, xm1 = _resolve_tap(sx + 1, W, border_type)
        ry0, ym0 = _resolve_tap(sy, H, border_type)
        ry1, ym1 = _resolve_tap(sy + 1, H, border_type)
        bx = np.minimum(rx0, rx1)
        by = np.minimum(ry0, ry1)
        patch = _patch_operand(x)
        idx = jnp.asarray((by * W + bx).astype(np.int32).ravel())
        g = jnp.take(patch, idx, axis=0).astype(acc_dtype)
        g = g.reshape(-1, 2, 2, N * C)

        def dm(m):
            return jnp.asarray(m.ravel()[:, None])

        selx0 = dm(rx0 == bx)
        selx1 = dm(rx1 == bx)
        sely0 = dm(ry0 == by)
        sely1 = dm(ry1 == by)
        r0x0 = jnp.where(selx0, g[:, 0, 0], g[:, 0, 1])
        r0x1 = jnp.where(selx1, g[:, 0, 0], g[:, 0, 1])
        r1x0 = jnp.where(selx0, g[:, 1, 0], g[:, 1, 1])
        r1x1 = jnp.where(selx1, g[:, 1, 0], g[:, 1, 1])
        t00 = jnp.where(sely0, r0x0, r1x0)
        t01 = jnp.where(sely0, r0x1, r1x1)
        t10 = jnp.where(sely1, r0x0, r1x0)
        t11 = jnp.where(sely1, r0x1, r1x1)
        cvalr = jnp.tile(cval_dev, N).reshape(1, N * C)
        t00 = jnp.where(dm(xm0 | ym0), cvalr, t00)
        t01 = jnp.where(dm(xm1 | ym0), cvalr, t01)
        t10 = jnp.where(dm(xm0 | ym1), cvalr, t10)
        t11 = jnp.where(dm(xm1 | ym1), cvalr, t11)
        acc = t00 * w00 + t01 * w01 + t10 * w10 + t11 * w11

    if is_u8:
        out = (acc + (1 << (REMAP_COEF_BITS - 1))) >> REMAP_COEF_BITS
        out = jnp.clip(out, 0, 255).astype(jnp.uint8)
    else:
        out = saturate_cast(acc, x.dtype)
    out = out.reshape(dh, dw, N, C).transpose(2, 0, 1, 3)
    if bt in (K.BORDER_CONSTANT,) and fully_out.any():
        m = jnp.asarray(fully_out[None, :, :, None])
        out = jnp.where(m, cval_dev.astype(x.dtype).reshape(1, 1, 1, C), out)
    return out


def _remap_linear_float(x, mapx, mapy, border_type, border_value):
    """Bilinear remap with host float64 coordinate maps.

    Host-resolved borders + ONE patch-operand gather per output pixel
    (see _patch_operand); tap decode masks are host-precomputed booleans.
    BORDER_WRAP falls back to four independent tap gathers (resolved
    pairs are not adjacent across the wrap seam)."""
    N, H, W, C = x.shape
    dh, dw = mapx.shape
    x0 = np.floor(mapx).astype(np.int64)
    y0 = np.floor(mapy).astype(np.int64)
    ax = (mapx - x0)
    ay = (mapy - y0)

    bval = np.zeros(4, np.float64)
    bv = (np.asarray(border_value, np.float64).reshape(-1)
          if border_value is not None else np.zeros(1))
    bval[:min(4, bv.size)] = bv[:4]
    if np.dtype(x.dtype).kind in "ui":
        info = np.iinfo(x.dtype)
        cvals = np.clip(np.rint(bval), info.min, info.max)
    else:
        cvals = bval
    cval_dev = jnp.asarray(cvals[[k & 3 for k in range(C)]], jnp.float32)

    bt = border_type & ~K.BORDER_ISOLATED
    if bt == K.BORDER_WRAP:
        return _remap_linear_float_4tap(
            x, x0, y0, ax, ay, border_type, cval_dev)

    rx0, xm0 = _resolve_tap(x0, W, border_type)
    rx1, xm1 = _resolve_tap(x0 + 1, W, border_type)
    ry0, ym0 = _resolve_tap(y0, H, border_type)
    ry1, ym1 = _resolve_tap(y0 + 1, H, border_type)
    bx = np.minimum(rx0, rx1)
    by = np.minimum(ry0, ry1)

    patch = _patch_operand(x)
    idx = jnp.asarray((by * W + bx).astype(np.int32).ravel())
    g = jnp.take(patch, idx, axis=0).astype(jnp.float32)
    g = g.reshape(-1, 2, 2, N * C)

    def dev_mask(m):
        return jnp.asarray(m.ravel()[:, None])

    selx0 = dev_mask(rx0 == bx)
    selx1 = dev_mask(rx1 == bx)
    sely0 = dev_mask(ry0 == by)
    sely1 = dev_mask(ry1 == by)
    r0x0 = jnp.where(selx0, g[:, 0, 0], g[:, 0, 1])
    r0x1 = jnp.where(selx1, g[:, 0, 0], g[:, 0, 1])
    r1x0 = jnp.where(selx0, g[:, 1, 0], g[:, 1, 1])
    r1x1 = jnp.where(selx1, g[:, 1, 0], g[:, 1, 1])
    t00 = jnp.where(sely0, r0x0, r1x0)
    t01 = jnp.where(sely0, r0x1, r1x1)
    t10 = jnp.where(sely1, r0x0, r1x0)
    t11 = jnp.where(sely1, r0x1, r1x1)

    cvalr = jnp.tile(cval_dev, N).reshape(1, N * C)
    t00 = jnp.where(dev_mask(xm0 | ym0), cvalr, t00)
    t01 = jnp.where(dev_mask(xm1 | ym0), cvalr, t01)
    t10 = jnp.where(dev_mask(xm0 | ym1), cvalr, t10)
    t11 = jnp.where(dev_mask(xm1 | ym1), cvalr, t11)

    axd = jnp.asarray(ax.astype(np.float32).ravel()[:, None])
    ayd = jnp.asarray(ay.astype(np.float32).ravel()[:, None])
    acc = (t00 * ((1 - axd) * (1 - ayd)) + t01 * (axd * (1 - ayd))
           + t10 * ((1 - axd) * ayd) + t11 * (axd * ayd))

    out = saturate_cast(acc, x.dtype).reshape(dh, dw, N, C)
    out = out.transpose(2, 0, 1, 3)
    fully_out = (x0 >= W) | (x0 + 1 < 0) | (y0 >= H) | (y0 + 1 < 0)
    if bt == K.BORDER_CONSTANT and fully_out.any():
        m = jnp.asarray(fully_out[None, :, :, None])
        out = jnp.where(m, cval_dev.astype(x.dtype).reshape(1, 1, 1, C),
                        out)
    return out


def _remap_linear_float_4tap(x, x0, y0, ax, ay, border_type, cval_dev):
    """Per-tap fallback (BORDER_WRAP)."""
    N, H, W, C = x.shape
    dh, dw = x0.shape
    flat = x.reshape(N, H * W, C)
    fully_out = (x0 >= W) | (x0 + 1 < 0) | (y0 >= H) | (y0 + 1 < 0)

    axd = jnp.asarray(ax.ravel()[None, :, None], jnp.float32)
    ayd = jnp.asarray(ay.ravel()[None, :, None], jnp.float32)
    wts = [(1 - axd) * (1 - ayd), axd * (1 - ayd),
           (1 - axd) * ayd, axd * ayd]

    acc = None
    for t, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        xi, xmask = _resolve_tap(x0 + dx, W, border_type)
        yi, ymask = _resolve_tap(y0 + dy, H, border_type)
        use_c = xmask | ymask
        idx = (yi * W + xi).astype(np.int32)
        g = jnp.take(flat, jnp.asarray(idx.ravel()), axis=1).astype(jnp.float32)
        if use_c.any():
            m = jnp.asarray(use_c.ravel()[None, :, None])
            g = jnp.where(m, cval_dev.reshape(1, 1, C), g)
        term = g * wts[t]
        acc = term if acc is None else acc + term

    out = saturate_cast(acc, x.dtype)
    out = out.reshape(N, dh, dw, C)
    bt = border_type & ~K.BORDER_ISOLATED
    if bt == K.BORDER_CONSTANT and fully_out.any():
        m = jnp.asarray(fully_out[None, :, :, None])
        out = jnp.where(m, cval_dev.astype(x.dtype).reshape(1, 1, 1, C),
                        out)
    return out


# --------------------------------------------------------------------------
# device-side remap core (used by warpAffine/warpPerspective)
#
# The reference computes per-block fixed-point coordinate maps on the CPU
# (imgwarp.cpp:2247 WarpAffineInvoker).  Shipping full-resolution maps to
# the device would bake dh*dw-sized constants into the XLA program (at 4K:
# ~130 MB per warp), so instead the maps are RANK-1 decomposed on the host
# (per-row + per-column double vectors) and reassembled on the device in
# double-float (two-float32) arithmetic — full double precision from f32
# hardware, O(dh + dw) host work, O(1) program size.
# --------------------------------------------------------------------------

def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    s = a + b
    return s, b - (s - a)


def _veltkamp_split(a):
    c = a * np.float32(4097.0)  # 2^12 + 1
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _veltkamp_split(a)
    bh, bl = _veltkamp_split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _dd_add(a, b):
    s, e = _two_sum(a[0], b[0])
    e = e + a[1] + b[1]
    return _quick_two_sum(s, e)


def _dd_div(a, b):
    q0 = a[0] / b[0]
    # r = a - q0*b in double-float
    p, pe = _two_prod(q0, b[0])
    rh, re = _two_sum(a[0], -p)
    r = rh + (re + a[1] - pe - q0 * b[1])
    q1 = r / b[0]
    return _quick_two_sum(q0, q1)


def _split_f64_host(v):
    """Host f64 vector → (hi, lo) f32 pair with hi+lo == v exactly-ish."""
    hi = v.astype(np.float32)
    lo = (v - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def _floor_frac_dd(hi, lo):
    """floor + fraction of a double-float coordinate (f32 pair)."""
    x0 = jnp.floor(hi)
    r = (hi - x0) + lo
    x0 = x0 + jnp.floor(r)
    r = r - jnp.floor(r)
    # clamp before the int cast: saturated/degenerate coords can exceed
    # int32 range in f32 (f32→s32 overflow is undefined in XLA)
    x0 = jnp.clip(x0, -1e9, 1e9)
    return x0.astype(jnp.int32), r.astype(jnp.float32)


def _resolve_tap_dev(coord, length, border_type):
    """Device borderInterpolate (copy.cpp:748): closed-form index map.
    Returns (idx int32 in [0,len), use_cval bool)."""
    bt = border_type & ~K.BORDER_ISOLATED
    L = length
    inside_bad = (coord < 0) | (coord >= L)
    if bt == K.BORDER_REPLICATE:
        return jnp.clip(coord, 0, L - 1), jnp.zeros_like(inside_bad)
    if bt in (K.BORDER_CONSTANT, K.BORDER_TRANSPARENT):
        return jnp.clip(coord, 0, L - 1), inside_bad
    if bt == K.BORDER_WRAP:
        return jnp.mod(coord, L), jnp.zeros_like(inside_bad)
    if L == 1:
        return jnp.zeros_like(coord), jnp.zeros_like(inside_bad)
    if bt == K.BORDER_REFLECT:        # period 2L: ...210|012...L-1|L-1...
        q = jnp.mod(coord, 2 * L)
        idx = jnp.where(q < L, q, 2 * L - 1 - q)
        return idx, jnp.zeros_like(inside_bad)
    if bt == K.BORDER_REFLECT_101:    # period 2L-2
        q = jnp.mod(coord, 2 * L - 2)
        idx = jnp.where(q < L, q, 2 * L - 2 - q)
        return idx, jnp.zeros_like(inside_bad)
    raise ValueError(f"unsupported border type {border_type}")


def _cval_vec(border_value, dtype, C):
    bval = np.zeros(4, np.float64)
    bv = (np.asarray(border_value, np.float64).reshape(-1)
          if border_value is not None else np.zeros(1))
    bval[:min(4, bv.size)] = bv[:4]
    if np.dtype(dtype).kind in "ui":
        info = np.iinfo(dtype)
        bval = np.clip(np.rint(bval), info.min, info.max)
    return jnp.asarray(bval[[k & 3 for k in range(C)]], jnp.float32)


def _remap_nn_dev(x, sx, sy, border_type, border_value):
    """NN remap with DEVICE int32 coordinate planes sx/sy (dh, dw).

    TPU note: XLA gather cost on TPU is per-INDEX, not per-byte, so the
    batch and channel axes ride in the gathered row payload ((H*W, N*C)
    operand, one index per output pixel) instead of looping the gather
    over N like the reference's per-image remap (imgwarp.cpp:1713)."""
    N, H, W, C = x.shape
    dh, dw = sx.shape
    cval = _cval_vec(border_value, x.dtype, C)
    xi, xm = _resolve_tap_dev(sx, W, border_type)
    yi, ym = _resolve_tap_dev(sy, H, border_type)
    use_c = xm | ym
    idx = (yi * W + xi).reshape(-1)
    flat = x.transpose(1, 2, 0, 3).reshape(H * W, N * C)
    g = jnp.take(flat, idx, axis=0).reshape(dh, dw, N, C)
    g = g.transpose(2, 0, 1, 3)
    return jnp.where(use_c[None, :, :, None],
                     cval.astype(x.dtype).reshape(1, 1, 1, C), g)


def _remap_ktap_dev(x, x0, fq5x, y0, fq5y, ksize, border_type,
                    border_value):
    """k-tap remap (CUBIC k=4 / LANCZOS4 k=8) with DEVICE integer taps
    and Q5-quantized fractions, using the reference's initInterTab2D
    weight tables (imgwarp.cpp:216; remapBicubic/remapLanczos4 gather
    semantics).  u8 inputs use the sum-corrected Q15 integer tables,
    floats the f32 tables."""
    N, H, W, C = x.shape
    dh, dw = x0.shape
    is_u8 = x.dtype == jnp.uint8
    cval = _cval_vec(border_value, x.dtype, C)
    flat = x.reshape(N, H * W, C)
    ftab, itab = _inter_tab(ksize)
    acc_t = jnp.int32 if is_u8 else jnp.float32
    wtab = jnp.asarray(itab if is_u8 else ftab).astype(acc_t)
    fxy = (fq5y * INTER_TAB_SIZE + fq5x).reshape(-1)
    wsel = wtab[fxy]                       # (dh*dw, k*k)
    off = ksize // 2 - 1

    acc = None
    t = 0
    for dy in range(ksize):
        yi, ym = _resolve_tap_dev(y0 + (dy - off), H, border_type)
        for dx in range(ksize):
            xi, xm = _resolve_tap_dev(x0 + (dx - off), W, border_type)
            use_c = (xm | ym).reshape(-1)[None, :, None]
            idx = (yi * W + xi).reshape(-1)
            g = jnp.take(flat, idx, axis=1).astype(acc_t)
            g = jnp.where(use_c, cval.astype(acc_t).reshape(1, 1, C), g)
            term = g * wsel[None, :, t:t + 1]
            acc = term if acc is None else acc + term
            t += 1

    if is_u8:
        out = (acc + (1 << (REMAP_COEF_BITS - 1))) >> REMAP_COEF_BITS
        out = jnp.clip(out, 0, 255).astype(jnp.uint8)
    else:
        out = saturate_cast(acc, x.dtype)
    out = out.reshape(N, dh, dw, C)
    bt = border_type & ~K.BORDER_ISOLATED
    if bt == K.BORDER_CONSTANT:
        fully_out = ((x0 - off >= W) | (x0 + ksize - 1 - off < 0)
                     | (y0 - off >= H) | (y0 + ksize - 1 - off < 0))
        out = jnp.where(fully_out[None, :, :, None],
                        cval.astype(x.dtype).reshape(1, 1, 1, C), out)
    return out


def _cubic_weights_dev(f):
    """Device bicubic weights, A=-0.75 (interpolateCubic, imgwarp.cpp)."""
    A = jnp.float32(-0.75)
    x = f.astype(jnp.float32)
    c0 = ((A * (x + 1) - 5 * A) * (x + 1) + 8 * A) * (x + 1) - 4 * A
    c1 = ((A + 2) * x - (A + 3)) * x * x + 1
    c2 = ((A + 2) * (1 - x) - (A + 3)) * (1 - x) * (1 - x) + 1
    c3 = jnp.float32(1.0) - c0 - c1 - c2
    return [c0, c1, c2, c3]


def _lanczos4_weights_dev(f):
    """Device Lanczos4 weights (interpolateLanczos4, imgwarp.cpp:162)."""
    s45 = 0.70710678118654752440084436210485
    cs = np.array([[1, 0], [-s45, -s45], [0, 1], [s45, -s45],
                   [-1, 0], [s45, s45], [0, -1], [-s45, s45]], np.float32)
    x = f.astype(jnp.float32)
    y0 = -(x + 3) * jnp.float32(math.pi * 0.25)
    s0, c0 = jnp.sin(y0), jnp.cos(y0)
    ws = []
    for i in range(8):
        d = x + jnp.float32(3 - i)
        y = -d * jnp.float32(math.pi * 0.25)
        w = (cs[i, 0] * s0 + cs[i, 1] * c0) / (y * y)
        w = jnp.where(jnp.abs(d) < 1e-6, jnp.float32(1e30), w)
        ws.append(w)
    total = sum(ws)
    return [w / total for w in ws]


def _remap_ktap_float_dev(x, x0, fx, y0, fy, ksize, border_type,
                          border_value):
    """k-tap remap with EXACT float fractions (the 5.x float scheme, like
    the linear path): separable weight evaluation on device, f32
    accumulation, saturate_cast at the end."""
    N, H, W, C = x.shape
    dh, dw = x0.shape
    cval = _cval_vec(border_value, x.dtype, C)
    flat = x.reshape(N, H * W, C)
    wfn = _cubic_weights_dev if ksize == 4 else _lanczos4_weights_dev
    wx = [w.reshape(-1)[None, :, None] for w in wfn(fx)]
    wy = [w.reshape(-1)[None, :, None] for w in wfn(fy)]
    off = ksize // 2 - 1

    acc = None
    for dy in range(ksize):
        yi, ym = _resolve_tap_dev(y0 + (dy - off), H, border_type)
        rowacc = None
        for dx in range(ksize):
            xi, xm = _resolve_tap_dev(x0 + (dx - off), W, border_type)
            use_c = (xm | ym).reshape(-1)[None, :, None]
            idx = (yi * W + xi).reshape(-1)
            g = jnp.take(flat, idx, axis=1).astype(jnp.float32)
            g = jnp.where(use_c, cval.reshape(1, 1, C), g)
            term = g * wx[dx]
            rowacc = term if rowacc is None else rowacc + term
        term = rowacc * wy[dy]
        acc = term if acc is None else acc + term

    out = saturate_cast(acc, x.dtype).reshape(N, dh, dw, C)
    bt = border_type & ~K.BORDER_ISOLATED
    if bt == K.BORDER_CONSTANT:
        fully_out = ((x0 - off >= W) | (x0 + ksize - 1 - off < 0)
                     | (y0 - off >= H) | (y0 + ksize - 1 - off < 0))
        out = jnp.where(fully_out[None, :, :, None],
                        cval.astype(x.dtype).reshape(1, 1, 1, C), out)
    return out


def _floor_q5_dd(hi, lo):
    """Double-float coordinate → (int tap, Q5 fraction), mirroring the
    reference's Q(AB_BITS) rounding then >>5 split (imgwarp.cpp:2698)."""
    s32h = hi * jnp.float32(32.0)
    s32l = lo * jnp.float32(32.0)
    t0 = jnp.floor(s32h)
    r = (s32h - t0) + s32l + jnp.float32(0.5)
    t = t0 + jnp.floor(r)
    t = jnp.clip(t, -1e9, 1e9)
    ti = t.astype(jnp.int32)
    return ti >> 5, ti & 31


def _warp_step_bounds(m, dw, dh):
    """Host bounds on (dX/dj, dY/dj) — the source-coordinate steps per
    output COLUMN — over the whole output rect.

    For affine maps the steps are the constants (m[0], m[3]).  For
    perspective maps X = (m0 j + m1 i + m2)/q, q = m6 j + m7 i + m8:
    dX/dj = (m0*(m7 i + m8) - m6*(m1 i + m2)) / q**2 — the numerator is
    linear in i and q is linear in (j, i), so exact bounds come from the
    rect's corners (mean-value theorem then bounds every finite step).
    Returns (sx_lo, sx_hi, sy_lo, sy_hi) or None (horizon crosses the
    output rect: no finite bound)."""
    m = np.asarray(m, np.float64).reshape(-1)
    if m.size == 6 or (m.size == 9 and m[6] == 0 and m[7] == 0
                       and m[8] == 1.0):
        return float(m[0]), float(m[0]), float(m[3]), float(m[3])
    q = [m[6] * j + m[7] * i + m[8]
         for j in (0.0, dw - 1.0) for i in (0.0, dh - 1.0)]
    if min(q) <= 0 < max(q) or max(q) == 0 or min(q) == 0:
        return None  # denominator changes sign (or hits 0) inside rect
    qq = [v * v for v in q]
    out = []
    for (ma, mb, mc) in ((m[0], m[1], m[2]), (m[3], m[4], m[5])):
        n = [ma * (m[7] * i + m[8]) - m[6] * (mb * i + mc)
             for i in (0.0, dh - 1.0)]
        cands = [a / b for a in (min(n), max(n)) for b in (min(qq), max(qq))]
        out += [min(cands), max(cands)]
    return out[0], out[1], out[2], out[3]


def _remap_linear_dev(x, x0, fx, y0, fy, border_type, border_value,
                      step_bounds=None):
    """Bilinear remap with DEVICE integer taps + f32 fractions.

    TPU gather strategy: XLA gather cost is per-index, so issue ONE
    gather per output pixel against a pre-stacked 2x2-patch operand of
    shape (H*W, 4*N*C) — the four bilinear taps and the whole batch ride
    in the row payload.  Border-resolved tap pairs are always adjacent
    or equal per axis (all modes except WRAP), so the patch at
    (min(ry), min(rx)) contains every resolved tap; a cheap decode picks
    each tap out of the four gathered values.

    step_bounds (host bounds on the per-column coordinate steps, from
    the warp matrix) is accepted for future blocked/kernel paths; an
    XLA-level K-pixel blocked gather was tried in r4 and measured 4.5x
    SLOWER (XLA materializes the blocked operand in HBM — 31.8 GB at 4K;
    see kernels/README.md "blocked-gather negative result")."""
    N, H, W, C = x.shape
    dh, dw = x0.shape
    bt = border_type & ~K.BORDER_ISOLATED
    if bt == K.BORDER_WRAP:
        return _remap_linear_dev_4tap(x, x0, fx, y0, fy, border_type,
                                      border_value)
    cval = _cval_vec(border_value, x.dtype, C)
    t00, t01, t10, t11 = _gather_patch_taps(x, x0, y0, border_type, cval)

    fxf = fx.reshape(-1)[:, None]
    fyf = fy.reshape(-1)[:, None]
    f32 = jnp.float32
    acc = (t00.astype(f32) * ((1 - fxf) * (1 - fyf))
           + t01.astype(f32) * (fxf * (1 - fyf))
           + t10.astype(f32) * ((1 - fxf) * fyf)
           + t11.astype(f32) * (fxf * fyf))

    out = saturate_cast(acc, x.dtype).reshape(dh, dw, N, C)
    out = out.transpose(2, 0, 1, 3)
    if bt == K.BORDER_CONSTANT:
        fully_out = ((x0 >= W) | (x0 + 1 < 0) | (y0 >= H) | (y0 + 1 < 0))
        out = jnp.where(fully_out[None, :, :, None],
                        cval.astype(x.dtype).reshape(1, 1, 1, C), out)
    return out


def _patch_operand(x):
    """(H*W, 4*N*C) pre-stacked 2x2-patch gather operand: all four
    bilinear taps and the whole batch ride in one gathered row (TPU
    gather cost is per-index).  Edge rows/cols are duplicated — the
    duplicate is only read where a resolved tap pair is equal."""
    N, H, W, C = x.shape
    xt = x.transpose(1, 2, 0, 3).reshape(H, W, N * C)
    xr = jnp.concatenate([xt[:, 1:], xt[:, -1:]], axis=1)
    patch = jnp.stack([xt, xr], axis=2)                  # (H, W, 2, NC)
    pdown = jnp.concatenate([patch[1:], patch[-1:]], axis=0)
    patch = jnp.concatenate([patch, pdown], axis=2)      # (H, W, 4, NC)
    return patch.reshape(H * W, 4 * N * C)


def _decode_patch_taps(x, rx0, rx1, ry0, ry1, xm0, xm1, ym0, ym1, cval):
    """Shared tap decode for the patch-operand gather: resolved per-axis
    tap pairs (device jnp or host numpy planes) -> ONE gather + selects.
    Returns t00..t11 of shape (dh*dw, N*C) in x.dtype."""
    N, H, W, C = x.shape
    rx0 = jnp.asarray(rx0)
    rx1 = jnp.asarray(rx1)
    ry0 = jnp.asarray(ry0)
    ry1 = jnp.asarray(ry1)
    bx = jnp.minimum(rx0, rx1)
    by = jnp.minimum(ry0, ry1)
    patch = _patch_operand(x)
    idx = (by * W + bx).reshape(-1).astype(jnp.int32)
    g = jnp.take(patch, idx, axis=0)
    g = g.reshape(-1, 2, 2, N * C)                       # (.., dy, dx, NC)

    def m(a):
        return jnp.asarray(a).reshape(-1)[:, None]

    selx0 = m(rx0 == bx)
    selx1 = m(rx1 == bx)
    sely0 = m(ry0 == by)
    sely1 = m(ry1 == by)
    r0x0 = jnp.where(selx0, g[:, 0, 0], g[:, 0, 1])
    r0x1 = jnp.where(selx1, g[:, 0, 0], g[:, 0, 1])
    r1x0 = jnp.where(selx0, g[:, 1, 0], g[:, 1, 1])
    r1x1 = jnp.where(selx1, g[:, 1, 0], g[:, 1, 1])
    t00 = jnp.where(sely0, r0x0, r1x0)
    t01 = jnp.where(sely0, r0x1, r1x1)
    t10 = jnp.where(sely1, r0x0, r1x0)
    t11 = jnp.where(sely1, r0x1, r1x1)

    cvalr = jnp.tile(cval, N).reshape(1, N * C).astype(x.dtype)
    t00 = jnp.where(m(xm0 | ym0), cvalr, t00)
    t01 = jnp.where(m(xm1 | ym0), cvalr, t01)
    t10 = jnp.where(m(xm0 | ym1), cvalr, t10)
    t11 = jnp.where(m(xm1 | ym1), cvalr, t11)
    return t00, t01, t10, t11


def _gather_patch_taps(x, x0, y0, border_type, cval):
    """Device-plane front end of _decode_patch_taps: resolve the four tap
    coordinates with the device borderInterpolate and decode.  Requires
    adjacent-or-equal resolved tap pairs (any border but WRAP)."""
    N, H, W, C = x.shape
    rx0, xm0 = _resolve_tap_dev(x0, W, border_type)
    rx1, xm1 = _resolve_tap_dev(x0 + 1, W, border_type)
    ry0, ym0 = _resolve_tap_dev(y0, H, border_type)
    ry1, ym1 = _resolve_tap_dev(y0 + 1, H, border_type)
    return _decode_patch_taps(x, rx0, rx1, ry0, ry1, xm0, xm1, ym0, ym1,
                              cval)

def _remap_linear_dev_4tap(x, x0, fx, y0, fy, border_type, border_value):
    """Fallback bilinear remap: four independent tap gathers (needed for
    BORDER_WRAP, where resolved tap pairs are not adjacent)."""
    N, H, W, C = x.shape
    dh, dw = x0.shape
    cval = _cval_vec(border_value, x.dtype, C)
    flat = x.reshape(N, H * W, C)

    fxf = fx.reshape(-1)[None, :, None]
    fyf = fy.reshape(-1)[None, :, None]
    wts = [(1 - fxf) * (1 - fyf), fxf * (1 - fyf),
           (1 - fxf) * fyf, fxf * fyf]

    acc = None
    for t, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        xi, xm = _resolve_tap_dev(x0 + dx, W, border_type)
        yi, ym = _resolve_tap_dev(y0 + dy, H, border_type)
        use_c = (xm | ym).reshape(-1)[None, :, None]
        idx = (yi * W + xi).reshape(-1)
        g = jnp.take(flat, idx, axis=1).astype(jnp.float32)
        g = jnp.where(use_c, cval.reshape(1, 1, C), g)
        term = g * wts[t]
        acc = term if acc is None else acc + term

    out = saturate_cast(acc, x.dtype).reshape(N, dh, dw, C)
    bt = border_type & ~K.BORDER_ISOLATED
    if bt == K.BORDER_CONSTANT:
        fully_out = ((x0 >= W) | (x0 + 1 < 0) | (y0 >= H) | (y0 + 1 < 0))
        out = jnp.where(fully_out[None, :, :, None],
                        cval.astype(x.dtype).reshape(1, 1, 1, C), out)
    return out


# --------------------------------------------------------------------------
# public warps
# --------------------------------------------------------------------------

def _sat_i32(a):
    return np.clip(np.rint(a), -2147483648, 2147483647).astype(np.int64)


def _sat_i16(a):
    return np.clip(a, -32768, 32767).astype(np.int64)


def warpAffine(src, M, dsize, flags: int = K.INTER_LINEAR,
               borderMode: int = K.BORDER_CONSTANT, borderValue=0):
    """`cv::warpAffine` (imgwarp.cpp:2788). M is a host 2x3 array."""
    x, meta = to_batched(src)
    N, H, W, C = x.shape
    dw, dh = int(dsize[0]), int(dsize[1])
    interp = flags & K.INTER_MAX
    M = np.asarray(M, np.float64).reshape(2, 3)
    if not (flags & K.WARP_INVERSE_MAP):
        M = invertAffineTransform(M)
    m = M.ravel()

    xs = np.arange(dw, dtype=np.float64)
    ys = np.arange(dh, dtype=np.float64)

    if interp == K.INTER_NEAREST:
        # exact integer scheme (imgwarp.cpp:2686): per-column adelta and
        # per-row X0 vectors assembled to the full plane ON DEVICE —
        # int32 wraparound add + arithmetic >> match the C semantics
        adelta = jnp.asarray(_sat_i32(m[0] * xs * AB_SCALE)
                             .astype(np.int32))
        bdelta = jnp.asarray(_sat_i32(m[3] * xs * AB_SCALE)
                             .astype(np.int32))
        rd = AB_SCALE // 2
        X0 = jnp.asarray((_sat_i32((m[1] * ys + m[2]) * AB_SCALE) + rd)
                         .astype(np.int32))
        Y0 = jnp.asarray((_sat_i32((m[4] * ys + m[5]) * AB_SCALE) + rd)
                         .astype(np.int32))
        X = (X0[:, None] + adelta[None, :]) >> AB_BITS
        Y = (Y0[:, None] + bdelta[None, :]) >> AB_BITS
        sx = jnp.clip(X, -32768, 32767)
        sy = jnp.clip(Y, -32768, 32767)
        y = _remap_nn_dev(x, sx, sy, borderMode, borderValue)
    else:
        # rank-1 map decomposition, reassembled in double-float on device
        cxh, cxl = _split_f64_host(m[0] * xs)
        cyh, cyl = _split_f64_host(m[3] * xs)
        rxh, rxl = _split_f64_host(m[1] * ys + m[2])
        ryh, ryl = _split_f64_host(m[4] * ys + m[5])
        sX, eX = _two_sum(rxh[:, None], cxh[None, :])
        loX = eX + (rxl[:, None] + cxl[None, :])
        sY, eY = _two_sum(ryh[:, None], cyh[None, :])
        loY = eY + (ryl[:, None] + cyl[None, :])
        if interp == K.INTER_LANCZOS4:
            # lanczos kept the Q5 table scheme in the reference line
            x0, fqx = _floor_q5_dd(sX, loX)
            y0, fqy = _floor_q5_dd(sY, loY)
            y = _remap_ktap_dev(x, x0, fqx, y0, fqy, 8, borderMode,
                                borderValue)
        elif interp == K.INTER_CUBIC:
            x0, fx = _floor_frac_dd(sX, loX)
            y0, fy = _floor_frac_dd(sY, loY)
            y = _remap_ktap_float_dev(x, x0, fx, y0, fy, 4, borderMode,
                                      borderValue)
        else:
            x0, fx = _floor_frac_dd(sX, loX)
            y0, fy = _floor_frac_dd(sY, loY)
            y = _remap_linear_dev(x, x0, fx, y0, fy, borderMode,
                                  borderValue,
                                  step_bounds=_warp_step_bounds(M, dw, dh))
    return from_batched(y, meta)


def warpPerspective(src, M, dsize, flags: int = K.INTER_LINEAR,
                    borderMode: int = K.BORDER_CONSTANT, borderValue=0):
    """`cv::warpPerspective` (imgwarp.cpp:3370). M is a host 3x3 array."""
    x, meta = to_batched(src)
    N, H, W, C = x.shape
    dw, dh = int(dsize[0]), int(dsize[1])
    interp = flags & K.INTER_MAX
    M = np.asarray(M, np.float64).reshape(3, 3)
    if not (flags & K.WARP_INVERSE_MAP):
        M = np.linalg.inv(M)
    m = M.ravel()

    xs = np.arange(dw, dtype=np.float64)
    ys = np.arange(dh, dtype=np.float64)

    # rank-1 double-float assembly of numerators/denominator on device
    def _plane(col, row):
        ch, cl = _split_f64_host(col)
        rh, rl = _split_f64_host(row)
        s, e = _two_sum(rh[:, None], ch[None, :])
        return s, e + (rl[:, None] + cl[None, :])

    Xn = _plane(m[0] * xs, m[1] * ys + m[2])
    Yn = _plane(m[3] * xs, m[4] * ys + m[5])
    Wd = _plane(m[6] * xs, m[7] * ys + m[8])
    w_zero = (Wd[0] == 0) & (Wd[1] == 0)
    Wsafe = (jnp.where(w_zero, 1.0, Wd[0]), jnp.where(w_zero, 0.0, Wd[1]))
    mx = _dd_div(Xn, Wsafe)
    my = _dd_div(Yn, Wsafe)
    mx = (jnp.where(w_zero, 0.0, mx[0]), jnp.where(w_zero, 0.0, mx[1]))
    my = (jnp.where(w_zero, 0.0, my[0]), jnp.where(w_zero, 0.0, my[1]))

    if interp == K.INTER_NEAREST:
        # cv2 rounds double coords with saturate_cast<int> (rint);
        # double-float round: round(hi) then correct by the residual
        def _dd_round(hi, lo):
            hi = jnp.clip(hi, -1e9, 1e9)
            r0 = jnp.round(hi)
            f = (hi - r0) + lo            # in (-0.5-eps, 0.5+eps)
            return (r0 + jnp.round(f)).astype(jnp.int32)

        sx = jnp.clip(_dd_round(mx[0], mx[1]), -32768, 32767)
        sy = jnp.clip(_dd_round(my[0], my[1]), -32768, 32767)
        y = _remap_nn_dev(x, sx, sy, borderMode, borderValue)
    elif interp == K.INTER_LANCZOS4:
        x0, fqx = _floor_q5_dd(mx[0], mx[1])
        y0, fqy = _floor_q5_dd(my[0], my[1])
        y = _remap_ktap_dev(x, x0, fqx, y0, fqy, 8, borderMode,
                            borderValue)
    elif interp == K.INTER_CUBIC:
        x0, fx = _floor_frac_dd(mx[0], mx[1])
        y0, fy = _floor_frac_dd(my[0], my[1])
        y = _remap_ktap_float_dev(x, x0, fx, y0, fy, 4, borderMode,
                                  borderValue)
    else:
        x0, fx = _floor_frac_dd(mx[0], mx[1])
        y0, fy = _floor_frac_dd(my[0], my[1])
        y = _remap_linear_dev(x, x0, fx, y0, fy, borderMode, borderValue,
                              step_bounds=_warp_step_bounds(M, dw, dh))
    return from_batched(y, meta)


def remap(src, map1, map2=None, interpolation: int = K.INTER_LINEAR,
          borderMode: int = K.BORDER_CONSTANT, borderValue=0):
    """`cv::remap` with host numpy maps (float32 x/y maps or fixed CV_16SC2
    (+CV_16UC1) pairs, imgwarp.cpp:1713)."""
    x, meta = to_batched(src)
    N, H, W, C = x.shape
    m1 = np.asarray(map1)
    interp = interpolation

    if m1.dtype == np.int16:  # fixed-point maps CV_16SC2
        sx = m1[..., 0].astype(np.int64)
        sy = m1[..., 1].astype(np.int64)
        if interp == K.INTER_NEAREST:
            y = _remap_fixed(x, sx, sy, None, interp, borderMode, borderValue)
            return from_batched(y, meta)
        fxy = (np.zeros_like(sx) if map2 is None
               else np.asarray(map2).astype(np.int64) & (INTER_TAB_SIZE2 - 1))
        y = _remap_fixed(x, sx, sy, fxy, interp, borderMode, borderValue)
        return from_batched(y, meta)

    if map2 is not None and np.asarray(map2).ndim == m1.ndim and m1.ndim == 2:
        mapx = m1.astype(np.float64)
        mapy = np.asarray(map2).astype(np.float64)
    else:
        mapx = m1[..., 0].astype(np.float64)
        mapy = m1[..., 1].astype(np.float64)

    if interp == K.INTER_NEAREST:
        sx = _sat_i32(mapx.astype(np.float32))
        sy = _sat_i32(mapy.astype(np.float32))
        y = _remap_fixed(x, sx, sy, None, interp, borderMode, borderValue)
        return from_batched(y, meta)

    y = _remap_linear_float(x, mapx, mapy, borderMode, borderValue)
    return from_batched(y, meta)


WARP_POLAR_LINEAR = 0
WARP_POLAR_LOG = 256


def warpPolar(src, dsize, center, maxRadius, flags):
    """cv2.warpPolar (imgproc/src/imgwarp.cpp warpPolar): remap into
    polar (or semilog) space; WARP_INVERSE_MAP maps back."""
    import numpy as _np
    img = _np.asarray(src)
    H, W = img.shape[:2]
    dw, dh = dsize
    if dw <= 0 and dh <= 0:
        dw = int(round(maxRadius))
        dh = int(round(maxRadius * _np.pi))
    elif dh <= 0:
        dh = int(round(dw * _np.pi))
    dsize = (dw, dh)
    semilog = bool(flags & WARP_POLAR_LOG)
    inverse = bool(flags & K.WARP_INVERSE_MAP)
    interp = flags & K.INTER_MAX

    if not inverse:
        # reference precomputes rho scales as float32 (imgwarp.cpp:3757+)
        if semilog:
            kmag = _np.log(maxRadius) / dw
            buf_rhos = (_np.exp(_np.arange(dw) * kmag) - 1.0).astype(_np.float32)
        else:
            buf_rhos = (_np.arange(dw) * (maxRadius / dw)).astype(_np.float32)
        kangle = 2 * _np.pi / dh
        phis = _np.arange(dh, dtype=_np.float64) * kangle
        cp, sp = _np.cos(phis), _np.sin(phis)
        mag = buf_rhos.astype(_np.float64)
        mapx = (mag[None, :] * cp[:, None] + center[0]).astype(_np.float32)
        mapy = (mag[None, :] * sp[:, None] + center[1]).astype(_np.float32)
        return remap(src, mapx, mapy, interp,
                     borderMode=K.BORDER_CONSTANT)
    # inverse: the input is the POLAR image; dsize is the output size.
    # wrap one angle row top/bottom like the reference (ANGLE_BORDER)
    pw = img.shape[1]
    ph = img.shape[0]
    wrapped = _np.concatenate([img[-1:], img, img[:1]], axis=0)
    out_h, out_w = dsize[1], dsize[0]
    f32 = _np.float32
    xs2, ys2 = _np.meshgrid(_np.arange(out_w, dtype=f32),
                            _np.arange(out_h, dtype=f32))
    dx = (xs2 - f32(center[0])).astype(f32)
    dy = (ys2 - f32(center[1])).astype(f32)
    # cartToPolar semantics: float32 magnitude + fastAtan2 polynomial
    # (core/src/mathfuncs_core.simd.hpp:52 atan_f32), radians
    mag = _np.sqrt((dx * dx + dy * dy).astype(f32)).astype(f32)
    angle = _fast_atan2_deg(dy, dx) * f32(_np.pi / 180)
    kangle = 2 * _np.pi / ph
    if semilog:
        kmag = _np.log(maxRadius) / pw
        bufp = _np.log((mag + f32(1.0)).astype(f32)).astype(f32)
    else:
        kmag = maxRadius / pw
        bufp = mag
    rho = (bufp.astype(_np.float64) / kmag).astype(f32)
    phi = (angle.astype(_np.float64) / kangle + 1.0).astype(f32)
    return remap(wrapped, rho, phi, interp, borderMode=K.BORDER_CONSTANT)


def _fast_atan2_deg(y, x):
    """Vectorized twin of cv::fastAtan2 (mathfuncs_core.simd.hpp:52):
    7th-order polynomial atan in float32, returns degrees in [0, 360)."""
    import numpy as _np
    f32 = _np.float32
    p1 = f32(0.9997878412794807 * (180 / _np.pi))
    p3 = f32(-0.3258083974640975 * (180 / _np.pi))
    p5 = f32(0.1555786518463281 * (180 / _np.pi))
    p7 = f32(-0.04432655554792128 * (180 / _np.pi))
    eps = f32(2.220446049250313e-16)  # (float)DBL_EPSILON
    ax, ay = _np.abs(x).astype(f32), _np.abs(y).astype(f32)
    swap = ax < ay
    c = _np.where(swap, ax / (ay + eps), ay / (ax + eps)).astype(f32)
    c2 = (c * c).astype(f32)
    a = ((((p7 * c2 + p5) * c2 + p3) * c2 + p1) * c).astype(f32)
    a = _np.where(swap, f32(90) - a, a).astype(f32)
    a = _np.where(x < 0, f32(180) - a, a).astype(f32)
    a = _np.where(y < 0, f32(360) - a, a).astype(f32)
    return a


def linearPolar(src, center, maxRadius, flags):
    """`cv::linearPolar` (imgwarp.cpp:3848) — warpPolar without LOG."""
    img = np.asarray(src)
    dsize = (img.shape[1], img.shape[0])
    return warpPolar(src, dsize, center, maxRadius,
                     flags & ~WARP_POLAR_LOG)


def logPolar(src, center, M, flags):
    """`cv::logPolar` (imgwarp.cpp:3854): maxRadius = exp(w / M)."""
    img = np.asarray(src)
    dsize = (img.shape[1], img.shape[0])
    maxR = np.exp(img.shape[1] / M) if M > 0 else 1.0
    return warpPolar(src, dsize, center, maxR, flags | WARP_POLAR_LOG)
