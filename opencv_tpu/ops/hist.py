"""Histograms: calcHist / equalizeHist / compareHist / calcBackProject /
CLAHE (imgproc/src/histogram.cpp, clahe.cpp).

TPU-native: small fixed-width histograms (256 bins) use a broadcast
compare-reduce (`_hist_fixed`) — TPU has no fast scatter, and bincount's
scatter-add measured 300ms vs 21ms for the compare formulation on a
16x1080p batch.  Larger/variable binnings use (`jnp.bincount` /
segment sums) which XLA lowers to efficient sorted-segment reductions;
equalizeHist is a LUT built from a cumsum (histogram.cpp:3436 exact
semantics); CLAHE becomes a tiled histogram + clip + per-tile LUT and a
bilinear LUT interpolation gather — all batched.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as K
from ..core.arrays import to_batched, from_batched

__all__ = ["calcHist", "equalizeHist", "compareHist", "calcBackProject",
           "createCLAHE", "CLAHE"]


def _bin_index(x, hist_size: int, lo: float, hi: float):
    if x.dtype in (jnp.uint8, jnp.uint16):
        # integer inputs: host double-precision LUT with the reference's
        # exact form idx = floor(j*a + b) (histogram.cpp calcHist_8u)
        nvals = 256 if x.dtype == jnp.uint8 else 65536
        j = np.arange(nvals, dtype=np.float64)
        a = hist_size / (hi - lo)
        b = -a * lo
        tab = np.floor(j * a + b).astype(np.int64)
        ok = (j >= lo) & (j < hi) & (tab >= 0) & (tab < hist_size)
        idx = jnp.asarray(np.where(ok, tab, 0).astype(np.int32))[
            x.astype(jnp.int32)]
        valid = jnp.asarray(ok)[x.astype(jnp.int32)]
        return idx, valid
    xf = x.astype(jnp.float32)
    scale = hist_size / (hi - lo)
    idx = jnp.floor((xf - lo) * scale).astype(jnp.int32)
    valid = (xf >= lo) & (xf < hi)
    return idx, valid


def _hist_fixed(idx, n):
    """Exact histogram of int values in [0, n) — no scatter.

    n == 256 uses the MXU: split each value into hi/lo nibbles, build two
    (M, 16) one-hots and contract them — hist[hi*16+lo] = A16ᵀB16.
    Products are exact 0/1 in bf16 and the f32 accumulation is exact for
    chunk counts < 2^24.  Other n use broadcast compare-reduce (256
    VPU ops/px; bincount's scatter-add measured 14x slower than that)."""
    flat = idx.reshape(-1)
    if n == 256:
        m = flat.shape[0]
        chunk = 1 << 23
        iota16 = jnp.arange(16, dtype=jnp.int32)

        def hist_chunk(row):
            A = (((row >> 4) & 15)[:, None] == iota16[None, :])                 .astype(jnp.bfloat16)
            Bm = ((row & 15)[:, None] == iota16[None, :])                 .astype(jnp.bfloat16)
            h = jax.lax.dot_general(
                A, Bm, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return h.reshape(256)

        if m <= chunk:
            return hist_chunk(flat).astype(jnp.int32)
        pad = (-m) % chunk
        fl = jnp.pad(flat, (0, pad)) if pad else flat

        def body(carry, row):
            # per-chunk counts are exact in f32 (< 2^23); accumulate in
            # int32 so multi-chunk bins past 2^24 stay exact
            return carry + hist_chunk(row).astype(jnp.int32), None
        h, _ = jax.lax.scan(body, jnp.zeros((256,), jnp.int32),
                            fl.reshape(-1, chunk))
        if pad:  # the zero padding landed in bin 0; remove it (static)
            h = h.at[0].add(-pad)
        return h
    bins = jnp.arange(n, dtype=flat.dtype)
    # chunk the pixel axis so the broadcast buffer stays cache-sized
    m = flat.shape[0]
    chunk = 1 << 20
    if m <= chunk:
        return jnp.sum(flat[:, None] == bins[None, :], axis=0,
                       dtype=jnp.int32)
    pad = (-m) % chunk
    fl = jnp.pad(flat, (0, pad), constant_values=n + 1) if pad else flat
    parts = fl.reshape(-1, chunk)

    def body(carry, row):
        return carry + jnp.sum(row[:, None] == bins[None, :], axis=0,
                               dtype=jnp.int32), None
    h, _ = jax.lax.scan(body, jnp.zeros((n,), jnp.int32), parts)
    return h


def _lut_apply_fixed(idx, lut):
    """Apply a small LUT per element without a gather (TPU gathers cost
    ~14ns per index; lut[img] measured ~20x slower).

    256-entry LUTs ride the MXU via the hi/lo-nibble factorization:
    out = Σ_h A[:,h]·(B @ Lᵀ)[:,h] with A/B the nibble one-hots — the
    one-hot row-select keeps every value exact in f32.  Other sizes use
    chunked broadcast-compare select-accumulate."""
    n = lut.shape[0]
    flat = idx.reshape(-1).astype(jnp.int32)
    m = flat.shape[0]
    # bf16 is exact only for u8-valued tables (integers < 2^8)
    if n == 256 and lut.dtype == jnp.uint8:
        iota16 = jnp.arange(16, dtype=jnp.int32)
        L = lut.astype(jnp.float32).reshape(16, 16)

        def apply_chunk(row):
            A = (((row >> 4) & 15)[:, None] == iota16[None, :])                 .astype(jnp.bfloat16)
            Bm = ((row & 15)[:, None] == iota16[None, :])                 .astype(jnp.bfloat16)
            Cm = jax.lax.dot_general(
                Bm, L.astype(jnp.bfloat16).T, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jnp.sum(A.astype(jnp.float32) * Cm, axis=1)

        chunk = 1 << 22
        if m <= chunk:
            out = apply_chunk(flat)
        else:
            pad = (-m) % chunk
            fl = jnp.pad(flat, (0, pad)) if pad else flat

            def body(_, row):
                return None, apply_chunk(row)
            _, out = jax.lax.scan(body, None, fl.reshape(-1, chunk))
            out = out.reshape(-1)[:m]
        return out.astype(lut.dtype).reshape(idx.shape)

    bins = jnp.arange(n, dtype=jnp.int32)
    chunk = 1 << 20

    def apply_chunk(row):
        eq = row[:, None] == bins[None, :]
        return jnp.sum(jnp.where(eq, lut[None, :], 0), axis=1)

    if m <= chunk:
        return apply_chunk(flat).reshape(idx.shape)
    pad = (-m) % chunk
    fl = jnp.pad(flat, (0, pad)) if pad else flat

    def body(_, row):
        return None, apply_chunk(row)
    _, out = jax.lax.scan(body, None, fl.reshape(-1, chunk))
    return out.reshape(-1)[:m].reshape(idx.shape)


def calcHist(images, channels, mask, histSize, ranges, accumulate=False):
    """cv2-compatible calcHist for 1-D and 2-D histograms (uniform bins).

    Returns float32 array of shape (histSize[0], 1) or (h0, h1).
    """
    imgs = [to_batched(im)[0] for im in images]

    def chan(ci):
        # channels index across the concatenated image list, cv2-style
        for im in imgs:
            if ci < im.shape[-1]:
                return im[..., ci]
            ci -= im.shape[-1]
        raise ValueError("channel index out of range")

    if mask is not None:
        m, _ = to_batched(mask)
        mvalid = (m[..., 0] != 0)
    else:
        mvalid = None

    if len(channels) == 1:
        n = int(histSize[0])
        lo, hi = float(ranges[0]), float(ranges[1])
        idx, valid = _bin_index(chan(channels[0]), n, lo, hi)
        if mvalid is not None:
            valid = valid & mvalid
        idx = jnp.where(valid, idx, n)  # overflow bin, dropped
        if n <= 4096:
            h = _hist_fixed(jnp.clip(idx, 0, n), n + 1)[:n]
        else:
            h = jnp.bincount(idx.reshape(-1), length=n + 1)[:n]
        return h.astype(jnp.float32)  # (n,) — cv2 5.x returns 1-D

    if len(channels) == 2:
        n0, n1 = int(histSize[0]), int(histSize[1])
        lo0, hi0, lo1, hi1 = [float(r) for r in ranges[:4]]
        i0, v0 = _bin_index(chan(channels[0]), n0, lo0, hi0)
        i1, v1 = _bin_index(chan(channels[1]), n1, lo1, hi1)
        valid = v0 & v1
        if mvalid is not None:
            valid = valid & mvalid
        flat = jnp.where(valid, i0 * n1 + i1, n0 * n1)
        h = jnp.bincount(flat.reshape(-1), length=n0 * n1 + 1)[:n0 * n1]
        return h.astype(jnp.float32).reshape(n0, n1)

    # general N-dimensional histogram (histogram.cpp:949 calcHist_)
    sizes = [int(histSize[k]) for k in range(len(channels))]
    flat_idx = None
    valid = None
    stride = int(np.prod(sizes))
    for k, ch in enumerate(channels):
        n = sizes[k]
        lo, hi = float(ranges[2 * k]), float(ranges[2 * k + 1])
        ik, vk = _bin_index(chan(ch), n, lo, hi)
        stride //= n
        term = ik * stride
        flat_idx = term if flat_idx is None else flat_idx + term
        valid = vk if valid is None else (valid & vk)
    if mvalid is not None:
        valid = valid & mvalid
    total = int(np.prod(sizes))
    flat = jnp.where(valid, flat_idx, total)
    h = jnp.bincount(flat.reshape(-1), length=total + 1)[:total]
    return h.astype(jnp.float32).reshape(sizes)


def _equalize_lut(hist, total):
    """LUT per histogram.cpp:3436: scale = 255/(total - hist[i0]),
    lut[i0] = 0, lut[i] = saturate(rint(cumsum·scale))."""
    nz = hist > 0
    i0 = jnp.argmax(nz)
    h0 = hist[i0]
    scale = 255.0 / jnp.maximum((total - h0).astype(jnp.float32), 1.0)
    idx = jnp.arange(256)
    masked = jnp.where(idx > i0, hist, 0)
    csum = jnp.cumsum(masked)
    lut = jnp.clip(jnp.rint(csum.astype(jnp.float32) * scale), 0, 255)
    lut = jnp.where(idx <= i0, jnp.where(idx == i0, 0.0, 0.0), lut)
    # degenerate single-bin image → constant i0
    lut = jnp.where(h0 == total, i0.astype(jnp.float32), lut)
    return lut.astype(jnp.uint8)


def equalizeHist(src):
    """`cv::equalizeHist` (histogram.cpp:3436), per image in the batch."""
    x, meta = to_batched(src)
    N, H, W, C = x.shape
    assert C == 1, "equalizeHist requires single-channel input"
    total = H * W

    def one(img):
        hist = _hist_fixed(img.astype(jnp.int32), 256)
        lut = _equalize_lut(hist, total)
        return _lut_apply_fixed(img, lut).astype(x.dtype)

    y = jax.vmap(one)(x) if N > 1 else one(x[0])[None]
    return from_batched(y, meta)


def compareHist(h1, h2, method: int):
    """`cv::compareHist` (histogram.cpp)."""
    a = jnp.asarray(h1, jnp.float32).reshape(-1)
    b = jnp.asarray(h2, jnp.float32).reshape(-1)
    if method == K.HISTCMP_CORREL:
        am = a - jnp.mean(a)
        bm = b - jnp.mean(b)
        num = jnp.sum(am * bm)
        den = jnp.sqrt(jnp.sum(am * am) * jnp.sum(bm * bm))
        return float(jnp.where(jnp.abs(den) > np.finfo(np.float64).eps,
                               num / den, 1.0))
    if method == K.HISTCMP_CHISQR:
        d = a - b
        return float(jnp.sum(jnp.where(jnp.abs(a) > 2.2e-16, d * d / a, 0.0)))
    if method == K.HISTCMP_CHISQR_ALT:
        d = a - b
        s = a + b
        return float(2 * jnp.sum(jnp.where(jnp.abs(s) > 2.2e-16, d * d / s, 0.0)))
    if method == K.HISTCMP_INTERSECT:
        return float(jnp.sum(jnp.minimum(a, b)))
    if method == K.HISTCMP_BHATTACHARYYA:
        s1 = jnp.sum(a)
        s2 = jnp.sum(b)
        num = jnp.sum(jnp.sqrt(a * b))
        den = jnp.sqrt(s1 * s2)
        v = jnp.sqrt(jnp.maximum(1.0 - num / jnp.maximum(den, 1e-30), 0.0))
        return float(v)
    if method == K.HISTCMP_KL_DIV:
        return float(jnp.sum(jnp.where(
            a > 2.2e-16,
            a * jnp.log(a / jnp.where(b > 2.2e-16, b, 2.2e-16)),
            0.0)))
    raise ValueError(f"unknown compareHist method {method}")


def calcBackProject(images, channels, hist, ranges, scale: float = 1.0):
    """`cv::calcBackProject` for 1-D/2-D histograms."""
    x, meta = to_batched(images[0])
    h = jnp.asarray(hist, jnp.float32)
    if h.ndim == 2 and h.shape[1] == 1:
        h = h[:, 0]
    if h.ndim == 1 and len(channels) == 1:
        n = h.shape[0]
        lo, hi = float(ranges[0]), float(ranges[1])
        idx, valid = _bin_index(x[..., channels[0]], n, lo, hi)
        vals = h[jnp.clip(idx, 0, n - 1)] * scale
        out = jnp.where(valid, vals, 0.0)
    elif len(channels) == 2:
        n0, n1 = h.shape
        lo0, hi0, lo1, hi1 = [float(r) for r in ranges[:4]]
        i0, v0 = _bin_index(x[..., channels[0]], n0, lo0, hi0)
        i1, v1 = _bin_index(x[..., channels[1]], n1, lo1, hi1)
        vals = h[jnp.clip(i0, 0, n0 - 1), jnp.clip(i1, 0, n1 - 1)] * scale
        out = jnp.where(v0 & v1, vals, 0.0)
    else:
        raise NotImplementedError
    if x.dtype == jnp.uint8:
        out = jnp.clip(jnp.rint(out), 0, 255).astype(jnp.uint8)
    return from_batched(out[..., None], meta)


class CLAHE:
    """Contrast-limited adaptive histogram equalization (clahe.cpp).

    Device pipeline: tile histograms → clip + redistribute → per-tile
    CDF LUTs → bilinear interpolation between the 4 surrounding tile LUTs.
    """

    def __init__(self, clipLimit=40.0, tileGridSize=(8, 8)):
        self.clip_limit = clipLimit
        self.tiles = tuple(tileGridSize)

    def setClipLimit(self, v):
        self.clip_limit = v

    def setTilesGridSize(self, t):
        self.tiles = tuple(t)

    def getClipLimit(self):
        return self.clip_limit

    def getTilesGridSize(self):
        return self.tiles

    def apply(self, src):
        x, meta = to_batched(src)
        N, H, W, C = x.shape
        assert C == 1 and x.dtype == jnp.uint8
        tx, ty = self.tiles
        # reference pads the image to a multiple of the grid with
        # BORDER_REFLECT_101 (clahe.cpp CLAHE_Impl::apply).  QUIRK,
        # reproduced exactly: the pad amounts are `tiles - dim % tiles`
        # WITHOUT a modulo wrap, so when only one dimension is
        # non-divisible the OTHER (divisible) one still gets a full
        # `tiles`-pixel pad — e.g. 64x64 on a (2,5) grid pads to 66x65
        # with tile width 33, not 32 (clahe.cpp:374-383).
        if H % ty == 0 and W % tx == 0:
            ph = pw = 0
        else:
            ph = ty - H % ty
            pw = tx - W % tx
        from ..core.borders import pad_nhwc
        xp = pad_nhwc(x, 0, ph, 0, pw, K.BORDER_REFLECT_101)
        Hp, Wp = H + ph, W + pw
        th, tw = Hp // ty, Wp // tx
        tile_area = th * tw

        if self.clip_limit > 0:
            clip = max(int(self.clip_limit * tile_area / 256), 1)
        else:
            clip = 0

        tiles = xp.reshape(N, ty, th, tx, tw, 1).transpose(0, 1, 3, 2, 4, 5)
        tiles = tiles.reshape(N, ty * tx, th * tw)
        oneh = jax.nn.one_hot(tiles.astype(jnp.int32), 256, dtype=jnp.float32)
        hist = oneh.sum(axis=2)  # (N, tiles, 256)

        if clip > 0:
            # exact integer redistribution (clahe.cpp calcLut):
            # hist = min(hist, clip) + total_clipped/256, then the residual
            # goes to bins 0, step, 2*step, ... with step = 256/residual
            clipped = jnp.minimum(hist, clip)
            total_clipped = (hist - clipped).sum(axis=2, keepdims=True)
            redist = jnp.floor(total_clipped / 256.0)
            residual = total_clipped - redist * 256.0
            step = jnp.maximum(jnp.floor(256.0 / jnp.maximum(residual, 1.0)),
                               1.0)
            idx = jnp.arange(256, dtype=jnp.float32)[None, None, :]
            gets_residual = (jnp.floor(idx / step) * step == idx) \
                & (idx < residual * step)
            hist = clipped + redist + jnp.where(
                (residual > 0) & gets_residual, 1.0, 0.0)

        lut_scale = 255.0 / tile_area
        cdf = jnp.cumsum(hist, axis=2)
        luts = jnp.clip(jnp.rint(cdf * lut_scale), 0, 255)  # (N, T, 256)

        # bilinear interpolation of tile LUTs per pixel
        # weights exactly as the reference (clahe.cpp interpolation
        # body): tile coordinate = index/tileSize - 0.5, fractional part
        # kept unclamped (indices clamp; at edges both tiles coincide so
        # the weight cancels), float32 arithmetic
        ys = jnp.arange(Hp, dtype=jnp.float32)
        xs = jnp.arange(Wp, dtype=jnp.float32)
        tyf = ys * jnp.float32(1.0 / th) - 0.5
        txf = xs * jnp.float32(1.0 / tw) - 0.5
        ty0 = jnp.clip(jnp.floor(tyf).astype(jnp.int32), 0, ty - 1)
        tx0 = jnp.clip(jnp.floor(txf).astype(jnp.int32), 0, tx - 1)
        ty1 = jnp.clip(jnp.floor(tyf).astype(jnp.int32) + 1, 0, ty - 1)
        tx1 = jnp.clip(jnp.floor(txf).astype(jnp.int32) + 1, 0, tx - 1)
        fy = tyf - jnp.floor(tyf)
        fx = txf - jnp.floor(txf)

        pix = xp[..., 0].astype(jnp.int32)  # (N, Hp, Wp)

        # ONE payload gather for all four neighbor-tile LUT values (TPU
        # gather cost is per-index): operand Q[n, tid, v] = the (2x2
        # tile-neighborhood) LUT values, rows of 4 floats
        T = ty * tx
        lutg = luts.reshape(N, ty, tx, 256)
        lut_r = jnp.concatenate([lutg[:, :, 1:], lutg[:, :, -1:]], axis=2)
        lut_d = jnp.concatenate([lutg[:, 1:], lutg[:, -1:]], axis=1)
        lut_dr = jnp.concatenate([lut_d[:, :, 1:], lut_d[:, :, -1:]],
                                 axis=2)
        Q = jnp.stack([lutg, lut_r, lut_d, lut_dr], axis=-1)             .reshape(N * T * 256, 4)
        tid00 = (ty0[:, None] * tx + tx0[None, :])[None]    # (1, Hp, Wp)
        nidx = jnp.arange(N)[:, None, None]
        flat_idx = ((nidx * T + tid00) * 256 + pix).reshape(-1)
        g = jnp.take(Q, flat_idx, axis=0).reshape(N, Hp, Wp, 4)
        # decode: tx1==tx0 at the right edge (clamped) -> the "right"
        # payload column duplicates the base, matching the clamp
        v00 = g[..., 0]
        v01 = jnp.where((tx1 > tx0)[None, None, :], g[..., 1], g[..., 0])
        v10 = jnp.where((ty1 > ty0)[None, :, None], g[..., 2], g[..., 0])
        sel_d = ((ty1 > ty0)[:, None] & (tx1 > tx0)[None, :])[None]
        v11 = jnp.where(sel_d, g[..., 3],
                        jnp.where((tx1 > tx0)[None, None, :], g[..., 1],
                                  jnp.where((ty1 > ty0)[None, :, None],
                                            g[..., 2], g[..., 0])))
        fyb = fy[None, :, None].astype(jnp.float32)
        fxb = fx[None, None, :].astype(jnp.float32)
        fy1 = (jnp.float32(1.0) - fyb)
        fx1 = (jnp.float32(1.0) - fxb)
        # the reference's exact nesting:
        # (p1[ind1]*xa1 + p1[ind2]*xa)*ya1 + (p2[ind1]*xa1+p2[ind2]*xa)*ya
        out = ((v00.astype(jnp.float32) * fx1
                + v01.astype(jnp.float32) * fxb) * fy1
               + (v10.astype(jnp.float32) * fx1
                  + v11.astype(jnp.float32) * fxb) * fyb)
        out = jnp.clip(jnp.rint(out), 0, 255).astype(jnp.uint8)
        out = out[:, :H, :W, None]
        return from_batched(out, meta)


def createCLAHE(clipLimit=40.0, tileGridSize=(8, 8)):
    return CLAHE(clipLimit, tileGridSize)
