"""Segmentation: floodFill / watershed / grabCut-lite / pyrMeanShiftFiltering
(imgproc/src/floodfill.cpp, segmentation.cpp, grabcut.cpp).

floodFill and watershed are the reference's host-tier propagation
algorithms (data-dependent frontiers); the dense upstream work (gradients
for watershed) runs on device.
"""

from __future__ import annotations

from collections import deque

import numpy as np

from .. import constants as K

__all__ = ["floodFill", "watershed", "pyrMeanShiftFiltering",
           "FLOODFILL_FIXED_RANGE", "FLOODFILL_MASK_ONLY"]

FLOODFILL_FIXED_RANGE = 1 << 16
FLOODFILL_MASK_ONLY = 1 << 17


def floodFill(image, mask, seedPoint, newVal, loDiff=None, upDiff=None,
              flags: int = 4):
    """`cv::floodFill` — returns (retval, image, mask, rect)."""
    img = np.array(image)  # work on a copy; cv2 mutates, we return
    multi = img.ndim == 3
    H, W = img.shape[:2]
    if mask is None:
        mask = np.zeros((H + 2, W + 2), np.uint8)
    else:
        mask = np.array(mask)
    conn = flags & 255 or 4
    fixed = bool(flags & FLOODFILL_FIXED_RANGE)
    mask_only = bool(flags & FLOODFILL_MASK_ONLY)
    fill_mask_val = (flags >> 8) & 255 or 1

    lo = np.zeros(img.shape[2] if multi else 1, np.float64) if loDiff is None \
        else np.asarray(loDiff, np.float64).reshape(-1)
    up = np.zeros_like(lo) if upDiff is None \
        else np.asarray(upDiff, np.float64).reshape(-1)

    sx, sy = int(seedPoint[0]), int(seedPoint[1])
    seed_val = img[sy, sx].astype(np.float64)
    nv = np.asarray(newVal, img.dtype).reshape(-1)[:img.shape[2]] if multi \
        else np.asarray(newVal).reshape(-1)[0]

    if img.dtype == np.uint8:
        from ..native import flood_fill as _native_ff
        res = _native_ff(img,
                         mask, (sx, sy), np.atleast_1d(nv), lo, up, conn,
                         fixed, mask_only, fill_mask_val)
        if res is not None:
            count, rect = res
            return count, img, mask, rect

    offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if conn == 8:
        offs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]

    filled = np.zeros((H, W), bool)
    q = deque([(sy, sx)])
    filled[sy, sx] = True
    count = 0
    minx, miny, maxx, maxy = sx, sy, sx, sy
    imgf = img.astype(np.float64)
    while q:
        y, x = q.popleft()
        count += 1
        minx, maxx = min(minx, x), max(maxx, x)
        miny, maxy = min(miny, y), max(maxy, y)
        base = seed_val if fixed else imgf[y, x]
        for dy, dx in offs:
            ny, nx = y + dy, x + dx
            if not (0 <= ny < H and 0 <= nx < W) or filled[ny, nx]:
                continue
            if mask[ny + 1, nx + 1]:
                continue
            v = imgf[ny, nx]
            d = v - base if multi else np.array([v - base])
            dd = np.atleast_1d(d)
            if np.all(dd >= -lo[:len(dd)]) and np.all(dd <= up[:len(dd)]):
                filled[ny, nx] = True
                q.append((ny, nx))
    mask[1:-1, 1:-1][filled] = fill_mask_val
    if not mask_only:
        img[filled] = nv
    rect = (minx, miny, maxx - minx + 1, maxy - miny + 1)
    return count, img, mask, rect


def watershed(image, markers):
    """Marker-controlled watershed, bit-exact with cv::watershed
    (segmentation.cpp:88-325): 256 FIFO bucket queues keyed by the
    max-channel gradient, raster seeding at the MIN diff to a labeled
    4-neighbor, left/right/top/bottom evaluation order, active bucket
    dropping back on cheaper pushes; the one-pixel frame is forced to
    -1 and unreachable zeros stay 0.  Native C tier with an exact
    Python twin."""
    img = np.ascontiguousarray(np.asarray(image), np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("watershed needs 8UC3 input")
    out = np.ascontiguousarray(np.asarray(markers), np.int32)
    from ..native import watershed as _native_ws
    if not _native_ws(img, out):
        _watershed_py(img, out)
    markers[...] = out
    return markers


def _watershed_py(img, m):
    """Exact Python twin of the native watershed flood."""
    from collections import deque
    IN_QUEUE, WSHED = -2, -1
    H, W = m.shape
    m[0, :] = m[-1, :] = WSHED
    m[:, 0] = m[:, -1] = WSHED
    im = img.astype(np.int32)

    def cdiff(y1, x1, y2, x2):
        return int(np.abs(im[y1, x1] - im[y2, x2]).max())

    q = [deque() for _ in range(256)]
    inner = m[1:H - 1, 1:W - 1]
    inner[inner < 0] = 0
    for i in range(1, H - 1):
        for j in range(1, W - 1):
            if m[i, j] != 0:
                continue
            idx = 256
            if m[i, j - 1] > 0:
                idx = cdiff(i, j, i, j - 1)
            if m[i, j + 1] > 0:
                idx = min(idx, cdiff(i, j, i, j + 1))
            if m[i - 1, j] > 0:
                idx = min(idx, cdiff(i, j, i - 1, j))
            if m[i + 1, j] > 0:
                idx = min(idx, cdiff(i, j, i + 1, j))
            if idx <= 255:
                q[idx].append((i, j))
                m[i, j] = IN_QUEUE
    active = next((k for k in range(256) if q[k]), 256)
    if active == 256:
        return
    while True:
        if not q[active]:
            active = next((k for k in range(active + 1, 256) if q[k]), 256)
            if active == 256:
                break
        i, j = q[active].popleft()
        lab = 0
        for t in (m[i, j - 1], m[i, j + 1], m[i - 1, j], m[i + 1, j]):
            if t > 0:
                if lab == 0:
                    lab = t
                elif t != lab:
                    lab = WSHED
        m[i, j] = lab
        if lab == WSHED:
            continue
        for ni, nj in ((i, j - 1), (i, j + 1), (i - 1, j), (i + 1, j)):
            if m[ni, nj] == 0:
                t = cdiff(i, j, ni, nj)
                q[t].append((ni, nj))
                active = min(active, t)
                m[ni, nj] = IN_QUEUE


def _ms_level(src, sp, isr2, max_count, eps, proc):
    """One pyramid level of the mean-shift iteration, vectorized over
    all pixels with per-pixel activity masks (segmentation.cpp:441-543
    semantics, incl. cvRound half-even means and the OLD-color stop
    test).  `proc` selects which pixels are recomputed."""
    H, W = src.shape[:2]
    s = src.astype(np.int64)
    yy0, xx0 = np.mgrid[0:H, 0:W]
    x0 = xx0.astype(np.int64)
    y0 = yy0.astype(np.int64)
    c = s.copy()                                   # (H, W, 3)
    active = proc.copy()
    # window offsets: bounds are cvRound(x0 +- sp) clamped to the image
    # (outside pixels are excluded, not replicated)
    dmax = int(np.ceil(sp)) + 1
    offs = np.arange(-dmax, dmax + 1)
    for _ in range(max_count):
        if not active.any():
            break
        minx = np.rint(x0 - sp).astype(np.int64)
        maxx = np.rint(x0 + sp).astype(np.int64)
        miny = np.rint(y0 - sp).astype(np.int64)
        maxy = np.rint(y0 + sp).astype(np.int64)
        np.clip(minx, 0, None, out=minx)
        np.clip(miny, 0, None, out=miny)
        np.clip(maxx, None, W - 1, out=maxx)
        np.clip(maxy, None, H - 1, out=maxy)
        s0 = np.zeros((H, W, 3), np.int64)
        sx = np.zeros((H, W), np.int64)
        sy = np.zeros((H, W), np.int64)
        cnt = np.zeros((H, W), np.int64)
        for dy in offs:
            yy = y0 + dy
            rowok = (yy >= miny) & (yy <= maxy)
            if not rowok.any():
                continue
            yc = np.clip(yy, 0, H - 1)
            for dx in offs:
                xx = x0 + dx
                sel = rowok & (xx >= minx) & (xx <= maxx) & active
                if not sel.any():
                    continue
                xc = np.clip(xx, 0, W - 1)
                t = s[yc, xc]                       # (H, W, 3)
                dist = ((t - c) ** 2).sum(-1)
                sel &= dist <= isr2
                s0 += t * sel[..., None]
                sx += xx * sel
                sy += yy * sel
                cnt += sel
        nz = cnt > 0
        live = active & nz
        icnt = 1.0 / np.maximum(cnt, 1).astype(np.float64)
        x1 = np.rint(sx * icnt).astype(np.int64)
        y1 = np.rint(sy * icnt).astype(np.int64)
        sm = np.rint(s0 * icnt[..., None]).astype(np.int64)
        moved = np.abs(x1 - x0) + np.abs(y1 - y0)
        cdist = ((sm - c) ** 2).sum(-1)
        stop = ((x1 == x0) & (y1 == y0)) | (moved + cdist <= eps)
        x0 = np.where(live, x1, x0)
        y0 = np.where(live, y1, y0)
        c = np.where(live[..., None], sm, c)
        active = live & ~stop
    return c.astype(np.uint8)


def pyrMeanShiftFiltering(src, sp: float, sr: float, maxLevel: int = 1,
                          termcrit=(3, 5, 1.0)):
    """cv::pyrMeanShiftFiltering (segmentation.cpp:333-546), bit-exact:
    Gaussian pyramid, top-down processing where finer levels start from
    pyrUp of the coarser result and only recompute pixels whose
    coarse-level 8-neighborhood shows a color edge (>= max(sr^2,16)),
    dilated 3x3; integer mean-shift with cvRound half-even means."""
    src0 = np.asarray(src)
    if src0.ndim != 3 or src0.shape[2] != 3 or src0.dtype != np.uint8:
        raise ValueError("pyrMeanShiftFiltering needs 8UC3")
    ttype, max_count, eps = (int(termcrit[0]), int(termcrit[1]),
                             float(termcrit[2]))
    if not ttype & 1:                               # TermCriteria::COUNT
        max_count = 5
    max_count = min(max(max_count, 1), 100)
    if not ttype & 2:                               # TermCriteria::EPS
        eps = 1.0
    eps = max(eps, 0.0)
    isr2 = int(np.rint(sr * sr))
    isr22 = max(isr2, 16)

    from .pyramids import pyrDown, pyrUp
    src_pyr = [src0]
    for level in range(1, maxLevel + 1):
        prev = src_pyr[-1]
        src_pyr.append(np.asarray(pyrDown(prev)))

    dst = None
    for level in range(maxLevel, -1, -1):
        cur = src_pyr[level]
        H, W = cur.shape[:2]
        sp_l = max(sp / (1 << level), 1.0)
        if level < maxLevel:
            up = np.asarray(pyrUp(dst, dstsize=(W, H)))
            # mask: coarse pixels with a color edge in the 8-neighbor
            # sense get re-run at this level (mask[1+2i, 2j-1] pattern,
            # then 3x3 dilation)
            h1, w1 = dst.shape[:2]
            m = np.zeros((H, W), np.uint8)
            if h1 > 2 and w1 > 2:
                d64 = dst.astype(np.int64)
                ctr = d64[1:-1, 1:-1]
                edge = np.zeros((h1 - 2, w1 - 2), bool)
                for oy in (-1, 0, 1):
                    for ox in (-1, 0, 1):
                        if oy == 0 and ox == 0:
                            continue
                        nb = d64[1 + oy:h1 - 1 + oy, 1 + ox:w1 - 1 + ox]
                        edge |= ((nb - ctr) ** 2).sum(-1) >= isr22
                ii, jj = np.nonzero(edge)
                m[1 + (ii + 1) * 2, (jj + 1) * 2 - 1] = 1
            # dilate 3x3
            mp = np.pad(m, 1)
            md = np.zeros_like(m)
            for oy in range(3):
                for ox in range(3):
                    md |= mp[oy:oy + H, ox:ox + W]
            proc = md.astype(bool)
            res = _ms_level(cur, sp_l, isr2, max_count, eps, proc)
            dst = np.where(proc[..., None], res, up)
        else:
            proc = np.ones((H, W), bool)
            dst = _ms_level(cur, sp_l, isr2, max_count, eps, proc)
    return dst
