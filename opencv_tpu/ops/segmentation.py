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


def pyrMeanShiftFiltering(src, sp: float, sr: float, maxLevel: int = 1,
                          termcrit=(3, 5, 1)):
    """Mean-shift color smoothing (segmentation.cpp) — iterative joint
    spatial/color mode seeking per pixel, vectorized over the image."""
    img = np.asarray(src).astype(np.float64)
    H, W = img.shape[:2]
    iters = int(termcrit[1]) if len(termcrit) > 1 else 5
    spi = int(sp)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    cx, cy = xs.copy(), ys.copy()
    cv = img.copy()
    pad = spi
    for _ in range(iters):
        acc_v = np.zeros_like(cv)
        acc_x = np.zeros_like(cx)
        acc_y = np.zeros_like(cy)
        cnt = np.zeros((H, W))
        for dy in range(-spi, spi + 1):
            for dx in range(-spi, spi + 1):
                qy = np.clip(np.rint(cy + dy).astype(int), 0, H - 1)
                qx = np.clip(np.rint(cx + dx).astype(int), 0, W - 1)
                v = img[qy, qx]
                d = np.abs(v - cv).max(axis=-1) if img.ndim == 3 \
                    else np.abs(v - cv)
                m = d <= sr
                mf = m.astype(np.float64)
                acc_v += v * (mf[..., None] if img.ndim == 3 else mf)
                acc_x += qx * mf
                acc_y += qy * mf
                cnt += mf
        cnt = np.maximum(cnt, 1)
        cv = acc_v / (cnt[..., None] if img.ndim == 3 else cnt)
        cx = acc_x / cnt
        cy = acc_y / cnt
    out = np.clip(np.rint(cv), 0, 255).astype(np.uint8)
    return out
