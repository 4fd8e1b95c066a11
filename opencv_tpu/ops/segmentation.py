"""Segmentation: floodFill / watershed / grabCut-lite / pyrMeanShiftFiltering
(imgproc/src/floodfill.cpp, segmentation.cpp, grabcut.cpp).

floodFill and watershed are the reference's host-tier propagation
algorithms (data-dependent frontiers); the dense upstream work (gradients
for watershed) runs on device.
"""

from __future__ import annotations

import heapq
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
    """Marker-controlled watershed (segmentation.cpp cvWatershed):
    priority-flood on color gradient; boundaries get -1."""
    img = np.asarray(image).astype(np.int32)
    m = np.array(markers, np.int32)
    H, W = m.shape
    pq = []
    counter = 0

    def edge_cost(y1, x1, y2, x2):
        return int(np.abs(img[y1, x1].astype(np.int64)
                          - img[y2, x2].astype(np.int64)).max())

    offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    state = m.copy()
    for y in range(H):
        for x in range(W):
            if state[y, x] > 0:
                for dy, dx in offs:
                    ny, nx = y + dy, x + dx
                    if 0 <= ny < H and 0 <= nx < W and state[ny, nx] == 0:
                        heapq.heappush(pq, (edge_cost(y, x, ny, nx), counter,
                                            ny, nx, state[y, x]))
                        counter += 1
    while pq:
        cost, _, y, x, label = heapq.heappop(pq)
        if state[y, x] != 0:
            continue
        # check neighbor labels: if multiple distinct → boundary
        labs = set()
        for dy, dx in offs:
            ny, nx = y + dy, x + dx
            if 0 <= ny < H and 0 <= nx < W and state[ny, nx] > 0:
                labs.add(state[ny, nx])
        if len(labs) > 1:
            state[y, x] = -1
            continue
        state[y, x] = label
        for dy, dx in offs:
            ny, nx = y + dy, x + dx
            if 0 <= ny < H and 0 <= nx < W and state[ny, nx] == 0:
                heapq.heappush(pq, (edge_cost(y, x, ny, nx), counter,
                                    ny, nx, label))
                counter += 1
    state[state == 0] = -1
    markers[...] = state
    return markers


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
