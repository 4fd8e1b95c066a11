"""Chessboard corner detection (calib3d/src/calibinit.cpp) and
cornerSubPix (imgproc/src/cornersubpix.cpp).

The reference's detector is a long sequential quad-assembly pipeline;
this one keeps its structure — adaptive binarization, quad extraction,
shared-corner clustering, homography-based grid ordering — with the
dense stages (threshold, erosion, contours' raster scan) on this
framework's primitives.  cornerSubPix is the classic gradient
structure-tensor iteration, solved per corner on host f64.
"""

from __future__ import annotations

import numpy as np

from .. import constants as K
from ..ops.thresh import adaptiveThreshold, threshold
from ..ops.morph import erode, getStructuringElement
from ..ops.contours import findContours, contourArea
from ..ops.color import cvtColor
from .geometry import findHomography

__all__ = ["findChessboardCorners", "drawChessboardCorners",
           "cornerSubPix", "CALIB_CB_ADAPTIVE_THRESH",
           "CALIB_CB_NORMALIZE_IMAGE", "CALIB_CB_FAST_CHECK"]

CALIB_CB_ADAPTIVE_THRESH = 1
CALIB_CB_NORMALIZE_IMAGE = 2
CALIB_CB_FILTER_QUADS = 4
CALIB_CB_FAST_CHECK = 8


def cornerSubPix(image, corners, winSize, zeroZone, criteria):
    """Iterative sub-pixel refinement: solve sum(G_i) q = sum(G_i p_i)
    with G = grad grad^T over the window (cornersubpix.cpp:40)."""
    img = np.asarray(image, np.float64)
    if img.ndim == 3:
        img = np.asarray(cvtColor(image, K.COLOR_BGR2GRAY)).astype(np.float64)
    H, W = img.shape
    wx, wy = winSize
    maxiter = int(criteria[1]) if len(criteria) > 1 else 30
    eps = float(criteria[2]) if len(criteria) > 2 else 1e-2

    # Gaussian-like weighting mask (the reference uses exp(-(r/w)^2))
    gx = np.arange(-wx, wx + 1) / wx
    gy = np.arange(-wy, wy + 1) / wy
    wmask = np.exp(-2.0 * (gx[None, :] ** 2 + gy[:, None] ** 2))
    if zeroZone is not None and zeroZone[0] >= 0:
        zx, zy = zeroZone
        wmask[wy - zy:wy + zy + 1, wx - zx:wx + zx + 1] = 0

    pts = np.asarray(corners, np.float64).reshape(-1, 2).copy()
    out = pts.copy()
    for idx, (cx, cy) in enumerate(pts):
        q = np.array([cx, cy])
        for _ in range(maxiter):
            ix, iy = q
            x0, y0 = int(round(ix)), int(round(iy))
            if not (wx + 1 <= x0 < W - wx - 1 and wy + 1 <= y0 < H - wy - 1):
                break
            sub = img[y0 - wy - 1:y0 + wy + 2, x0 - wx - 1:x0 + wx + 2]
            dx = (sub[1:-1, 2:] - sub[1:-1, :-2]) * 0.5
            dy = (sub[2:, 1:-1] - sub[:-2, 1:-1]) * 0.5
            gxx = np.sum(wmask * dx * dx)
            gxy = np.sum(wmask * dx * dy)
            gyy = np.sum(wmask * dy * dy)
            xs = x0 + np.arange(-wx, wx + 1)[None, :] * 1.0
            ys = y0 + np.arange(-wy, wy + 1)[:, None] * 1.0
            bx = np.sum(wmask * (dx * dx * xs + dx * dy * ys))
            by = np.sum(wmask * (dx * dy * xs + dy * dy * ys))
            det = gxx * gyy - gxy * gxy
            if abs(det) < 1e-12:
                break
            qn = np.array([(gyy * bx - gxy * by) / det,
                           (gxx * by - gxy * bx) / det])
            shift = np.linalg.norm(qn - q)
            q = qn
            if shift < eps:
                break
        out[idx] = q
    return out.reshape(np.asarray(corners).shape).astype(np.float32)


def _extract_quads(binary, min_area):
    """Square-ish contours via minAreaRect rectangularity (more robust
    to ragged adaptive-threshold edges than polygon approximation)."""
    from ..ops.contours import minAreaRect, boxPoints
    contours, _ = findContours(binary, K.RETR_LIST, K.CHAIN_APPROX_SIMPLE)
    quads = []
    for c in contours:
        pts = np.asarray(c).reshape(-1, 2)
        if len(pts) < 4:
            continue
        area = abs(contourArea(pts.astype(np.float32)))
        if area < min_area:
            continue
        rect = minAreaRect(pts.astype(np.float32))
        (w, h) = rect[1]
        if w <= 0 or h <= 0:
            continue
        rect_area = w * h
        if not (0.65 * rect_area <= area <= 1.1 * rect_area):
            continue
        if max(w, h) > 4.0 * min(w, h):
            continue
        quads.append(np.asarray(boxPoints(rect), np.float64))
    return quads


def findChessboardCorners(image, patternSize, corners=None, flags=1 | 2):
    """cv2.findChessboardCorners (calibinit.cpp:512): returns
    (found, corners (N,1,2) f32 row-major)."""
    cols, rows = patternSize          # inner corners per row / column
    img = np.asarray(image)
    if img.ndim == 3:
        img = np.asarray(cvtColor(img, K.COLOR_BGR2GRAY))

    found_pts = None
    for attempt in range(3):
        if flags & CALIB_CB_ADAPTIVE_THRESH:
            block = max(11, (min(img.shape) // 8) | 1) + 10 * attempt
            binary = np.asarray(adaptiveThreshold(
                img, 255, K.ADAPTIVE_THRESH_MEAN_C, K.THRESH_BINARY,
                block | 1, 0))
        else:
            _, binary = threshold(img, 127, 255, K.THRESH_BINARY)
            binary = np.asarray(binary)
        # invert (black squares -> white) THEN erode to disconnect
        # diagonally-touching squares
        se = getStructuringElement(K.MORPH_RECT, (3, 3))
        inv0 = (255 - binary).astype(np.uint8)
        inv = np.asarray(erode(inv0, se, iterations=1 + attempt))

        min_area = (img.shape[0] * img.shape[1]) / (
            (cols + 3) * (rows + 3) * 20)
        quads = _extract_quads(inv, min_area)
        if len(quads) < (cols + 1) * (rows + 1) // 4:
            continue

        # cluster quad corners: inner chessboard corners are where two
        # black quads (diagonal neighbors) nearly touch
        allc = np.concatenate(quads)           # (4*nq, 2)
        used = np.zeros(len(allc), bool)
        centers = []
        # pair threshold from median quad edge length
        es = [np.linalg.norm(q[i] - q[(i + 1) % 4])
              for q in quads for i in range(4)]
        thr = np.median(es) * 0.6 + 2.0 * (attempt + 1)
        for i in range(len(allc)):
            if used[i]:
                continue
            d = np.linalg.norm(allc - allc[i], axis=1)
            near = np.nonzero((d < thr) & ~used)[0]
            if len(near) >= 2:
                centers.append(allc[near].mean(axis=0))
                used[near] = True
        centers = np.array(centers)
        if len(centers) < cols * rows:
            continue

        grid = _order_grid(centers, cols, rows)
        if grid is not None:
            found_pts = grid
            break

    if found_pts is None:
        return False, None

    refined = cornerSubPix(img, found_pts.astype(np.float32), (5, 5),
                           (-1, -1), (3, 30, 0.01))
    return True, refined.reshape(-1, 1, 2)


def _order_grid(pts, cols, rows):
    """Order candidate corners row-major via an iterated unit-grid
    homography fit seeded from the hull extremes."""
    if len(pts) < cols * rows:
        return None
    c = pts.mean(axis=0)
    d = pts - c
    # 4 extreme corners by rotated-quadrant max distance
    ang = np.arctan2(d[:, 1], d[:, 0])
    r = np.linalg.norm(d, axis=1)
    extremes = []
    for a0 in (-3 * np.pi / 4, -np.pi / 4, np.pi / 4, 3 * np.pi / 4):
        m = np.abs(np.angle(np.exp(1j * (ang - a0)))) < np.pi / 4
        if not m.any():
            return None
        extremes.append(pts[m][np.argmax(r[m])])
    tl, tr, br, bl = extremes
    unit = np.array([[0, 0], [cols - 1, 0], [cols - 1, rows - 1],
                     [0, rows - 1]], np.float64)
    H, _ = findHomography(unit, np.array([tl, tr, br, bl]), 0)
    if H is None:
        return None

    grid = np.zeros((rows, cols, 2))
    taken = np.zeros(len(pts), bool)
    uv = np.stack(np.meshgrid(np.arange(cols), np.arange(rows)), -1
                  ).reshape(-1, 2).astype(np.float64)
    proj = np.concatenate([uv, np.ones((len(uv), 1))], axis=1) @ H.T
    proj = proj[:, :2] / proj[:, 2:3]
    for k, (u, v) in enumerate(uv.astype(int)):
        dists = np.linalg.norm(pts - proj[k], axis=1)
        dists[taken] = np.inf
        j = np.argmin(dists)
        if not np.isfinite(dists[j]):
            return None
        grid[v, u] = pts[j]
        taken[j] = True
    # sanity: grid rows should be monotonic along the row direction
    spacing = np.linalg.norm(grid[0, 1] - grid[0, 0])
    errs = np.linalg.norm(grid.reshape(-1, 2) - proj, axis=1)
    if np.median(errs) > spacing:
        return None
    return grid.reshape(-1, 2)


def drawChessboardCorners(image, patternSize, corners, patternWasFound):
    from ..ops.drawing import circle, line
    img = np.asarray(image)
    if corners is None:
        return img
    pts = np.asarray(corners).reshape(-1, 2)
    colors = [(0, 0, 255), (0, 255, 0), (255, 0, 0), (0, 255, 255)]
    for i, p in enumerate(pts):
        col = colors[i % 4] if patternWasFound else (0, 0, 255)
        circle(img, (int(round(p[0])), int(round(p[1]))), 4, col, 1)
        if patternWasFound and i + 1 < len(pts):
            q = pts[i + 1]
            line(img, (int(round(p[0])), int(round(p[1]))),
                 (int(round(q[0])), int(round(q[1]))), col, 1)
    return img
