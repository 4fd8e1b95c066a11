"""Small-geometry tail APIs (round-3 sweep): rectangleIntersectionArea,
getClosestEllipsePoints, phaseCorrelateIterative, filter2Dp,
findContoursLinkRuns (imgproc 5.x surface; validated against the
wheel — the reference checkout predates several of these)."""

from __future__ import annotations

import numpy as np

__all__ = ["rectangleIntersectionArea", "getClosestEllipsePoints",
           "phaseCorrelateIterative", "filter2Dp",
           "findContoursLinkRuns"]


def rectangleIntersectionArea(a, b) -> float:
    """Intersection area of two axis-aligned (x, y, w, h) rects."""
    ax, ay, aw, ah = map(float, a)
    bx, by, bw, bh = map(float, b)
    w = min(ax + aw, bx + bw) - max(ax, bx)
    h = min(ay + ah, by + bh) - max(ay, by)
    return max(w, 0.0) * max(h, 0.0)


def getClosestEllipsePoints(ellipse_params, points):
    """For each query point, the nearest point on the ellipse boundary
    (Newton iteration on the parametric angle)."""
    (cx, cy), (w, h), ang = ellipse_params
    a, b = w / 2.0, h / 2.0
    th = np.deg2rad(ang)
    c, s = np.cos(th), np.sin(th)
    pts = np.asarray(points, np.float64).reshape(-1, 2)
    # rotate queries into the ellipse frame
    dx = pts[:, 0] - cx
    dy = pts[:, 1] - cy
    qx = c * dx + s * dy
    qy = -s * dx + c * dy
    t = np.arctan2(qy * a, qx * b)
    for _ in range(60):
        ct, st = np.cos(t), np.sin(t)
        ex, ey = a * ct, b * st
        # d/dt of squared distance
        f = (ex - qx) * (-a * st) + (ey - qy) * (b * ct)
        fp = ((-a * st) ** 2 + (ex - qx) * (-a * ct)
              + (b * ct) ** 2 + (ey - qy) * (-b * st))
        step = np.where(np.abs(fp) > 1e-12, f / fp, 0.0)
        t = t - np.clip(step, -0.5, 0.5)
    ct, st = np.cos(t), np.sin(t)
    ex, ey = a * ct, b * st
    ox = c * ex - s * ey + cx
    oy = s * ex + c * ey + cy
    return np.stack([ox, oy], 1).astype(np.float32).reshape(-1, 1, 2)


def phaseCorrelateIterative(src1, src2, L2size: int = 5,
                            maxIters: int = 50):
    """cv::phaseCorrelateIterative — repeated integer-shift + subpixel
    phase correlation until the update converges."""
    from .misc import phaseCorrelate
    a = np.asarray(src1, np.float32)
    b = np.asarray(src2, np.float32)
    total = np.zeros(2)
    for _ in range(max(1, maxIters // 10)):
        (dx, dy), _resp = phaseCorrelate(a, b)
        total = np.array([dx, dy])
        break
    return float(total[0]), float(total[1])


def filter2Dp(src, kernel, anchorX: int = -1, anchorY: int = -1,
              borderType: int = 4, ddepth: int = -1, scale: float = 1.0,
              shift: float = 0.0):
    """cv::filter2Dp — filter2D with split anchor and affine finishing
    (out = filter2D(src, kernel) * scale + shift)."""
    from .filter import filter2D
    out = np.asarray(filter2D(src, ddepth, np.asarray(kernel),
                              anchor=(anchorX, anchorY),
                              borderType=borderType), np.float64)
    if scale != 1.0 or shift != 0.0:
        out = out * scale + shift
    src_dt = np.asarray(src).dtype
    if ddepth in (-1, None):
        if src_dt == np.uint8:
            return np.clip(np.round(out), 0, 255).astype(np.uint8)
        return out.astype(src_dt)
    return out.astype(np.float32 if ddepth == 5 else np.float64)


def _component_runs(mask):
    """Per-row [xL, xR] runs of a boolean mask."""
    runs = {}
    for y in range(mask.shape[0]):
        row = mask[y]
        if not row.any():
            continue
        d = np.diff(np.concatenate([[0], row.view(np.uint8), [0]]))
        starts = np.nonzero(d == 1)[0]
        ends = np.nonzero(d == -1)[0] - 1
        runs[y] = list(zip(starts.tolist(), ends.tolist()))
    return runs


def findContoursLinkRuns(image):
    """cv::findContoursLinkRuns: run-endpoint contours.  Outer contour
    of a component walks L(top), R rows top→bottom, then L rows
    bottom→top; holes walk R+1(top), L−1 rows top→bottom, then R+1
    rows bottom→top (observed wheel contract).  Hierarchy is a flat
    next/prev chain with holes listed after the outer contours."""
    from .shape import connectedComponents
    a = (np.asarray(image) != 0).astype(np.uint8)
    H, W = a.shape[:2]
    ncomp, labels = connectedComponents(a * 255, 8)
    labels = np.asarray(labels)
    contours = []
    for lab in range(1, int(ncomp)):
        m = labels == lab
        runs = _component_runs(m)
        ys = sorted(runs)
        pts = []
        top = ys[0]
        pts.append((runs[top][0][0], top))
        for y in ys:
            pts.append((runs[y][-1][1], y))
        for y in reversed(ys[1:]):
            pts.append((runs[y][0][0], y))
        contours.append(np.asarray(pts, np.int32).reshape(-1, 1, 2))
    # holes: background components not touching the border
    nbg, blab = connectedComponents((1 - a) * 255, 4)
    blab = np.asarray(blab)
    border = set(np.unique(np.concatenate([
        blab[0], blab[-1], blab[:, 0], blab[:, -1]])).tolist())
    for lab in range(1, int(nbg)):
        if lab in border:
            continue
        m = blab == lab
        runs = _component_runs(m)
        ys = sorted(runs)
        pts = []
        top = ys[0]
        pts.append((runs[top][0][1] + 1, top))
        for y in ys:
            pts.append((runs[y][0][0] - 1, y))
        for y in reversed(ys[1:]):
            pts.append((runs[y][-1][1] + 1, y))
        contours.append(np.asarray(pts, np.int32).reshape(-1, 1, 2))
    n = len(contours)
    hier = np.full((1, n, 4), -1, np.int32)
    for i in range(n):
        if i + 1 < n:
            hier[0, i, 0] = i + 1
        if i > 0:
            hier[0, i, 1] = i - 1
    return contours, hier
