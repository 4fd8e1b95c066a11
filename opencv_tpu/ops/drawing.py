"""Drawing primitives (imgproc/src/drawing.cpp).

Rasterization is inherently sequential host-side work in the reference
too; these are numpy implementations of the cv2 surface.  Images are
mutated in place when given numpy arrays (cv2 semantics) and returned.

Line drawing matches the reference's 8-connected Bresenham; thick lines
and circles rasterize the same integer midpoint spans.
"""

from __future__ import annotations

import math

import numpy as np

from .. import constants as K

__all__ = ["line", "rectangle", "circle", "ellipse", "polylines",
           "fillPoly", "fillConvexPoly", "drawContours", "drawMarker",
           "arrowedLine", "drawKeypoints", "drawMatches",
           "putText", "getTextSize", "getFontScaleFromHeight"]


def _as_np(img):
    a = np.asarray(img)
    if a.base is not None or not a.flags.writeable:
        a = np.array(a)
    return a


def _put(img, y, x, color):
    H, W = img.shape[:2]
    m = (y >= 0) & (y < H) & (x >= 0) & (x < W)
    if img.ndim == 2:
        img[y[m], x[m]] = color if np.isscalar(color) else color[0]
    else:
        c = np.asarray(color).reshape(-1)[:img.shape[2]]
        img[y[m], x[m]] = c


def _line_points(p0, p1):
    """8-connected Bresenham from p0 to p1 inclusive (LineIterator)."""
    x0, y0 = int(round(p0[0])), int(round(p0[1]))
    x1, y1 = int(round(p1[0])), int(round(p1[1]))
    dx = abs(x1 - x0)
    dy = abs(y1 - y0)
    sx = 1 if x1 >= x0 else -1
    sy = 1 if y1 >= y0 else -1
    xs, ys = [], []
    if dx >= dy:
        err = dx // 2
        y = y0
        for i, x in enumerate(range(x0, x1 + sx, sx)):
            xs.append(x)
            ys.append(y)
            err -= dy
            if err < 0:
                y += sy
                err += dx
    else:
        err = dy // 2
        x = x0
        for i, y in enumerate(range(y0, y1 + sy, sy)):
            xs.append(x)
            ys.append(y)
            err -= dx
            if err < 0:
                x += sx
                err += dy
    return np.asarray(ys), np.asarray(xs)


def _blend(img, ys, xs, alpha, color):
    """Alpha-composite `color` at integer coords with per-pixel coverage."""
    H, W = img.shape[:2]
    m = (ys >= 0) & (ys < H) & (xs >= 0) & (xs < W) & (alpha > 0)
    ys, xs, a = ys[m], xs[m], alpha[m]
    if img.ndim == 2:
        c = color if np.isscalar(color) else np.asarray(color).reshape(-1)[0]
        base = img[ys, xs].astype(np.float64)
        img[ys, xs] = np.clip(base * (1 - a) + float(c) * a + 0.5, 0,
                              255).astype(img.dtype)
    else:
        c = np.asarray(color, np.float64).reshape(-1)[:img.shape[2]]
        base = img[ys, xs].astype(np.float64)
        img[ys, xs] = np.clip(base * (1 - a)[:, None] + c[None, :]
                              * a[:, None] + 0.5, 0, 255).astype(img.dtype)


def _line_aa(img, pt1, pt2, color, thickness=1):
    """Antialiased line: Wu-style fractional coverage along the minor
    axis (the role of LineAA in drawing.cpp — the reference uses an
    8-bit filtered profile; endpoints and coverage agree closely)."""
    x0, y0 = float(pt1[0]), float(pt1[1])
    x1, y1 = float(pt2[0]), float(pt2[1])
    dx = x1 - x0
    dy = y1 - y0
    steep = abs(dy) > abs(dx)
    if steep:
        x0, y0, x1, y1 = y0, x0, y1, x1
        dx, dy = dy, dx
    if x1 < x0:
        x0, x1 = x1, x0
        y0, y1 = y1, y0
    grad = dy / dx if dx != 0 else 0.0
    n = int(np.floor(x1) - np.ceil(x0)) + 1
    if n <= 0:
        return
    xs = np.ceil(x0) + np.arange(max(n, 0))
    yc = y0 + (xs - x0) * grad
    # triangular coverage over PERPENDICULAR distance (the reference's
    # LineAA profile integrates to ~1.35 for 1-px lines)
    cos_t = 1.0 / np.hypot(1.0, grad)
    half = max(thickness / 2.0, 0.5) + 0.7
    span = int(np.ceil(half / cos_t)) + 1
    offs = np.arange(-span, span + 1)
    yy = (np.floor(yc)[:, None] + offs[None, :]).astype(int)
    dist = np.abs(yy + 0.0 - yc[:, None]) * cos_t
    alpha = np.clip((half - dist) / 0.7, 0.0, 1.0)
    xx = np.broadcast_to(xs.astype(int)[:, None], yy.shape)
    if steep:
        _blend(img, xx.ravel(), yy.ravel(), alpha.ravel(), color)
    else:
        _blend(img, yy.ravel(), xx.ravel(), alpha.ravel(), color)


def line(img, pt1, pt2, color, thickness: int = 1, lineType: int = K.LINE_8,
         shift: int = 0):
    img = _as_np(img)
    if lineType == K.LINE_AA:
        _line_aa(img, pt1, pt2, color, thickness)
    elif thickness <= 1:
        ys, xs = _line_points(pt1, pt2)
        _put(img, ys, xs, color)
    else:
        # thick line: stamp a disk of radius thickness/2 along the line
        r = thickness / 2.0
        ys, xs = _line_points(pt1, pt2)
        rr = int(math.ceil(r))
        dy, dx = np.mgrid[-rr:rr + 1, -rr:rr + 1]
        disk = (dy * dy + dx * dx) <= r * r
        ddy, ddx = dy[disk], dx[disk]
        yy = (ys[:, None] + ddy[None, :]).ravel()
        xx = (xs[:, None] + ddx[None, :]).ravel()
        _put(img, yy, xx, color)
    return img


def rectangle(img, pt1, pt2, color, thickness: int = 1,
              lineType: int = K.LINE_8, shift: int = 0):
    img = _as_np(img)
    x0, y0 = int(pt1[0]), int(pt1[1])
    x1, y1 = int(pt2[0]), int(pt2[1])
    x0, x1 = min(x0, x1), max(x0, x1)
    y0, y1 = min(y0, y1), max(y0, y1)
    H, W = img.shape[:2]
    if thickness < 0 or thickness == K.FILLED:
        ya, yb = max(y0, 0), min(y1 + 1, H)
        xa, xb = max(x0, 0), min(x1 + 1, W)
        if ya < yb and xa < xb:
            img[ya:yb, xa:xb] = (color if np.isscalar(color)
                                 else np.asarray(color).reshape(-1)[:1 if img.ndim == 2 else img.shape[2]])
        return img
    for t in range(thickness):
        # concentric rectangles approximate cv2's thick border
        xx0, yy0, xx1, yy1 = x0 + 0, y0 + 0, x1 - 0, y1 - 0
        line(img, (x0, y0), (x1, y0), color, 1)
        line(img, (x1, y0), (x1, y1), color, 1)
        line(img, (x1, y1), (x0, y1), color, 1)
        line(img, (x0, y1), (x0, y0), color, 1)
        x0, y0, x1, y1 = x0 - 1, y0 - 1, x1 + 1, y1 + 1
    return img


def circle(img, center, radius: int, color, thickness: int = 1,
           lineType: int = K.LINE_8, shift: int = 0):
    img = _as_np(img)
    cx, cy = int(center[0]), int(center[1])
    H, W = img.shape[:2]
    if thickness < 0 or thickness == K.FILLED:
        ys, xs = np.mgrid[max(cy - radius, 0):min(cy + radius + 1, H),
                          max(cx - radius, 0):min(cx + radius + 1, W)]
        m = (ys - cy) ** 2 + (xs - cx) ** 2 <= radius * radius
        _put(img, ys[m], xs[m], color)
        return img
    # midpoint circle (8 octants)
    pts = set()
    x, y, err = radius, 0, 0
    while x >= y:
        for (a, b) in [(x, y), (y, x), (-y, x), (-x, y), (-x, -y), (-y, -x),
                       (y, -x), (x, -y)]:
            pts.add((cy + b, cx + a))
        y += 1
        err += 1 + 2 * y
        if 2 * (err - x) + 1 > 0:
            x -= 1
            err += 1 - 2 * x
    arr = np.asarray(list(pts))
    for t in range(max(thickness, 1)):
        _put(img, arr[:, 0], arr[:, 1], color)
        if thickness > 1:
            arr2 = np.concatenate([arr + [0, 1], arr + [1, 0]])
            arr = arr2
    return img


def ellipse(img, center, axes, angle: float, startAngle: float,
            endAngle: float, color, thickness: int = 1,
            lineType: int = K.LINE_8, shift: int = 0):
    img = _as_np(img)
    cx, cy = float(center[0]), float(center[1])
    a, b = float(axes[0]), float(axes[1])
    rot = math.radians(angle)
    ca, sa = math.cos(rot), math.sin(rot)
    ts = np.radians(np.arange(int(startAngle), int(endAngle) + 1))
    ex = a * np.cos(ts)
    ey = b * np.sin(ts)
    xs = np.rint(cx + ex * ca - ey * sa).astype(int)
    ys = np.rint(cy + ex * sa + ey * ca).astype(int)
    if thickness < 0:
        pts = np.stack([xs, ys], axis=1)
        return fillPoly(img, [pts], color)
    for i in range(len(xs) - 1):
        line(img, (xs[i], ys[i]), (xs[i + 1], ys[i + 1]), color,
             max(thickness, 1))
    return img


def polylines(img, pts, isClosed: bool, color, thickness: int = 1,
              lineType: int = K.LINE_8, shift: int = 0):
    img = _as_np(img)
    for poly in pts:
        p = np.asarray(poly).reshape(-1, 2)
        for i in range(len(p) - 1):
            line(img, p[i], p[i + 1], color, thickness)
        if isClosed and len(p) > 2:
            line(img, p[-1], p[0], color, thickness)
    return img


def fillPoly(img, pts, color, lineType: int = K.LINE_8, shift: int = 0,
             offset=(0, 0)):
    """Even-odd scanline fill (drawing.cpp FillEdgeCollection)."""
    img = _as_np(img)
    H, W = img.shape[:2]
    for poly in pts:
        p = np.asarray(poly, np.float64).reshape(-1, 2) + np.asarray(offset)
        n = len(p)
        ymin = max(int(np.ceil(p[:, 1].min())), 0)
        ymax = min(int(np.floor(p[:, 1].max())), H - 1)
        for y in range(ymin, ymax + 1):
            xs = []
            for i in range(n):
                x0, y0 = p[i]
                x1, y1 = p[(i + 1) % n]
                if y0 == y1:
                    continue
                if (y >= min(y0, y1)) and (y <= max(y0, y1)):
                    t = (y - y0) / (y1 - y0)
                    if 0 <= t <= 1:
                        xs.append(x0 + t * (x1 - x0))
            xs.sort()
            for i in range(0, len(xs) - 1, 2):
                xa = max(int(np.rint(xs[i])), 0)
                xb = min(int(np.rint(xs[i + 1])), W - 1)
                if xa <= xb:
                    if img.ndim == 2:
                        img[y, xa:xb + 1] = color if np.isscalar(color) else color[0]
                    else:
                        img[y, xa:xb + 1] = np.asarray(color).reshape(-1)[:img.shape[2]]
        # the reference also rasterizes the boundary (Bresenham) when filling
        polylines(img, [p.astype(np.int64)], True, color, 1)
    return img


def fillConvexPoly(img, points, color, lineType: int = K.LINE_8,
                   shift: int = 0):
    return fillPoly(img, [points], color, lineType, shift)


def drawContours(img, contours, contourIdx: int, color, thickness: int = 1,
                 lineType: int = K.LINE_8, hierarchy=None, maxLevel=None,
                 offset=(0, 0)):
    img = _as_np(img)
    sel = contours if contourIdx < 0 else [contours[contourIdx]]
    if thickness < 0:
        return fillPoly(img, [np.asarray(c).reshape(-1, 2) for c in sel],
                        color, offset=offset)
    for c in sel:
        p = np.asarray(c).reshape(-1, 2) + np.asarray(offset)
        polylines(img, [p], True, color, thickness)
    return img


def drawMarker(img, position, color, markerType: int = 0, markerSize: int = 20,
               thickness: int = 1, line_type: int = K.LINE_8):
    x, y = int(position[0]), int(position[1])
    s = markerSize // 2
    img = line(img, (x - s, y), (x + s, y), color, thickness)
    img = line(img, (x, y - s), (x, y + s), color, thickness)
    return img


def arrowedLine(img, pt1, pt2, color, thickness: int = 1,
                line_type: int = K.LINE_8, shift: int = 0,
                tipLength: float = 0.1):
    img = line(img, pt1, pt2, color, thickness)
    dx, dy = pt2[0] - pt1[0], pt2[1] - pt1[1]
    L = math.hypot(dx, dy)
    if L == 0:
        return img
    t = tipLength * L
    ang = math.atan2(dy, dx)
    for da in (math.pi * 3 / 4, -math.pi * 3 / 4):
        ex = pt2[0] + t * math.cos(ang + da)
        ey = pt2[1] + t * math.sin(ang + da)
        img = line(img, pt2, (ex, ey), color, thickness)
    return img


def drawKeypoints(image, keypoints, outImage, color=None, flags: int = 0):
    img = _as_np(image).copy()
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    rng = np.random.default_rng(0)
    for k in keypoints:
        c = (color if color is not None and not np.isscalar(color)
             else rng.integers(0, 256, 3).tolist())
        circle(img, (int(k.pt[0]), int(k.pt[1])), 3, c, 1)
    return img


def drawMatches(img1, keypoints1, img2, keypoints2, matches1to2, outImg,
                matchColor=None, singlePointColor=None, matchesMask=None,
                flags: int = 0):
    a = _as_np(img1)
    b = _as_np(img2)
    if a.ndim == 2:
        a = np.stack([a] * 3, axis=-1)
    if b.ndim == 2:
        b = np.stack([b] * 3, axis=-1)
    H = max(a.shape[0], b.shape[0])
    out = np.zeros((H, a.shape[1] + b.shape[1], 3), np.uint8)
    out[:a.shape[0], :a.shape[1]] = a
    out[:b.shape[0], a.shape[1]:] = b
    rng = np.random.default_rng(0)
    for i, m in enumerate(matches1to2):
        if matchesMask is not None and not matchesMask[i]:
            continue
        c = (matchColor if matchColor is not None
             else rng.integers(0, 256, 3).tolist())
        p1 = keypoints1[m.queryIdx].pt
        p2 = keypoints2[m.trainIdx].pt
        line(out, (int(p1[0]), int(p1[1])),
             (int(p2[0]) + a.shape[1], int(p2[1])), c, 1)
    return out


# ------------------------------------------------------------------ text
# Hershey vector fonts (imgproc/src/drawing.cpp:2287 putText,
# :2355 getTextSize).  The glyph strokes and per-font ascii index tables
# are the public-domain Hershey font data, extracted from the reference
# into hershey_data.json; each glyph string encodes vertices as
# char-'R' offsets with " R" polyline breaks.

_HERSHEY = None


def _hershey():
    global _HERSHEY
    if _HERSHEY is None:
        import json
        import os
        path = os.path.join(os.path.dirname(__file__), "hershey_data.json")
        _HERSHEY = json.load(open(path))
    return _HERSHEY


_FONT_TABLE_NAMES = {
    K.FONT_HERSHEY_SIMPLEX: ("HersheySimplex", "HersheySimplex"),
    K.FONT_HERSHEY_PLAIN: ("HersheyPlain", "HersheyPlainItalic"),
    K.FONT_HERSHEY_DUPLEX: ("HersheyDuplex", "HersheyDuplex"),
    K.FONT_HERSHEY_COMPLEX: ("HersheyComplex", "HersheyComplexItalic"),
    K.FONT_HERSHEY_TRIPLEX: ("HersheyTriplex", "HersheyTriplexItalic"),
    K.FONT_HERSHEY_COMPLEX_SMALL: ("HersheyComplexSmall",
                                   "HersheyComplexSmallItalic"),
    K.FONT_HERSHEY_SCRIPT_SIMPLEX: ("HersheyScriptSimplex",
                                    "HersheyScriptSimplex"),
    K.FONT_HERSHEY_SCRIPT_COMPLEX: ("HersheyScriptComplex",
                                    "HersheyScriptComplex"),
}


def _font_ascii(fontFace):
    italic = bool(fontFace & K.FONT_ITALIC)
    names = _FONT_TABLE_NAMES.get(fontFace & 15)
    if names is None:
        raise ValueError(f"Unknown font type {fontFace}")
    return _hershey()["fonts"][names[1 if italic else 0]]


def _glyph(ascii_table, c):
    if c < ord(' ') or c >= 127:
        c = ord('?')
    return _hershey()["glyphs"][ascii_table[(c - ord(' ')) + 1]]


def putText(img, text, org, fontFace, fontScale, color, thickness: int = 1,
            lineType: int = K.LINE_8, bottomLeftOrigin: bool = False):
    """Render text with the Hershey vector fonts
    (imgproc/src/drawing.cpp:2287).  Glyph strokes are scaled in float
    and rasterized with the polyline primitive."""
    a = _as_np(img)
    if not text:
        return a
    ascii_table = _font_ascii(fontFace)
    base_line = -(ascii_table[0] & 15)
    hscale = float(fontScale)
    vscale = -hscale if bottomLeftOrigin else hscale

    view_x = float(org[0])
    view_y = float(org[1]) + base_line * vscale

    for ch in text:
        ptr = _glyph(ascii_table, ord(ch))
        px = ord(ptr[0]) - ord('R')
        py = ord(ptr[1]) - ord('R')
        dx = py * hscale
        view_x -= px * hscale
        pts = []
        i = 2
        while True:
            if i >= len(ptr) or ptr[i] == ' ':
                if len(pts) > 1:
                    polylines(a, [np.array(pts, np.int32)], False, color,
                              thickness, lineType)
                if i >= len(ptr):
                    break
                i += 1
                pts = []
            else:
                gx = ord(ptr[i]) - ord('R')
                gy = ord(ptr[i + 1]) - ord('R')
                i += 2
                pts.append((int(round(gx * hscale + view_x)),
                            int(round(gy * vscale + view_y))))
        view_x += dx
    return a


def getTextSize(text, fontFace, fontScale, thickness):
    """Bounding size + baseline (imgproc/src/drawing.cpp:2355)."""
    ascii_table = _font_ascii(fontFace)
    base_line = ascii_table[0] & 15
    cap_line = (ascii_table[0] >> 4) & 15
    height = int(round((cap_line + base_line) * fontScale
                       + (thickness + 1) // 2))
    view_x = 0.0
    for ch in text:
        ptr = _glyph(ascii_table, ord(ch))
        px = ord(ptr[0]) - ord('R')
        py = ord(ptr[1]) - ord('R')
        view_x += (py - px) * fontScale
    width = int(round(view_x + thickness))
    baseline = int(round(base_line * fontScale + thickness * 0.5))
    return (width, height), baseline


def getFontScaleFromHeight(fontFace, pixelHeight, thickness=1):
    ascii_table = _font_ascii(fontFace)
    base_line = ascii_table[0] & 15
    cap_line = (ascii_table[0] >> 4) & 15
    return (pixelHeight - (thickness + 1) / 2.0) / (cap_line + base_line)


# ------------------------------------------------------------ ellipse2Poly

_SIN_TABLE = np.sin(np.deg2rad(np.arange(491))).astype(np.float32)


def ellipse2Poly(center, axes, angle: int, arcStart: int, arcEnd: int,
                 delta: int):
    """`cv::ellipse2Poly` (imgproc/src/drawing.cpp): per-degree float32
    sin-table sampling, cvRound to int points, consecutive duplicates
    removed; degenerate arcs return the center twice."""
    assert 0 < delta <= 180
    angle = int(angle)
    while angle < 0:
        angle += 360
    while angle > 360:
        angle -= 360
    arc_start, arc_end = int(arcStart), int(arcEnd)
    if arc_start > arc_end:
        arc_start, arc_end = arc_end, arc_start
    while arc_start < 0:
        arc_start += 360
        arc_end += 360
    while arc_end > 360:
        arc_end -= 360
        arc_start -= 360
    if arc_end - arc_start > 360:
        arc_start, arc_end = 0, 360
    alpha = _SIN_TABLE[450 - angle]
    beta = _SIN_TABLE[angle]
    cx, cy = float(center[0]), float(center[1])
    aw, ah = float(axes[0]), float(axes[1])
    pts = []
    prev = None
    i = arc_start
    while i < arc_end + delta:
        a = min(i, arc_end)
        if a < 0:
            a += 360
        x = aw * float(_SIN_TABLE[450 - a])
        y = ah * float(_SIN_TABLE[a])
        px = _cv_round(cx + x * float(alpha) - y * float(beta))
        py = _cv_round(cy + x * float(beta) + y * float(alpha))
        if (px, py) != prev:
            pts.append((px, py))
            prev = (px, py)
        i += delta
    if len(pts) == 1:
        pts = [(int(round(cx)), int(round(cy)))] * 2
    return np.asarray(pts, np.int32)


def _cv_round(v: float) -> int:
    """cvRound: round half to even."""
    import builtins
    f = math.floor(v)
    d = v - f
    if d < 0.5:
        return int(f)
    if d > 0.5:
        return int(f) + 1
    return int(f) + (int(f) & 1)


def drawMatchesKnn(img1, keypoints1, img2, keypoints2, matches1to2,
                   outImg=None, matchColor=None, singlePointColor=None,
                   matchesMask=None, flags: int = 0):
    """cv::drawMatches knn overload (draw.cpp): draws every match in each
    k-NN bucket, honoring the per-bucket mask rows."""
    flat, flat_mask = [], []
    for i, bucket in enumerate(matches1to2):
        for j, m in enumerate(bucket):
            flat.append(m)
            if matchesMask is not None:
                row = matchesMask[i]
                flat_mask.append(bool(row[j]) if j < len(row) else False)
    return drawMatches(img1, keypoints1, img2, keypoints2, flat, outImg,
                       matchColor, singlePointColor,
                       flat_mask if matchesMask is not None else None,
                       flags)
