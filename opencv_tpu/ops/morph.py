"""Morphology: erode / dilate / morphologyEx / getStructuringElement
(imgproc/src/morph.dispatch.cpp).

Erode and dilate both scan the SE support as-is (verified against the
installed reference build; no SE reflection).

TPU-native design: rectangular structuring elements become two 1-D
min/max sliding windows (`lax.reduce_window`, VPU-vectorized); arbitrary
elements reduce over the SE's nonzero shifted slices — XLA fuses the
min/max chain.  The `morphologyDefaultBorderValue()` sentinel resolves to
the reduction identity per op (+max for erode, -max for dilate,
morph.dispatch.cpp:113-127), so the constant border never wins.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from .. import constants as K
from ..core.arrays import to_batched, from_batched
from ..core.borders import pad_nhwc

__all__ = ["erode", "dilate", "morphologyEx", "getStructuringElement",
           "morphologyDefaultBorderValue"]


def morphologyDefaultBorderValue():
    return (np.finfo(np.float64).max,) * 4


def getStructuringElement(shape: int, ksize, anchor=(-1, -1)) -> np.ndarray:
    """Host twin of `cv::getStructuringElement`."""
    kw, kh = int(ksize[0]), int(ksize[1])
    ax = kw // 2 if anchor[0] < 0 else anchor[0]
    ay = kh // 2 if anchor[1] < 0 else anchor[1]
    el = np.zeros((kh, kw), np.uint8)
    if shape == K.MORPH_RECT or (kw == 1 and kh == 1):
        el[:] = 1
    elif shape == K.MORPH_CROSS:
        el[ay, :] = 1
        el[:, ax] = 1
    elif shape == K.MORPH_ELLIPSE:
        r = kh // 2
        c = kw // 2
        inv_r2 = 1.0 / (r * r) if r else 0.0
        for i in range(kh):
            dy = i - r
            if abs(dy) <= r:
                dx = int(np.rint(c * np.sqrt(max(r * r - dy * dy, 0) * inv_r2))) \
                    if r else c
                j1 = max(c - dx, 0)
                j2 = min(c + dx + 1, kw)
                el[i, j1:j2] = 1
    else:
        raise ValueError(f"unknown structuring element shape {shape}")
    return el


def _identity_value(dtype, is_erode: bool):
    if dtype.kind in "ui":
        info = np.iinfo(dtype)
        return info.max if is_erode else info.min
    return np.inf if is_erode else -np.inf


def _is_default_border_value(value) -> bool:
    if value is None:
        return True
    v = np.asarray(value, np.float64).reshape(-1)
    return bool(np.all(v[:1] == np.finfo(np.float64).max))


def _morph_op(x, kernel, anchor, iterations, border_type, border_value,
              is_erode: bool):
    kernel = np.asarray(kernel) if kernel is not None else None
    if kernel is None or kernel.size == 0:
        kernel = np.ones((3, 3), np.uint8)
        anchor = (1, 1)
    kh, kw = kernel.shape
    ax = kw // 2 if anchor is None or anchor[0] < 0 else anchor[0]
    ay = kh // 2 if anchor is None or anchor[1] < 0 else anchor[1]

    is_rect = bool(np.all(kernel != 0))
    if is_rect and iterations > 1:
        # rect SE composes exactly: N iterations of k ≡ one k+(N-1)(k-1)
        # (morph.dispatch.cpp erode/dilate iterations folding)
        ax = ax + (iterations - 1) * ax
        ay = ay + (iterations - 1) * ay
        kw = kw + (iterations - 1) * (kw - 1)
        kh = kh + (iterations - 1) * (kh - 1)
        kernel = np.ones((kh, kw), np.uint8)
        iterations = 1

    dtype = np.dtype(x.dtype)
    bt = border_type & ~K.BORDER_ISOLATED
    if bt == K.BORDER_CONSTANT:
        if _is_default_border_value(border_value):
            pad_val = _identity_value(dtype, is_erode)
        else:
            v = np.asarray(border_value, np.float64).reshape(-1)[0]
            if dtype.kind in "ui":
                info = np.iinfo(dtype)
                pad_val = int(np.clip(np.rint(v), info.min, info.max))
            else:
                pad_val = v
    else:
        pad_val = 0

    # No Pallas tier here by measurement: XLA fuses the log-doubling
    # min/max chain into ~one pass (1.9 ms vs 2.6 ms for a VMEM kernel
    # at 5x5 1080p batch 32 — Mosaic lacks u8 vector min/max, forcing
    # int32 widening).  See kernels/README.md.
    op = jnp.minimum if is_erode else jnp.maximum

    def slide(v, k, axis):
        # exact sliding min/max by window doubling: ceil(log2 k) shifted
        # combines per axis (XLA's 2-D reduce_window costs kh*kw
        # comparisons per pixel and measured ~3x slower at 5x5)
        covered = 1
        while covered < k:
            s = min(covered, k - covered)
            lo = [slice(None)] * 4
            hi = [slice(None)] * 4
            lo[axis] = slice(0, v.shape[axis] - s)
            hi[axis] = slice(s, None)
            v = op(v[tuple(lo)], v[tuple(hi)])
            covered += s
        return v

    def one_pass(xx):
        xp = pad_nhwc(xx, ay, kh - 1 - ay, ax, kw - 1 - ax, border_type,
                      pad_val)
        H, W = xx.shape[1], xx.shape[2]
        if is_rect:
            return slide(slide(xp, kw, 2), kh, 1)
        acc = None
        for j in range(kh):
            for i in range(kw):
                if kernel[j, i]:
                    s = xp[:, j:j + H, i:i + W, :]
                    acc = s if acc is None else op(acc, s)
        return acc

    y = x
    for _ in range(max(iterations, 1)):
        y = one_pass(y)
    return y


def erode(src, kernel=None, anchor=(-1, -1), iterations: int = 1,
          borderType: int = K.BORDER_CONSTANT, borderValue=None):
    x, meta = to_batched(src)
    y = _morph_op(x, kernel, anchor, iterations, borderType, borderValue,
                  is_erode=True)
    return from_batched(y, meta)


def dilate(src, kernel=None, anchor=(-1, -1), iterations: int = 1,
           borderType: int = K.BORDER_CONSTANT, borderValue=None):
    x, meta = to_batched(src)
    y = _morph_op(x, kernel, anchor, iterations, borderType, borderValue,
                  is_erode=False)
    return from_batched(y, meta)


def morphologyEx(src, op: int, kernel, anchor=(-1, -1), iterations: int = 1,
                 borderType: int = K.BORDER_CONSTANT, borderValue=None):
    """Compound ops (morph.dispatch.cpp:935,1012)."""
    a = dict(anchor=anchor, iterations=iterations, borderType=borderType,
             borderValue=borderValue)
    if op == K.MORPH_ERODE:
        return erode(src, kernel, **a)
    if op == K.MORPH_DILATE:
        return dilate(src, kernel, **a)
    if op == K.MORPH_OPEN:
        return dilate(erode(src, kernel, **a), kernel, **a)
    if op == K.MORPH_CLOSE:
        return erode(dilate(src, kernel, **a), kernel, **a)
    x, meta = to_batched(src)
    if op == K.MORPH_GRADIENT:
        d = _morph_op(x, kernel, anchor, iterations, borderType, borderValue, False)
        e = _morph_op(x, kernel, anchor, iterations, borderType, borderValue, True)
        y = d - e
        return from_batched(y, meta)
    if op == K.MORPH_TOPHAT:
        o, _ = to_batched(morphologyEx(src, K.MORPH_OPEN, kernel, **a))
        return from_batched(x - o, meta)
    if op == K.MORPH_BLACKHAT:
        c, _ = to_batched(morphologyEx(src, K.MORPH_CLOSE, kernel, **a))
        return from_batched(c - x, meta)
    if op == K.MORPH_HITMISS:
        kern = np.asarray(kernel, np.int64)
        e1 = _morph_op(x, (kern == 1).astype(np.uint8), anchor, 1,
                       borderType, borderValue, True)
        info = np.iinfo(np.dtype(x.dtype)) if x.dtype.kind in "ui" else None
        inv = (info.max - x) if info else -x
        e2 = _morph_op(inv, (kern == -1).astype(np.uint8), anchor, 1,
                       borderType, borderValue, True)
        y = jnp.minimum(e1, e2)
        return from_batched(y, meta)
    raise ValueError(f"unknown morphology op {op}")
