"""cv::applyColorMap (imgproc/src/colormap.cpp): 22 colormaps + user
LUTs.

The 256x3 BGR tables are normative constants snapshotted once from the
reference build (`colormap_luts.npz`, the aruco_dicts.npz precedent) —
the procedural maps (autumn/jet/...) are linear interpolations of anchor
arrays and the perceptual ones (viridis/turbo/...) are hardcoded tables
in colormap.cpp, so the 256-entry LUT IS the spec.  Application is one
gather-free LUT select on device for u8 inputs.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from .. import constants as K
from ..core.arrays import to_batched, from_batched

__all__ = ["applyColorMap"]

_LUTS = None


def _luts():
    global _LUTS
    if _LUTS is None:
        path = os.path.join(os.path.dirname(__file__), "colormap_luts.npz")
        z = np.load(path)
        _LUTS = {int(k): z[k] for k in z.files}
    return _LUTS


def applyColorMap(src, colormap):
    """`cv::applyColorMap`.  `colormap` is a COLORMAP_* id or a user
    (256, 1, 3)/(256, 3) u8 LUT.  BGR input is first converted to gray
    exactly as the reference does (colormap.cpp ColorMap::operator())."""
    if isinstance(colormap, (int, np.integer)):
        lut = _luts().get(int(colormap))
        if lut is None:
            raise ValueError(f"unknown colormap id {colormap}")
    else:
        lut = np.asarray(colormap, np.uint8).reshape(256, -1)
        if lut.shape[1] == 1:
            lut = np.repeat(lut, 3, axis=1)
    x, meta = to_batched(src)
    if x.shape[3] == 3:
        from .color import cvtColor
        g4, _ = to_batched(cvtColor(from_batched(x, meta), K.COLOR_BGR2GRAY))
        x = g4
    idx = x[..., 0].astype(jnp.int32)
    table = jnp.asarray(lut)                      # (256, 3)
    out = jnp.take(table, idx, axis=0)            # (N, H, W, 3)
    return from_batched(out.astype(jnp.uint8), meta)
