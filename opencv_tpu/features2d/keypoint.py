"""KeyPoint container + KeyPointsFilter utilities
(features2d/src/keypoint.cpp).

TPU-native: detector kernels produce fixed-capacity (score, mask) tensors;
this module is the host-side bridge to the cv2 KeyPoint API.
"""

from __future__ import annotations

import numpy as np

__all__ = ["KeyPoint", "retain_best", "run_by_image_border"]


class KeyPoint:
    """cv2.KeyPoint-compatible plain container."""

    __slots__ = ("pt", "size", "angle", "response", "octave",
                 "class_id", "_oct_pos", "_scl_octv")

    def __init__(self, x=0.0, y=0.0, size=0.0, angle=-1.0, response=0.0,
                 octave=0, class_id=-1):
        self.pt = (float(x), float(y))
        self.size = float(size)
        self.angle = float(angle)
        self.response = float(response)
        self.octave = int(octave)
        self.class_id = int(class_id)

    def __repr__(self):
        return (f"KeyPoint(pt={self.pt}, size={self.size}, "
                f"angle={self.angle}, response={self.response}, "
                f"octave={self.octave})")


def retain_best(kps: list, n_points: int) -> list:
    """KeyPointsFilter::retainBest (keypoint.cpp): keep the n strongest;
    ties at the cut response are ALL kept (the reference nth_elements then
    extends over equal responses)."""
    if n_points >= len(kps) or n_points <= 0:
        return kps
    kps = sorted(kps, key=lambda k: -k.response)
    cut = kps[n_points - 1].response
    out = [k for k in kps if k.response > cut]
    out += [k for k in kps if k.response == cut]
    return out


def run_by_image_border(kps: list, size, border: int) -> list:
    """KeyPointsFilter::runByImageBorder."""
    w, h = size
    return [k for k in kps
            if border <= k.pt[0] < w - border and border <= k.pt[1] < h - border]
