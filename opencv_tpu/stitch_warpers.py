"""Rotation warpers (modules/stitching/src/warpers.cpp,
include/opencv2/stitching/detail/warpers_inl.hpp).

cv::PyRotationWarper parity: plane / spherical / cylindrical /
fisheye / stereographic / mercator / transverseMercator projectors.
The reference's per-pixel mapBackward loops become vectorized map
construction (numpy math on the full destination grid) feeding the
device remap — the actual pixel pull is the same batched gather the
rest of the warp stack uses on TPU.
"""

from __future__ import annotations

import numpy as np

from .ops.warp import remap as _remap
from . import constants as K

__all__ = ["PyRotationWarper"]


class _Projector:
    """Camera-parameter bookkeeping (warpers.cpp:63
    ProjectorBase::setCameraParams)."""

    def __init__(self, scale):
        self.scale = float(scale)

    def set_camera(self, Km, R, T=None):
        Km = np.asarray(Km, np.float32).reshape(3, 3).astype(np.float64)
        R = np.asarray(R, np.float32).reshape(3, 3).astype(np.float64)
        self.k = Km
        self.rinv = R.T
        self.r_kinv = R @ np.linalg.inv(Km)
        self.k_rinv = Km @ R.T
        self.t = (np.zeros(3) if T is None
                  else np.asarray(T, np.float64).reshape(3))

    def _ray(self, x, y):
        M = self.r_kinv
        x_ = M[0, 0] * x + M[0, 1] * y + M[0, 2]
        y_ = M[1, 0] * x + M[1, 1] * y + M[1, 2]
        z_ = M[2, 0] * x + M[2, 1] * y + M[2, 2]
        return x_, y_, z_

    def _unray(self, x_, y_, z_):
        M = self.k_rinv
        x = M[0, 0] * x_ + M[0, 1] * y_ + M[0, 2] * z_
        y = M[1, 0] * x_ + M[1, 1] * y_ + M[1, 2] * z_
        z = M[2, 0] * x_ + M[2, 1] * y_ + M[2, 2] * z_
        good = z > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            xr = np.where(good, x / z, -1.0)
            yr = np.where(good, y / z, -1.0)
        return xr, yr

    # ROI detection strategy: "full" grid scan, "border", or "corners"
    roi_mode = "full"


class _Plane(_Projector):
    roi_mode = "corners"

    def forward(self, x, y):
        x_, y_, z_ = self._ray(x, y)
        t = self.t
        u = self.scale * (t[0] + x_ / z_ * (1 - t[2]))
        v = self.scale * (t[1] + y_ / z_ * (1 - t[2]))
        return u, v

    def backward(self, u, v):
        t = self.t
        u = u / self.scale - t[0]
        v = v / self.scale - t[1]
        return self._unray(u, v, np.full_like(np.asarray(u, np.float64),
                                              1 - t[2]))


class _Spherical(_Projector):
    roi_mode = "border"

    def forward(self, x, y):
        x_, y_, z_ = self._ray(x, y)
        u = self.scale * np.arctan2(x_, z_)
        w = y_ / np.sqrt(x_ * x_ + y_ * y_ + z_ * z_)
        v = self.scale * (np.pi - np.arccos(np.nan_to_num(
            np.clip(w, -1, 1))))
        return u, v

    def backward(self, u, v):
        u = np.asarray(u, np.float64) / self.scale
        v = np.asarray(v, np.float64) / self.scale
        sinv = np.sin(np.pi - v)
        return self._unray(sinv * np.sin(u), np.cos(np.pi - v),
                           sinv * np.cos(u))


class _Cylindrical(_Projector):
    roi_mode = "border"

    def forward(self, x, y):
        x_, y_, z_ = self._ray(x, y)
        u = self.scale * np.arctan2(x_, z_)
        v = self.scale * y_ / np.sqrt(x_ * x_ + z_ * z_)
        return u, v

    def backward(self, u, v):
        u = np.asarray(u, np.float64) / self.scale
        v = np.asarray(v, np.float64) / self.scale
        return self._unray(np.sin(u), v, np.cos(u))


class _Fisheye(_Projector):
    def forward(self, x, y):
        x_, y_, z_ = self._ray(x, y)
        u_ = np.arctan2(x_, z_)
        w = y_ / np.sqrt(x_ * x_ + y_ * y_ + z_ * z_)
        v_ = np.pi - np.arccos(np.clip(w, -1, 1))
        return self.scale * v_ * np.cos(u_), self.scale * v_ * np.sin(u_)

    def backward(self, u, v):
        u = np.asarray(u, np.float64) / self.scale
        v = np.asarray(v, np.float64) / self.scale
        u_ = np.arctan2(v, u)
        v_ = np.sqrt(u * u + v * v)
        sinv = np.sin(np.pi - v_)
        return self._unray(sinv * np.sin(u_), np.cos(np.pi - v_),
                           sinv * np.cos(u_))


class _Stereographic(_Projector):
    def forward(self, x, y):
        x_, y_, z_ = self._ray(x, y)
        u_ = np.arctan2(x_, z_)
        w = y_ / np.sqrt(x_ * x_ + y_ * y_ + z_ * z_)
        v_ = np.pi - np.arccos(np.clip(w, -1, 1))
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.sin(v_) / (1 - np.cos(v_))
        return self.scale * r * np.cos(u_), self.scale * r * np.sin(u_)

    def backward(self, u, v):
        u = np.asarray(u, np.float64) / self.scale
        v = np.asarray(v, np.float64) / self.scale
        u_ = np.arctan2(v, u)
        r = np.sqrt(u * u + v * v)
        with np.errstate(divide="ignore", invalid="ignore"):
            v_ = 2 * np.arctan(1.0 / r)
        sinv = np.sin(np.pi - v_)
        return self._unray(sinv * np.sin(u_), np.cos(np.pi - v_),
                           sinv * np.cos(u_))


class _Mercator(_Projector):
    def forward(self, x, y):
        x_, y_, z_ = self._ray(x, y)
        u_ = np.arctan2(x_, z_)
        v_ = np.arcsin(np.clip(
            y_ / np.sqrt(x_ * x_ + y_ * y_ + z_ * z_), -1, 1))
        return (self.scale * u_,
                self.scale * np.log(np.tan(np.pi / 4 + v_ / 2)))

    def backward(self, u, v):
        u = np.asarray(u, np.float64) / self.scale
        v = np.asarray(v, np.float64) / self.scale
        v_ = np.arctan(np.sinh(v))
        cosv = np.cos(v_)
        return self._unray(cosv * np.sin(u), np.sin(v_), cosv * np.cos(u))


class _TransverseMercator(_Projector):
    def forward(self, x, y):
        x_, y_, z_ = self._ray(x, y)
        u_ = np.arctan2(x_, z_)
        v_ = np.arcsin(np.clip(
            y_ / np.sqrt(x_ * x_ + y_ * y_ + z_ * z_), -1, 1))
        b = np.cos(v_) * np.sin(u_)
        u = self.scale * 0.5 * np.log((1 + b) / (1 - b))
        v = self.scale * np.arctan2(np.tan(v_), np.cos(u_))
        return u, v

    def backward(self, u, v):
        u = np.asarray(u, np.float64) / self.scale
        v = np.asarray(v, np.float64) / self.scale
        v_ = np.arcsin(np.clip(np.sin(v) / np.cosh(u), -1, 1))
        u_ = np.arctan2(np.sinh(u), np.cos(v))
        cosv = np.cos(v_)
        return self._unray(cosv * np.sin(u_), np.sin(v_),
                           cosv * np.cos(u_))


_WARPERS = {
    "plane": _Plane,
    "spherical": _Spherical,
    "cylindrical": _Cylindrical,
    "fisheye": _Fisheye,
    "stereographic": _Stereographic,
    "mercator": _Mercator,
    "transverseMercator": _TransverseMercator,
    "affine": _Plane,
}


class PyRotationWarper:
    """cv::PyRotationWarper (stitching/include/opencv2/stitching/
    warpers.hpp)."""

    def __init__(self, warp_type="spherical", scale=1.0):
        if warp_type not in _WARPERS:
            raise ValueError(f"unknown warper type {warp_type!r}")
        self.proj = _WARPERS[warp_type](scale)

    def warpPoint(self, pt, Km, R):
        self.proj.set_camera(Km, R)
        u, v = self.proj.forward(float(pt[0]), float(pt[1]))
        return (float(u), float(v))

    def warpPointBackward(self, pt, Km, R):
        self.proj.set_camera(Km, R)
        x, y = self.proj.backward(float(pt[0]), float(pt[1]))
        return (float(x), float(y))

    def _detect_roi(self, src_size, src_h, src_w):
        p = self.proj
        w, h = src_w, src_h
        if p.roi_mode == "corners":
            xs = np.asarray([0.0, w - 1, 0.0, w - 1])
            ys = np.asarray([0.0, 0.0, h - 1, h - 1])
        elif p.roi_mode == "border":
            xs = np.concatenate([np.arange(w, dtype=np.float64),
                                 np.arange(w, dtype=np.float64),
                                 np.zeros(h), np.full(h, w - 1.0)])
            ys = np.concatenate([np.zeros(w), np.full(w, h - 1.0),
                                 np.arange(h, dtype=np.float64),
                                 np.arange(h, dtype=np.float64)])
        else:
            gx, gy = np.meshgrid(np.arange(w, dtype=np.float64),
                                 np.arange(h, dtype=np.float64))
            xs = gx.ravel()
            ys = gy.ravel()
        u, v = p.forward(xs, ys)
        tl_u, tl_v = float(np.min(u)), float(np.min(v))
        br_u, br_v = float(np.max(u)), float(np.max(v))
        if isinstance(p, _Spherical):
            # pole visibility widens the v range to [0, pi*scale]
            # (warpers.cpp:375 SphericalWarper::detectResultRoi)
            for sgn in (1.0, -1.0):
                x, y, z = p.rinv[0, 1], sgn * p.rinv[1, 1], p.rinv[2, 1]
                if y > 0:
                    x_ = (p.k[0, 0] * x + p.k[0, 1] * y) / z + p.k[0, 2]
                    y_ = p.k[1, 1] * y / z + p.k[1, 2]
                    if 0 < x_ < w and 0 < y_ < h:
                        vv = np.pi * p.scale if sgn > 0 else 0.0
                        tl_u = min(tl_u, 0.0)
                        tl_v = min(tl_v, vv)
                        br_u = max(br_u, 0.0)
                        br_v = max(br_v, vv)
        return (int(tl_u), int(tl_v)), (int(br_u), int(br_v))

    def buildMaps(self, src_size, Km, R):
        """Returns (roi, xmap, ymap); roi = (x, y, w, h)."""
        self.proj.set_camera(Km, R)
        w, h = src_size
        (tlx, tly), (brx, bry) = self._detect_roi(src_size, h, w)
        us, vs = np.meshgrid(np.arange(tlx, brx + 1, dtype=np.float64),
                             np.arange(tly, bry + 1, dtype=np.float64))
        x, y = self.proj.backward(us, vs)
        # cv2's buildMaps ROI is Rect(tl, br): width excludes br
        return ((tlx, tly, brx - tlx, bry - tly),
                x.astype(np.float32), y.astype(np.float32))

    def warp(self, src, Km, R, interp_mode=K.INTER_LINEAR,
             border_mode=K.BORDER_CONSTANT):
        src = np.asarray(src)
        h, w = src.shape[:2]
        roi, xmap, ymap = self.buildMaps((w, h), Km, R)
        dst = np.asarray(_remap(src, xmap, ymap, interp_mode,
                                borderMode=border_mode))
        return (roi[0], roi[1]), dst

    def warpBackward(self, src, Km, R, interp_mode, border_mode,
                     dst_size):
        """Inverse warp: from projected image back to camera plane
        (warpers_inl.hpp:113)."""
        self.proj.set_camera(Km, R)
        w, h = dst_size
        (tlx, tly), _ = self._detect_roi(dst_size, h, w)
        gx, gy = np.meshgrid(np.arange(w, dtype=np.float64),
                             np.arange(h, dtype=np.float64))
        u, v = self.proj.forward(gx, gy)
        dst = np.asarray(_remap(np.asarray(src),
                                (u - tlx).astype(np.float32),
                                (v - tly).astype(np.float32),
                                interp_mode, borderMode=border_mode))
        return dst

    def warpRoi(self, src_size, Km, R):
        self.proj.set_camera(Km, R)
        w, h = src_size
        (tlx, tly), (brx, bry) = self._detect_roi(src_size, h, w)
        return (tlx, tly, brx - tlx + 1, bry - tly + 1)

    def getScale(self):
        return self.proj.scale

    def setScale(self, s):
        self.proj.scale = float(s)
