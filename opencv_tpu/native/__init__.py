"""Native host-tail library: lazy g++ build + ctypes bindings.

The compute path is JAX/XLA/Pallas; this .so implements the sequential
host algorithms around it (Suzuki-Abe contours, flood fill).  Falls back
to the pure-Python implementations when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "hosttails.cpp")
_LIB = None
_TRIED = False


def _build() -> str | None:
    out = os.path.join(_DIR, "_hosttails.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(_SRC):
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", out],
            check=True, capture_output=True, timeout=120)
        return out
    except Exception:
        return None


def get_lib():
    """ctypes handle to the native library, or None (fallback to Python)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.suzuki_contours.restype = ctypes.c_int
        lib.suzuki_contours.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32,
        ]
        lib.flood_fill_u8.restype = ctypes.c_int64
        lib.flood_fill_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint8,
            ctypes.c_void_p,
        ]
        lib.ebcot_t1_decode.restype = ctypes.c_int
        lib.ebcot_t1_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.ebcot_t1_encode.restype = ctypes.c_int
        lib.ebcot_t1_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.hfyu_decode_syms.restype = ctypes.c_int
        lib.hfyu_decode_syms.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
            ctypes.c_long, ctypes.c_void_p,
        ]
        lib.hfyu_encode_syms.restype = ctypes.c_long
        lib.hfyu_encode_syms.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_long,
        ]
        lib.crc32_msb.restype = ctypes.c_uint32
        lib.crc32_msb.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_uint32]
        lib.ffv1_decode_slice.restype = ctypes.c_int64
        lib.ffv1_decode_slice.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.ffv1_encode_slice.restype = ctypes.c_int64
        lib.ffv1_encode_slice.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def suzuki_contours(binary: np.ndarray):
    """Run the native contour scan; returns (list_of_point_arrays,
    parents, is_outer) or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    f = np.ascontiguousarray((binary != 0).astype(np.uint8))
    H, W = f.shape
    max_pts = max(4 * H * W, 1024)
    max_ctrs = max(H * W // 2, 64)
    pts = np.empty((max_pts, 2), np.int32)
    starts = np.empty(max_ctrs + 1, np.int32)
    parents = np.empty(max_ctrs, np.int32)
    is_outer = np.empty(max_ctrs, np.uint8)
    n = lib.suzuki_contours(
        f.ctypes.data, H, W,
        pts.ctypes.data, max_pts,
        starts.ctypes.data, parents.ctypes.data, is_outer.ctypes.data,
        max_ctrs)
    if n < 0:
        return None
    out = [pts[starts[i]:starts[i + 1]].copy() for i in range(n)]
    return out, parents[:n].copy(), is_outer[:n].astype(bool)


def flood_fill(img: np.ndarray, mask: np.ndarray, seed, new_val,
               lo, up, conn: int, fixed_range: bool, mask_only: bool,
               mask_val: int):
    """Native flood fill; mutates img/mask in place. Returns (count, rect)
    or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    a = img if img.flags.c_contiguous else np.ascontiguousarray(img)
    C = a.shape[2] if a.ndim == 3 else 1
    nv = np.asarray(new_val, np.uint8).reshape(-1)[:C].copy()
    if len(nv) < C:
        nv = np.resize(nv, C)
    lo = np.asarray(lo, np.float64).reshape(-1)[:C].copy()
    up = np.asarray(up, np.float64).reshape(-1)[:C].copy()
    if len(lo) < C:
        lo = np.resize(lo, C)
    if len(up) < C:
        up = np.resize(up, C)
    rect = np.zeros(4, np.int32)
    count = lib.flood_fill_u8(
        a.ctypes.data, mask.ctypes.data, a.shape[0], a.shape[1], C,
        int(seed[0]), int(seed[1]), nv.ctypes.data,
        lo.ctypes.data, up.ctypes.data, conn,
        1 if fixed_range else 0, 1 if mask_only else 0, mask_val,
        rect.ctypes.data)
    if a is not img:
        img[...] = a
    return int(count), tuple(int(v) for v in rect)


def mser_detect(img: np.ndarray, delta=5, min_area=60, max_area=14400,
                max_variation=0.25, min_diversity=0.2, max_out=4096):
    """Run native MSER on one polarity; returns (seeds, levels) arrays
    or None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    if not hasattr(lib, "_mser_ready"):
        lib.mser_detect.restype = ctypes.c_int
        lib.mser_detect.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib._mser_ready = True
    img = np.ascontiguousarray(img, np.uint8)
    H, W = img.shape
    seeds = np.zeros(max_out, np.int32)
    levels = np.zeros(max_out, np.int32)
    n = lib.mser_detect(img.ctypes.data, H, W, int(delta), int(min_area),
                        int(max_area), float(max_variation),
                        float(min_diversity),
                        seeds.ctypes.data, levels.ctypes.data, max_out)
    return seeds[:n], levels[:n]


def maxflow_grid(srcw, snkw, leftw, upleftw, upw, uprightw):
    """GrabCut grid min-cut; returns fg mask (H, W) bool or None when
    the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    if not hasattr(lib, "_mf_ready"):
        lib.maxflow_grid.restype = ctypes.c_double
        lib.maxflow_grid.argtypes = [ctypes.c_int, ctypes.c_int] \
            + [ctypes.c_void_p] * 7
        lib._mf_ready = True
    H, W = srcw.shape
    arrs = [np.ascontiguousarray(a, np.float64)
            for a in (srcw, snkw, leftw, upleftw, upw, uprightw)]
    out = np.zeros((H, W), np.uint8)
    lib.maxflow_grid(H, W, *(a.ctypes.data for a in arrs), out.ctypes.data)
    return out.astype(bool)


def _ensure_jpeg_sigs(lib):
    if hasattr(lib, "_jpg_ready"):
        return
    lib.jpeg_decode_blocks.restype = ctypes.c_longlong
    lib.jpeg_decode_blocks.argtypes = [
        ctypes.c_void_p, ctypes.c_longlong, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.jpeg_encode_blocks.restype = ctypes.c_longlong
    lib.jpeg_encode_blocks.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
    ]
    lib._jpg_ready = True


def jpeg_decode_blocks(data: bytes, comp_h, comp_v, scan_ci, scan_td,
                       scan_ta, mcux, mcuy, dri, dc_tables, ac_tables,
                       comp_dims):
    """Native baseline-JPEG entropy decode.  dc/ac_tables: list of up to 4
    (bits, values) pairs (None entries allowed); comp_dims: per-component
    (bh, bw) block-grid dims.  Returns list of (bh, bw, 64) int32 arrays
    in ZIGZAG coefficient order, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    _ensure_jpeg_sigs(lib)

    def pack_tables(tabs, n):
        bits = np.zeros((n, 16), np.uint8)
        vals = np.zeros((n, 256), np.uint8)
        for i, t in enumerate(tabs[:n]):
            if t is None:
                continue
            b, v = t
            bits[i, :len(b)] = b
            vals[i, :len(v)] = v
        return bits, vals

    dcb, dcv = pack_tables(dc_tables, 4)
    acb, acv = pack_tables(ac_tables, 4)
    ncomp = len(comp_h)
    offs = np.zeros(ncomp, np.int64)
    total = 0
    for ci, (bh, bw) in enumerate(comp_dims):
        offs[ci] = total
        total += bh * bw * 64
    coeff = np.zeros(total, np.int32)
    ch = np.asarray(comp_h, np.int32)
    cv_ = np.asarray(comp_v, np.int32)
    sci = np.asarray(scan_ci, np.int32)
    std = np.asarray(scan_td, np.int32)
    sta = np.asarray(scan_ta, np.int32)
    buf = np.frombuffer(data, np.uint8)
    rc = lib.jpeg_decode_blocks(
        buf.ctypes.data, len(buf), ncomp,
        ch.ctypes.data, cv_.ctypes.data,
        sci.ctypes.data, std.ctypes.data, sta.ctypes.data, len(sci),
        mcux, mcuy, dri,
        dcb.ctypes.data, dcv.ctypes.data,
        acb.ctypes.data, acv.ctypes.data,
        coeff.ctypes.data, offs.ctypes.data)
    if rc != 0:
        return None
    return [coeff[offs[ci]:offs[ci] + bh * bw * 64].reshape(bh, bw, 64)
            for ci, (bh, bw) in enumerate(comp_dims)]


def jpeg_encode_blocks(qcoef, comp_h, comp_v, comp_tq, mcux, mcuy,
                       dc_tables, ac_tables):
    """Native baseline-JPEG entropy encode.  qcoef: per-component
    (bh, bw, 64) int32 zigzag blocks; dc/ac_tables: 2 (bits, values)
    pairs (lum, chr).  Returns the stuffed entropy bytes or None."""
    lib = get_lib()
    if lib is None:
        return None
    _ensure_jpeg_sigs(lib)
    ncomp = len(qcoef)
    offs = np.zeros(ncomp, np.int64)
    total = 0
    for ci, q in enumerate(qcoef):
        offs[ci] = total
        total += q.size
    coeff = np.concatenate([np.ascontiguousarray(q, np.int32).reshape(-1)
                            for q in qcoef])

    def pack_tables(tabs):
        bits = np.zeros((2, 16), np.uint8)
        vals = np.zeros((2, 256), np.uint8)
        for i, (b, v) in enumerate(tabs[:2]):
            bits[i, :len(b)] = b
            vals[i, :len(v)] = v
        return bits, vals

    dcb, dcv = pack_tables(dc_tables)
    acb, acv = pack_tables(ac_tables)
    cap = max(total * 4, 1 << 16)
    out = np.empty(cap, np.uint8)
    ch = np.asarray(comp_h, np.int32)
    cv_ = np.asarray(comp_v, np.int32)
    ctq = np.asarray(comp_tq, np.int32)
    n = lib.jpeg_encode_blocks(
        coeff.ctypes.data, offs.ctypes.data, ncomp,
        ch.ctypes.data, cv_.ctypes.data, ctq.ctypes.data,
        mcux, mcuy,
        dcb.ctypes.data, dcv.ctypes.data,
        acb.ctypes.data, acv.ctypes.data,
        out.ctypes.data, cap)
    if n < 0:
        return None
    return bytes(out[:n])


def watershed(img: np.ndarray, markers: np.ndarray):
    """Native marker-controlled watershed (cv::watershed semantics);
    mutates `markers` in place.  Returns False if the native lib is
    unavailable (caller falls back to the Python twin)."""
    lib = get_lib()
    if lib is None:
        return False
    if not getattr(lib, "_ws_sig", False):
        lib.watershed_u8c3.restype = ctypes.c_int
        lib.watershed_u8c3.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        lib._ws_sig = True
    im = np.ascontiguousarray(img, np.uint8)
    assert markers.flags.c_contiguous and markers.dtype == np.int32
    H, W = markers.shape
    lib.watershed_u8c3(im.ctypes.data, markers.ctypes.data, H, W)
    return True
