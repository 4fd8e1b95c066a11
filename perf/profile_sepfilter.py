"""Decompose the sepfilter pipeline cost on the real TPU.

Isolates: (1) full GaussianBlur, (2) Pallas kernel on pre-padded input,
(3) border-build alone, (4) a copy-only kernel with the same grid/DMA
shape (grid+DMA floor), (5) XLA-tier blur, (6) device-to-device copy
(HBM roofline floor).
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

import opencv_tpu as cv
from opencv_tpu.kernels.sepfilter import sep_filter_u8, _TH, _TW, _round_up


def sync(x):
    float(jnp.max(jnp.asarray(x).astype(jnp.float32)))


def timeit(name, fn, *args, iters=8, npix=None):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    line = f"{name:38s} {dt*1e3:8.2f} ms"
    if npix:
        line += f"  {npix/dt/1e9:8.2f} Gpix/s"
    print(line, flush=True)
    return dt


def main():
    B = int(os.environ.get("B", "32"))
    H, W = 1080, 1920
    rng = np.random.default_rng(0)
    npix = B * H * W

    gray = jax.device_put(rng.integers(0, 256, (B, H, W, 1), np.uint8))
    bgr = jax.device_put(rng.integers(0, 256, (B, H, W, 3), np.uint8))
    sync(gray); sync(bgr)

    from opencv_tpu.ops.smooth import (gaussian_kernel_bitexact,
                                       gaussian_kernel_fixedpoint_ed)
    kxf = gaussian_kernel_bitexact(5, 0.0)
    kx = tuple(int(v) for v in gaussian_kernel_fixedpoint_ed(kxf, 8))

    # (6) HBM roofline floor: pure device copy
    timeit("copy u8 (roofline floor)",
           jax.jit(lambda x: x + jnp.uint8(0)), gray, npix=npix)

    # (1) full GaussianBlur (Pallas on TPU by default)
    timeit("GaussianBlur 5x5 gray (full)",
           jax.jit(lambda x: cv.GaussianBlur(x, (5, 5), 0)), gray, npix=npix)

    # cfg1 chain
    timeit("cvtColor+Gauss (cfg1)",
           jax.jit(lambda x: cv.GaussianBlur(
               cv.cvtColor(x, cv.COLOR_BGR2GRAY), (5, 5), 0)), bgr,
           npix=npix)

    timeit("cvtColor alone",
           jax.jit(lambda x: cv.cvtColor(x, cv.COLOR_BGR2GRAY)), bgr,
           npix=npix)

    # (5) XLA tier blur
    os.environ["OPENCV_TPU_PALLAS"] = "0"
    timeit("GaussianBlur XLA tier",
           jax.jit(lambda x: cv.GaussianBlur(x, (5, 5), 0)), gray, npix=npix)
    os.environ["OPENCV_TPU_PALLAS"] = "1"

    # (2) Pallas kernel on PRE-padded flat input: isolate the border cost.
    # Build the padded buffer once outside the timed region.
    N, Hh, Ww, C = gray.shape
    kw = kh = 5
    Wf = Ww * C
    Hp = _round_up(Hh, _TH)
    Wp = _round_up(Wf, _TW)
    ih = _TH + _round_up(kh - 1, 8)
    iw = _TW + _round_up((kw - 1) * C, 128)

    timeit("sep_filter_u8 (incl border build)",
           jax.jit(lambda x: sep_filter_u8(x, kx, kx, 16)), gray, npix=npix)

    # (3) border+align build alone (the host-side prep inside the jit)
    from opencv_tpu.core.borders import _axis_pad, border_index
    import opencv_tpu.constants as K

    def border_build(x):
        ax = ay = 2
        bt = K.BORDER_REFLECT_101
        pad_h_extra = Hp + ih - _TH - (Hh + kh - 1)
        xp = _axis_pad(x, ay, kh - 1 - ay, 1, bt, Hh, extra=pad_h_extra)
        xf = xp.reshape(N, xp.shape[1], Wf)
        cidx = border_index(Ww, ax, kw - 1 - ax, bt)
        ar = np.arange(C)
        left_idx = (cidx[:ax, None] * C + ar).ravel()
        right_idx = (cidx[ax + Ww:, None] * C + ar).ravel()
        extra_w = Wp + iw - _TW - (Wf + (kw - 1) * C)
        right_idx = np.append(right_idx, np.full(extra_w, Wf - 1, np.int64))
        parts = [jnp.take(xf, jnp.asarray(left_idx, jnp.int32), axis=2), xf,
                 jnp.take(xf, jnp.asarray(right_idx, jnp.int32), axis=2)]
        return jnp.concatenate(parts, axis=2)

    bb = jax.jit(border_build)
    timeit("border build alone", bb, gray, npix=npix)

    print("done", flush=True)


if __name__ == "__main__":
    main()
