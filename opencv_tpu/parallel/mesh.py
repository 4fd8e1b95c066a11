"""Multi-chip scaling: batch data-parallelism and spatial sharding.

The reference is a single-process shared-memory library whose only parallel
primitive is `parallel_for_` over row stripes (`core/src/parallel.cpp:552`).
The TPU-native replacement (SURVEY §2.4):

- **Batch DP**: a `jax.sharding.Mesh` with a `"data"` axis; image batches
  are sharded over it and every op in this library runs SPMD with zero
  communication (all ops are per-image).
- **Spatial sharding (SP)**: for frames larger than one chip's appetite,
  the H axis is sharded over a `"sp"` axis and stencil ops exchange halo
  rows with `jax.lax.ppermute` over ICI inside `shard_map` — the
  TPU-native analogue of FilterEngine's streamed row bands
  (`imgproc/src/filterengine.hpp:214`) and G-API Fluid's line-synchronous
  islands (`gapi/src/backends/fluid/gfluidbuffer_priv.hpp:277`).
- **Pipeline fusion**: `pipeline(fn)` jit-compiles a whole user pipeline
  into ONE XLA program — the role G-API's graph compiler plays
  (`gapi/src/compiler/gcompiler.cpp:220`), done natively by tracing.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "pipeline", "sharded_pipeline",
           "spatial_gaussian_blur", "spatial_sep_filter",
           "sharded_min_max", "sharded_hist", "sharded_otsu"]


def make_mesh(n_data: int = None, n_sp: int = 1, devices=None) -> Mesh:
    """Build a ("data", "sp") mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_sp
    devs = np.asarray(devices[:n_data * n_sp]).reshape(n_data, n_sp)
    return Mesh(devs, ("data", "sp"))


def shard_batch(x, mesh: Mesh):
    """Place an (N, H, W, C) batch with N sharded over the "data" axis."""
    return jax.device_put(x, NamedSharding(mesh, P("data")))


def pipeline(fn):
    """jit a whole image pipeline into one XLA program (G-API analogue)."""
    return jax.jit(fn)


def sharded_pipeline(fn, mesh: Mesh):
    """jit `fn` with inputs/outputs batch-sharded over the mesh's data
    axis.  Ops in this library are per-image, so XLA inserts no
    collectives — pure data parallelism over ICI-connected chips."""
    spec = NamedSharding(mesh, P("data"))

    @functools.wraps(fn)
    def wrapped(*args):
        args = tuple(jax.device_put(a, spec) if hasattr(a, "ndim") and a.ndim == 4
                     else a for a in args)
        return jax.jit(fn, in_shardings=spec, out_shardings=spec)(*args)

    return wrapped


def _halo_exchange_rows(x, halo: int, axis_name: str):
    """Exchange `halo` boundary rows with ring neighbors over ICI.

    x: (N, H_local, W, C) shard. Returns x extended with received halo
    rows: (N, H_local + 2*halo, W, C); outermost shards receive zeros
    (callers handle true image borders globally before sharding).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top_rows = x[:, :halo]          # my first rows → previous neighbor's bottom halo
    bot_rows = x[:, -halo:]         # my last rows → next neighbor's top halo
    # send bottom rows down the ring (shard i → i+1)
    recv_top = jax.lax.ppermute(bot_rows, axis_name,
                                [(i, (i + 1) % n) for i in range(n)])
    # send top rows up the ring (shard i → i-1)
    recv_bot = jax.lax.ppermute(top_rows, axis_name,
                                [(i, (i - 1) % n) for i in range(n)])
    # zero out wrapped halos at the outer edges
    recv_top = jnp.where(idx == 0, jnp.zeros_like(recv_top), recv_top)
    recv_bot = jnp.where(idx == n - 1, jnp.zeros_like(recv_bot), recv_bot)
    return jnp.concatenate([recv_top, x, recv_bot], axis=1)


def _halo_exchange_bordered(x, halo: int, axis_name: str, border_type: int,
                            H_global: int, border_value=0):
    """Halo exchange honoring the global image border semantics.

    x: (N, H_local, W, C) int32 shard of an H-sharded image.  Interior
    shards receive true neighbor rows via ppermute; the outermost shards
    synthesize their outer halo from the reference border rule
    (`cv::borderInterpolate`, core/src/copy.cpp:748) applied to the GLOBAL
    image — those source rows always live in the edge shard itself for
    halo ≤ H_local, so no extra communication is needed.  BORDER_WRAP is
    exactly the ppermute ring wraparound.
    """
    from ..core.borders import border_interpolate
    from .. import constants as K

    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    H_local = x.shape[1]
    bt = border_type & ~K.BORDER_ISOLATED

    top_rows = x[:, :halo]
    bot_rows = x[:, -halo:]
    recv_top = jax.lax.ppermute(bot_rows, axis_name,
                                [(i, (i + 1) % n) for i in range(n)])
    recv_bot = jax.lax.ppermute(top_rows, axis_name,
                                [(i, (i - 1) % n) for i in range(n)])

    if bt == K.BORDER_WRAP:
        pass  # ring wraparound IS the wrap border
    elif bt == K.BORDER_CONSTANT:
        fill = jnp.full_like(recv_top, border_value)
        recv_top = jnp.where(idx == 0, fill, recv_top)
        recv_bot = jnp.where(idx == n - 1, fill, recv_bot)
    else:
        # REPLICATE / REFLECT / REFLECT_101: global border rows -halo..-1
        # map to global rows that the first shard owns (and symmetrically
        # for the last shard) — gather them locally, select per shard.
        ti = [border_interpolate(j, H_global, bt) for j in range(-halo, 0)]
        bi = [border_interpolate(H_global + j, H_global, bt) - (H_global - H_local)
              for j in range(halo)]
        assert max(ti) < H_local and min(bi) >= 0, \
            "halo larger than shard height"
        loc_top = x[:, jnp.asarray(np.asarray(ti, np.int32))]
        loc_bot = x[:, jnp.asarray(np.asarray(bi, np.int32))]
        recv_top = jnp.where(idx == 0, loc_top, recv_top)
        recv_bot = jnp.where(idx == n - 1, loc_bot, recv_bot)
    return jnp.concatenate([recv_top, x, recv_bot], axis=1)


def spatial_sep_filter(imgs, ksize, sigma, mesh: Mesh, border=None):
    """Bit-exact Gaussian/separable filtering with H sharded over "sp",
    honoring all 5 border modes at the global image edges.

    The generic SP path: ppermute halo exchange for interior seams,
    reference `borderInterpolate` semantics at the outer edges, then the
    same Q8 fixed-point separable kernel as the single-chip path
    (`GaussianBlurFixedPoint`, smooth.dispatch.cpp:720).
    """
    from ..ops.filter import gaussian_kernel_bitexact, gaussian_kernel_fixedpoint_ed
    from ..core.borders import pad_nhwc
    from .. import constants as K
    from jax import shard_map

    if border is None:
        border = K.BORDER_DEFAULT
    kw, kh = ksize
    kq_x = gaussian_kernel_fixedpoint_ed(gaussian_kernel_bitexact(kw, sigma), 8)
    kq_y = (kq_x if kh == kw else
            gaussian_kernel_fixedpoint_ed(gaussian_kernel_bitexact(kh, sigma), 8))
    r = kh // 2
    rx = kw // 2
    H_global = imgs.shape[1]
    n_sp = mesh.shape["sp"]

    def local(x):
        xi = x.astype(jnp.int32)
        xh = _halo_exchange_bordered(xi, r, "sp", border, H_global)
        # horizontal pass: W is unsharded, pad with the true border rule
        xp = pad_nhwc(xh, 0, 0, rx, rx, border)
        W = x.shape[2]
        h = None
        for i, c in enumerate(kq_x):
            t = xp[:, :, i:i + W, :] * int(c)
            h = t if h is None else h + t
        Hl = x.shape[1]
        v = None
        for j, c in enumerate(kq_y):
            t = h[:, j:j + Hl, :, :] * int(c)
            v = t if v is None else v + t
        out = (v + (1 << 15)) >> 16
        return jnp.clip(out, 0, 255).astype(jnp.uint8)

    fn = shard_map(local, mesh=mesh,
                   in_specs=P("data", "sp"), out_specs=P("data", "sp"))
    return jax.jit(fn)(imgs)


def _psum_all(v, mesh: Mesh):
    """psum a per-shard value over every mesh axis."""
    return jax.lax.psum(jax.lax.psum(v, "sp"), "data")


def sharded_min_max(imgs, mesh: Mesh):
    """Global min/max of a sharded batch via pmin/pmax collectives — the
    sharded analogue of `cv::minMaxLoc` global reduction."""
    from jax import shard_map

    def local(x):
        mn = jax.lax.pmin(jax.lax.pmin(jnp.min(x), "sp"), "data")
        mx = jax.lax.pmax(jax.lax.pmax(jnp.max(x), "sp"), "data")
        return mn[None], mx[None]

    fn = shard_map(local, mesh=mesh,
                   in_specs=P("data", "sp"),
                   out_specs=(P(), P()))
    mn, mx = jax.jit(fn)(imgs)
    return mn[0], mx[0]


def sharded_hist(imgs, mesh: Mesh):
    """256-bin histogram of a sharded u8 batch via psum — the collective
    backbone for sharded Otsu / equalizeHist / calcHist."""
    from jax import shard_map

    def local(x):
        h = jnp.bincount(x.reshape(-1).astype(jnp.int32), length=256)
        return _psum_all(h, mesh)

    fn = shard_map(local, mesh=mesh, in_specs=P("data", "sp"), out_specs=P())
    return jax.jit(fn)(imgs)


def sharded_otsu(imgs, mesh: Mesh):
    """Otsu threshold of a sharded u8 batch: psum histogram + the exact
    reference scan (thresh.cpp getThreshVal_Otsu_8u)."""
    hist = sharded_hist(imgs, mesh).astype(jnp.float32)
    N = float(np.prod([imgs.shape[0], imgs.shape[1], imgs.shape[2],
                       imgs.shape[3]]))
    scale = 1.0 / N
    i = jnp.arange(256, dtype=jnp.float32)
    p = hist * scale
    mu = jnp.sum(i * p)
    q1 = jnp.cumsum(p)
    mu1s = jnp.cumsum(i * p)
    q2 = 1.0 - q1
    valid = (jnp.minimum(q1, q2) >= np.finfo(np.float32).eps)
    mu1 = jnp.where(q1 > 0, mu1s / q1, 0.0)
    mu2 = jnp.where(q2 > 0, (mu - mu1s) / q2, 0.0)
    sigma = jnp.where(valid, q1 * q2 * (mu1 - mu2) ** 2, -1.0)
    return jnp.argmax(sigma).astype(jnp.float32)


def spatial_gaussian_blur(imgs, ksize, sigma, mesh: Mesh):
    """GaussianBlur with H sharded over the mesh's "sp" axis.

    Demonstrates the SP strategy: pad the full image once on the host
    border, shard rows, exchange halos via ppermute, and run the same
    bit-exact separable kernel per shard.  Bit-exact with the single-chip
    path for BORDER_CONSTANT(0) borders.
    """
    from ..ops.filter import gaussian_kernel_bitexact, gaussian_kernel_fixedpoint_ed
    from jax import shard_map

    kw, kh = ksize
    kf = gaussian_kernel_bitexact(kw, sigma)
    kq = gaussian_kernel_fixedpoint_ed(kf, 8)
    r = kh // 2

    def local(x):
        xh = _halo_exchange_rows(x.astype(jnp.int32), r, "sp")
        # horizontal pass with zero columns at W borders
        xp = jnp.pad(xh, ((0, 0), (0, 0), (r, r), (0, 0)))
        W = x.shape[2]
        h = None
        for i, c in enumerate(kq):
            t = xp[:, :, i:i + W, :] * int(c)
            h = t if h is None else h + t
        Hl = x.shape[1]
        v = None
        for j, c in enumerate(kq):
            t = h[:, j:j + Hl, :, :] * int(c)
            v = t if v is None else v + t
        out = (v + (1 << 15)) >> 16
        return jnp.clip(out, 0, 255).astype(jnp.uint8)

    fn = shard_map(local, mesh=mesh,
                   in_specs=P("data", "sp"), out_specs=P("data", "sp"))
    return jax.jit(fn)(imgs)
