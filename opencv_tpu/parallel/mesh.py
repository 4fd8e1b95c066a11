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
           "spatial_gaussian_blur"]


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
