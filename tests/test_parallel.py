"""Mesh / sharding tests on a virtual 8-device CPU mesh.

Each scenario runs in a SUBPROCESS with `JAX_PLATFORMS=cpu` and
`--xla_force_host_platform_device_count=8` forced in the environment
before the interpreter starts, so they execute (never skip) regardless of
which jax backend the host process initialized — including the 1-chip
bench machine where the axon TPU plugin wins backend discovery.
"""

import os
import subprocess
import sys

import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_worker(name):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), name],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (
        f"worker {name} failed\n--- stdout ---\n{r.stdout[-4000:]}"
        f"\n--- stderr ---\n{r.stderr[-4000:]}")


def test_batch_dp_pipeline():
    _run_worker("batch_dp")


def test_spatial_sharding_halo_exchange():
    _run_worker("spatial_halo")


def test_spatial_sharding_border_modes():
    _run_worker("spatial_borders")


def test_sharded_global_reductions():
    _run_worker("global_reductions")


def test_graft_entry_dryrun():
    _run_worker("dryrun")


def test_graft_entry_compiles():
    sys.path.insert(0, REPO)
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[0].shape[0]


# ---------------------------------------------------------------- workers

def _w_batch_dp():
    import numpy as np
    import cv2
    import opencv_tpu as tcv
    from opencv_tpu.parallel import make_mesh, sharded_pipeline

    mesh = make_mesh(n_data=8, n_sp=1)
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, size=(16, 64, 96, 3), dtype=np.uint8)

    def pipe(imgs):
        g = tcv.cvtColor(imgs, tcv.COLOR_BGR2GRAY)
        return tcv.GaussianBlur(g, (5, 5), 1.2)

    out = np.asarray(sharded_pipeline(pipe, mesh)(batch))
    for i in [0, 7, 15]:
        ref = cv2.GaussianBlur(cv2.cvtColor(batch[i], cv2.COLOR_BGR2GRAY),
                               (5, 5), 1.2)
        assert (out[i, :, :, 0] == ref).all(), f"img {i} not bit-exact"


def _w_spatial_halo():
    import numpy as np
    import cv2
    from opencv_tpu.parallel import make_mesh, spatial_gaussian_blur

    mesh = make_mesh(n_data=2, n_sp=4)
    rng = np.random.default_rng(1)
    batch = rng.integers(0, 256, size=(4, 128, 64, 1), dtype=np.uint8)
    out = np.asarray(spatial_gaussian_blur(batch, (5, 5), 1.5, mesh))
    for i in range(4):
        ref = cv2.GaussianBlur(batch[i], (5, 5), 1.5,
                               borderType=cv2.BORDER_CONSTANT)
        assert (out[i, :, :, 0] == ref).all(), f"img {i} not bit-exact"


def _w_spatial_borders():
    """Spatial sharding must be bit-exact for every border mode, through
    the generic sharded sepFilter path (not just one Gaussian)."""
    import numpy as np
    import cv2
    from opencv_tpu.parallel import make_mesh, spatial_sep_filter

    mesh = make_mesh(n_data=2, n_sp=4)
    rng = np.random.default_rng(2)
    batch = rng.integers(0, 256, size=(2, 128, 64, 1), dtype=np.uint8)
    modes = [cv2.BORDER_CONSTANT, cv2.BORDER_REPLICATE, cv2.BORDER_REFLECT,
             cv2.BORDER_WRAP, cv2.BORDER_REFLECT_101]
    for bm in modes:
        out = np.asarray(spatial_sep_filter(
            batch, (5, 5), 1.5, mesh, border=bm))
        for i in range(batch.shape[0]):
            ref = cv2.GaussianBlur(batch[i], (5, 5), 1.5, borderType=bm)
            assert (out[i, :, :, 0] == ref).all(), \
                f"img {i} border {bm} not bit-exact"


def _w_global_reductions():
    """psum-based global stats under spatial sharding: minMaxLoc, calcHist
    and Otsu threshold must equal the single-device results."""
    import numpy as np
    import cv2
    from opencv_tpu.parallel import (make_mesh, sharded_min_max,
                                     sharded_hist, sharded_otsu)

    mesh = make_mesh(n_data=2, n_sp=4)
    rng = np.random.default_rng(3)
    batch = rng.integers(0, 256, size=(2, 128, 64, 1), dtype=np.uint8)

    mn, mx = sharded_min_max(batch, mesh)
    assert int(mn) == int(batch.min()) and int(mx) == int(batch.max())

    h = np.asarray(sharded_hist(batch, mesh))
    ref_h = np.bincount(batch.ravel(), minlength=256)
    assert (h == ref_h).all()

    t = sharded_otsu(batch, mesh)
    ref_t, _ = cv2.threshold(batch.reshape(-1, 64), 0, 255,
                             cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    assert abs(float(t) - float(ref_t)) <= 1e-6, (float(t), float(ref_t))


def _w_dryrun():
    sys.path.insert(0, REPO)
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


if __name__ == "__main__":
    # The axon sitecustomize force-updates jax_platforms to "axon,cpu" in
    # every interpreter; override it post-import (env vars alone lose).
    jax.config.update("jax_platforms", "cpu")
    try:
        import jax._src.xla_bridge as _xb
        _xb._backend_factories.pop("axon", None)
    except Exception:
        pass
    {
        "batch_dp": _w_batch_dp,
        "spatial_halo": _w_spatial_halo,
        "spatial_borders": _w_spatial_borders,
        "global_reductions": _w_global_reductions,
        "dryrun": _w_dryrun,
    }[sys.argv[1]]()
    print("OK")
