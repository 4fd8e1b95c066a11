"""Mesh / sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from common import cv2, assert_exact

import opencv_tpu as tcv
from opencv_tpu.parallel import make_mesh, shard_batch, sharded_pipeline, \
    spatial_gaussian_blur


needs_8dev = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@needs_8dev
def test_batch_dp_pipeline():
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
        assert_exact(out[i, :, :, 0], ref, f"img {i}")


@needs_8dev
def test_spatial_sharding_halo_exchange():
    # H sharded over 4 devices; halo exchange must reproduce the
    # single-device zero-border result exactly.
    mesh = make_mesh(n_data=2, n_sp=4)
    rng = np.random.default_rng(1)
    batch = rng.integers(0, 256, size=(4, 128, 64, 1), dtype=np.uint8)
    out = np.asarray(spatial_gaussian_blur(batch, (5, 5), 1.5, mesh))
    for i in range(4):
        ref = cv2.GaussianBlur(batch[i], (5, 5), 1.5,
                               borderType=cv2.BORDER_CONSTANT)
        assert_exact(out[i, :, :, 0], ref, f"img {i}")


@needs_8dev
def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[0].shape[0]
