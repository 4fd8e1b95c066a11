"""Root conftest: force JAX onto a virtual 8-device CPU mesh for tests.

Tests run on CPU (the real TPU is reserved for bench runs); the 8 virtual
devices let sharding/mesh tests exercise real multi-device partitioning,
mirroring how the driver dry-runs the multi-chip path.

Note: pytest plugins may import jax before this file runs, so setting the
environment variable alone is not enough — use jax.config.update, which
works post-import.  Also drop the axon (remote TPU tunnel) PJRT plugin if
registered: backend discovery would contact the tunnel, and a busy tunnel
blocks CPU-only runs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass


# ---------------------------------------------------------------------------
# test tiers: `-m smoke` selects the fast tier (< 5 min); the slow model/
# algorithm suites (features2d pyramids, stitching, trackers, ...) are the
# non-smoke remainder, mirroring the reference's CV_TEST_TAG_VERYLONG gating
# (modules/ts/src/ts_tags.cpp).
_SMOKE_FILES = {
    "test_analysis", "test_borders", "test_color", "test_constants",
    "test_contours", "test_core_ops", "test_filters2", "test_flann",
    "test_fuzz_geometry", "test_hough_seg", "test_imgcodecs", "test_kernels", "test_misc_ops",
    "test_onnx_ops", "test_parallel", "test_resize", "test_smooth",
    "test_tail_apis", "test_warp",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.module.__name__ in _SMOKE_FILES:
            item.add_marker(pytest.mark.smoke)
