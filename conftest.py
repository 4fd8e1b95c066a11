"""Root conftest: force JAX onto a virtual 8-device CPU mesh for tests.

Tests run on CPU (the real TPU is reserved for bench runs); the 8 virtual
devices let sharding/mesh tests exercise real multi-device partitioning,
mirroring how the driver dry-runs the multi-chip path.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override axon: tests run on host CPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
