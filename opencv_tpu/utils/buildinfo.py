"""Build/runtime information (cv::getBuildInformation analogue) and
thread-control compatibility shims (parallelism on TPU is the device
grid + batch sharding, not a thread pool)."""

from __future__ import annotations


def getBuildInformation() -> str:
    import jax
    import jaxlib

    lines = [
        "General configuration for opencv_tpu",
        f"  jax:     {jax.__version__}",
        f"  jaxlib:  {jaxlib.__version__}",
        f"  devices: {[str(d) for d in jax.devices()]}",
        f"  backend: {jax.default_backend()}",
        "  compute: XLA primitives + Pallas kernels (NHWC batched)",
        "  parallel: jax.sharding Mesh (batch DP + spatial SP)",
    ]
    return "\n".join(lines)


def setNumThreads(n: int) -> None:
    """Compatibility no-op: parallelism is the XLA device grid, not a
    host thread pool (cv::setNumThreads analogue)."""


def getNumThreads() -> int:
    import jax

    return jax.device_count()
