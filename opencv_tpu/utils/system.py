"""System/utility surface (core/src/system.cpp): tick counters, version,
thread controls (no-ops — parallelism is XLA's, not a thread pool),
build info."""

from __future__ import annotations

import os
import time

VERSION_MAJOR, VERSION_MINOR, VERSION_REVISION = 5, 0, 0
VERSION_STATUS = "-tpu"

_TICK_FREQ = 1_000_000_000


def getTickCount() -> int:
    return time.perf_counter_ns()


def getTickFrequency() -> float:
    return float(_TICK_FREQ)


def getCPUTickCount() -> int:
    return time.perf_counter_ns()


def getNumThreads() -> int:
    return os.cpu_count() or 1


def setNumThreads(n: int) -> None:
    """No-op: ops execute as XLA programs (device-parallel), not on a
    host thread pool (the reference's parallel_for_ has no analogue)."""


def getThreadNum() -> int:
    return 0


def getNumberOfCPUs() -> int:
    return os.cpu_count() or 1


def useOptimized() -> bool:
    return True


def setUseOptimized(flag: bool) -> None:
    pass


def checkHardwareSupport(feature: int) -> bool:
    return False   # CPU SIMD feature flags don't apply to the TPU path


def getHardwareFeatureName(feature: int) -> str:
    return ""


def getCPUFeaturesLine() -> str:
    return ""


def getVersionMajor() -> int:
    return VERSION_MAJOR


def getVersionMinor() -> int:
    return VERSION_MINOR


def getVersionRevision() -> int:
    return VERSION_REVISION


def getVersionString() -> str:
    return f"{VERSION_MAJOR}.{VERSION_MINOR}.{VERSION_REVISION}" \
           f"{VERSION_STATUS}"


def getBuildInformation() -> str:
    import jax
    lines = [
        "General configuration for opencv_tpu",
        f"  Version control:  {getVersionString()}",
        "  Platform:         TPU-native (jax/XLA/Pallas)",
        f"  JAX:              {jax.__version__}",
        f"  Backend:          {jax.default_backend()}",
        f"  Devices:          {len(jax.devices())}",
    ]
    return "\n".join(lines) + "\n"


_error_handler = None


def redirectError(onError=None):
    """cv::redirectError — store (or clear) a custom error callback.
    Errors in this package surface as Python exceptions, so the handler
    is kept for API compatibility and invoked by ``error()``."""
    global _error_handler
    _error_handler = onError


ALGO_HINT_DEFAULT = 0
ALGO_HINT_ACCURATE = 1
ALGO_HINT_APPROX = 2


def getDefaultAlgorithmHint() -> int:
    return ALGO_HINT_ACCURATE


def bootstrap() -> None:
    """cv2.bootstrap — loader hook; nothing to do in-process."""


def VideoCapture_waitAny(streams, timeoutNs: int = 0):
    """cv::VideoCapture::waitAny — our captures are synchronous file
    readers, so every opened stream is immediately ready."""
    ready = [i for i, s in enumerate(streams)
             if getattr(s, "isOpened", lambda: False)()]
    return len(ready) > 0, ready
