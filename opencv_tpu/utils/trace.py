"""Tracing/profiling — the TPU-native replacement for CV_TRACE_* /
CV_INSTRUMENT_REGION (core/src/trace.cpp): jax.profiler annotations that
show up in XLA/TensorBoard traces, plus a one-call profile capture.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace_region(name: str):
    """`CV_TRACE_REGION` equivalent: annotate a region so it appears in
    the device trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_to(logdir: str):
    """Capture a device profile for the enclosed block (view with
    TensorBoard or xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
