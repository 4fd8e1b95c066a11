"""Tracing/profiling — the TPU-native replacement for CV_TRACE_* /
CV_INSTRUMENT_REGION (core/src/trace.cpp, core/src/utils/instrumentation.cpp).

Three tiers, mirroring the reference's split:

1. **Host region tracing** (`trace_region`, the CV_TRACE_REGION
   analogue): nested spans with wall times and optional args, recorded
   into a per-thread buffer when tracing is enabled.  `dump_trace()`
   writes the Chrome trace-event format (load in chrome://tracing or
   Perfetto) — the modern equivalent of the reference's .ot container.
   Enable programmatically (`start()`) or via the environment like the
   reference's OPENCV_TRACE: ``OPENCV_TPU_TRACE=1`` traces the whole
   process and writes ``OPENCV_TPU_TRACE_LOCATION`` (default
   ``opencv_tpu_trace.json``) at exit.

2. **Device annotation**: every `trace_region` is also a
   `jax.profiler.TraceAnnotation`, so enclosed XLA work is labeled in
   TensorBoard/xprof device traces.

3. **Dispatch-tier instrumentation** (the CV_INSTRUMENT analogue for
   the CALL_HAL ladder): `core.dispatch.lookup` reports which tier
   (pallas kernel vs XLA lowering) served each op; `tier_stats()`
   returns the counters.
"""

from __future__ import annotations

import atexit
import contextlib
import json
import os
import threading
import time

import jax

_TLS = threading.local()
_LOCK = threading.Lock()
_ENABLED = False
_EVENTS: list[dict] = []        # completed spans, Chrome "X" events
_COUNTERS: dict[str, int] = {}  # dispatch-tier counters
_T0 = time.perf_counter()


def _now_us() -> float:
    return (time.perf_counter() - _T0) * 1e6


def is_enabled() -> bool:
    return _ENABLED


def start() -> None:
    """Begin recording host spans (device annotations are always on)."""
    global _ENABLED
    _ENABLED = True


def stop() -> None:
    global _ENABLED
    _ENABLED = False


def reset() -> None:
    with _LOCK:
        _EVENTS.clear()
        _COUNTERS.clear()


def _depth() -> int:
    return getattr(_TLS, "depth", 0)


@contextlib.contextmanager
def trace_region(name: str, **args):
    """`CV_TRACE_REGION` equivalent: label the region in the device
    trace and, when tracing is enabled, record a nested host span with
    optional args (CV_TRACE_ARG)."""
    with jax.profiler.TraceAnnotation(name):
        if not _ENABLED:
            yield
            return
        _TLS.depth = _depth() + 1
        t0 = _now_us()
        try:
            yield
        finally:
            t1 = _now_us()
            _TLS.depth -= 1
            ev = {"name": name, "ph": "X", "ts": t0, "dur": t1 - t0,
                  "pid": os.getpid(), "tid": threading.get_ident(),
                  "args": {"depth": _depth(), **args} if args or True
                  else {}}
            with _LOCK:
                _EVENTS.append(ev)


def region(name: str):
    """Decorator form of trace_region."""
    def deco(fn):
        def wrapped(*a, **kw):
            with trace_region(name):
                return fn(*a, **kw)
        wrapped.__name__ = getattr(fn, "__name__", name)
        return wrapped
    return deco


def count(counter: str, n: int = 1) -> None:
    """Bump an instrumentation counter (dispatch tiers use
    ``tier.<op>.<tier>``)."""
    with _LOCK:
        _COUNTERS[counter] = _COUNTERS.get(counter, 0) + n


def tier_stats() -> dict:
    """Counters of which dispatch tier served each op since reset()."""
    with _LOCK:
        return dict(_COUNTERS)


def events() -> list:
    with _LOCK:
        return list(_EVENTS)


def dump_trace(path: str) -> str:
    """Write recorded spans + counters as Chrome trace-event JSON
    (chrome://tracing / Perfetto / `about:tracing`)."""
    with _LOCK:
        evs = list(_EVENTS)
        ctrs = dict(_COUNTERS)
    doc = {"traceEvents": evs,
           "otherData": {"counters": ctrs,
                         "origin": "opencv_tpu trace_region"}}
    with open(path, "w") as f:
        json.dump(doc, f)
    return path


@contextlib.contextmanager
def profile_to(logdir: str):
    """Capture a device profile for the enclosed block (view with
    TensorBoard or xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# --- OPENCV_TRACE-style environment activation (core/src/trace.cpp:
# getTraceLevel reads OPENCV_TRACE; location via OPENCV_TRACE_LOCATION)
if os.environ.get("OPENCV_TPU_TRACE", "") not in ("", "0"):
    start()

    @atexit.register
    def _dump_at_exit():
        if _EVENTS or _COUNTERS:
            dump_trace(os.environ.get("OPENCV_TPU_TRACE_LOCATION",
                                      "opencv_tpu_trace.json"))
