"""Graph pipelines & streaming — the G-API analogue (modules/gapi).

The reference builds lazy expression graphs, fuses islands, and runs a
streaming executor (gapi/src/compiler/gcompiler.cpp:220-284,
executor/gstreamingexecutor.cpp).  On TPU the graph compiler is XLA:
`pipeline(fn)` traces the WHOLE user pipeline into one fused device
program (island fusion for free), and `Stream` double-buffers host→HBM
transfers against compute — the pipeline-parallel analogue of the
streaming executor.
"""

from __future__ import annotations

import functools
import threading
import queue as _queue

import jax

__all__ = ["pipeline", "Stream"]


def pipeline(fn=None, *, donate: bool = False):
    """Compile a whole image pipeline into one XLA program.

    Use as a decorator::

        @tcv.pipeline
        def preprocess(imgs): ...
    """
    def wrap(f):
        jitted = jax.jit(f, donate_argnums=(0,) if donate else ())

        @functools.wraps(f)
        def run(*args, **kwargs):
            return jitted(*args, **kwargs)

        run.lower = jitted.lower
        return run

    return wrap(fn) if fn is not None else wrap


class Stream:
    """Double-buffered host→device feed: overlap `jax.device_put` of the
    next batch with device compute on the current one.

    >>> stream = Stream(pipeline_fn)
    >>> for out in stream.run(batches):
    ...     consume(out)
    """

    def __init__(self, fn, prefetch: int = 2):
        self.fn = pipeline(fn) if not hasattr(fn, "lower") else fn
        self.prefetch = prefetch

    def run(self, batches):
        q = _queue.Queue(maxsize=self.prefetch)
        stop = object()

        def feeder():
            for b in batches:
                q.put(jax.device_put(b))
            q.put(stop)

        t = threading.Thread(target=feeder, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is stop:
                break
            yield self.fn(b)
        t.join()
