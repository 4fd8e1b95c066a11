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


# --------------------------------------------------------------------------
# Expression graphs + serialization (modules/gapi s11n.hpp, api/s11n.cpp)
# --------------------------------------------------------------------------
#
# The reference's GComputation is a lazy op graph serialized by walking
# its internal ade graph into a byte stream (gapi/src/api/s11n.cpp).
# Here the graph is a tiny DAG of named ops over GMat placeholders,
# serialized as JSON; `GComputation.apply` interprets it through the
# package's ops and jit-compiles the whole interpretation into one XLA
# program (the island-fusion step).  `serialize_compiled` additionally
# exports the COMPILED pipeline as portable StableHLO bytes
# (jax.export) — the TPU-native analogue of a serialized GCompiled.

import json as _json

import numpy as _np

__all__ += ["GMat", "GComputation", "serialize", "deserialize",
            "serialize_compiled", "deserialize_compiled", "op_registry"]


def _g_ops():
    import opencv_tpu as cv
    import jax.numpy as jnp

    return {
        "add": lambda a, b: cv.add(a, b),
        "sub": lambda a, b: cv.subtract(a, b),
        "mul": lambda a, b: cv.multiply(a, b),
        "div": lambda a, b: cv.divide(a, b),
        "absDiff": lambda a, b: cv.absdiff(a, b),
        "addWeighted": lambda a, b, alpha=1.0, beta=1.0, gamma=0.0:
            cv.addWeighted(a, alpha, b, beta, gamma),
        "bitwise_and": lambda a, b: cv.bitwise_and(a, b),
        "bitwise_or": lambda a, b: cv.bitwise_or(a, b),
        "bitwise_xor": lambda a, b: cv.bitwise_xor(a, b),
        "bitwise_not": lambda a: cv.bitwise_not(a),
        "cvtColor": lambda a, code=6: cv.cvtColor(a, code),
        "resize": lambda a, dsize=None, fx=0.0, fy=0.0, interpolation=1:
            cv.resize(a, tuple(dsize) if dsize else None, fx=fx, fy=fy,
                      interpolation=interpolation),
        "gaussianBlur": lambda a, ksize=(3, 3), sigmaX=0.0, sigmaY=0.0:
            cv.GaussianBlur(a, tuple(ksize), sigmaX, sigmaY=sigmaY),
        "blur": lambda a, ksize=(3, 3): cv.blur(a, tuple(ksize)),
        "medianBlur": lambda a, ksize=3: cv.medianBlur(a, ksize),
        "erode": lambda a, kernel=None, iterations=1:
            cv.erode(a, _np.asarray(kernel, _np.uint8), iterations=iterations),
        "dilate": lambda a, kernel=None, iterations=1:
            cv.dilate(a, _np.asarray(kernel, _np.uint8), iterations=iterations),
        "threshold": lambda a, thresh=0.0, maxval=255.0, type=0:
            cv.threshold(a, thresh, maxval, type)[1],
        "filter2D": lambda a, kernel=None, ddepth=-1:
            cv.filter2D(a, ddepth, _np.asarray(kernel, _np.float32)),
        "sobel": lambda a, ddepth=-1, dx=1, dy=0, ksize=3:
            cv.Sobel(a, ddepth, dx, dy, ksize=ksize),
        "canny": lambda a, threshold1=50.0, threshold2=150.0:
            cv.Canny(a, threshold1, threshold2),
        "normalize": lambda a, alpha=0.0, beta=1.0, norm_type=4:
            cv.normalize(a, None, alpha, beta, norm_type),
        "warpAffine": lambda a, M=None, dsize=None:
            cv.warpAffine(a, _np.asarray(M, _np.float64), tuple(dsize)),
        "pyrDown": lambda a: cv.pyrDown(a),
        "pyrUp": lambda a: cv.pyrUp(a),
        "equalizeHist": lambda a: cv.equalizeHist(a),
        "flip": lambda a, flipCode=0: cv.flip(a, flipCode),
        "transpose": lambda a: cv.transpose(a),
        "crop": lambda a, rect=None: a[rect[1]:rect[1] + rect[3],
                                       rect[0]:rect[0] + rect[2]],
    }


def op_registry():
    """Names usable as graph ops (the kernel package analogue)."""
    return sorted(_g_ops().keys())


class GMat:
    """Lazy placeholder/expression node (cv::GMat)."""

    _counter = [0]

    def __init__(self, op=None, inputs=(), consts=None):
        self.id = GMat._counter[0]
        GMat._counter[0] += 1
        self.op = op                 # None => graph input
        self.inputs = list(inputs)
        self.consts = dict(consts or {})

    # expression sugar
    def __add__(self, other):
        return GMat("add", [self, other])

    def __sub__(self, other):
        return GMat("sub", [self, other])

    def __mul__(self, other):
        return GMat("mul", [self, other])


def g_op(name, *mats, **consts):
    """Build an op node: g_op("resize", gmat, dsize=(64, 48))."""
    ops = _g_ops()
    if name not in ops:
        raise KeyError(f"unknown gapi op {name!r}; see op_registry()")
    return GMat(name, list(mats), consts)


class GComputation:
    """cv::GComputation: a serializable op DAG compiled to one XLA
    program on apply (gcomputation.cpp; s11n.cpp for the byte form)."""

    def __init__(self, ins, outs):
        self.ins = list(ins) if isinstance(ins, (list, tuple)) else [ins]
        self.outs = list(outs) if isinstance(outs, (list, tuple)) \
            else [outs]
        self._nodes = self._topo()
        self._compiled = None

    def _topo(self):
        order = []
        seen = set()

        def visit(n):
            if n.id in seen:
                return
            seen.add(n.id)
            for i in n.inputs:
                visit(i)
            order.append(n)

        for o in self.outs:
            visit(o)
        for i in self.ins:
            if i.id not in seen:
                order.insert(0, i)
                seen.add(i.id)
        return order

    def _interp(self, *arrays):
        ops = _g_ops()
        env = {}
        for g, a in zip(self.ins, arrays):
            env[g.id] = a
        for n in self._nodes:
            if n.op is None:
                if n.id not in env:
                    raise ValueError("unbound graph input")
                continue
            args = [env[i.id] for i in n.inputs]
            env[n.id] = ops[n.op](*args, **n.consts)
        outs = [env[o.id] for o in self.outs]
        return outs[0] if len(outs) == 1 else tuple(outs)

    def apply(self, *arrays):
        """Run the graph; the whole DAG is one jitted XLA program."""
        if self._compiled is None:
            self._compiled = jax.jit(self._interp)
        return self._compiled(*arrays)

    # ------------------------------------------------------------- s11n
    def to_bytes(self):
        nodes = [{"id": n.id, "op": n.op,
                  "inputs": [i.id for i in n.inputs],
                  "consts": {k: (v.tolist()
                                 if isinstance(v, _np.ndarray) else v)
                             for k, v in n.consts.items()}}
                 for n in self._nodes]
        doc = {"version": 1,
               "nodes": nodes,
               "ins": [g.id for g in self.ins],
               "outs": [g.id for g in self.outs]}
        return _json.dumps(doc).encode()

    @staticmethod
    def from_bytes(blob):
        doc = _json.loads(bytes(blob).decode())
        assert doc.get("version") == 1
        by_id = {}
        for nd in doc["nodes"]:
            g = GMat(nd["op"], [by_id[i] for i in nd["inputs"]],
                     nd["consts"])
            g.id = nd["id"]
            by_id[g.id] = g
        return GComputation([by_id[i] for i in doc["ins"]],
                            [by_id[i] for i in doc["outs"]])


def serialize(comp):
    """cv::gapi::serialize(GComputation) analogue."""
    return comp.to_bytes()


def deserialize(blob):
    """cv::gapi::deserialize<GComputation>() analogue."""
    return GComputation.from_bytes(blob)


def serialize_compiled(fn, *example_args):
    """Export a jitted pipeline as portable StableHLO bytes — the
    compiled-artifact form (GCompiled s11n analogue, TPU-native via
    jax.export)."""
    from jax import export as _export
    import jax.numpy as jnp
    f = fn if hasattr(fn, "lower") else jax.jit(fn)
    specs = [jax.ShapeDtypeStruct(_np.shape(a), jnp.asarray(a).dtype)
             for a in example_args]
    return bytes(_export.export(f)(*specs).serialize())


def deserialize_compiled(blob):
    """Rebuild a callable from StableHLO bytes."""
    from jax import export as _export
    exp = _export.deserialize(bytearray(blob))
    return lambda *args: exp.call(*args)
