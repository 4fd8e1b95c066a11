"""Per-op perf campaign: TPU (batched) vs the cv2 wheel (single thread).

Mirrors the parameter axes of the reference perf suites
(modules/imgproc/perf/perf_resize.cpp:36-131, perf_warp.cpp,
perf_cvt_color.cpp, perf_blur.cpp, perf_morph.cpp, perf_canny.cpp,
perf_matchTemplate.cpp, perf_pyramids.cpp) on the BASELINE.json sizes.

Usage:  python perf/perf_imgproc.py [--json out.json] [--md]
  --md rewrites the results table in BASELINE.md between the marker
  comments.

Metric: Mpix/s of INPUT pixels (batch x H x W / wall time), steady state
with HBM-resident inputs; cv2 baseline is measured in a subprocess with
cv2.setNumThreads(1) (cv2 and the axon TPU client must not share a
process).
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
BATCH = int(os.environ.get("PERF_BATCH", "16"))
ITERS = int(os.environ.get("PERF_ITERS", "4"))


def _case_batch(h):
    """Per-case batch: BASELINE.json's contract batch (64) applies at
    1080p; 4K inputs are capped so K independent copies + int32
    intermediates stay inside 16 GB HBM (a 4K u8 frame is 24.9 MB; the
    resize int32 horizontal buffer is 4x that per copy)."""
    return BATCH if h <= 1080 else max(8, BATCH // 4)


def _sync(x):
    import jax.numpy as jnp
    float(jnp.max(jnp.asarray(x).astype(jnp.float32)))


# each case: (name, size (h, w, c), tpu_fn(cv, x) -> array, cv2_src)
def _cases():
    import opencv_tpu as cv
    import jax.numpy as jnp
    M = cv.getRotationMatrix2D((960.0, 540.0), 15.0, 0.9)
    P = np.array([[0.95, 0.05, 8.0], [-0.04, 1.02, 4.0],
                  [1e-6, -2e-6, 1.0]], np.float64)
    se5 = np.ones((5, 5), np.uint8)
    tmpl_shape = (32, 32)

    def s(x):
        return x.astype(jnp.int32).sum()

    # mode: "chain" feeds the (same-shape u8) output back K times in one
    # jit; "indep" applies the op to K independent inputs in one jit
    # (pure-XLA ops only — K pallas_calls in one program compile
    # pathologically through the tunnel AOT service); "single" is one
    # application per dispatch.
    return [
        ("cvtColor BGR2GRAY 1080p", (1080, 1920, 3),
         lambda cv, x: s(cv.cvtColor(x, cv.COLOR_BGR2GRAY)),
         "cv2.cvtColor(im, cv2.COLOR_BGR2GRAY)", "indep"),
        ("cvtColor BGR2HSV 1080p", (1080, 1920, 3),
         lambda cv, x: cv.cvtColor(x, cv.COLOR_BGR2HSV),
         "cv2.cvtColor(im, cv2.COLOR_BGR2HSV)", "chain"),
        ("GaussianBlur 5x5 1080p", (1080, 1920, 3),
         lambda cv, x: cv.GaussianBlur(x, (5, 5), 0),
         "cv2.GaussianBlur(im, (5, 5), 0)", "chain"),
        ("boxFilter 9x9 1080p", (1080, 1920, 1),
         lambda cv, x: cv.boxFilter(x, -1, (9, 9)),
         "cv2.boxFilter(im, -1, (9, 9))", "chain"),
        ("resize LINEAR 4K->1080p", (2160, 3840, 3),
         lambda cv, x: s(cv.resize(x, (1920, 1080),
                                   interpolation=cv.INTER_LINEAR)),
         "cv2.resize(im, (1920, 1080), interpolation=cv2.INTER_LINEAR)",
         "indep"),
        ("resize AREA 4K->1080p", (2160, 3840, 3),
         lambda cv, x: s(cv.resize(x, (1920, 1080),
                                   interpolation=cv.INTER_AREA)),
         "cv2.resize(im, (1920, 1080), interpolation=cv2.INTER_AREA)",
         "indep"),
        ("resize CUBIC 4K->1080p", (2160, 3840, 3),
         lambda cv, x: s(cv.resize(x, (1920, 1080),
                                   interpolation=cv.INTER_CUBIC)),
         "cv2.resize(im, (1920, 1080), interpolation=cv2.INTER_CUBIC)",
         "indep"),
        ("warpAffine LINEAR 1080p", (1080, 1920, 3),
         lambda cv, x: cv.warpAffine(x, M, (1920, 1080)),
         "cv2.warpAffine(im, M, (1920, 1080))", "chain"),
        ("warpPerspective LINEAR 1080p", (1080, 1920, 3),
         lambda cv, x: cv.warpPerspective(x, P, (1920, 1080)),
         "cv2.warpPerspective(im, P, (1920, 1080))", "chain"),
        ("erode 5x5 1080p", (1080, 1920, 1),
         lambda cv, x: cv.erode(x, se5),
         "cv2.erode(im, np.ones((5,5),np.uint8))", "chain"),
        ("pyrDown 1080p", (1080, 1920, 1),
         lambda cv, x: s(cv.pyrDown(x)),
         "cv2.pyrDown(im)", "single"),
        ("Sobel dx 1080p", (1080, 1920, 1),
         lambda cv, x: cv.Sobel(x, cv.CV_8U, 1, 0),
         "cv2.Sobel(im, cv2.CV_8U, 1, 0)", "chain"),
        ("Canny 1080p", (1080, 1920, 1),
         lambda cv, x: cv.Canny(x, 50, 150)[..., None],
         "cv2.Canny(im, 50, 150)", "chain"),
        ("matchTemplate CCOEFF_NORMED 1080p", (1080, 1920, 1),
         lambda cv, x: cv.matchTemplate(
             x, _TMPL, cv.TM_CCOEFF_NORMED).sum(),
         "cv2.matchTemplate(im, tmpl, cv2.TM_CCOEFF_NORMED)", "indep"),
        ("threshold OTSU 1080p", (1080, 1920, 1),
         lambda cv, x: cv.threshold(x, 0, 255,
                                    cv.THRESH_BINARY | cv.THRESH_OTSU)[1],
         "cv2.threshold(im, 0, 255, cv2.THRESH_BINARY | cv2.THRESH_OTSU)",
         "chain"),
        ("equalizeHist 1080p", (1080, 1920, 1),
         lambda cv, x: cv.equalizeHist(x),
         "cv2.equalizeHist(im)", "chain"),
    ]


_TMPL = None


def run_tpu():
    global _TMPL
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, ".jax_cache"))
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    import jax.numpy as jnp
    import opencv_tpu as cv
    rng = np.random.default_rng(0)
    _TMPL = jax.device_put(
        rng.integers(0, 256, (32, 32), np.uint8))
    out = {}
    # Steady-state method: K independent applications of the op inside
    # ONE jitted program (one dispatch).  Per-dispatch tunnel latency was
    # measured at 2-6 ms — single-op timings are floor-dominated and
    # fluctuate 2x with tunnel state; the reference's harness likewise
    # measures repeated steady-state iterations (ts_perf.cpp:1922).
    K = int(os.environ.get("PERF_CHAIN", "4"))
    for name, (h, w, c), fn, _, mode in _cases():
        B = _case_batch(h)
        shape = (B, h, w, c)
        xs = None
        try:
            if mode == "chain":
                x0 = jax.device_put(rng.integers(0, 256, shape, np.uint8))

                @jax.jit
                def f(v, fn=fn):
                    for _ in range(K):
                        v = fn(cv, v).reshape(v.shape).astype(v.dtype)
                    return v.astype(jnp.int32).sum()

                args = (x0,)
                kk = K
            elif mode == "indep":
                xs = [jax.device_put(
                    rng.integers(0, 256, shape, np.uint8))
                    for _ in range(K)]

                @jax.jit
                def f(vs, fn=fn):
                    acc = None
                    for v in vs:
                        r = fn(cv, v)
                        r = r if r.ndim == 0 \
                            else r.astype(jnp.int32).sum()
                        acc = r if acc is None else acc + r
                    return acc

                args = (xs,)
                kk = K
            else:  # single
                x0 = jax.device_put(rng.integers(0, 256, shape, np.uint8))
                f = jax.jit(lambda v, fn=fn: fn(cv, v))
                args = (x0,)
                kk = 1
            o = f(*args)
            _sync(o)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                o = f(*args)
            _sync(o)
            dt = (time.perf_counter() - t0) / ITERS / kk
            out[name] = B * h * w / 1e6 / dt
        except Exception as e:  # keep the campaign alive per-op
            print(f"# {name}: {e}", file=sys.stderr)
            out[name] = None
        print(f"tpu {name:36s} {out[name] and round(out[name], 1)}",
              file=sys.stderr)
    return out


_CPU_SCRIPT = r"""
import json, sys, time
import numpy as np
import cv2
cv2.setNumThreads(1)
rng = np.random.default_rng(0)
M = cv2.getRotationMatrix2D((960.0, 540.0), 15.0, 0.9)
P = np.array([[0.95, 0.05, 8.0], [-0.04, 1.02, 4.0],
              [1e-6, -2e-6, 1.0]], np.float64)
tmpl = rng.integers(0, 256, (32, 32), np.uint8)
cases = %(cases)s
res = {}
for name, (h, w, c), expr in cases:
    shape = (h, w, c) if c > 1 else (h, w)
    im = rng.integers(0, 256, shape, np.uint8)
    fn = eval("lambda im, M=M, P=P, tmpl=tmpl: " + expr)
    fn(im)
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        fn(im)
    res[name] = h * w / 1e6 / ((time.perf_counter() - t0) / n)
print(json.dumps(res))
"""


def run_cpu():
    cases = [(name, size, expr) for name, size, _, expr, _m in _cases()]
    code = _CPU_SCRIPT % {"cases": repr(cases)}
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=1800)
    if r.returncode != 0:
        print(r.stderr[-2000:], file=sys.stderr)
        return {}
    return json.loads(r.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--md", action="store_true")
    args = ap.parse_args()

    tpu = run_tpu()
    cpu = run_cpu()
    rows = []
    for name, *_rest in _cases():
        t = tpu.get(name)
        c = cpu.get(name)
        sp = (t / c) if t and c else None
        rows.append((name, t, c, sp))
    table = ["| Op / size | TPU (batch %d) Mpix/s | cv2 1-thread Mpix/s |"
             " speedup |" % BATCH,
             "|---|---|---|---|"]
    for name, t, c, sp in rows:
        table.append("| %s | %s | %s | %s |" % (
            name,
            f"{t:,.0f}" if t else "—",
            f"{c:,.0f}" if c else "—",
            f"{sp:.1f}x" if sp else "—"))
    md = "\n".join(table)
    print(md)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"tpu": tpu, "cpu": cpu, "batch": BATCH,
                       "batch_4k": _case_batch(2160)}, f, indent=1)
    if args.md:
        path = os.path.join(REPO, "BASELINE.md")
        src = open(path).read()
        lo = src.find("<!-- perf-table-start -->")
        hi = src.find("<!-- perf-table-end -->")
        stamp = os.environ.get("PERF_STAMP", "driver bench round")
        block = ("<!-- perf-table-start -->\n"
                 f"Measured ({stamp}; TPU v5e via axon, batch {BATCH} at "
                 f"1080p / {_case_batch(2160)} at 4K, "
                 "HBM-resident; cv2 wheel pinned to 1 thread):\n\n"
                 + md + "\n")
        if lo != -1 and hi != -1:
            src = src[:lo] + block + src[hi:]
        else:
            src += "\n## Measured per-op results\n\n" + block + \
                "<!-- perf-table-end -->\n"
        open(path, "w").write(src)


if __name__ == "__main__":
    main()
