"""Benchmark: the five BASELINE.json configs on the real TPU chip.

Configs (BASELINE.json):
  1. cvtColor BGR→GRAY + GaussianBlur 5×5, batched 1080p
  2. resize LINEAR/AREA/CUBIC + warpAffine/warpPerspective, batched 4K
  3. pyrDown + cornerHarris + Sobel + Canny, 1080p
  4. matchTemplate TM_CCOEFF_NORMED + erode/dilate (k=3,5,9), 1080p
  5. ORB end-to-end (8-level pyramid, 500 features), 1080p

Metric: Mpix/s/chip — input pixels processed per second, steady state
(data HBM-resident; production pipelines double-buffer host→HBM, see
opencv_tpu.parallel).  Baseline: the image's cv2 wheel pinned to one
thread (`cv2.setNumThreads(1)`), the same op mix per image.  The CPU
baseline is static per machine, so it is read from a committed cache
(`perf/cpu_baseline.json`) and only re-measured (in a subprocess — cv2
and the axon TPU client must not share a process) when absent.

Robustness contract (the reference's perf harness measures to stability
and always reports, `modules/ts/src/ts_perf.cpp:1922` — ours must too):
- persistent XLA compilation cache under `.jax_cache/` so warm reruns
  skip the multi-minute compile wall of the axon tunnel;
- one global deadline (BENCH_BUDGET_S, default 480 s) enforced by
  SIGALRM: whatever configs completed by then are emitted — a slow
  compile can cost configs, never the whole round's evidence;
- each config individually guarded; a failure records an error string
  and moves on.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}:
value = geometric-mean TPU Mpix/s across completed configs,
vs_baseline = geometric-mean speedup; per-config detail under "configs".
"""

import json
import os
import signal
import subprocess
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BATCH_1080 = int(os.environ.get("BENCH_BATCH", "32"))
# 4K batch must stay large: the warp formulation's gather cost is per
# OUTPUT PIXEL (one gather per pixel, whole batch in the row payload),
# so small batches amortize the same ~116ms over fewer pixels
BATCH_4K = max(8, BATCH_1080 // 2)
CPU_IMGS = int(os.environ.get("BENCH_CPU_IMGS", "2"))
CPU_ITERS = int(os.environ.get("BENCH_CPU_ITERS", "2"))
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "480"))
CPU_CACHE = os.path.join(REPO, "perf", "cpu_baseline.json")

_T0 = time.monotonic()
_TPU_RES = {}      # filled incrementally, config by config
_ERRORS = {}
_EMITTED = False


def _remaining():
    return BUDGET_S - (time.monotonic() - _T0)


def _geomean(vals):
    vals = [v for v in vals if v and v > 0]
    return float(np.exp(np.mean(np.log(vals)))) if vals else None


def _load_cpu_baseline():
    try:
        with open(CPU_CACHE) as f:
            data = json.load(f)
        # sanity: per-image Mpix/s numbers, machine-static
        return {k: float(v) for k, v in data["configs"].items()}
    except Exception:
        return {}


def emit_and_exit(code=0):
    """Print the final JSON from whatever has completed.  Idempotent."""
    global _EMITTED
    if _EMITTED:
        os._exit(code)
    _EMITTED = True
    cpu = _load_cpu_baseline()
    configs = {}
    ratios = []
    for k, v in _TPU_RES.items():
        c = cpu.get(k)
        r = (v / c) if c else None
        configs[k] = {"tpu_mpix_s": round(v, 1),
                      "cpu_mpix_s": round(c, 1) if c else None,
                      "speedup": round(r, 2) if r else None}
        if r:
            ratios.append(r)
    for k, e in _ERRORS.items():
        configs[k] = {"error": e}
    out = {
        "metric": "imgproc_5config_geomean_mpix_per_s_per_chip",
        "value": (round(_geomean(list(_TPU_RES.values())), 1)
                  if _TPU_RES else None),
        "unit": "Mpix/s",
        "vs_baseline": round(_geomean(ratios), 2) if ratios else None,
        "configs": configs,
        "elapsed_s": round(time.monotonic() - _T0, 1),
        "batch": BATCH_1080,
    }
    print(json.dumps(out), flush=True)
    os._exit(code)


def _on_alarm(signum, frame):
    _ERRORS.setdefault("_deadline", "global budget hit; partial results")
    emit_and_exit(0)


def _sync(x):
    import jax.numpy as jnp
    # block_until_ready is a no-op under the axon tunnel; force a readback
    if isinstance(x, (list, tuple)):
        x = x[0]
    float(jnp.max(jnp.asarray(x).astype(jnp.float32)))


def _time_tpu(fn, args, iters=6):
    out = fn(*args)
    _sync(out)  # compile + sync
    # adaptive: one timed iteration first, then as many as the budget allows
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    dt1 = time.perf_counter() - t0
    n = max(1, min(iters, int((_remaining() - 30) / max(dt1, 1e-3))))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def _run_config(name, thunk):
    if _remaining() < 20:
        _ERRORS[name] = "skipped: budget exhausted"
        return
    try:
        _TPU_RES[name] = thunk()
    except Exception as e:  # noqa: BLE001 — record and continue
        _ERRORS[name] = f"{type(e).__name__}: {e}"[:300]


# ---------------------------------------------------------------- configs

def bench_tpu():
    # Persistent compilation cache: the axon tunnel pays 20-200 s per
    # compile; cache hits make warm runs finish in seconds (precedent:
    # OpenCV's on-disk OpenCL binary cache, core/src/ocl.cpp:215).
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

    # ---- config 1: cvtColor + GaussianBlur, 1080p ----------------------
    b1080 = jax.device_put(rng.integers(
        0, 256, size=(BATCH_1080, 1080, 1920, 3), dtype=np.uint8))

    @jax.jit
    def cfg1(x):
        g = cv.cvtColor(x, cv.COLOR_BGR2GRAY)
        return cv.GaussianBlur(g, (5, 5), 0)

    def run1():
        dt = _time_tpu(cfg1, (b1080,))
        return BATCH_1080 * 1080 * 1920 / 1e6 / dt

    _run_config("1_cvt_gauss_1080p", run1)

    # ---- config 3: pyramid + corners + derivatives, 1080p ---------------
    # (run before the 4K monster: cheaper compile, banked earlier)
    g1080 = jax.device_put(rng.integers(
        0, 256, size=(BATCH_1080, 1080, 1920, 1), dtype=np.uint8))

    @jax.jit
    def cfg3(x):
        p = cv.pyrDown(x)
        h = cv.cornerHarris(x.astype(jnp.float32) / 255., 2, 3, 0.04)
        sx = cv.Sobel(x, cv.CV_16S, 1, 0)
        c = cv.Canny(x, 50, 150)
        return (p.astype(jnp.int32).sum() + h.sum().astype(jnp.int32)
                + sx.astype(jnp.int32).sum() + c.astype(jnp.int32).sum())

    def run3():
        dt = _time_tpu(cfg3, (g1080,), iters=4)
        return BATCH_1080 * 4 * 1080 * 1920 / 1e6 / dt

    _run_config("3_pyr_corner_edge_1080p", run3)

    # ---- config 4: matchTemplate + morphology, 1080p ---------------------
    tmpl = jax.device_put(rng.integers(0, 256, size=(32, 32),
                                       dtype=np.uint8))
    se9 = np.ones((9, 9), np.uint8)

    @jax.jit
    def cfg4(x, t):
        m = cv.matchTemplate(x, t, cv.TM_CCOEFF_NORMED)
        e3 = cv.erode(x, np.ones((3, 3), np.uint8))
        d5 = cv.dilate(x, np.ones((5, 5), np.uint8))
        e9 = cv.erode(x, se9)
        return (m.sum().astype(jnp.float32) + e3.astype(jnp.int32).sum()
                + d5.astype(jnp.int32).sum() + e9.astype(jnp.int32).sum())

    def run4():
        dt = _time_tpu(cfg4, (g1080, tmpl), iters=4)
        return BATCH_1080 * 4 * 1080 * 1920 / 1e6 / dt

    _run_config("4_match_morph_1080p", run4)

    # ---- config 5: ORB end-to-end, 1080p (batched device pipeline) ------
    def run5():
        n_img = min(32, BATCH_1080)
        imgs5 = g1080[:n_img, :, :, 0]
        orb = cv.ORB_create(nfeatures=500)
        orb.detect_and_compute_batch(imgs5)  # warm (compiles)
        n_orb = 3
        t0 = time.perf_counter()
        for _ in range(n_orb):
            orb.detect_and_compute_batch(imgs5)
        dt = (time.perf_counter() - t0) / n_orb
        return n_img * 1080 * 1920 / 1e6 / dt

    _run_config("5_orb_1080p", run5)

    # ---- config 2: resize + warp, 4K (the compile monster, last) --------
    del g1080, b1080
    b4k = jax.device_put(rng.integers(
        0, 256, size=(BATCH_4K, 2160, 3840, 3), dtype=np.uint8))
    M = cv.getRotationMatrix2D((1920.0, 1080.0), 15.0, 0.9)
    P = np.array([[0.95, 0.05, 8.0], [-0.04, 1.02, 4.0],
                  [1e-6, -2e-6, 1.0]], np.float64)

    # split into three jits: smaller programs compile faster, cache
    # independently, and partial compiles survive a deadline hit
    @jax.jit
    def cfg2_resize(x):
        r1 = cv.resize(x, (1920, 1080), interpolation=cv.INTER_LINEAR)
        r2 = cv.resize(x, (1920, 1080), interpolation=cv.INTER_AREA)
        r3 = cv.resize(x, (1920, 1080), interpolation=cv.INTER_CUBIC)
        return (r1.astype(jnp.int32).sum() + r2.astype(jnp.int32).sum()
                + r3.astype(jnp.int32).sum())

    @jax.jit
    def cfg2_warp_a(x):
        return cv.warpAffine(x, M, (3840, 2160)).astype(jnp.int32).sum()

    @jax.jit
    def cfg2_warp_p(x):
        return cv.warpPerspective(x, P, (3840, 2160)).astype(jnp.int32).sum()

    def run2():
        def chain(x):
            return (cfg2_resize(x), cfg2_warp_a(x), cfg2_warp_p(x))
        dt = _time_tpu(chain, (b4k,), iters=4)
        return BATCH_4K * 5 * 2160 * 3840 / 1e6 / dt

    _run_config("2_resize_warp_4k", run2)


# ------------------------------------------------------------- baseline

_CPU_SCRIPT = r"""
import json, sys, time
import numpy as np
import cv2
cv2.setNumThreads(1)
rng = np.random.default_rng(0)
N = %(n)d
ITERS = %(iters)d
res = {}

imgs = [rng.integers(0, 256, size=(1080, 1920, 3), dtype=np.uint8)
        for _ in range(N)]
g1080 = [cv2.cvtColor(im, cv2.COLOR_BGR2GRAY) for im in imgs]
i4k = [rng.integers(0, 256, size=(2160, 3840, 3), dtype=np.uint8)
       for _ in range(N)]

def timed(fn, npix):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(ITERS):
        fn()
    return npix * N / 1e6 / ((time.perf_counter() - t0) / ITERS)

def c1():
    for im in imgs:
        cv2.GaussianBlur(cv2.cvtColor(im, cv2.COLOR_BGR2GRAY), (5, 5), 0)
res["1_cvt_gauss_1080p"] = timed(c1, 1080*1920)

M = cv2.getRotationMatrix2D((1920.0, 1080.0), 15.0, 0.9)
P = np.array([[0.95, 0.05, 8.0], [-0.04, 1.02, 4.0],
              [1e-6, -2e-6, 1.0]], np.float64)
def c2():
    for im in i4k:
        cv2.resize(im, (1920, 1080), interpolation=cv2.INTER_LINEAR)
        cv2.resize(im, (1920, 1080), interpolation=cv2.INTER_AREA)
        cv2.resize(im, (1920, 1080), interpolation=cv2.INTER_CUBIC)
        cv2.warpAffine(im, M, (3840, 2160))
        cv2.warpPerspective(im, P, (3840, 2160))
res["2_resize_warp_4k"] = timed(c2, 5*2160*3840)

def c3():
    for g in g1080:
        cv2.pyrDown(g)
        cv2.cornerHarris(g.astype(np.float32)/255., 2, 3, 0.04)
        cv2.Sobel(g, cv2.CV_16S, 1, 0)
        cv2.Canny(g, 50, 150)
res["3_pyr_corner_edge_1080p"] = timed(c3, 4*1080*1920)

tmpl = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
se9 = np.ones((9, 9), np.uint8)
def c4():
    for g in g1080:
        cv2.matchTemplate(g, tmpl, cv2.TM_CCOEFF_NORMED)
        cv2.erode(g, np.ones((3, 3), np.uint8))
        cv2.dilate(g, np.ones((5, 5), np.uint8))
        cv2.erode(g, se9)
res["4_match_morph_1080p"] = timed(c4, 4*1080*1920)

orb = cv2.ORB_create(nfeatures=500)
def c5():
    for g in g1080:
        orb.detectAndCompute(g, None)
res["5_orb_1080p"] = timed(c5, 1080*1920)

print(json.dumps(res))
"""


def measure_cpu_baseline():
    """Measure the 1-thread cv2 baseline in a subprocess and cache it."""
    code = _CPU_SCRIPT % {"n": CPU_IMGS, "iters": CPU_ITERS}
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # keep the axon plugin out of the process
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env,
                       timeout=max(60, _remaining() - 20))
    if r.returncode != 0:
        return None
    res = json.loads(r.stdout.strip().splitlines()[-1])
    os.makedirs(os.path.dirname(CPU_CACHE), exist_ok=True)
    with open(CPU_CACHE, "w") as f:
        json.dump({"note": "1-thread cv2 wheel, per-image Mpix/s; "
                           "machine-static (re-measure: delete this file "
                           "or run `python bench.py --cpu-baseline`)",
                   "n_imgs": CPU_IMGS, "iters": CPU_ITERS,
                   "configs": res}, f, indent=1)
    return res


def main():
    if "--cpu-baseline" in sys.argv:
        print(json.dumps(measure_cpu_baseline()))
        return
    # Two deadline mechanisms: SIGALRM (interrupts python code) AND a
    # watchdog thread (fires even while the main thread is blocked in a
    # native compile RPC, where pending signals are not delivered).
    signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(int(BUDGET_S))
    watchdog = threading.Timer(BUDGET_S + 5, _on_alarm, args=(None, None))
    watchdog.daemon = True
    watchdog.start()
    try:
        bench_tpu()
        # TPU evidence banked; fill in the baseline only if the committed
        # cache is missing and time remains
        if not _load_cpu_baseline() and _remaining() > 90:
            try:
                measure_cpu_baseline()
            except Exception:
                pass
    finally:
        emit_and_exit(0)


if __name__ == "__main__":
    main()
