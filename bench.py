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
and ALWAYS reports, `modules/ts/src/ts_perf.cpp:1922` — ours must too,
including when the device is gone):
- PRE-FLIGHT is a raw TCP connect to the axon relay ports (~1 s — a
  dead relay is connection-refused, and the jax client then hangs
  >240 s, so this must not go through jax).  A closed relay stamps an
  explicit "tpu unreachable" diagnostic into EVERY config and exits 0 —
  a dead tunnel must be legible in BENCH_r{N}.json, never inferred.
- THE RUNNER IS THE PROBE: all configs run in ONE killable runner
  subprocess that emits an {"attached": s} line once the device is up
  (this doubles as the trivial-op probe — the attach is paid ONCE and
  then reused for the measurements, instead of a probe process paying
  ~200 s of attach that is thrown away), {"tick": ...} lines at stage
  boundaries inside a config, and a {"config": ..., "mpix_s": ...}
  heartbeat as each config completes.
- STALL DETECTION IS TICK-TO-TICK, not per-config-total: the parent
  enforces a deadline on the SILENT INTERVAL between runner lines —
  floored at the attach wall (~200-300 s measured through the tunnel)
  right after a spawn and after a "compile" tick, tighter between
  measurement ticks.  On a stall — a native compile RPC hang included,
  which ignores signals — it kills the runner and respawns it with the
  remaining configs.  One attach cost in the good case, at most one
  re-attach per hang; a hang can never eat the other configs or the
  round.
- persistent XLA compilation cache under `.jax_cache/` shared by all
  subprocesses, so warm reruns skip the axon compile wall;
- a global deadline (BENCH_BUDGET_S, default 480 s) enforced by a
  watchdog thread that emits whatever completed;
- BENCH_FAST=1 shrinks batch/iters for a cold-cache run that finishes
  through the tunnel in <6 min; the parent AUTO-DROPS a respawned
  runner to FAST shapes when the remaining budget cannot fit the full
  ones.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}:
value = geometric-mean TPU Mpix/s across completed configs,
vs_baseline = geometric-mean speedup; per-config detail under
"configs".  The metric name says "5config" ONLY when all five configs
contributed; a partial run is named `imgproc_{n}of5config_...` so a
3-config geomean can never masquerade as the full one.
"""

import json
import os
import signal
import socket
import subprocess
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
FAST = os.environ.get("BENCH_FAST", "") not in ("", "0")
BATCH_1080 = int(os.environ.get("BENCH_BATCH", "8" if FAST else "32"))
# 4K batch must stay large: the warp formulation's gather cost is per
# OUTPUT PIXEL (one gather per pixel, whole batch in the row payload),
# so small batches amortize the same gather wall over fewer pixels
BATCH_4K = max(4 if FAST else 8, BATCH_1080 // 2)
ITERS = int(os.environ.get("BENCH_ITERS", "2" if FAST else "6"))
CPU_IMGS = int(os.environ.get("BENCH_CPU_IMGS", "2"))
CPU_ITERS = int(os.environ.get("BENCH_CPU_ITERS", "2"))
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "480"))
# device attach through the tunnel is paid once per process; measured
# 10-200+s run to run even when healthy (r4: 201s for a trivial op).
# Every silent-interval deadline that may include an attach or a cold
# compile is FLOORED at this wall.
ATTACH_WALL_S = float(os.environ.get("BENCH_ATTACH_WALL_S", "300"))
# warm tick-to-tick silence bound (measurement iterations emit ticks)
STALL_S = float(os.environ.get("BENCH_STALL_S", "150"))
CPU_CACHE = os.path.join(REPO, "perf", "cpu_baseline.json")
CACHE_DIR = os.path.join(REPO, ".jax_cache")

# run order: cfg1 first (cheap, proves the attach), then the two
# historically starved configs (ORB, resize/warp-4K) while budget is
# plentiful, then the remaining dense configs
CONFIG_ORDER = ["1_cvt_gauss_1080p", "5_orb_1080p", "2_resize_warp_4k",
                "3_pyr_corner_edge_1080p", "4_match_morph_1080p"]
# rough full-shape per-config wall (warm cache, measured r4/r5) used by
# the auto-FAST downgrade decision
_EST_CONFIG_S = {"1_cvt_gauss_1080p": 35, "5_orb_1080p": 90,
                 "2_resize_warp_4k": 75, "3_pyr_corner_edge_1080p": 45,
                 "4_match_morph_1080p": 45}

_T0 = time.monotonic()
_TPU_RES = {}      # filled incrementally, config by config
_ERRORS = {}
_META = {}
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
    n_done = len(_TPU_RES)
    tag = "5config" if n_done == len(CONFIG_ORDER) else f"{n_done}of5config"
    out = {
        "metric": f"imgproc_{tag}_geomean_mpix_per_s_per_chip",
        "value": (round(_geomean(list(_TPU_RES.values())), 1)
                  if _TPU_RES else None),
        "unit": "Mpix/s",
        "vs_baseline": round(_geomean(ratios), 2) if ratios else None,
        "configs": configs,
        "elapsed_s": round(time.monotonic() - _T0, 1),
        "batch": BATCH_1080,
        "fast_mode": FAST,
    }
    out.update(_META)
    print(json.dumps(out), flush=True)
    os._exit(code)


def _fail_all(diag):
    """Stamp an explicit diagnostic into every config and emit."""
    for name in CONFIG_ORDER:
        _ERRORS.setdefault(name, diag)
    emit_and_exit(0)


# ------------------------------------------------------------- preflight

def _relay_ports():
    try:
        src = open("/root/.tpu_init.py").read(4096)
        first = src.splitlines()[0]
        if first.startswith("PORTS"):
            return list(eval(first.split("=", 1)[1]))  # noqa: S307 literal
    except Exception:
        pass
    return [8082, 8083, 8087]


def preflight():
    """Return None if the relay accepts connections, else a diagnostic.

    Raw socket only: the axon relay is a local TCP bridge; a dead relay
    is connection-refused in <1s, while the jax client blocks >240s, so
    this must not go through jax.  The device-level probe is the
    RUNNER's own attach (its "attached" heartbeat) — one attach, reused
    for the measurements (modules/ts/src/ts_perf.cpp:1922 contract:
    when the device is gone the output must SAY so per config).
    """
    ports = _relay_ports()
    t0 = time.monotonic()
    open_ports = []
    for port in ports:
        s = socket.socket()
        s.settimeout(2.0)
        try:
            s.connect(("127.0.0.1", port))
            open_ports.append(port)
        except OSError:
            pass
        finally:
            s.close()
    _META["preflight_socket_s"] = round(time.monotonic() - t0, 2)
    if not open_ports:
        return ("tpu unreachable: axon relay down (connection refused "
                f"on ports {ports}; relay process not running)")
    return None


# ------------------------------------------------------- config children

def _child_env():
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", CACHE_DIR)
    return env


def _run_all_configs():
    """One runner child for all configs; the runner doubles as the probe.

    Runner stdout protocol (one JSON object per line):
      {"attached": s}               device attach done (the probe)
      {"tick": name, "stage": s}    stage boundary inside a config
      {"config": name, "mpix_s": x} config complete
      {"config": name, "error": e}  config raised

    The parent bounds the SILENT INTERVAL between lines: the attach
    wall right after a spawn and after any "compile" stage tick (cold
    compiles through the tunnel rival the attach), STALL_S otherwise.
    On a stall it kills the runner, stamps the config, and respawns
    with the remaining configs — downgraded to BENCH_FAST shapes when
    the remaining budget can no longer fit the full ones."""
    respawns = 0
    fast_forced = False
    while True:
        todo = [c for c in CONFIG_ORDER
                if c not in _TPU_RES and c not in _ERRORS]
        if not todo:
            return
        if _remaining() < 45:
            for c in todo:
                _ERRORS[c] = "skipped: global budget exhausted"
            return
        env = _child_env()
        est = sum(_EST_CONFIG_S.get(c, 60) for c in todo)
        attach_due = 0 if respawns == 0 else ATTACH_WALL_S * 0.8
        if not FAST and _remaining() - attach_due < est and respawns:
            # a respawned runner re-pays the attach; if what's left can't
            # fit full shapes, salvage the configs at FAST shapes instead
            # of banking nothing (result is still honest: fast_mode and
            # per-config batch are stamped into the output)
            env["BENCH_FAST"] = "1"
            fast_forced = True
            _META["fast_forced_configs"] = todo
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--runner"] + todo,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            env=env)
        spawned = time.monotonic()
        pending = list(todo)
        window = ATTACH_WALL_S          # first line may include attach
        try:
            while pending:
                deadline = min(window, max(10.0, _remaining() - 10))
                line = _readline_deadline(proc, deadline)
                if line is None:  # stall or runner death
                    raise _RunnerStall(
                        f"no heartbeat within {deadline:.0f}s")
                try:
                    res = json.loads(line)
                except ValueError:
                    raise _RunnerStall(f"bad heartbeat: {line[-200:]}")
                if "attached" in res:
                    _META.setdefault("attach_s", round(
                        time.monotonic() - spawned, 1))
                    window = ATTACH_WALL_S  # first compile rivals attach
                    continue
                if "tick" in res:
                    stage = str(res.get("stage", ""))
                    window = (ATTACH_WALL_S if "compile" in stage
                              else STALL_S)
                    continue
                name = res.get("config")
                if name != pending[0]:
                    raise _RunnerStall(f"out-of-order heartbeat: {line[-200:]}")
                pending.pop(0)
                if "mpix_s" in res:
                    _TPU_RES[name] = float(res["mpix_s"])
                    if fast_forced:
                        _META.setdefault("fast_results", []).append(name)
                else:
                    _ERRORS[name] = str(res.get("error", "unknown"))[:250]
                window = ATTACH_WALL_S  # next config's first compile
            proc.wait(timeout=10)
            return
        except _RunnerStall as e:
            proc.kill()
            proc.wait()
            _ERRORS[pending[0]] = (f"killed: {e} (runner respawns for the "
                                   "remaining configs)")
            respawns += 1
            _META["runner_respawns"] = respawns
            if respawns > len(CONFIG_ORDER):
                for c in CONFIG_ORDER:
                    _ERRORS.setdefault(c, "skipped: runner respawn limit")
                return


class _RunnerStall(Exception):
    pass


def _readline_deadline(proc, deadline):
    """Read one stdout line from proc within deadline; None on timeout/EOF."""
    import selectors
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    buf = []
    end = time.monotonic() + deadline
    try:
        while True:
            left = end - time.monotonic()
            if left <= 0:
                return None
            if not sel.select(timeout=min(left, 5.0)):
                if proc.poll() is not None:
                    return None
                continue
            ch = proc.stdout.readline()
            if ch == "":
                return None  # EOF: runner died
            ch = ch.strip()
            if ch.startswith("{"):
                return ch
            buf.append(ch)  # stray output (jax warnings routed to stdout)
    finally:
        sel.close()


def _sync(x):
    import jax.numpy as jnp
    # block_until_ready is a no-op under the axon tunnel; force a readback
    if isinstance(x, (list, tuple)):
        x = x[0]
    float(jnp.max(jnp.asarray(x).astype(jnp.float32)))


_CUR_CONFIG = [None]


def _tick(stage):
    """Stage-boundary heartbeat; resets the parent's stall window."""
    print(json.dumps({"tick": _CUR_CONFIG[0], "stage": stage}), flush=True)


def _time_tpu(fn, args, iters=None):
    iters = ITERS if iters is None else iters
    _tick("compile")
    out = fn(*args)
    _sync(out)  # compile + sync
    _tick("warm")
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    dt1 = time.perf_counter() - t0
    n = max(1, min(iters, int(60.0 / max(dt1, 1e-3))))
    _tick("measure")
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def _child_setup():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         CACHE_DIR))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass


def runner_main(names):
    """Measure configs sequentially; one JSON heartbeat line per config.

    The first emitted line, {"attached": s}, doubles as the device
    probe — the parent treats its absence within the attach wall as
    "tpu unreachable"."""
    _child_setup()
    import jax
    import jax.numpy as jnp
    t0 = time.monotonic()
    float(jnp.max(jnp.arange(1024, dtype=jnp.float32) * 2 + 1))
    print(json.dumps({"attached": round(time.monotonic() - t0, 1),
                      "backend": jax.default_backend()}), flush=True)
    for name in names:
        _CUR_CONFIG[0] = name
        try:
            mpix = _measure_config(name)
            print(json.dumps({"config": name, "mpix_s": mpix,
                              "batch": BATCH_1080, "fast": FAST}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"config": name,
                              "error": f"{type(e).__name__}: {e}"[:250]}),
                  flush=True)


def child_main(name):
    """Measure ONE config; print {"mpix_s": x} as the last stdout line."""
    _child_setup()
    print(json.dumps({"mpix_s": _measure_config(name)}), flush=True)


def _measure_config(name):
    import jax
    import jax.numpy as jnp
    import opencv_tpu as cv

    rng = np.random.default_rng(0)

    if name == "1_cvt_gauss_1080p":
        x = jax.device_put(rng.integers(
            0, 256, size=(BATCH_1080, 1080, 1920, 3), dtype=np.uint8))

        @jax.jit
        def cfg1(x):
            g = cv.cvtColor(x, cv.COLOR_BGR2GRAY)
            return cv.GaussianBlur(g, (5, 5), 0)

        dt = _time_tpu(cfg1, (x,))
        mpix = BATCH_1080 * 1080 * 1920 / 1e6 / dt

    elif name == "3_pyr_corner_edge_1080p":
        x = jax.device_put(rng.integers(
            0, 256, size=(BATCH_1080, 1080, 1920, 1), dtype=np.uint8))

        @jax.jit
        def cfg3(x):
            p = cv.pyrDown(x)
            h = cv.cornerHarris(x.astype(jnp.float32) / 255., 2, 3, 0.04)
            sx = cv.Sobel(x, cv.CV_16S, 1, 0)
            c = cv.Canny(x, 50, 150)
            return (p.astype(jnp.int32).sum() + h.sum().astype(jnp.int32)
                    + sx.astype(jnp.int32).sum() + c.astype(jnp.int32).sum())

        dt = _time_tpu(cfg3, (x,), iters=min(ITERS, 4))
        mpix = BATCH_1080 * 4 * 1080 * 1920 / 1e6 / dt

    elif name == "4_match_morph_1080p":
        x = jax.device_put(rng.integers(
            0, 256, size=(BATCH_1080, 1080, 1920, 1), dtype=np.uint8))
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

        dt = _time_tpu(cfg4, (x, tmpl), iters=min(ITERS, 4))
        mpix = BATCH_1080 * 4 * 1080 * 1920 / 1e6 / dt

    elif name == "5_orb_1080p":
        n_img = min(32, BATCH_1080)
        x = jax.device_put(rng.integers(
            0, 256, size=(n_img, 1080, 1920), dtype=np.uint8))
        orb = cv.ORB_create(nfeatures=500)
        _tick("compile")        # first call compiles the whole pipeline
        orb.detect_and_compute_batch(x)  # warm (compiles)
        n_orb = min(ITERS, 3)
        t0 = time.perf_counter()
        for i in range(n_orb):
            _tick(f"measure_{i}")
            orb.detect_and_compute_batch(x)
        dt = (time.perf_counter() - t0) / n_orb
        mpix = n_img * 1080 * 1920 / 1e6 / dt

    elif name == "2_resize_warp_4k":
        x = jax.device_put(rng.integers(
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
            return (cv.warpPerspective(x, P, (3840, 2160))
                    .astype(jnp.int32).sum())

        def chain(x):
            return (cfg2_resize(x), cfg2_warp_a(x), cfg2_warp_p(x))

        dt = _time_tpu(chain, (x,), iters=min(ITERS, 4))
        mpix = BATCH_4K * 5 * 2160 * 3840 / 1e6 / dt

    else:
        raise SystemExit(f"unknown config {name}")

    return mpix


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


def _on_alarm(signum, frame):
    _ERRORS.setdefault("_deadline", "global budget hit; partial results")
    emit_and_exit(0)


def main():
    if "--runner" in sys.argv:
        runner_main(sys.argv[sys.argv.index("--runner") + 1:])
        return
    if "--child" in sys.argv:
        child_main(sys.argv[sys.argv.index("--child") + 1])
        return
    if "--cpu-baseline" in sys.argv:
        print(json.dumps(measure_cpu_baseline()))
        return
    # Global deadline: SIGALRM (interrupts python) AND a watchdog thread.
    # Config work happens in killable subprocesses, so the main loop can
    # always reach emit — these are belt-and-braces.
    signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(int(BUDGET_S) + 30)
    watchdog = threading.Timer(BUDGET_S + 35, _on_alarm, args=(None, None))
    watchdog.daemon = True
    watchdog.start()
    try:
        diag = preflight()
        if diag is not None:
            _fail_all(diag)  # emits and exits
        _run_all_configs()
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
