"""On-TPU verification tier: the bit-exact core ops run COMPILED on the
real chip (Pallas kernels included) and compare against the cv2 oracle.

Run:  OPENCV_TPU_TESTS_TPU=1 python -m pytest tests/test_tpu.py -m tpu -q

Mirrors the reference's CPU-as-oracle OCL tests
(ts/include/opencv2/ts/ocl_test.hpp:92): same op, two backends, compare.
cv2 and the axon TPU client must not share a process (deadlock risk), so
the oracle side runs in a clean subprocess over .npy files.
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

_ON_TPU = os.environ.get("OPENCV_TPU_TESTS_TPU") == "1"

if not _ON_TPU:
    pytest.skip("set OPENCV_TPU_TESTS_TPU=1 to run the on-chip tier",
                allow_module_level=True)


_ORACLE = r"""
import json, sys
import numpy as np
import cv2
d = sys.argv[1]
x = np.load(d + "/in.npy")
se5 = np.ones((5, 5), np.uint8)
out = {}
refs = []
for i in range(x.shape[0]):
    g = x[i]
    refs.append(dict(
        gray=None,
        gauss=cv2.GaussianBlur(g, (5, 5), 0),
        sobel=cv2.Sobel(g, cv2.CV_16S, 1, 0),
        box=cv2.blur(g, (9, 9)),
        erode=cv2.erode(g, se5),
        pyr=cv2.pyrDown(g),
        resize=cv2.resize(g, (97, 61), interpolation=cv2.INTER_LINEAR),
        thresh=cv2.threshold(g, 127, 255, cv2.THRESH_BINARY)[1],
        canny=cv2.Canny(g, 50, 150),
    ))
for k in refs[0]:
    if refs[0][k] is not None:
        np.save(d + f"/ref_{k}.npy", np.stack([r[k] for r in refs]))
c = np.load(d + "/in3.npy")
np.save(d + "/ref_cvt.npy",
        np.stack([cv2.cvtColor(im, cv2.COLOR_BGR2GRAY) for im in c]))
print("OK")
"""


@pytest.fixture(scope="module")
def tpu_results():
    import jax
    import jax.numpy as jnp
    import opencv_tpu as cv

    assert jax.default_backend() != "cpu", \
        "on-TPU tier requires the real backend"

    rng = np.random.default_rng(0)
    gray = rng.integers(0, 256, (4, 240, 320), np.uint8)
    bgr = rng.integers(0, 256, (4, 120, 160, 3), np.uint8)
    g = jax.device_put(gray[..., None])
    c = jax.device_put(bgr)
    se5 = np.ones((5, 5), np.uint8)

    @jax.jit
    def pipe(x, col):
        return dict(
            gauss=cv.GaussianBlur(x, (5, 5), 0),
            sobel=cv.Sobel(x, cv.CV_16S, 1, 0),
            box=cv.blur(x, (9, 9)),
            erode=cv.erode(x, se5),
            pyr=cv.pyrDown(x),
            resize=cv.resize(x, (97, 61), interpolation=cv.INTER_LINEAR),
            thresh=cv.threshold(x, 127, 255, cv.THRESH_BINARY)[1],
            canny=cv.Canny(x, 50, 150),
            cvt=cv.cvtColor(col, cv.COLOR_BGR2GRAY),
        )

    outs = pipe(g, c)
    float(jnp.max(outs["gauss"].astype(jnp.float32)))  # hard sync

    d = tempfile.mkdtemp(prefix="tcv_tpu_")
    np.save(d + "/in.npy", gray)
    np.save(d + "/in3.npy", bgr)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run([sys.executable, "-c", _ORACLE, d],
                       capture_output=True, text=True, env=env,
                       timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    return d, {k: np.asarray(v) for k, v in outs.items()}


@pytest.mark.parametrize("op", ["gauss", "sobel", "box", "erode", "pyr",
                                "resize", "thresh", "canny", "cvt"])
def test_tpu_bitexact(tpu_results, op):
    d, outs = tpu_results
    ref = np.load(d + f"/ref_{op}.npy")
    got = outs[op]
    if got.ndim == 4 and got.shape[-1] == 1:
        got = got[..., 0]
    assert got.shape == ref.shape, (got.shape, ref.shape)
    assert np.array_equal(got, ref), \
        f"{op}: {np.count_nonzero(got != ref)} px differ on the chip"


_ORACLE2 = r"""
import sys
import numpy as np
import cv2
# The wheel routes INTER_CUBIC through IPP (Intel's closed binary), which
# differs from OpenCV's own resize.cpp fixed-point algorithm on ~5.6% of
# pixels (+-1).  We implement the documented resize.cpp path
# (modules/imgproc/src/resize.cpp:961-1020, Q11 short coeffs), so the
# oracle is the wheel with IPP off; warps and the other ops here are
# unaffected by the switch (measured r5).
cv2.ipp.setUseIPP(False)
d = sys.argv[1]
x = np.load(d + "/in2.npy")          # (B, H, W) u8
c = np.load(d + "/in23.npy")         # (B, H, W, 3) u8
M = np.load(d + "/warp_m.npy")
P = np.load(d + "/warp_p.npy")
refs = {}
for i in range(x.shape[0]):
    g, im = x[i], c[i]
    r = dict(
        warpa=cv2.warpAffine(g, M, (320, 240)),
        warpp=cv2.warpPerspective(g, P, (320, 240)),
        resize_area=cv2.resize(g, (160, 120), interpolation=cv2.INTER_AREA),
        resize_cubic=cv2.resize(g, (200, 150),
                                interpolation=cv2.INTER_CUBIC),
        lab=cv2.cvtColor(im, cv2.COLOR_BGR2Lab),
        luv=cv2.cvtColor(im, cv2.COLOR_BGR2Luv),
        labback=cv2.cvtColor(cv2.cvtColor(im, cv2.COLOR_BGR2Lab),
                             cv2.COLOR_Lab2BGR),
        eqhist=cv2.equalizeHist(g),
        clahe=cv2.createCLAHE(2.0, (7, 4)).apply(g),
        otsu=cv2.threshold(g, 0, 255,
                           cv2.THRESH_BINARY + cv2.THRESH_OTSU)[1],
        match=cv2.matchTemplate(g, x[0][60:90, 100:140],
                                cv2.TM_CCOEFF_NORMED),
    )
    for k, v in r.items():
        refs.setdefault(k, []).append(v)
for k, v in refs.items():
    np.save(d + f"/ref2_{k}.npy", np.stack(v))
print("OK")
"""


@pytest.fixture(scope="module")
def tpu_results2():
    import jax
    import jax.numpy as jnp
    import opencv_tpu as cv

    assert jax.default_backend() != "cpu"
    rng = np.random.default_rng(5)
    gray = rng.integers(0, 256, (4, 240, 320), np.uint8)
    bgr = rng.integers(0, 256, (4, 120, 160, 3), np.uint8)
    g = jax.device_put(gray[..., None])
    c = jax.device_put(bgr)
    M = np.asarray(cv.getRotationMatrix2D((160.0, 120.0), 12.5, 0.9))
    P = np.array([[0.96, 0.04, 3.0], [-0.03, 1.01, 2.0],
                  [1e-5, -2e-5, 1.0]], np.float64)
    tmpl = gray[0][60:90, 100:140]

    @jax.jit
    def pipe(x, col):
        return dict(
            warpa=cv.warpAffine(x, M, (320, 240)),
            warpp=cv.warpPerspective(x, P, (320, 240)),
            resize_area=cv.resize(x, (160, 120),
                                  interpolation=cv.INTER_AREA),
            resize_cubic=cv.resize(x, (200, 150),
                                   interpolation=cv.INTER_CUBIC),
            lab=cv.cvtColor(col, cv.COLOR_BGR2Lab),
            luv=cv.cvtColor(col, cv.COLOR_BGR2Luv),
            labback=cv.cvtColor(cv.cvtColor(col, cv.COLOR_BGR2Lab),
                                cv.COLOR_Lab2BGR),
            eqhist=cv.equalizeHist(x),
            clahe=cv.createCLAHE(2.0, (7, 4)).apply(x),
            otsu=cv.threshold(x, 0, 255,
                              cv.THRESH_BINARY + cv.THRESH_OTSU)[1],
            match=cv.matchTemplate(x, tmpl, cv.TM_CCOEFF_NORMED),
        )

    outs = pipe(g, c)
    float(jnp.max(outs["eqhist"].astype(jnp.float32)))  # hard sync

    d = tempfile.mkdtemp(prefix="tcv_tpu2_")
    np.save(d + "/in2.npy", gray)
    np.save(d + "/in23.npy", bgr)
    np.save(d + "/warp_m.npy", M)
    np.save(d + "/warp_p.npy", P)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run([sys.executable, "-c", _ORACLE2, d],
                       capture_output=True, text=True, env=env,
                       timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    return d, {k: np.asarray(v) for k, v in outs.items()}


@pytest.mark.parametrize("op", ["resize_area", "lab", "luv", "labback",
                                "eqhist", "otsu", "clahe"])
def test_tpu_bitexact2(tpu_results2, op):
    d, outs = tpu_results2
    ref = np.load(d + f"/ref2_{op}.npy")
    got = outs[op]
    if got.ndim == 4 and got.shape[-1] == 1:
        got = got[..., 0]
    assert np.array_equal(got, ref), \
        f"{op}: {np.count_nonzero(got != ref)} px differ on the chip"


@pytest.mark.parametrize("op,atol,frac", [
    ("warpa", 1, 0.995), ("warpp", 1, 0.995), ("resize_cubic", 1, 0.9999)])
def test_tpu_near_u8(tpu_results2, op, atol, frac):
    """u8 paths with documented rare +-1 rounding ties."""
    d, outs = tpu_results2
    ref = np.load(d + f"/ref2_{op}.npy").astype(np.int32)
    got = outs[op]
    if got.ndim == 4 and got.shape[-1] == 1:
        got = got[..., 0]
    diff = np.abs(got.astype(np.int32) - ref)
    assert diff.max() <= atol, f"{op}: maxdiff {diff.max()}"
    assert (diff == 0).mean() >= frac, f"{op}: exact {(diff == 0).mean()}"


def test_tpu_match_template(tpu_results2):
    d, outs = tpu_results2
    ref = np.load(d + "/ref2_match.npy")
    got = outs["match"]
    if got.ndim == 4 and got.shape[-1] == 1:
        got = got[..., 0]
    assert np.allclose(got, ref, atol=1e-3), \
        f"matchTemplate maxdiff {np.abs(got - ref).max()}"


def test_tpu_orb_oracle():
    """ORB end-to-end on the chip vs the wheel (overlap metrics as in
    tests/test_features2d.py)."""
    import opencv_tpu as tcv

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (240, 320), np.uint8)
    ok, od = tcv.ORB_create(nfeatures=200).detectAndCompute(img, None)

    d = tempfile.mkdtemp(prefix="tcv_orb_")
    np.save(d + "/img.npy", img)
    oracle = (
        "import sys, numpy as np, cv2\n"
        "d = sys.argv[1]\n"
        "img = np.load(d + '/img.npy')\n"
        "rk, rd = cv2.ORB_create(nfeatures=200).detectAndCompute(img, None)\n"
        "np.save(d + '/kp.npy', np.array([[k.pt[0], k.pt[1], k.octave]"
        " for k in rk]))\n"
        "np.save(d + '/desc.npy', rd)\n"
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run([sys.executable, "-c", oracle, d],
                       capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    kp = np.load(d + "/kp.npy")
    rd = np.load(d + "/desc.npy")
    rset = {(round(p[0]), round(p[1]), int(p[2])) for p in kp}
    oset = {(round(k.pt[0]), round(k.pt[1]), k.octave) for k in ok}
    inter = len(rset & oset)
    assert inter >= 0.97 * max(len(rset), len(oset)), \
        f"kp overlap {inter}/{max(len(rset), len(oset))}"
    rmap = {(round(p[0]), round(p[1]), int(p[2])): i
            for i, p in enumerate(kp)}
    omap = {(round(k.pt[0]), round(k.pt[1]), k.octave): i
            for i, k in enumerate(ok)}
    common = list(rset & oset)
    ham = np.asarray(
        [int(np.unpackbits(np.bitwise_xor(rd[rmap[c]], od[omap[c]])).sum())
         for c in common])
    assert np.mean(ham) < 4.0 and np.median(ham) <= 1.0


def test_tpu_sharded_collective():
    """shard_map + psum compiled against the real backend (mesh over the
    available chips; size-1 meshes still exercise the collective path)."""
    import jax
    import numpy as np_
    from opencv_tpu.parallel import mesh as pm

    x = np_.random.default_rng(3).integers(
        0, 256, (8, 64, 64, 1), np_.uint8)
    mesh = pm.make_mesh(n_data=len(jax.devices()))
    hist = np_.asarray(pm.sharded_hist(x, mesh))
    ref = np_.bincount(x.reshape(-1), minlength=256)
    assert np_.array_equal(hist, ref)


def test_tpu_pallas_kernels_selected():
    """The dispatch registry must actually route to the Pallas tier on
    the real backend (not silently fall back to XLA)."""
    from opencv_tpu.core.dispatch import lookup, kernels_enabled

    assert kernels_enabled()
    assert lookup("sep_filter_int", dtype="uint8", kw=5, kh=5,
                  channels=1, border=4, shift=16, delta=0,
                  out="uint8", max_abs_acc=65536 * 255) is not None
