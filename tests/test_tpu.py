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


def test_tpu_pallas_kernels_selected():
    """The dispatch registry must actually route to the Pallas tier on
    the real backend (not silently fall back to XLA)."""
    from opencv_tpu.core.dispatch import lookup, kernels_enabled

    assert kernels_enabled()
    assert lookup("sep_filter_int", dtype="uint8", kw=5, kh=5,
                  channels=1, border=4, shift=16, delta=0,
                  out="uint8", max_abs_acc=65536 * 255) is not None
