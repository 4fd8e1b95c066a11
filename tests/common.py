"""Shared test utilities: cv2 is the oracle (the CPU-as-oracle pattern the
reference uses for its OpenCL backend tests, ts/include/opencv2/ts/ocl_test.hpp)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

# cv2 border enum ↔ ours are numerically identical; asserted in test_constants.

def rand_img(rng, h, w, c=3, dtype=np.uint8):
    if np.dtype(dtype).kind in "ui":
        info = np.iinfo(dtype)
        img = rng.integers(info.min, info.max + 1, size=(h, w, c), dtype=dtype)
    else:
        img = rng.random((h, w, c), dtype=np.float32 if dtype == np.float32 else None).astype(dtype)
    if c == 1:
        img = img[..., 0]
    return img


def assert_exact(ours, ref, msg=""):
    ours = np.asarray(ours)
    ref = np.asarray(ref)
    assert ours.shape == ref.shape, f"{msg} shape {ours.shape} != {ref.shape}"
    assert ours.dtype == ref.dtype, f"{msg} dtype {ours.dtype} != {ref.dtype}"
    if not np.array_equal(ours, ref):
        diff = np.abs(ours.astype(np.int64) - ref.astype(np.int64)) if ours.dtype.kind in "ui" else np.abs(ours - ref)
        raise AssertionError(
            f"{msg} mismatch: {np.count_nonzero(diff)} px differ, max |d|={diff.max()}")


def assert_near(ours, ref, atol=0, msg=""):
    ours = np.asarray(ours)
    ref = np.asarray(ref)
    assert ours.shape == ref.shape, f"{msg} shape {ours.shape} != {ref.shape}"
    a = ours.astype(np.float64)
    b = ref.astype(np.float64)
    d = np.abs(a - b).max()
    assert d <= atol, f"{msg} max |d|={d} > {atol}"
