"""FLANN ANN indexes (kd-tree / kmeans / LSH / linear) + persistence +
FlannBasedMatcher, cross-checked against cv2's FLANN where available."""

import numpy as np
import pytest

from common import cv2

import opencv_tpu as tcv


def _dataset(n=2000, dim=64, nq=100, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(n, dim)).astype(np.float32)
    q = data[:nq] + rng.normal(scale=0.01, size=(nq, dim)).astype(np.float32)
    return data, q


def test_kdtree_recall_vs_reference():
    data, q = _dataset()
    ours = tcv.flann_Index(data, {"algorithm": 1, "trees": 4})
    i_o, _ = ours.knnSearch(q, 1, {"checks": 64})
    recall_ours = (i_o[:, 0] == np.arange(len(q))).mean()

    fl = cv2.flann_Index(data, {"algorithm": 1, "trees": 4})
    i_r, _ = fl.knnSearch(q, 1, params={"checks": 64})
    recall_ref = (i_r[:, 0] == np.arange(len(q))).mean()

    assert recall_ours >= recall_ref - 0.02, (recall_ours, recall_ref)


def test_kmeans_index():
    data, q = _dataset(seed=1)
    idx = tcv.flann_Index(data, {"algorithm": 2, "branching": 16})
    i, d = idx.knnSearch(q, 1, {"checks": 128})
    assert (i[:, 0] == np.arange(len(q))).mean() >= 0.95


def test_lsh_binary():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, (1500, 32), dtype=np.uint8)
    q = data[:50].copy()
    flip = rng.integers(0, 32, 50)
    q[np.arange(50), flip] ^= 1  # 1-bit perturbation
    idx = tcv.flann_Index(data, {"algorithm": 6, "table_number": 8,
                                 "key_size": 16, "multi_probe_level": 1})
    i, d = idx.knnSearch(q, 1, {})
    assert (i[:, 0] == np.arange(50)).mean() >= 0.95
    assert d[i[:, 0] == np.arange(50), 0].max() <= 8


def test_linear_index_exact():
    data, q = _dataset(n=500, nq=20, seed=3)
    idx = tcv.flann_Index(data, {"algorithm": 0})
    i, d = idx.knnSearch(q, 3, {})
    ref = ((q[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    assert (i[:, 0] == ref.argmin(1)).all()
    np.testing.assert_allclose(d[:, 0], ref.min(1), rtol=1e-4)


def test_index_save_load(tmp_path):
    data, q = _dataset(n=800, nq=30, seed=4)
    idx = tcv.flann_Index(data, {"algorithm": 1, "trees": 4})
    i1, d1 = idx.knnSearch(q, 2, {"checks": 48})
    f = str(tmp_path / "idx.npz")
    idx.save(f)
    idx2 = tcv.flann_Index()
    idx2.load(data, f)
    i2, d2 = idx2.knnSearch(q, 2, {"checks": 48})
    assert (i1 == i2).all() and np.allclose(d1, d2)


def test_flann_matcher_sift_scene():
    """Ratio-test matching on a real SIFT pair must find the same good
    matches as cv2's FlannBasedMatcher (recall parity on a warped scene)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (240, 320), np.uint8)
    img = cv2.GaussianBlur(img, (0, 0), 2.0)
    M = cv2.getRotationMatrix2D((160, 120), 12, 0.95)
    img2 = cv2.warpAffine(img, M, (320, 240))

    sift = cv2.SIFT_create(nfeatures=300)
    k1, d1 = sift.detectAndCompute(img, None)
    k2, d2 = sift.detectAndCompute(img2, None)
    if d1 is None or d2 is None or len(d1) < 20 or len(d2) < 20:
        pytest.skip("not enough SIFT features on synthetic scene")

    def good_pairs(matcher, is_cv2):
        mm = matcher.knnMatch(d1, d2, 2)
        good = set()
        for pair in mm:
            if len(pair) == 2 and pair[0].distance < 0.7 * pair[1].distance:
                good.add((pair[0].queryIdx, pair[0].trainIdx))
        return good

    ours = good_pairs(tcv.FlannBasedMatcher(), False)
    refs = good_pairs(cv2.FlannBasedMatcher(), True)
    # ANN search is randomized in both; demand strong overlap and parity
    inter = len(ours & refs)
    assert len(ours) >= 0.9 * len(refs), (len(ours), len(refs))
    assert inter >= 0.8 * min(len(ours), len(refs))
