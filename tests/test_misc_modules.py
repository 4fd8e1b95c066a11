"""ml / HOG / stitching / pipeline-stream modules."""

import numpy as np
import pytest

from common import cv2, rand_img, assert_near

import opencv_tpu as tcv


def test_knearest():
    rng = np.random.default_rng(0)
    X = np.vstack([rng.normal(0, 1, (40, 2)), rng.normal(5, 1, (40, 2))]).astype(np.float32)
    y = np.array([0] * 40 + [1] * 40, np.float32).reshape(-1, 1)
    # the installed reference wheel no longer ships cv2.ml — validate
    # classification behavior directly
    ours = tcv.ml.KNearest_create(); ours.train(X, tcv.ml.ROW_SAMPLE, y)
    Q = np.array([[0.2, 0.1], [5.1, 4.8]], np.float32)
    _, ores, nbrs, dists = ours.findNearest(Q, 5)
    assert ores[0, 0] == 0 and ores[1, 0] == 1
    assert dists.shape == (2, 5) and (np.diff(dists, axis=1) >= 0).all()


def test_normal_bayes():
    rng = np.random.default_rng(1)
    X = np.vstack([rng.normal(0, 1, (60, 3)), rng.normal(4, 1, (60, 3))]).astype(np.float32)
    y = np.array([1] * 60 + [2] * 60, np.int32).reshape(-1, 1)
    ours = tcv.ml.NormalBayesClassifier_create()
    ours.train(X, tcv.ml.ROW_SAMPLE, y)
    _, out = ours.predict(np.float32([[0, 0, 0], [4, 4, 4]]))
    assert out[0, 0] == 1 and out[1, 0] == 2


def test_logistic_regression():
    rng = np.random.default_rng(2)
    X = np.vstack([rng.normal(-1, 0.5, (50, 2)), rng.normal(1, 0.5, (50, 2))]).astype(np.float32)
    y = np.array([0] * 50 + [1] * 50, np.float32)
    lr = tcv.ml.LogisticRegression_create()
    lr.setLearningRate(0.5)
    lr.setIterations(300)
    lr.train(X, tcv.ml.ROW_SAMPLE, y)
    _, out = lr.predict(np.float32([[-1.2, -0.8], [1.1, 0.9]]))
    assert out[0, 0] == 0 and out[1, 0] == 1


def test_hog_descriptor():
    rng = np.random.default_rng(3)
    img = rand_img(rng, 128, 64, 1)
    # reference wheel no longer ships HOGDescriptor; check the canonical
    # 64x128/16/8/8/9 layout invariants instead
    hog_o = tcv.HOGDescriptor()
    assert hog_o.getDescriptorSize() == 3780
    od = hog_o.compute(img)
    assert od.shape == (3780, 1)
    assert np.isfinite(od).all() and 0 <= od.min() and od.max() <= 1.0


def test_stitcher():
    rng = np.random.default_rng(4)
    scene = cv2.GaussianBlur(rng.integers(0, 256, (200, 300, 3), np.uint8),
                             (3, 3), 1)
    a = scene[:, :200]
    b = scene[:, 80:]   # 120 px overlap (ORB's edgeThreshold eats 31/side)
    status, pano = tcv.Stitcher.create().stitch([a, b])
    assert status == tcv.Stitcher.OK
    assert pano.shape[1] >= 290  # covers the full scene width
    # overlap region reconstructs the scene
    d = np.abs(pano[50:150, 50:150].astype(int)
               - scene[50:150, 50:150].astype(int))
    assert np.median(d) <= 2


def test_pipeline_and_stream():
    import jax

    @tcv.pipeline
    def pipe(imgs):
        g = tcv.cvtColor(imgs, tcv.COLOR_BGR2GRAY)
        return tcv.GaussianBlur(g, (3, 3), 0)

    rng = np.random.default_rng(5)
    batches = [rng.integers(0, 256, (2, 32, 32, 3), np.uint8) for _ in range(3)]
    outs = list(tcv.Stream(pipe).run(batches))
    assert len(outs) == 3 and outs[0].shape == (2, 32, 32, 1)
    ref = cv2.GaussianBlur(cv2.cvtColor(batches[0][0], cv2.COLOR_BGR2GRAY), (3, 3), 0)
    assert np.array_equal(np.asarray(outs[0])[0, :, :, 0], ref)
