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


def test_ml_classifiers_xor():
    """SVM/trees/boost/MLP/EM (the 5.0 wheel has no cv2.ml —
    accuracy-threshold self tests on XOR + blobs)."""
    from opencv_tpu import ml
    rng = np.random.default_rng(0)

    def make_xor(n):
        X = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
        return X, ((X[:, 0] > 0) ^ (X[:, 1] > 0)).astype(np.int32)

    Xtr, ytr = make_xor(400)
    Xte, yte = make_xor(200)

    svm = ml.SVM_create()
    svm.setKernel(ml.SVM.RBF)
    svm.setC(5.0)
    svm.setGamma(2.0)
    svm.train(Xtr, 0, ytr)
    _, p = svm.predict(Xte)
    assert (p.ravel() == yte).mean() > 0.9
    assert len(svm.getSupportVectors()) > 0

    dt = ml.DTrees_create()
    dt.setMaxDepth(8)
    dt.train(Xtr, 0, ytr)
    assert (dt.predict(Xte)[1].ravel() == yte).mean() > 0.95

    rt = ml.RTrees_create()
    rt.setTermCriteria((3, 30, 0))
    rt.train(Xtr, 0, ytr)
    assert (rt.predict(Xte)[1].ravel() == yte).mean() > 0.95

    bo = ml.Boost_create()
    bo.setWeakCount(80)
    bo.setMaxDepth(2)
    bo.train(Xtr, 0, ytr)
    assert (bo.predict(Xte)[1].ravel() == yte).mean() > 0.95

    mlp = ml.ANN_MLP_create()
    mlp.setLayerSizes([2, 16, 1])
    mlp.setTrainMethod(0, 0.2)
    mlp.setTermCriteria((3, 400, 0))
    mlp.train(Xtr, 0, ytr.astype(np.float32) * 2 - 1)
    assert ((mlp.predict(Xte)[1].ravel() > 0) == yte).mean() > 0.85

    em = ml.EM_create()
    em.setClustersNumber(2)
    blobs = np.concatenate([rng.normal((0, 0), 0.3, (100, 2)),
                            rng.normal((3, 3), 0.5, (100, 2))])
    ok, ll, lbl, resp = em.trainEM(blobs)
    assert ok
    a = lbl.ravel()[:100]
    assert max((a == 0).mean(), (a == 1).mean()) > 0.98


def test_filestorage_yaml_xml_json_cross():
    import tempfile, os
    tmp = tempfile.mkdtemp()
    M = np.arange(6, dtype=np.float64).reshape(2, 3) + 0.25
    B = np.arange(4, dtype=np.uint8).reshape(2, 2)
    for ext in ("yml", "xml", "json"):
        p = os.path.join(tmp, "ours." + ext)
        fs = tcv.FileStorage(p, tcv.FILE_STORAGE_WRITE)
        fs.write("M", M)
        fs.write("count", 42)
        fs.write("name", "hello")
        fs.write("B", B)
        fs.release()
        rfs = cv2.FileStorage(p, cv2.FILE_STORAGE_READ)
        assert np.allclose(rfs.getNode("M").mat(), M), ext
        assert rfs.getNode("count").real() == 42
        assert rfs.getNode("name").string() == "hello"
        assert np.array_equal(rfs.getNode("B").mat(), B)
        p2 = os.path.join(tmp, "ref." + ext)
        wfs = cv2.FileStorage(p2, cv2.FILE_STORAGE_WRITE)
        wfs.write("M", M)
        wfs.write("count", 42)
        wfs.write("name", "hello")
        wfs.write("B", B)
        wfs.release()
        ofs = tcv.FileStorage(p2, tcv.FILE_STORAGE_READ)
        assert np.allclose(ofs.getNode("M").mat(), M), ext
        assert ofs.getNode("count").real() == 42
        assert ofs.getNode("name").string() == "hello"
        assert np.array_equal(ofs.getNode("B").mat(), B)


def test_multiband_blender():
    rng = np.random.default_rng(0)
    H, W = 100, 140
    a = np.zeros((H, W, 3), np.uint8)
    b = np.zeros((H, W, 3), np.uint8)
    a[:] = (180, 60, 40)
    b[:] = (40, 80, 200)
    # seam down the middle with soft weights
    wa = np.zeros((H, W), np.float32)
    wb = np.zeros((H, W), np.float32)
    wa[:, :80] = 1.0
    wb[:, 60:] = 1.0
    from opencv_tpu.blenders import blend_multiband
    out = blend_multiband([a, b], [wa, wb], num_bands=4)
    assert out.shape == a.shape
    # pure regions keep their color, the seam transitions smoothly
    assert np.abs(out[50, 10].astype(int) - a[50, 10].astype(int)).max() <= 2
    assert np.abs(out[50, 130].astype(int) - b[50, 130].astype(int)).max() <= 2
    mid = out[50, 60:80, 2].astype(int)
    assert (np.diff(mid) >= -12).all()  # monotone-ish blue ramp
    # class surface
    bl = tcv.MultiBandBlender(num_bands=4)
    bl.prepare((0, 0, W, H))
    bl.feed(a, np.full((H, W), 255, np.uint8), (0, 0))
    bl.feed(b, np.full((H, W), 255, np.uint8), (0, 0))
    res, mask = bl.blend()
    assert res.shape == a.shape and mask.shape == (H, W)


def test_gapi_graph_serialization():
    from opencv_tpu import gapi

    gin = gapi.GMat()
    g = gapi.g_op("cvtColor", gin, code=tcv.COLOR_BGR2GRAY)
    b = gapi.g_op("gaussianBlur", g, ksize=(5, 5), sigmaX=0.0)
    r = gapi.g_op("resize", b, dsize=(32, 24))
    comp = gapi.GComputation(gin, r)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 64, 3), np.uint8)
    out1 = np.asarray(comp.apply(img))

    blob = gapi.serialize(comp)
    comp2 = gapi.deserialize(blob)
    out2 = np.asarray(comp2.apply(img))
    assert np.array_equal(out1, out2)

    # oracle: same chain eagerly
    ref = np.asarray(tcv.resize(tcv.GaussianBlur(
        tcv.cvtColor(img, tcv.COLOR_BGR2GRAY), (5, 5), 0), (32, 24)))
    assert np.array_equal(out1, ref)

    # arithmetic sugar + multi-output
    a = gapi.GMat()
    bg = gapi.GMat()
    s = a + bg
    d = gapi.g_op("absDiff", a, bg)
    comp3 = gapi.GComputation([a, bg], [s, d])
    x = rng.integers(0, 256, (8, 8), np.uint8)
    y = rng.integers(0, 256, (8, 8), np.uint8)
    os_, od = comp3.apply(x, y)
    assert np.array_equal(np.asarray(os_), np.asarray(tcv.add(x, y)))
    assert np.array_equal(np.asarray(od), np.asarray(tcv.absdiff(x, y)))


def test_gapi_compiled_serialization():
    from opencv_tpu import gapi

    def pipe(x):
        g = tcv.cvtColor(x, tcv.COLOR_BGR2GRAY)
        return tcv.GaussianBlur(g, (3, 3), 0)

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (2, 32, 40, 3), np.uint8)
    blob = gapi.serialize_compiled(pipe, img)
    assert isinstance(blob, bytes) and len(blob) > 100
    fn = gapi.deserialize_compiled(blob)
    out = np.asarray(fn(img))
    assert np.array_equal(out, np.asarray(pipe(img)))


def test_y4m_roundtrip():
    """Y4M writer/capture round-trip through the bit-exact I420 path."""
    import tempfile, os
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, (48, 64, 3), np.uint8) for _ in range(3)]
    path = os.path.join(tempfile.mkdtemp(), "clip.y4m")
    wr = tcv.VideoWriter(path, 0, 30.0, (64, 48))
    for f in frames:
        wr.write(f)
    wr.release()
    cap = tcv.VideoCapture(path)
    assert cap.isOpened()
    assert cap.get(tcv.CAP_PROP_FPS) == 30.0
    got = []
    while True:
        ok, img = cap.read()
        if not ok:
            break
        got.append(img)
    assert len(got) == 3
    # 4:2:0 chroma subsampling is lossy; luma-dominant content should be
    # close after the round trip
    for a, b in zip(got, frames):
        ya = cv2.cvtColor(a, cv2.COLOR_BGR2GRAY).astype(int)
        yb = cv2.cvtColor(b, cv2.COLOR_BGR2GRAY).astype(int)
        assert np.abs(ya - yb).mean() < 3


def test_svmsgd():
    """SVMSGD (ml/src/svmsgd.cpp): self-validated (the 5.0 wheel ships
    no cv2.ml) — linearly separable data must be classified perfectly
    by both SGD and ASGD, soft and hard margins."""
    from opencv_tpu import ml
    rng = np.random.default_rng(0)
    n = 120
    X = rng.normal(0, 1, (n, 2)).astype(np.float32)
    w_true = np.array([1.5, -2.0], np.float32)
    y = np.where(X @ w_true + 0.3 > 0, 1.0, -1.0).astype(np.float32)
    # margin gap so the SGD iterates converge cleanly
    keep = np.abs(X @ w_true + 0.3) > 0.4
    X, y = X[keep], y[keep]
    for t in (ml.SVMSGD.SGD, ml.SVMSGD.ASGD):
        for m in (ml.SVMSGD.SOFT_MARGIN, ml.SVMSGD.HARD_MARGIN):
            s = ml.SVMSGD_create()
            s.setOptimalParameters(t, m)
            assert s.train(X, 0, y)
            _, pred = s.predict(X)
            acc = float((pred.ravel() == y).mean())
            assert acc >= 0.97, (t, m, acc)
    assert s.getWeights().shape == (1, 2)
