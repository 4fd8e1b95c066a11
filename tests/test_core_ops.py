"""Core arithmetic / stats / LUT ops vs cv2."""

import numpy as np
import pytest

from common import cv2, rand_img, assert_exact, assert_near

import opencv_tpu as tcv


def _imgs(seed=0, dtype=np.uint8):
    rng = np.random.default_rng(seed)
    a = rand_img(rng, 24, 32, 3, dtype)
    b = rand_img(rng, 24, 32, 3, dtype)
    return a, b


def test_add_sub():
    a, b = _imgs()
    assert_exact(np.asarray(tcv.add(a, b)), cv2.add(a, b))
    assert_exact(np.asarray(tcv.subtract(a, b)), cv2.subtract(a, b))
    assert_exact(np.asarray(tcv.absdiff(a, b)), cv2.absdiff(a, b))


def test_multiply_divide():
    a, b = _imgs(1)
    assert_near(np.asarray(tcv.multiply(a, b, scale=1 / 255.0)),
                cv2.multiply(a, b, scale=1 / 255.0), atol=1)
    assert_near(np.asarray(tcv.divide(a, b, scale=8.0)),
                cv2.divide(a, b, scale=8.0), atol=1)


def test_add_weighted():
    a, b = _imgs(2)
    assert_near(np.asarray(tcv.addWeighted(a, 0.3, b, 0.6, 10.0)),
                cv2.addWeighted(a, 0.3, b, 0.6, 10.0), atol=1)


def test_bitwise():
    a, b = _imgs(3)
    for name in ["bitwise_and", "bitwise_or", "bitwise_xor"]:
        assert_exact(np.asarray(getattr(tcv, name)(a, b)),
                     getattr(cv2, name)(a, b), name)
    assert_exact(np.asarray(tcv.bitwise_not(a)), cv2.bitwise_not(a))


def test_min_max_compare():
    a, b = _imgs(4)
    assert_exact(np.asarray(tcv.min(a, b)), cv2.min(a, b))
    assert_exact(np.asarray(tcv.max(a, b)), cv2.max(a, b))
    g1 = cv2.cvtColor(a, cv2.COLOR_BGR2GRAY)
    g2 = cv2.cvtColor(b, cv2.COLOR_BGR2GRAY)
    for op in range(6):
        assert_exact(np.asarray(tcv.compare(g1, g2, op)),
                     cv2.compare(g1, g2, op), f"cmp {op}")


def test_in_range():
    a, _ = _imgs(5)
    ref = cv2.inRange(a, (10, 20, 30), (200, 210, 220))
    ours = np.asarray(tcv.inRange(a, (10, 20, 30), (200, 210, 220)))
    assert_exact(ours, ref)


def test_lut():
    a, _ = _imgs(6)
    rng = np.random.default_rng(7)
    lut = rng.integers(0, 256, 256, dtype=np.uint8)
    assert_exact(np.asarray(tcv.LUT(a, lut)), cv2.LUT(a, lut))


def test_convert_scale_abs():
    a, _ = _imgs(8)
    assert_near(np.asarray(tcv.convertScaleAbs(a, alpha=1.5, beta=-20)),
                cv2.convertScaleAbs(a, alpha=1.5, beta=-20), atol=1)


def test_normalize_minmax():
    a, _ = _imgs(9)
    g = cv2.cvtColor(a, cv2.COLOR_BGR2GRAY)
    ref = cv2.normalize(g, None, 0, 255, cv2.NORM_MINMAX)
    ours = np.asarray(tcv.normalize(g, None, 0, 255, tcv.NORM_MINMAX))
    assert_near(ours, ref, atol=1)


def test_split_merge_flip_rotate_transpose():
    a, _ = _imgs(10)
    chans = tcv.split(a)
    assert len(chans) == 3
    assert_exact(np.asarray(chans[1]), cv2.split(a)[1])
    assert_exact(np.asarray(tcv.merge(chans)), a)
    for code in (0, 1, -1):
        assert_exact(np.asarray(tcv.flip(a, code)), cv2.flip(a, code), f"flip{code}")
    for code in (tcv.ROTATE_90_CLOCKWISE, tcv.ROTATE_180,
                 tcv.ROTATE_90_COUNTERCLOCKWISE):
        assert_exact(np.asarray(tcv.rotate(a, code)), cv2.rotate(a, code),
                     f"rot{code}")
    g = cv2.cvtColor(a, cv2.COLOR_BGR2GRAY)
    assert_exact(np.asarray(tcv.transpose(g)), cv2.transpose(g))


def test_min_max_loc_mean_norm():
    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, (31, 37), np.uint8)
    rmin, rmax, rminloc, rmaxloc = cv2.minMaxLoc(g)
    omin, omax, ominloc, omaxloc = tcv.minMaxLoc(g)
    assert (rmin, rmax) == (omin, omax)
    assert rminloc == ominloc and rmaxloc == omaxloc
    assert_near(np.asarray(tcv.mean(g)), np.asarray(cv2.mean(g)), atol=1e-3)
    for nt in (tcv.NORM_L1, tcv.NORM_L2, tcv.NORM_INF):
        assert abs(tcv.norm(g, nt) - cv2.norm(g, nt)) < max(1.0, cv2.norm(g, nt) * 1e-5)
    assert tcv.countNonZero(g) == cv2.countNonZero(g)


def test_mean_std_dev():
    a, _ = _imgs(12)
    rmu, rsd = cv2.meanStdDev(a)
    omu, osd = tcv.meanStdDev(a)
    assert_near(omu, rmu, atol=1e-2)
    assert_near(osd, rsd, atol=1e-2)


def test_cart_polar():
    rng = np.random.default_rng(13)
    x = rng.normal(0, 10, (16, 16)).astype(np.float32)
    y = rng.normal(0, 10, (16, 16)).astype(np.float32)
    rm, ra = cv2.cartToPolar(x, y)
    om, oa = tcv.cartToPolar(x, y)
    assert_near(np.asarray(om), rm, atol=1e-3)
    # phase is coarse in the reference (atan2 LUT approx) — tolerance
    da = np.abs(np.asarray(oa) - ra)
    da = np.minimum(da, 2 * np.pi - da)
    assert da.max() < 1e-2


def test_dft_idft():
    rng = np.random.default_rng(14)
    x = rng.random((16, 24)).astype(np.float32)
    ref = cv2.dft(x, flags=cv2.DFT_COMPLEX_OUTPUT)
    ours = np.asarray(tcv.dft(x, flags=tcv.DFT_COMPLEX_OUTPUT))
    assert_near(ours, ref, atol=1e-3)
    back = np.asarray(tcv.idft(ours, flags=tcv.DFT_SCALE | tcv.DFT_REAL_OUTPUT))
    assert_near(back, x, atol=1e-5)


def test_dct():
    rng = np.random.default_rng(15)
    x = rng.random((16, 16)).astype(np.float32)
    ref = cv2.dct(x)
    ours = np.asarray(tcv.dct(x))
    assert_near(ours, ref, atol=1e-4)
    assert_near(np.asarray(tcv.idct(ours)), x, atol=1e-5)


def test_optimal_dft_size():
    for n in [1, 7, 13, 100, 255, 256, 1000]:
        assert tcv.getOptimalDFTSize(n) == cv2.getOptimalDFTSize(n)


def test_gabor_kernel():
    ref = cv2.getGaborKernel((21, 21), 4.0, 0.5, 10.0, 0.5, 1.0)
    ours = tcv.getGaborKernel((21, 21), 4.0, 0.5, 10.0, 0.5, 1.0)
    assert_near(ours, ref, atol=1e-10)


def test_mul_spectrums():
    rng = np.random.default_rng(16)
    a = rng.random((8, 8, 2)).astype(np.float32)
    b = rng.random((8, 8, 2)).astype(np.float32)
    ref = cv2.mulSpectrums(a, b, 0)
    ours = np.asarray(tcv.mulSpectrums(a, b, 0))
    assert_near(ours, ref, atol=1e-5)
    ref = cv2.mulSpectrums(a, b, 0, conjB=True)
    ours = np.asarray(tcv.mulSpectrums(a, b, 0, conjB=True))
    assert_near(ours, ref, atol=1e-5)


def test_accumulate():
    rng = np.random.default_rng(17)
    src = rand_img(rng, 16, 16, 1)
    dst = rng.random((16, 16)).astype(np.float32) * 10
    ref = dst.copy(); cv2.accumulate(src, ref)
    ours = np.asarray(tcv.accumulate(src, dst))
    assert_near(ours, ref, atol=1e-4)
    ref = dst.copy(); cv2.accumulateWeighted(src, ref, 0.3)
    ours = np.asarray(tcv.accumulateWeighted(src, dst, 0.3))
    assert_near(ours, ref, atol=1e-4)


# ------------------------------------------------- linalg public surface

def test_solve_modes():
    rng = np.random.default_rng(0)
    A = rng.random((5, 5)) + np.eye(5) * 3
    A = A @ A.T  # symmetric PD (DECOMP_CHOLESKY reads one triangle)
    b = rng.random((5, 1))
    for flags in [tcv.DECOMP_LU, tcv.DECOMP_SVD, tcv.DECOMP_CHOLESKY]:
        r_ref, x_ref = cv2.solve(A, b, flags=flags)
        r_our, x_our = tcv.solve(A, b, flags)
        assert r_our == r_ref
        np.testing.assert_allclose(x_our, x_ref, atol=1e-10)
    # overdetermined with DECOMP_NORMAL
    A = rng.random((8, 3))
    b = rng.random((8, 1))
    r_ref, x_ref = cv2.solve(A, b, flags=cv2.DECOMP_NORMAL + cv2.DECOMP_LU)
    r_our, x_our = tcv.solve(A, b, tcv.DECOMP_NORMAL + tcv.DECOMP_LU)
    np.testing.assert_allclose(x_our, x_ref, atol=1e-8)


def test_svdecomp():
    rng = np.random.default_rng(1)
    a = rng.random((6, 4))
    for flags in [0, cv2.SVD_FULL_UV]:
        w_r, u_r, vt_r = cv2.SVDecomp(a, flags=flags)
        w_o, u_o, vt_o = tcv.SVDecomp(a, flags)
        assert u_o.shape == u_r.shape and vt_o.shape == vt_r.shape
        np.testing.assert_allclose(w_o, w_r, atol=1e-10)
        # reconstruct (signs may differ per column)
        k = w_o.shape[0]
        rec_o = (u_o[:, :k] * w_o.ravel()) @ vt_o[:k]
        np.testing.assert_allclose(rec_o, a, atol=1e-10)


def test_eigen_pca():
    rng = np.random.default_rng(2)
    X = rng.random((40, 5)).astype(np.float32)
    S = np.cov(X.T)
    r_ref, ev_ref, evec_ref = cv2.eigen(S)
    r_our, ev_our, evec_our = tcv.eigen(S)
    np.testing.assert_allclose(ev_our, ev_ref, atol=1e-10)
    for i in range(5):  # rows up to sign
        assert min(np.abs(evec_our[i] - evec_ref[i]).max(),
                   np.abs(evec_our[i] + evec_ref[i]).max()) < 1e-8

    m_ref, v_ref = cv2.PCACompute(X, mean=None, maxComponents=3)
    m_our, v_our = tcv.PCACompute(X, None, maxComponents=3)
    np.testing.assert_allclose(m_our, m_ref, atol=1e-5)
    for i in range(3):
        assert min(np.abs(v_our[i] - v_ref[i]).max(),
                   np.abs(v_our[i] + v_ref[i]).max()) < 1e-4
    m2, v2, e2 = tcv.PCACompute2(X, None)
    m2r, v2r, e2r = cv2.PCACompute2(X, mean=None)
    np.testing.assert_allclose(e2.ravel(), e2r.ravel(), rtol=1e-4)
    # project/backproject roundtrip
    p_our = tcv.PCAProject(X, m_our, v_our)
    back = tcv.PCABackProject(p_our, m_our, v_our)
    p_ref = cv2.PCAProject(X, m_ref, v_ref)
    assert np.abs(np.abs(p_our) - np.abs(p_ref)).max() < 1e-3
    assert np.abs(back - X).max() < 1.0  # lossy (3 of 5 comps)


def test_transform_invert_misc():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 200, (6, 7, 3), np.uint8)
    M = np.float32([[0, 0, 1, 10], [1, 0, 0, 0]])
    np.testing.assert_array_equal(tcv.transform(img, M),
                                  cv2.transform(img, M))
    Mf = rng.random((3, 3))
    imgf = rng.random((6, 7, 3)).astype(np.float32)
    np.testing.assert_allclose(tcv.transform(imgf, Mf),
                               cv2.transform(imgf, Mf), atol=1e-5)
    A = rng.random((4, 4)) + 2 * np.eye(4)
    r_ref, inv_ref = cv2.invert(A)
    r_our, inv_our = tcv.invert(A)
    np.testing.assert_allclose(inv_our, inv_ref, atol=1e-10)
    assert abs(tcv.determinant(A) - cv2.determinant(A)) < 1e-8
    d = rng.random(3)
    e = rng.random(3)
    ic = np.linalg.inv(np.cov(rng.random((10, 3)).T))
    assert abs(tcv.Mahalanobis(d, e, ic) - cv2.Mahalanobis(d, e, ic)) < 1e-10
    a = rng.random((5, 3))
    np.testing.assert_allclose(tcv.mulTransposed(a, True),
                               cv2.mulTransposed(a, True), atol=1e-12)


def test_estimate_affine_2d():
    rng = np.random.default_rng(4)
    pts = rng.random((30, 2)).astype(np.float32) * 100
    A = np.array([[1.1, 0.2, 3.0], [-0.1, 0.9, 4.0]])
    dst = (pts @ A[:, :2].T + A[:, 2]).astype(np.float32)
    # add outliers
    dst[::7] += 50
    M_ref, inl_ref = cv2.estimateAffine2D(pts, dst)
    M_our, inl_our = tcv.estimateAffine2D(pts, dst)
    np.testing.assert_allclose(M_our, A, atol=1e-3)
    np.testing.assert_allclose(M_ref, M_our, atol=1e-3)
    assert (inl_our.ravel() > 0).sum() == (inl_ref.ravel() > 0).sum()

    th = np.deg2rad(20)
    S = 1.3 * np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    dst = (pts @ S.T + [5, -2]).astype(np.float32)
    M_our, _ = tcv.estimateAffinePartial2D(pts, dst)
    M_ref, _ = cv2.estimateAffinePartial2D(pts, dst)
    np.testing.assert_allclose(M_our, M_ref, atol=1e-4)


def test_kmeans():
    rng = np.random.default_rng(5)
    blobs = np.concatenate([
        rng.normal((0, 0), 0.3, (40, 2)),
        rng.normal((5, 5), 0.3, (40, 2)),
        rng.normal((0, 5), 0.3, (40, 2)),
    ]).astype(np.float32)
    crit = (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 1e-4)
    comp_ref, lbl_ref, C_ref = cv2.kmeans(blobs, 3, None, crit, 5,
                                          cv2.KMEANS_PP_CENTERS)
    comp_our, lbl_our, C_our = tcv.kmeans(blobs, 3, None, crit, 5,
                                          tcv.KMEANS_PP_CENTERS)
    assert lbl_our.shape == lbl_ref.shape and C_our.shape == C_ref.shape
    assert comp_our <= comp_ref * 1.05  # same optimum on separated blobs
    # centers agree as sets
    d = np.abs(C_our[:, None] - C_ref[None]).sum(-1)
    assert (d.min(axis=1) < 0.2).all()


def test_rng_surface():
    tcv.setRNGSeed(7)
    a = np.zeros((4, 4), np.float32)
    tcv.randu(a, 0, 1)
    assert 0 <= a.min() and a.max() <= 1 and a.std() > 0
    b = np.zeros((100,), np.float64)
    tcv.randn(b, 0.0, 2.0)
    assert 1.0 < b.std() < 3.0


def test_dft_ccs_packing():
    rng = np.random.default_rng(7)
    for shape in [(4, 6), (5, 6), (4, 7), (5, 7), (8, 8)]:
        a = rng.random(shape).astype(np.float32)
        ref = cv2.dft(a)
        ours = np.asarray(tcv.dft(a))
        np.testing.assert_allclose(ours, ref, atol=1e-3)
        back_r = cv2.idft(ref, flags=cv2.DFT_SCALE | cv2.DFT_REAL_OUTPUT)
        back_o = np.asarray(tcv.idft(ours,
                                     flags=tcv.DFT_SCALE | tcv.DFT_REAL_OUTPUT))
        np.testing.assert_allclose(back_o, back_r, atol=1e-4)
        np.testing.assert_allclose(back_o, a, atol=1e-4)
