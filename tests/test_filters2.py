"""Sobel/Scharr/Laplacian, morphology, pyramids, threshold, integral vs cv2."""

import numpy as np
import pytest

from common import cv2, rand_img, assert_exact, assert_near

import opencv_tpu as tcv


# ------------------------------------------------------------ derivatives

@pytest.mark.parametrize("dx,dy,ksize", [(1, 0, 3), (0, 1, 3), (1, 1, 3),
                                         (2, 0, 3), (1, 0, 5), (2, 2, 5),
                                         (1, 0, 7), (0, 3, 7), (1, 0, 1)])
def test_sobel_u8_to_16s(dx, dy, ksize):
    rng = np.random.default_rng(0)
    img = rand_img(rng, 32, 40, 1)
    ref = cv2.Sobel(img, cv2.CV_16S, dx, dy, ksize=ksize)
    ours = np.asarray(tcv.Sobel(img, tcv.CV_16S, dx, dy, ksize=ksize))
    assert_exact(ours, ref, f"sobel {dx},{dy},k{ksize}")


def test_sobel_scale_f32():
    rng = np.random.default_rng(1)
    img = rng.random((30, 30), dtype=np.float32)
    ref = cv2.Sobel(img, -1, 1, 0, ksize=3, scale=0.25, delta=1.0)
    ours = np.asarray(tcv.Sobel(img, -1, 1, 0, ksize=3, scale=0.25, delta=1.0))
    assert_near(ours, ref, atol=1e-5)


def test_scharr():
    rng = np.random.default_rng(2)
    img = rand_img(rng, 24, 26, 1)
    ref = cv2.Scharr(img, cv2.CV_16S, 1, 0)
    ours = np.asarray(tcv.Scharr(img, tcv.CV_16S, 1, 0))
    assert_exact(ours, ref)


@pytest.mark.parametrize("ksize", [1, 3, 5])
def test_laplacian(ksize):
    rng = np.random.default_rng(3)
    img = rand_img(rng, 24, 26, 1)
    ref = cv2.Laplacian(img, cv2.CV_16S, ksize=ksize)
    ours = np.asarray(tcv.Laplacian(img, tcv.CV_16S, ksize=ksize))
    assert_near(ours, ref, atol=1, msg=f"laplacian k{ksize}")


def test_get_deriv_kernels():
    for dx, dy, ks, norm in [(1, 0, 3, False), (2, 1, 5, False),
                             (1, 0, 7, True), (0, 1, -1, False)]:
        rkx, rky = cv2.getDerivKernels(dx, dy, ks, normalize=norm)
        okx, oky = tcv.getDerivKernels(dx, dy, ks, normalize=norm)
        assert_near(okx, rkx, atol=1e-12, msg="kx")
        assert_near(oky, rky, atol=1e-12, msg="ky")


def test_spatial_gradient():
    rng = np.random.default_rng(4)
    img = rand_img(rng, 30, 30, 1)
    rdx, rdy = cv2.spatialGradient(img)
    odx, ody = tcv.spatialGradient(img)
    assert_exact(np.asarray(odx), rdx)
    assert_exact(np.asarray(ody), rdy)


# ------------------------------------------------------------ morphology

@pytest.mark.parametrize("shape", [tcv.MORPH_RECT, tcv.MORPH_CROSS,
                                   tcv.MORPH_ELLIPSE])
@pytest.mark.parametrize("ksize", [(3, 3), (5, 5), (7, 3), (1, 5)])
def test_structuring_element(shape, ksize):
    ref = cv2.getStructuringElement(shape, ksize)
    ours = tcv.getStructuringElement(shape, ksize)
    assert_exact(ours, ref, f"SE {shape} {ksize}")


@pytest.mark.parametrize("op", ["erode", "dilate"])
@pytest.mark.parametrize("shape", [tcv.MORPH_RECT, tcv.MORPH_ELLIPSE,
                                   tcv.MORPH_CROSS])
def test_erode_dilate(op, shape):
    rng = np.random.default_rng(5)
    img = rand_img(rng, 40, 44, 3)
    se = cv2.getStructuringElement(shape, (5, 3))
    ref = getattr(cv2, op)(img, se)
    ours = np.asarray(getattr(tcv, op)(img, se))
    assert_exact(ours, ref, f"{op} shape={shape}")


def test_erode_iterations():
    rng = np.random.default_rng(6)
    img = rand_img(rng, 30, 30, 1)
    se = np.ones((3, 3), np.uint8)
    ref = cv2.erode(img, se, iterations=3)
    ours = np.asarray(tcv.erode(img, se, iterations=3))
    assert_exact(ours, ref)


def test_erode_border_replicate():
    rng = np.random.default_rng(7)
    img = rand_img(rng, 20, 20, 1)
    se = np.ones((3, 3), np.uint8)
    ref = cv2.erode(img, se, borderType=cv2.BORDER_REPLICATE)
    ours = np.asarray(tcv.erode(img, se, borderType=tcv.BORDER_REPLICATE))
    assert_exact(ours, ref)


def test_erode_constant_custom_value():
    rng = np.random.default_rng(8)
    img = rand_img(rng, 20, 20, 1)
    se = np.ones((3, 3), np.uint8)
    ref = cv2.erode(img, se, borderValue=5)
    ours = np.asarray(tcv.erode(img, se, borderValue=5))
    assert_exact(ours, ref)


def test_asymmetric_kernel_dilate():
    rng = np.random.default_rng(9)
    img = rand_img(rng, 20, 24, 1)
    se = np.array([[1, 0, 0], [1, 1, 0], [0, 0, 0]], np.uint8)
    ref_e = cv2.erode(img, se)
    ref_d = cv2.dilate(img, se)
    assert_exact(np.asarray(tcv.erode(img, se)), ref_e, "erode asym")
    assert_exact(np.asarray(tcv.dilate(img, se)), ref_d, "dilate asym")


@pytest.mark.parametrize("op", [tcv.MORPH_OPEN, tcv.MORPH_CLOSE,
                                tcv.MORPH_GRADIENT, tcv.MORPH_TOPHAT,
                                tcv.MORPH_BLACKHAT])
def test_morphology_ex(op):
    rng = np.random.default_rng(10)
    img = rand_img(rng, 30, 30, 1)
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
    ref = cv2.morphologyEx(img, op, se)
    ours = np.asarray(tcv.morphologyEx(img, op, se))
    assert_exact(ours, ref, f"morphEx {op}")


# -------------------------------------------------------------- pyramids

@pytest.mark.parametrize("shape", [(48, 64), (47, 63), (33, 41)])
def test_pyr_down_u8(shape):
    rng = np.random.default_rng(11)
    img = rand_img(rng, shape[0], shape[1], 3)
    ref = cv2.pyrDown(img)
    ours = np.asarray(tcv.pyrDown(img))
    assert_exact(ours, ref, f"pyrDown {shape}")


def test_pyr_down_f32():
    rng = np.random.default_rng(12)
    img = rng.random((40, 40), dtype=np.float32)
    ref = cv2.pyrDown(img)
    ours = np.asarray(tcv.pyrDown(img))
    assert_near(ours, ref, atol=1e-5)


@pytest.mark.parametrize("shape", [(24, 32), (17, 21)])
def test_pyr_up_u8(shape):
    rng = np.random.default_rng(13)
    img = rand_img(rng, shape[0], shape[1], 3)
    ref = cv2.pyrUp(img)
    ours = np.asarray(tcv.pyrUp(img))
    assert_exact(ours, ref, f"pyrUp {shape}")


def test_build_pyramid():
    rng = np.random.default_rng(14)
    img = rand_img(rng, 64, 64, 1)
    levels = tcv.buildPyramid(img, 3)
    ref = img
    assert len(levels) == 4
    for lv in range(1, 4):
        ref = cv2.pyrDown(ref)
        assert_exact(np.asarray(levels[lv]), ref, f"level {lv}")


# -------------------------------------------------------------- threshold

@pytest.mark.parametrize("ttype", [tcv.THRESH_BINARY, tcv.THRESH_BINARY_INV,
                                   tcv.THRESH_TRUNC, tcv.THRESH_TOZERO,
                                   tcv.THRESH_TOZERO_INV])
def test_threshold_u8(ttype):
    rng = np.random.default_rng(15)
    img = rand_img(rng, 30, 30, 1)
    rret, ref = cv2.threshold(img, 127.4, 200, ttype)
    oret, ours = tcv.threshold(img, 127.4, 200, ttype)
    assert float(oret) == rret
    assert_exact(np.asarray(ours), ref, f"thresh {ttype}")


def test_threshold_otsu():
    rng = np.random.default_rng(16)
    img = np.concatenate([rng.normal(80, 10, 400), rng.normal(180, 12, 500)])
    img = np.clip(img, 0, 255).astype(np.uint8).reshape(30, 30)
    rret, ref = cv2.threshold(img, 0, 255, cv2.THRESH_BINARY | cv2.THRESH_OTSU)
    oret, ours = tcv.threshold(img, 0, 255, tcv.THRESH_BINARY | tcv.THRESH_OTSU)
    assert float(oret) == rret
    assert_exact(np.asarray(ours), ref)


def test_threshold_triangle():
    rng = np.random.default_rng(17)
    img = np.clip(rng.normal(100, 30, 900), 0, 255).astype(np.uint8).reshape(30, 30)
    rret, ref = cv2.threshold(img, 0, 255, cv2.THRESH_BINARY | cv2.THRESH_TRIANGLE)
    oret, ours = tcv.threshold(img, 0, 255, tcv.THRESH_BINARY | tcv.THRESH_TRIANGLE)
    assert float(oret) == rret
    assert_exact(np.asarray(ours), ref)


def test_threshold_f32():
    rng = np.random.default_rng(18)
    img = rng.random((20, 20), dtype=np.float32)
    rret, ref = cv2.threshold(img, 0.5, 1.0, cv2.THRESH_BINARY)
    oret, ours = tcv.threshold(img, 0.5, 1.0, tcv.THRESH_BINARY)
    assert_near(np.asarray(ours), ref, atol=0)


@pytest.mark.parametrize("method", [tcv.ADAPTIVE_THRESH_MEAN_C,
                                    tcv.ADAPTIVE_THRESH_GAUSSIAN_C])
def test_adaptive_threshold(method):
    rng = np.random.default_rng(19)
    img = rand_img(rng, 40, 40, 1)
    ref = cv2.adaptiveThreshold(img, 255, method, cv2.THRESH_BINARY, 11, 5.0)
    ours = np.asarray(tcv.adaptiveThreshold(img, 255, method,
                                            tcv.THRESH_BINARY, 11, 5.0))
    assert_exact(ours, ref, f"adaptive {method}")


# -------------------------------------------------------------- integral

def test_integral_u8():
    rng = np.random.default_rng(20)
    img = rand_img(rng, 30, 40, 1)
    ref = cv2.integral(img)
    ours = np.asarray(tcv.integral(img))
    assert_exact(ours, ref)


def test_integral2():
    rng = np.random.default_rng(21)
    img = rand_img(rng, 30, 40, 1)
    rsum, rsq = cv2.integral2(img)
    osum, osq = tcv.integral2(img)
    assert_exact(np.asarray(osum), rsum)
    assert_near(np.asarray(osq), rsq, atol=4)  # f32 vs f64 sqsum


def test_integral3_tilted():
    rng = np.random.default_rng(22)
    img = rand_img(rng, 16, 20, 1)
    rsum, rsq, rtil = cv2.integral3(img)
    osum, osq, otil = tcv.integral3(img)
    assert_exact(np.asarray(osum), rsum)
    assert_exact(np.asarray(otil).astype(rtil.dtype), rtil, "tilted")


def test_filter2d_large_kernel_dft_path():
    """Large kernels route through the DFT path (filter.dispatch.cpp:1274)
    and must stay within the float tolerance contract vs cv2."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (96, 120, 3), np.uint8)
    k = rng.random((13, 11)).astype(np.float32)
    k /= k.sum()
    ref = cv2.filter2D(img, -1, k)
    ours = np.asarray(tcv.filter2D(img, -1, k))
    assert_near(ours, ref, atol=1, msg="filter2D dft u8")

    imf = rng.random((80, 90), np.float32)
    kf = rng.standard_normal((9, 9)).astype(np.float32)
    reff = cv2.filter2D(imf, -1, kf)
    oursf = np.asarray(tcv.filter2D(imf, -1, kf))
    assert np.max(np.abs(oursf - reff)) < 1e-3 * np.abs(reff).max()
