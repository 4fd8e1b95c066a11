"""GaussianBlur / blur / boxFilter vs cv2.

The u8 GaussianBlur path must be bit-exact (the reference's own contract,
imgproc/test/test_smooth_bitexact.cpp)."""

import numpy as np
import pytest

from common import cv2, rand_img, assert_exact, assert_near

import opencv_tpu as tcv

BORDERS = [tcv.BORDER_CONSTANT, tcv.BORDER_REPLICATE, tcv.BORDER_REFLECT,
           tcv.BORDER_REFLECT_101]


@pytest.mark.parametrize("ksize,sigma", [
    ((3, 3), 0), ((5, 5), 0), ((7, 7), 0), ((9, 9), 0),
    ((3, 3), 1.75), ((3, 3), 0.875), ((5, 5), 0.375), ((5, 5), 0.75),
    ((7, 7), 2.0), ((5, 5), 1.1), ((11, 11), 3.0), ((21, 21), 5.0),
])
@pytest.mark.parametrize("border", BORDERS)
def test_gaussian_u8_bitexact(ksize, sigma, border):
    rng = np.random.default_rng(0)
    img = rand_img(rng, 49, 53, 3)
    ref = cv2.GaussianBlur(img, ksize, sigma, borderType=border)
    ours = tcv.GaussianBlur(img, ksize, sigma, borderType=border)
    assert_exact(ours, ref, f"k={ksize} s={sigma} b={border}")


def test_gaussian_u8_auto_ksize():
    rng = np.random.default_rng(1)
    img = rand_img(rng, 40, 40, 1)
    for sigma in [0.5, 1.0, 1.5, 2.2, 3.0]:
        ref = cv2.GaussianBlur(img, (0, 0), sigma)
        ours = tcv.GaussianBlur(img, (0, 0), sigma)
        assert_exact(ours, ref, f"auto sigma={sigma}")


def test_gaussian_u8_asymmetric():
    rng = np.random.default_rng(2)
    img = rand_img(rng, 31, 37, 3)
    ref = cv2.GaussianBlur(img, (3, 7), 1.0, sigmaY=2.5)
    ours = tcv.GaussianBlur(img, (3, 7), 1.0, sigmaY=2.5)
    assert_exact(ours, ref)


def test_gaussian_f32():
    rng = np.random.default_rng(3)
    img = rng.random((47, 53, 3), dtype=np.float32)
    ref = cv2.GaussianBlur(img, (5, 5), 1.5)
    ours = np.asarray(tcv.GaussianBlur(img, (5, 5), 1.5))
    assert_near(ours, ref, atol=1e-5)


def test_gaussian_u16():
    rng = np.random.default_rng(4)
    img = rand_img(rng, 33, 35, 1, np.uint16)
    ref = cv2.GaussianBlur(img, (5, 5), 1.5)
    ours = tcv.GaussianBlur(img, (5, 5), 1.5)
    assert_near(np.asarray(ours), ref, atol=1)


def test_get_gaussian_kernel():
    for n, sigma in [(3, 0), (5, 0), (7, 1.5), (9, 2.5), (13, 0)]:
        ref = cv2.getGaussianKernel(n, sigma)
        ours = tcv.getGaussianKernel(n, sigma)
        # softdouble exp vs libm exp: <=1 ulp
        assert_near(ours, ref, atol=4e-16)


@pytest.mark.parametrize("ksize", [(3, 3), (5, 5), (7, 3), (15, 15)])
@pytest.mark.parametrize("border", BORDERS)
def test_blur_u8(ksize, border):
    rng = np.random.default_rng(5)
    img = rand_img(rng, 41, 43, 3)
    ref = cv2.blur(img, ksize, borderType=border)
    ours = tcv.blur(img, ksize, borderType=border)
    assert_near(np.asarray(ours), ref, atol=1)


def test_box_filter_unnormalized():
    rng = np.random.default_rng(6)
    img = rand_img(rng, 21, 23, 1)
    ref = cv2.boxFilter(img, cv2.CV_32F, (5, 5), normalize=False)
    ours = np.asarray(tcv.boxFilter(img, tcv.CV_32F, (5, 5), normalize=False))
    assert_near(ours, ref, atol=0)


def test_sep_filter2d_u8():
    rng = np.random.default_rng(7)
    img = rand_img(rng, 30, 32, 3)
    kx = cv2.getGaussianKernel(5, 1.0)
    ky = cv2.getGaussianKernel(3, 0.8)
    ref = cv2.sepFilter2D(img, -1, kx, ky)
    ours = np.asarray(tcv.sepFilter2D(img, -1, kx, ky))
    assert_near(ours, ref, atol=1)


def test_filter2d_float_vs_cv2():
    rng = np.random.default_rng(8)
    img = rng.random((32, 34, 3), dtype=np.float32)
    kern = rng.random((3, 5), dtype=np.float32) - 0.25
    ref = cv2.filter2D(img, -1, kern)
    ours = np.asarray(tcv.filter2D(img, -1, kern))
    assert_near(ours, ref, atol=2e-5)


def test_filter2d_u8():
    rng = np.random.default_rng(9)
    img = rand_img(rng, 32, 34, 3)
    kern = np.array([[0, -1, 0], [-1, 5, -1], [0, -1, 0]], np.float32)
    ref = cv2.filter2D(img, -1, kern)
    ours = np.asarray(tcv.filter2D(img, -1, kern))
    assert_near(ours, ref, atol=1)
