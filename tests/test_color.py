"""cvtColor vs cv2 — bit-exact on integer paths (the reference has CRC-level
bit-exact tests for these, imgproc/test/test_color.cpp:2823)."""

import os

import numpy as np
import pytest

from common import cv2, rand_img, assert_exact, assert_near

import opencv_tpu as tcv

INT_CODES_3CH = [
    "COLOR_BGR2GRAY", "COLOR_RGB2GRAY",
    "COLOR_BGR2RGB",
    "COLOR_BGR2BGRA", "COLOR_BGR2RGBA",
    "COLOR_BGR2YCrCb", "COLOR_RGB2YCrCb",
    "COLOR_YCrCb2BGR", "COLOR_YCrCb2RGB",
    "COLOR_BGR2YUV", "COLOR_RGB2YUV",
    "COLOR_YUV2BGR", "COLOR_YUV2RGB",
    "COLOR_BGR2XYZ", "COLOR_RGB2XYZ",
    "COLOR_XYZ2BGR", "COLOR_XYZ2RGB",
]

INT_CODES_4CH = [
    "COLOR_BGRA2BGR", "COLOR_RGBA2BGR", "COLOR_BGRA2RGBA",
    "COLOR_BGRA2GRAY", "COLOR_RGBA2GRAY",
]

GRAY_CODES = ["COLOR_GRAY2BGR", "COLOR_GRAY2BGRA"]


@pytest.mark.parametrize("code", INT_CODES_3CH)
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_cvtcolor_int_3ch(code, dtype):
    rng = np.random.default_rng(0)
    img = rand_img(rng, 263, 255, 3, dtype)
    ref = cv2.cvtColor(img, getattr(cv2, code))
    ours = tcv.cvtColor(img, getattr(tcv, code))
    assert_exact(ours, ref, code)


@pytest.mark.parametrize("code", INT_CODES_4CH)
def test_cvtcolor_int_4ch(code):
    rng = np.random.default_rng(1)
    img = rand_img(rng, 65, 77, 4, np.uint8)
    ref = cv2.cvtColor(img, getattr(cv2, code))
    ours = tcv.cvtColor(img, getattr(tcv, code))
    assert_exact(ours, ref, code)


@pytest.mark.parametrize("code", GRAY_CODES)
def test_cvtcolor_gray(code):
    rng = np.random.default_rng(2)
    img = rand_img(rng, 65, 77, 1, np.uint8)
    ref = cv2.cvtColor(img, getattr(cv2, code))
    ours = tcv.cvtColor(img, getattr(tcv, code))
    assert_exact(ours, ref, code)


@pytest.mark.parametrize("code", ["COLOR_BGR2GRAY", "COLOR_BGR2YCrCb",
                                  "COLOR_YCrCb2BGR", "COLOR_BGR2XYZ",
                                  "COLOR_BGR2YUV", "COLOR_YUV2BGR"])
def test_cvtcolor_float(code):
    rng = np.random.default_rng(3)
    img = rng.random((64, 48, 3), dtype=np.float32)
    ref = cv2.cvtColor(img, getattr(cv2, code))
    ours = np.asarray(tcv.cvtColor(img, getattr(tcv, code)))
    assert_near(ours, ref, atol=1e-5, msg=code)


def test_cvtcolor_batched():
    rng = np.random.default_rng(4)
    batch = rng.integers(0, 256, size=(3, 32, 40, 3), dtype=np.uint8)
    out = np.asarray(tcv.cvtColor(batch, tcv.COLOR_BGR2GRAY))
    assert out.shape == (3, 32, 40, 1)
    for i in range(3):
        ref = cv2.cvtColor(batch[i], cv2.COLOR_BGR2GRAY)
        assert_exact(out[i, :, :, 0], ref)


def test_cvtcolor_jit():
    import jax
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(2, 16, 16, 3), dtype=np.uint8)
    fn = jax.jit(lambda x: tcv.cvtColor(x, tcv.COLOR_BGR2GRAY))
    out = np.asarray(fn(img))
    ref = cv2.cvtColor(img[0], cv2.COLOR_BGR2GRAY)
    assert_exact(out[0, :, :, 0], ref)


HSV_CODES = ["COLOR_BGR2HSV", "COLOR_RGB2HSV", "COLOR_BGR2HSV_FULL",
             "COLOR_BGR2HLS", "COLOR_RGB2HLS", "COLOR_BGR2HLS_FULL"]
HSV_INV = ["COLOR_HSV2BGR", "COLOR_HSV2RGB", "COLOR_HSV2BGR_FULL",
           "COLOR_HLS2BGR", "COLOR_HLS2RGB", "COLOR_HLS2RGB_FULL"]


@pytest.mark.parametrize("code", HSV_CODES)
def test_hsv_hls_u8(code):
    rng = np.random.default_rng(20)
    img = rand_img(rng, 64, 64, 3)
    ref = cv2.cvtColor(img, getattr(cv2, code))
    ours = np.asarray(tcv.cvtColor(img, getattr(tcv, code)))
    if "HSV" in code:
        assert_exact(ours, ref, code)
    else:
        # HLS saturation goes through float division: rare +-1 ties
        assert_near(ours, ref, atol=1, msg=code)


@pytest.mark.parametrize("code", HSV_INV)
def test_hsv_hls_inverse_u8(code):
    rng = np.random.default_rng(21)
    img = rand_img(rng, 64, 64, 3)
    ref = cv2.cvtColor(img, getattr(cv2, code))
    ours = np.asarray(tcv.cvtColor(img, getattr(tcv, code)))
    assert_near(ours, ref, atol=1, msg=code)


@pytest.mark.parametrize("code", ["COLOR_BGR2HSV", "COLOR_HSV2BGR",
                                  "COLOR_BGR2HLS", "COLOR_HLS2BGR"])
def test_hsv_hls_f32(code):
    rng = np.random.default_rng(22)
    if "2BGR" in code:
        img = np.stack([rng.random((32, 32), np.float32) * 360,
                        rng.random((32, 32), np.float32),
                        rng.random((32, 32), np.float32)], axis=-1)
    else:
        img = rng.random((32, 32, 3), dtype=np.float32)
    ref = cv2.cvtColor(img, getattr(cv2, code))
    ours = np.asarray(tcv.cvtColor(img, getattr(tcv, code)))
    assert_near(ours, ref, atol=2e-3, msg=code)


LAB_LUV_U8 = [
    "COLOR_BGR2Lab", "COLOR_RGB2Lab", "COLOR_Lab2BGR", "COLOR_Lab2RGB",
    "COLOR_BGR2Luv", "COLOR_RGB2Luv", "COLOR_Luv2BGR", "COLOR_Luv2RGB",
    "COLOR_LBGR2Lab", "COLOR_Lab2LBGR", "COLOR_Luv2LBGR", "COLOR_LRGB2Lab",
    "COLOR_Lab2LRGB", "COLOR_Luv2LRGB",
]


@pytest.mark.parametrize("code", LAB_LUV_U8)
def test_lab_luv_u8_bitexact(code):
    """u8 Lab/Luv runs the reference's fixed-point/LUT pipelines with
    softfloat-snapshotted tables (tools/gen_lab_luts.py) — bit-exact.
    The full 2^24-input exhaustive check is test_lab_luv_u8_exhaustive
    below (opt-in); here a dense random + boundary grid sample.
    """
    rng = np.random.default_rng(30)
    img = rand_img(rng, 128, 128, 3)
    # all combinations of boundary channel values
    edges = np.array([0, 1, 7, 8, 20, 21, 127, 128, 254, 255], np.uint8)
    grid = np.stack(np.meshgrid(edges, edges, edges, indexing="ij"),
                    axis=-1).reshape(-1, 3)
    pad = -len(grid) % 128
    grid = np.vstack([grid, grid[:pad]]).reshape(-1, 128, 3)
    img = np.vstack([img, grid])
    ref = cv2.cvtColor(img, getattr(cv2, code))
    ours = np.asarray(tcv.cvtColor(img, getattr(tcv, code)))
    assert_exact(ours, ref, code)


@pytest.mark.skipif(os.environ.get("OPENCV_TPU_EXHAUSTIVE") != "1",
                    reason="opt-in: OPENCV_TPU_EXHAUSTIVE=1 (~2 min)")
@pytest.mark.parametrize("code", ["COLOR_BGR2Lab", "COLOR_BGR2Luv",
                                  "COLOR_Lab2BGR", "COLOR_Luv2BGR"])
def test_lab_luv_u8_exhaustive(code):
    """ALL 2^24 u8 inputs vs the wheel — the reproducible form of the
    COVERAGE.md exhaustiveness claim (VERDICT r4 weak #8).  For the
    backward conversions every (L,a,b)/(L,u,v) triple is checked, i.e.
    the whole domain including triples no forward mapping produces."""
    vals = np.arange(256, dtype=np.uint8)
    img = np.stack(np.meshgrid(vals, vals, vals, indexing="ij"),
                   axis=-1).reshape(4096, 4096, 3)
    ref = cv2.cvtColor(img, getattr(cv2, code))
    ours = np.asarray(tcv.cvtColor(img, getattr(tcv, code)))
    diff = np.nonzero(ours != ref)
    assert len(diff[0]) == 0, \
        f"{code}: {len(diff[0])} of 2^24*3 values differ"


def test_lab_luv_f32():
    rng = np.random.default_rng(31)
    img = rng.random((32, 32, 3), dtype=np.float32)
    for code, tol in [("COLOR_BGR2Lab", 0.5), ("COLOR_BGR2Luv", 0.05),
                      ("COLOR_Lab2BGR", 1e-2), ("COLOR_Luv2BGR", 1e-2)]:
        if "2BGR" in code:
            src = cv2.cvtColor(img, getattr(cv2, code.replace("Lab2BGR", "BGR2Lab").replace("Luv2BGR", "BGR2Luv")))
        else:
            src = img
        ref = cv2.cvtColor(src, getattr(cv2, code))
        ours = np.asarray(tcv.cvtColor(src, getattr(tcv, code)))
        assert_near(ours, ref, atol=tol, msg=code)


# ------------------------------------------------- packed 5x5 (565/555)

PACK_TO = [
    "COLOR_BGR2BGR565", "COLOR_RGB2BGR565",
    "COLOR_BGRA2BGR565", "COLOR_RGBA2BGR565",
    "COLOR_BGR2BGR555", "COLOR_RGB2BGR555",
    "COLOR_BGRA2BGR555", "COLOR_RGBA2BGR555",
]
PACK_FROM = [
    "COLOR_BGR5652BGR", "COLOR_BGR5652RGB",
    "COLOR_BGR5652BGRA", "COLOR_BGR5652RGBA",
    "COLOR_BGR5552BGR", "COLOR_BGR5552RGB",
    "COLOR_BGR5552BGRA", "COLOR_BGR5552RGBA",
    "COLOR_BGR5652GRAY", "COLOR_BGR5552GRAY",
]


@pytest.mark.parametrize("code", PACK_TO)
def test_pack5x5(code):
    rng = np.random.default_rng(5)
    cn = 4 if ("BGRA" in code.split("2")[0] or "RGBA" in code.split("2")[0]) else 3
    img = rand_img(rng, 37, 53, cn, np.uint8)
    ref = cv2.cvtColor(img, getattr(cv2, code))
    ours = tcv.cvtColor(img, getattr(tcv, code))
    assert_exact(ours, ref, code)


@pytest.mark.parametrize("code", PACK_FROM)
def test_unpack5x5(code):
    rng = np.random.default_rng(6)
    img = rand_img(rng, 37, 53, 2, np.uint8)
    ref = cv2.cvtColor(img, getattr(cv2, code))
    ours = tcv.cvtColor(img, getattr(tcv, code))
    assert_exact(ours, ref, code)


def test_gray_to_5x5():
    rng = np.random.default_rng(7)
    img = rand_img(rng, 37, 53, 1, np.uint8).reshape(37, 53)
    for code in ["COLOR_GRAY2BGR565", "COLOR_GRAY2BGR555"]:
        ref = cv2.cvtColor(img, getattr(cv2, code))
        ours = tcv.cvtColor(img, getattr(tcv, code))
        assert_exact(ours, ref, code)


# ------------------------------------------------- YUV 4:2:0 / 4:2:2

YUV420_DEC = [
    "COLOR_YUV2BGR_NV12", "COLOR_YUV2RGB_NV12",
    "COLOR_YUV2BGR_NV21", "COLOR_YUV2RGB_NV21",
    "COLOR_YUV2BGRA_NV12", "COLOR_YUV2RGBA_NV21",
    "COLOR_YUV2BGR_I420", "COLOR_YUV2RGB_I420",
    "COLOR_YUV2BGR_YV12", "COLOR_YUV2RGB_YV12",
    "COLOR_YUV2BGRA_I420", "COLOR_YUV2RGBA_YV12",
    "COLOR_YUV2GRAY_420",
]


@pytest.mark.parametrize("code", YUV420_DEC)
def test_yuv420_decode(code):
    rng = np.random.default_rng(8)
    yuv = rand_img(rng, 36, 64, 1, np.uint8).reshape(36, 64)
    ref = cv2.cvtColor(yuv, getattr(cv2, code))
    ours = tcv.cvtColor(yuv, getattr(tcv, code))
    assert_exact(ours, ref, code)


YUV422_DEC = [
    "COLOR_YUV2BGR_YUY2", "COLOR_YUV2RGB_YUY2",
    "COLOR_YUV2BGR_UYVY", "COLOR_YUV2RGB_UYVY",
    "COLOR_YUV2BGR_YVYU", "COLOR_YUV2RGB_YVYU",
    "COLOR_YUV2BGRA_YUY2", "COLOR_YUV2RGBA_UYVY",
    "COLOR_YUV2GRAY_YUY2", "COLOR_YUV2GRAY_UYVY",
]


@pytest.mark.parametrize("code", YUV422_DEC)
def test_yuv422_decode(code):
    rng = np.random.default_rng(9)
    img = rand_img(rng, 24, 32, 2, np.uint8)
    ref = cv2.cvtColor(img, getattr(cv2, code))
    ours = tcv.cvtColor(img, getattr(tcv, code))
    assert_exact(ours, ref, code)


YUV_ENC = [
    ("COLOR_BGR2YUV_I420", 3), ("COLOR_RGB2YUV_I420", 3),
    ("COLOR_BGRA2YUV_I420", 4), ("COLOR_RGBA2YUV_YV12", 4),
    ("COLOR_BGR2YUV_YV12", 3), ("COLOR_RGB2YUV_YV12", 3),
    ("COLOR_BGR2YUV_YUY2", 3), ("COLOR_RGB2YUV_YUY2", 3),
    ("COLOR_BGR2YUV_UYVY", 3), ("COLOR_RGB2YUV_UYVY", 3),
    ("COLOR_BGR2YUV_YVYU", 3), ("COLOR_RGBA2YUV_YUY2", 4),
]


@pytest.mark.parametrize("code,cn", YUV_ENC)
def test_yuv_encode(code, cn):
    rng = np.random.default_rng(10)
    img = rand_img(rng, 36, 64, cn, np.uint8)
    ref = cv2.cvtColor(img, getattr(cv2, code))
    ours = tcv.cvtColor(img, getattr(tcv, code))
    assert_exact(ours, ref, code)


@pytest.mark.parametrize("code", ["COLOR_BayerBG2BGR", "COLOR_BayerGR2RGB",
                                  "COLOR_BayerRG2BGR", "COLOR_BayerGB2RGB"])
def test_cvtcolor_bayer_routing(code):
    """cvtColor routes Bayer codes to the demosaicing engine
    (color.cpp's demosaicing cases); bit-exact vs cv2 incl. the
    border row/column copy convention."""
    rng = np.random.default_rng(5)
    raw = rng.integers(0, 256, (64, 80), np.uint8)
    ours = np.asarray(tcv.cvtColor(raw, getattr(tcv, code)))
    ref = cv2.cvtColor(raw, getattr(cv2, code))
    assert_exact(ours, ref, code)
