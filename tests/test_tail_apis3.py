"""Round-3 sweep part 3 vs the cv2 oracle: preCornerDetect,
thresholdWithMask, cvtColorTwoPlane, GFTT-with-quality, optical-flow
pyramid + .flo IO, knn match drawing, multi-page in-memory codecs,
matMulDeriv / RQDecomp3x3, temporal colored NL-means."""

import numpy as np
import pytest

from common import cv2, assert_exact

import opencv_tpu as tcv


def _img(seed=0, h=40, w=50, c=1):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    return rng.integers(0, 255, shape, np.uint8)


def test_pre_corner_detect():
    a = _img(1)
    for ks in (3, 5):
        ref = cv2.preCornerDetect(a, ks)
        got = np.asarray(tcv.preCornerDetect(a, ks))
        assert np.allclose(got, ref, atol=1e-3), ks
    f = _img(2).astype(np.float32) / 255.0
    ref = cv2.preCornerDetect(f, 3)
    got = np.asarray(tcv.preCornerDetect(f, 3))
    assert np.allclose(got, ref, atol=1e-5)


def test_threshold_with_mask():
    a = _img(3)
    m = (_img(4) > 128).astype(np.uint8) * 255
    for ttype in (cv2.THRESH_BINARY, cv2.THRESH_TOZERO,
                  cv2.THRESH_BINARY | cv2.THRESH_OTSU):
        dst_ref = a.copy()
        rv_ref, dst_ref = cv2.thresholdWithMask(a, dst_ref, m, 100, 255,
                                                ttype)
        rv_got, dst_got = tcv.thresholdWithMask(a, a.copy(), m, 100, 255,
                                                ttype)
        assert abs(rv_got - rv_ref) < 1e-6, ttype
        assert_exact(dst_got, dst_ref, f"type {ttype}")


def test_cvt_color_two_plane():
    h, w = 32, 40
    y = _img(5, h, w)
    uv = _img(6, h // 2, w // 2, 2)
    for code in (cv2.COLOR_YUV2BGR_NV12, cv2.COLOR_YUV2RGB_NV21):
        ref = cv2.cvtColorTwoPlane(y, uv, code)
        got = np.asarray(tcv.cvtColorTwoPlane(y, uv, code))
        assert_exact(got, ref, str(code))


def test_gftt_with_quality():
    a = cv2.GaussianBlur(_img(7, 64, 64), (3, 3), 1.0)
    ref_c, ref_q = cv2.goodFeaturesToTrackWithQuality(
        a, 20, 0.05, 5.0, None)
    got_c, got_q = tcv.goodFeaturesToTrackWithQuality(a, 20, 0.05, 5.0)
    assert got_c.shape[0] == ref_c.shape[0]
    assert np.allclose(np.asarray(got_c).reshape(-1, 2),
                       np.asarray(ref_c).reshape(-1, 2))
    assert np.allclose(np.asarray(got_q).ravel(),
                       np.asarray(ref_q).ravel(), rtol=1e-4)


def test_build_optical_flow_pyramid():
    a = _img(8, 60, 80)
    ref_n, ref_pyr = cv2.buildOpticalFlowPyramid(
        a, (11, 11), 3, withDerivatives=False)
    got_n, got_pyr = tcv.buildOpticalFlowPyramid(
        a, (11, 11), 3, withDerivatives=False)
    assert got_n == ref_n
    assert len(got_pyr) == len(ref_pyr)
    for g, r in zip(got_pyr, ref_pyr):
        assert_exact(g, r)
    # derivative planes (CV_16SC2 unnormalized Scharr)
    ref_n, ref_pyr = cv2.buildOpticalFlowPyramid(
        a, (11, 11), 2, withDerivatives=True)
    got_n, got_pyr = tcv.buildOpticalFlowPyramid(
        a, (11, 11), 2, withDerivatives=True)
    assert got_n == ref_n and len(got_pyr) == len(ref_pyr)
    for i, (g, r) in enumerate(zip(got_pyr, ref_pyr)):
        assert_exact(g, r, f"pyr[{i}]")


def test_optical_flow_io(tmp_path):
    rng = np.random.default_rng(9)
    flow = rng.normal(0, 3, (20, 30, 2)).astype(np.float32)
    p_ref = str(tmp_path / "ref.flo")
    p_got = str(tmp_path / "got.flo")
    assert cv2.writeOpticalFlow(p_ref, flow)
    assert tcv.writeOpticalFlow(p_got, flow)
    with open(p_ref, "rb") as f1, open(p_got, "rb") as f2:
        assert f1.read() == f2.read()
    back = tcv.readOpticalFlow(p_ref)
    assert_exact(back, cv2.readOpticalFlow(p_got))
    assert_exact(back, flow)


def test_draw_matches_knn():
    img1 = _img(10, 40, 40, 3)
    img2 = _img(11, 40, 40, 3)
    kp1 = [cv2.KeyPoint(10.0, 10.0, 3), cv2.KeyPoint(20.0, 15.0, 3)]
    kp2 = [cv2.KeyPoint(12.0, 11.0, 3), cv2.KeyPoint(25.0, 18.0, 3)]
    knn = [[cv2.DMatch(0, 0, 0.5), cv2.DMatch(0, 1, 0.9)],
           [cv2.DMatch(1, 1, 0.4)]]
    out = tcv.drawMatchesKnn(img1, kp1, img2, kp2, knn, None,
                             matchColor=(0, 255, 0))
    assert out.shape == (40, 80, 3)
    assert (out[:, :, 1] == 255).any()   # some green lines drawn


def test_multi_page_memory_codecs():
    pages = [_img(12, 16, 20), _img(13, 16, 20)]
    ok, buf = tcv.imencodemulti(".tiff", pages)
    assert ok
    ok_ref, ref_pages = cv2.imdecodemulti(
        np.asarray(buf, np.uint8), cv2.IMREAD_ANYCOLOR)
    assert ok_ref and len(ref_pages) == 2
    ok_got, got_pages = tcv.imdecodemulti(
        np.asarray(buf, np.uint8), tcv.IMREAD_ANYCOLOR)
    assert ok_got and len(got_pages) == 2
    for g, r, orig in zip(got_pages, ref_pages, pages):
        assert_exact(g, r)
        assert_exact(g, orig)


def test_mat_mul_deriv():
    rng = np.random.default_rng(14)
    A = rng.random((3, 4))
    B = rng.random((4, 5))
    ref_dA, ref_dB = cv2.matMulDeriv(A, B)
    got_dA, got_dB = tcv.matMulDeriv(A, B)
    assert np.allclose(got_dA, ref_dA)
    assert np.allclose(got_dB, ref_dB)


def test_rq_decomp():
    rng = np.random.default_rng(15)
    for i in range(5):
        R = cv2.Rodrigues(rng.normal(0, 0.8, 3))[0]
        K = np.array([[500, 2, 320], [0, 480, 240], [0, 0, 1]],
                     np.float64)
        M = K @ R
        ref = cv2.RQDecomp3x3(M)
        got = tcv.RQDecomp3x3(M)
        assert np.allclose(got[0], np.asarray(ref[0]).ravel(),
                           atol=1e-8), i
        assert np.allclose(got[1], ref[1], atol=1e-8)
        assert np.allclose(got[2], ref[2], atol=1e-8)
        for j in (3, 4, 5):
            assert np.allclose(got[j], ref[j], atol=1e-8)


def test_colored_multi_denoise():
    rng = np.random.default_rng(16)
    base = _img(17, 24, 24, 3).astype(np.int32)
    frames = [np.clip(base + rng.normal(0, 8, base.shape), 0,
                      255).astype(np.uint8) for _ in range(3)]
    ref = cv2.fastNlMeansDenoisingColoredMulti(frames, 1, 3, None, 4, 4,
                                               5, 9)
    got = np.asarray(tcv.fastNlMeansDenoisingColoredMulti(
        frames, 1, 3, 4, 4, 5, 9))
    assert got.shape == ref.shape
    # same algorithm family; allow small per-pixel drift
    assert np.mean(np.abs(got.astype(int) - ref.astype(int))) < 3.0
    assert np.max(np.abs(got.astype(int) - ref.astype(int))) <= 30
