"""photo module vs cv2 (NL-means, HDR, inpaint) — these are
approximation-tolerant algorithms; compare quality metrics."""

import numpy as np
import pytest

from common import cv2, rand_img

import opencv_tpu as tcv


def test_nl_means_denoising():
    rng = np.random.default_rng(0)
    clean = cv2.GaussianBlur(rng.integers(0, 256, (64, 64), np.uint8), (7, 7), 3)
    noisy = np.clip(clean.astype(int) + rng.normal(0, 15, clean.shape), 0,
                    255).astype(np.uint8)
    ref = cv2.fastNlMeansDenoising(noisy, None, 10)
    ours = np.asarray(tcv.fastNlMeansDenoising(noisy, 10))
    def psnr(a, b):
        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 10 * np.log10(255 ** 2 / max(mse, 1e-9))
    # both must denoise (PSNR vs clean better than noisy), similar quality
    p_noisy = psnr(noisy, clean)
    p_ref = psnr(ref, clean)
    p_ours = psnr(ours, clean)
    assert p_ours > p_noisy + 1.0
    assert p_ours > p_ref - 3.0, f"ours {p_ours:.1f} vs ref {p_ref:.1f}"


def test_merge_mertens():
    rng = np.random.default_rng(1)
    base = rng.integers(30, 220, (64, 64, 3), np.uint8)
    exposures = [np.clip(base.astype(int) * s, 0, 255).astype(np.uint8)
                 for s in (0.4, 1.0, 2.0)]
    ref = cv2.createMergeMertens().process(exposures)
    ours = np.asarray(tcv.createMergeMertens().process(exposures))
    # same dynamic range and high correlation
    r = np.corrcoef(ref.ravel(), ours.ravel())[0, 1]
    assert r > 0.98, f"correlation {r}"


def test_merge_debevec_calibrate():
    rng = np.random.default_rng(2)
    base = rng.integers(20, 200, (32, 32, 3), np.uint8)
    times = np.array([0.25, 1.0, 4.0], np.float32)
    exposures = [np.clip(base.astype(float) * t, 0, 255).astype(np.uint8)
                 for t in times]
    resp = tcv.createCalibrateDebevec().process(exposures, times)
    hdr = tcv.createMergeDebevec().process(exposures, times, resp)
    assert hdr.shape == base.shape and np.isfinite(hdr).all()
    ldr = tcv.createTonemapReinhard().process(hdr)
    assert 0 <= ldr.min() and ldr.max() <= 1.0


def test_inpaint():
    rng = np.random.default_rng(3)
    img = cv2.GaussianBlur(rng.integers(0, 256, (48, 48), np.uint8), (7, 7), 2)
    mask = np.zeros((48, 48), np.uint8)
    mask[20:28, 20:28] = 255
    damaged = img.copy()
    damaged[mask > 0] = 0
    ours = np.asarray(tcv.inpaint(damaged, mask, 3, tcv.INPAINT_TELEA))
    ref = cv2.inpaint(damaged, mask, 3, cv2.INPAINT_TELEA)
    # filled region must approximate the original better than the hole
    err_ours = np.abs(ours[mask > 0].astype(int) - img[mask > 0]).mean()
    err_hole = np.abs(0 - img[mask > 0].astype(int)).mean()
    assert err_ours < err_hole * 0.35
