"""Tail APIs vs the cv2 oracle: fitLine, applyColorMap, convexityDefects,
ellipse2Poly, mixChannels, setIdentity, completeSymm, solveCubic,
solvePoly, PSNR, batchDistance, imreadmulti/imwritemulti/imcount,
linearPolar/logPolar."""

import numpy as np
import pytest

from common import cv2, assert_exact

import opencv_tpu as tcv


def test_fitline_l2_2d():
    rng = np.random.default_rng(0)
    t = rng.random(60)
    pts = np.stack([10 + 30 * t + rng.normal(0, 0.3, 60),
                    5 + 12 * t + rng.normal(0, 0.3, 60)],
                   axis=1).astype(np.float32)
    ref = cv2.fitLine(pts, cv2.DIST_L2, 0, 0.01, 0.01).ravel()
    got = tcv.fitLine(pts, tcv.DIST_L2, 0, 0.01, 0.01).ravel()
    if np.dot(ref[:2], got[:2]) < 0:
        got = np.concatenate([-got[:2], got[2:]])
    assert np.allclose(got, ref, atol=1e-4), (got, ref)


@pytest.mark.parametrize("dist", ["DIST_L1", "DIST_L12", "DIST_HUBER",
                                  "DIST_FAIR", "DIST_WELSCH"])
def test_fitline_robust_2d(dist):
    rng = np.random.default_rng(1)
    t = rng.random(80)
    pts = np.stack([30 * t, 2 + 7 * t], axis=1)
    pts += rng.normal(0, 0.05, pts.shape)
    pts[:6] += rng.normal(0, 8, (6, 2))       # outliers
    pts = pts.astype(np.float32)
    ref = cv2.fitLine(pts, getattr(cv2, dist), 0, 0.01, 0.01).ravel()
    got = tcv.fitLine(pts, getattr(tcv, dist), 0, 0.01, 0.01).ravel()
    if np.dot(ref[:2], got[:2]) < 0:
        got = np.concatenate([-got[:2], got[2:]])
    # robust fits agree on the line direction; the anchor point is any
    # point on the line
    assert abs(np.dot(got[:2], ref[:2])) > 0.9995, (got, ref)


def test_fitline_l2_3d():
    rng = np.random.default_rng(2)
    t = rng.random(50)
    pts = np.stack([1 + 3 * t, 2 - 5 * t, 0.5 + 2 * t], axis=1)
    pts += rng.normal(0, 0.01, pts.shape)
    pts = pts.astype(np.float32)
    ref = cv2.fitLine(pts, cv2.DIST_L2, 0, 0.01, 0.01).ravel()
    got = tcv.fitLine(pts, tcv.DIST_L2, 0, 0.01, 0.01).ravel()
    if np.dot(ref[:3], got[:3]) < 0:
        got = np.concatenate([-got[:3], got[3:]])
    assert abs(np.dot(got[:3], ref[:3])) > 0.99999
    assert np.allclose(got[3:], ref[3:], atol=1e-3)


@pytest.mark.parametrize("cmap", [0, 2, 9, 11, 12, 16, 20, 21])
def test_apply_colormap(cmap):
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (40, 50), np.uint8)
    assert_exact(np.asarray(tcv.applyColorMap(g, cmap)),
                 cv2.applyColorMap(g, cmap), f"cmap {cmap} gray")
    c = rng.integers(0, 256, (20, 30, 3), np.uint8)
    assert_exact(np.asarray(tcv.applyColorMap(c, cmap)),
                 cv2.applyColorMap(c, cmap), f"cmap {cmap} bgr")


def test_apply_colormap_user_lut():
    rng = np.random.default_rng(4)
    g = rng.integers(0, 256, (15, 17), np.uint8)
    lut = rng.integers(0, 256, (256, 1, 3), np.uint8)
    assert_exact(np.asarray(tcv.applyColorMap(g, lut)),
                 cv2.applyColorMap(g, lut), "user lut")


def test_convexity_defects():
    rng = np.random.default_rng(5)
    # star-shaped contour with known defects
    ang = np.linspace(0, 2 * np.pi, 10, endpoint=False)
    r = np.where(np.arange(10) % 2 == 0, 50, 20)
    pts = np.stack([60 + r * np.cos(ang), 60 + r * np.sin(ang)],
                   axis=1).astype(np.int32).reshape(-1, 1, 2)
    hull = cv2.convexHull(pts, returnPoints=False)
    ref = cv2.convexityDefects(pts, hull)
    got = tcv.convexityDefects(pts, hull)
    assert got is not None and ref is not None
    assert_exact(got, ref, "star defects")


def test_ellipse2poly():
    for (c, ax, ang, a0, a1, d) in [((50, 40), (30, 20), 0, 0, 360, 5),
                                    ((10, 10), (15, 25), 30, 45, 270, 10),
                                    ((0, 0), (7, 3), 125, -90, 90, 1)]:
        ref = cv2.ellipse2Poly(c, ax, ang, a0, a1, d)
        got = tcv.ellipse2Poly(c, ax, ang, a0, a1, d)
        assert_exact(got, ref, f"{c} {ax} {ang}")


def test_mix_channels():
    rng = np.random.default_rng(6)
    bgra = rng.integers(0, 256, (8, 9, 4), np.uint8)
    bgr = np.zeros((8, 9, 3), np.uint8)
    alpha = np.zeros((8, 9), np.uint8)
    # bgra -> bgr + alpha, like the cv2 docs example
    ref_bgr = np.zeros_like(bgr)
    ref_a = np.zeros_like(alpha)
    cv2.mixChannels([bgra], [ref_bgr, ref_a],
                    [0, 2, 1, 1, 2, 0, 3, 3])
    got = tcv.mixChannels([bgra], [bgr, alpha], [0, 2, 1, 1, 2, 0, 3, 3])
    assert_exact(got[0], ref_bgr, "bgr")
    assert_exact(got[1], ref_a, "alpha")


def test_set_identity_complete_symm():
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    ref = a.copy()
    cv2.setIdentity(ref, 3)
    assert_exact(tcv.setIdentity(a, 3), ref, "setIdentity")
    b = np.arange(9, dtype=np.float64).reshape(3, 3)
    ref = b.copy()
    cv2.completeSymm(ref, False)
    assert_exact(tcv.completeSymm(b, False), ref, "completeSymm u->l")
    ref = b.copy()
    cv2.completeSymm(ref, True)
    assert_exact(tcv.completeSymm(b, True), ref, "completeSymm l->u")


def test_solve_cubic_poly():
    # x^3 - 6x^2 + 11x - 6 = (x-1)(x-2)(x-3)
    n, roots = tcv.solveCubic(np.array([1.0, -6.0, 11.0, -6.0]))
    nref, rref = cv2.solveCubic(np.array([1.0, -6.0, 11.0, -6.0]))
    assert n == nref
    assert np.allclose(sorted(roots.ravel()[:n]),
                       sorted(rref.ravel()[:n]), atol=1e-8)
    # solvePoly: cv2 coefficient order is low->high: 2 - 3x + x^2
    md, r = tcv.solvePoly(np.array([2.0, -3.0, 1.0]))
    mdref, rr = cv2.solvePoly(np.array([2.0, -3.0, 1.0]))
    got = sorted(r[:, 0, 0])
    ref = sorted(rr[:, 0, 0])
    assert np.allclose(got, ref, atol=1e-6), (got, ref)


def test_psnr():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, (32, 32), np.uint8)
    b = np.clip(a.astype(int) + rng.integers(-6, 7, a.shape), 0,
                255).astype(np.uint8)
    assert abs(tcv.PSNR(a, b) - cv2.PSNR(a, b)) < 1e-6


def test_batch_distance():
    rng = np.random.default_rng(8)
    a = rng.random((10, 16)).astype(np.float32)
    b = rng.random((14, 16)).astype(np.float32)
    ref_d, ref_i = cv2.batchDistance(a, b, cv2.CV_32F, K=3,
                                     normType=cv2.NORM_L2)
    got_d, got_i = tcv.batchDistance(a, b, tcv.CV_32F, K=3,
                                     normType=tcv.NORM_L2)
    assert_exact(got_i, ref_i, "nidx")
    assert np.allclose(got_d, ref_d, atol=1e-5)
    # hamming on packed bytes (K>0 so the wheel accepts nidx)
    a8 = rng.integers(0, 256, (6, 32), np.uint8)
    b8 = rng.integers(0, 256, (9, 32), np.uint8)
    ref_d, ref_i = cv2.batchDistance(a8, b8, cv2.CV_32S, K=2,
                                     normType=cv2.NORM_HAMMING)
    got_d, got_i = tcv.batchDistance(a8, b8, tcv.CV_32S, K=2,
                                     normType=tcv.NORM_HAMMING)
    assert_exact(got_i, ref_i, "hamming nidx")
    assert_exact(got_d.astype(ref_d.dtype), ref_d, "hamming dists")


def test_imreadmulti_tiff(tmp_path):
    rng = np.random.default_rng(9)
    pages = [rng.integers(0, 256, (16 + 4 * i, 20, 3), np.uint8)
             for i in range(3)]
    p = str(tmp_path / "multi.tif")
    assert tcv.imwritemulti(p, pages)
    # cv2 reads ours
    okr, ref = cv2.imreadmulti(p)
    assert okr and len(ref) == 3
    for i in range(3):
        assert_exact(ref[i], pages[i], f"cv2 reads page {i}")
    # we read cv2's
    p2 = str(tmp_path / "multi2.tif")
    assert cv2.imwritemulti(p2, pages)
    ok2, got = tcv.imreadmulti(p2)
    assert ok2 and len(got) == 3
    for i in range(3):
        assert_exact(got[i], pages[i], f"we read cv2 page {i}")
    assert tcv.imcount(p2) == 3


def test_linear_log_polar():
    # the 5.0 wheel removed the deprecated aliases, so validate against
    # their defining warpPolar forms (imgwarp.cpp:3848-3860)
    rng = np.random.default_rng(10)
    img = cv2.GaussianBlur(rng.integers(0, 256, (64, 80), np.uint8),
                           (5, 5), 2)
    c = (40.0, 32.0)
    ref = cv2.warpPolar(img, (80, 64), c, 35.0,
                        cv2.INTER_LINEAR | cv2.WARP_FILL_OUTLIERS)
    got = np.asarray(tcv.linearPolar(
        img, c, 35.0, tcv.INTER_LINEAR | tcv.WARP_FILL_OUTLIERS))
    d = np.abs(got.astype(int) - ref.astype(int))
    assert np.mean(d) < 1.0, np.mean(d)
    # WARP_FILL_OUTLIERS: without it the reference leaves out-of-range
    # pixels UNINITIALIZED (BORDER_TRANSPARENT), unusable as an oracle
    maxr = float(np.exp(80 / 20.0))
    ref = cv2.warpPolar(img, (80, 64), c, maxr,
                        cv2.INTER_LINEAR | cv2.WARP_POLAR_LOG
                        | cv2.WARP_FILL_OUTLIERS)
    got = np.asarray(tcv.logPolar(
        img, c, 20.0, tcv.INTER_LINEAR | tcv.WARP_FILL_OUTLIERS))
    d = np.abs(got.astype(int) - ref.astype(int))
    assert np.mean(d) < 1.0, np.mean(d)
