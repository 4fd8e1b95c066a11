"""Round-3 sweep part 5 vs the cv2 oracle: fitEllipseAMS/Direct and
approxPolyN."""

import numpy as np
import pytest

from common import cv2

import opencv_tpu as tcv


def _ellipse_pts(seed):
    r = np.random.default_rng(seed)
    cx, cy = 60 + 40 * r.random(), 50 + 30 * r.random()
    A, B = 30 + 20 * r.random(), 15 + 10 * r.random()
    th = r.random() * np.pi
    t = r.uniform(0, 2 * np.pi, 40)
    x = cx + A * np.cos(t) * np.cos(th) - B * np.sin(t) * np.sin(th)
    y = cy + A * np.cos(t) * np.sin(th) + B * np.sin(t) * np.cos(th)
    pts = np.stack([x, y], 1).astype(np.float32)
    return pts + r.normal(0, 0.5, (40, 2)).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_fit_ellipse_ams_direct(seed):
    pts = _ellipse_pts(seed)
    for ours, ref_fn in ((tcv.fitEllipseAMS, cv2.fitEllipseAMS),
                         (tcv.fitEllipseDirect, cv2.fitEllipseDirect)):
        (gx, gy), (gw, gh), ga = ours(pts)
        (rx, ry), (rw, rh), ra = ref_fn(pts)
        assert abs(gx - rx) < 1e-2 and abs(gy - ry) < 1e-2
        assert abs(gw - rw) < 5e-2 and abs(gh - rh) < 5e-2
        # ellipse orientation is defined mod 180; the raw AMS value can
        # differ by 180 depending on the eigenvector sign convention
        d = abs(ga - ra) % 180.0
        assert min(d, 180.0 - d) < 0.1


def test_fit_ellipse_int_points():
    pts = np.round(_ellipse_pts(7)).astype(np.int32)
    (gx, gy), (gw, gh), ga = tcv.fitEllipseDirect(pts)
    (rx, ry), (rw, rh), ra = cv2.fitEllipseDirect(pts)
    assert abs(gx - rx) < 1e-2 and abs(gh - rh) < 5e-2


def _cyclic_equal(g, r):
    g = np.asarray(g).reshape(-1, 2)
    r = np.asarray(r).reshape(-1, 2)
    if g.shape != r.shape:
        return False
    return any(np.array_equal(np.roll(g, k, 0), r) for k in range(len(g)))


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_approx_poly_n(seed):
    r = np.random.default_rng(seed)
    pts = r.integers(10, 200, (30, 1, 2)).astype(np.int32)
    for ns in (3, 4, 6):
        ref = cv2.approxPolyN(pts, ns)
        got = tcv.approxPolyN(pts, ns)
        assert _cyclic_equal(got, ref), (seed, ns)


def test_approx_poly_n_epsilon():
    r = np.random.default_rng(5)
    pts = r.integers(10, 200, (25, 1, 2)).astype(np.int32)
    ref = cv2.approxPolyN(pts, 4, epsilon_percentage=0.02)
    got = tcv.approxPolyN(pts, 4, epsilon_percentage=0.02)
    assert _cyclic_equal(got, ref)
