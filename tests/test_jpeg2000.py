"""JPEG 2000 decoder vs the wheel's OpenJPEG encoder/decoder: lossless
files round-trip bit-exact; lossy (9/7) files match the wheel's own
decode bit-for-bit (float32 lifting identical to opj)."""

import numpy as np
import pytest

from common import cv2, assert_exact

import opencv_tpu as tcv


def _write(tmp_path, name, img, params=None):
    p = str(tmp_path / f"{name}.jp2")
    assert cv2.imwrite(p, img, params or [])
    return p


LOSSLESS = [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000, 1000]


def test_jp2_lossless_color(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (150, 200, 3), np.uint8)
    p = _write(tmp_path, "c", img, LOSSLESS)
    got = tcv.imread(p)
    assert_exact(got, img)


def test_jp2_lossless_gray_odd(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (97, 129), np.uint8)
    p = _write(tmp_path, "g", img, LOSSLESS)
    got = tcv.imread(p, tcv.IMREAD_GRAYSCALE)
    assert_exact(np.squeeze(got), img)


def test_jp2_lossless_structured(tmp_path):
    img = np.tile(np.arange(256, dtype=np.uint8), (64, 1))
    p = _write(tmp_path, "grad", img, LOSSLESS)
    got = tcv.imread(p, tcv.IMREAD_GRAYSCALE)
    assert_exact(np.squeeze(got), img)
    img2 = np.zeros((80, 100, 3), np.uint8)
    cv2.circle(img2, (50, 40), 25, (30, 200, 90), -1)
    p2 = _write(tmp_path, "circ", img2, LOSSLESS)
    assert_exact(tcv.imread(p2), img2)


def test_jp2_lossy_matches_wheel_decode(tmp_path):
    rng = np.random.default_rng(2)
    img = cv2.GaussianBlur(
        rng.integers(0, 255, (120, 180, 3), np.uint8), (7, 7), 3)
    for x1000 in (None, 500, 250):
        params = ([] if x1000 is None
                  else [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000, x1000])
        p = _write(tmp_path, f"l{x1000}", img, params)
        ref = cv2.imread(p)           # wheel decodes its own file
        got = tcv.imread(p)
        assert_exact(got, ref, f"x1000={x1000}")


def test_jp2_imdecode_memory(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (40, 56, 3), np.uint8)
    p = _write(tmp_path, "m", img, LOSSLESS)
    buf = np.fromfile(p, np.uint8)
    got = tcv.imdecode(buf, tcv.IMREAD_COLOR)
    assert_exact(got, img)
    assert tcv.haveImageReader(p)


def test_jp2_encode_wheel_decodes(tmp_path):
    rng = np.random.default_rng(4)
    cases = {
        "gray": rng.integers(0, 255, (37, 51), np.uint8),
        "color": rng.integers(0, 255, (70, 90, 3), np.uint8),
        "tiny": rng.integers(0, 255, (5, 7, 3), np.uint8),
        "u16": rng.integers(0, 65535, (30, 40), np.uint16),
    }
    for name, img in cases.items():
        p = str(tmp_path / f"{name}.jp2")
        assert tcv.imwrite(p, img)
        back = cv2.imread(p, cv2.IMREAD_UNCHANGED)
        assert back is not None, name
        assert_exact(np.squeeze(back), np.squeeze(img), name)


def test_jp2_encode_self_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (64, 80, 3), np.uint8)
    p = str(tmp_path / "rt.jp2")
    assert tcv.imwrite(p, img)
    assert_exact(tcv.imread(p), img)
