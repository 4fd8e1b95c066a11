"""PBM / ASCII-PNM / PFM / Sun raster codecs vs the wheel
(reference: modules/imgcodecs/src/grfmt_pxm.cpp, grfmt_pfm.cpp,
grfmt_sunras.cpp)."""

import os

import numpy as np
import pytest

from common import cv2, assert_exact

import opencv_tpu as tcv


RNG = np.random.default_rng(0)


def test_pbm_wheel_interop(tmp_path):
    img = (RNG.integers(0, 2, (13, 21), np.uint8) * 255).astype(np.uint8)
    p = str(tmp_path / "a.pbm")
    assert cv2.imwrite(p, img)
    ours = tcv.imread(p, tcv.IMREAD_UNCHANGED)
    ref = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    assert_exact(ours, ref)
    assert_exact(ours, img)
    # we write, wheel reads
    p2 = str(tmp_path / "b.pbm")
    assert tcv.imwrite(p2, img)
    back = cv2.imread(p2, cv2.IMREAD_UNCHANGED)
    assert_exact(back, img)


def test_pbm_ascii_p1(tmp_path):
    body = b"P1\n# comment\n5 3\n1 0 1 0 1\n0 1 0 1 0\n11111\n"
    p = str(tmp_path / "c.pbm")
    open(p, "wb").write(body)
    ours = tcv.imread(p, tcv.IMREAD_UNCHANGED)
    ref = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    if ref is None:
        pytest.skip("wheel cannot read P1")
    assert_exact(ours, ref)


def test_pnm_ascii_p2_p3(tmp_path):
    p2 = str(tmp_path / "d.pgm")
    open(p2, "wb").write(b"P2\n4 2\n255\n0 10 20 30\n200 210 220 255\n")
    ours = tcv.imread(p2, tcv.IMREAD_UNCHANGED)
    ref = cv2.imread(p2, cv2.IMREAD_UNCHANGED)
    if ref is not None:
        assert_exact(ours, ref)
    p3 = str(tmp_path / "e.ppm")
    open(p3, "wb").write(b"P3\n2 1\n255\n255 0 0  0 255 0\n")
    ours = tcv.imread(p3, tcv.IMREAD_UNCHANGED)
    ref = cv2.imread(p3, cv2.IMREAD_UNCHANGED)
    if ref is not None:
        assert_exact(ours, ref)


@pytest.mark.parametrize("shape", [(9, 14, 3), (9, 14)])
def test_pfm_wheel_interop(tmp_path, shape):
    img = RNG.random(shape).astype(np.float32) * 100 - 50
    p = str(tmp_path / "a.pfm")
    assert cv2.imwrite(p, img)
    ours = tcv.imread(p, tcv.IMREAD_UNCHANGED)
    ref = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    assert_exact(ours, ref)
    p2 = str(tmp_path / "b.pfm")
    assert tcv.imwrite(p2, img)
    back = cv2.imread(p2, cv2.IMREAD_UNCHANGED)
    assert_exact(back, img)


@pytest.mark.parametrize("ext", [".sr", ".ras"])
@pytest.mark.parametrize("color", [True, False])
def test_sunras_wheel_interop(tmp_path, ext, color):
    img = RNG.integers(0, 255, (11, 13, 3) if color else (11, 13),
                       np.uint8)
    p = str(tmp_path / ("a" + ext))
    assert cv2.imwrite(p, img)
    ours = tcv.imread(p, tcv.IMREAD_UNCHANGED)
    # lossless vs the ORIGINAL: the wheel's own 8-bit reader drops the
    # 16-bit row padding its writer emits (odd widths shift); ours
    # follows the spec and round-trips, so compare against img, and
    # against the wheel only where the wheel round-trips itself.
    assert_exact(ours, img)
    ref = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    if np.array_equal(ref, img):
        assert_exact(ours, ref)
    p2 = str(tmp_path / ("b" + ext))
    assert tcv.imwrite(p2, img)
    back = cv2.imread(p2, cv2.IMREAD_UNCHANGED)
    assert_exact(back, img)


def test_sunras_rle_decode(tmp_path):
    """RT_BYTE_ENCODED: hand-built RLE stream (0x80 runs) decodes the
    same in the wheel and here."""
    import struct
    w, h = 6, 2
    row = bytes([7, 7, 7, 7, 9, 9])  # stride 6 (already even)
    raw = row * 2
    # RLE encode: 0x80, count-1, value for runs; literal otherwise
    rle = bytes([0x80, 3, 7, 0x80, 1, 9, 0x80, 3, 7, 0x80, 1, 9])
    head = struct.pack(">8I", 0x59A66A95, w, h, 8, len(rle), 2, 1, 768)
    pal = bytes(range(256)) * 3
    p = str(tmp_path / "rle.ras")
    open(p, "wb").write(head + pal + rle)
    ours = tcv.imread(p, tcv.IMREAD_UNCHANGED)
    ref = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    want = np.frombuffer(raw, np.uint8).reshape(h, w)
    if ref is not None:
        assert_exact(ours, ref)
    assert np.array_equal(np.asarray(ours).squeeze()[..., :1].squeeze()
                          if np.asarray(ours).ndim == 3 else ours, want)
