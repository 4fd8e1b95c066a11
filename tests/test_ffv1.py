"""FFV1 ('FFV1') AVI codec vs the wheel's FFmpeg backend.

FFV1 is LOSSLESS, so both directions are bit-exact: wheel-written files
(version 3, Golomb-Rice, RGB/BGRA, 2x2 slices, per-slice CRCs) decode to
the original frames through our decoder, and our single-slice streams
read back exactly through the wheel.  The ConfigurationRecord CRC gives
a parse-exactness oracle on top (poly 0x04C11DB7, MSB-first).
"""

import numpy as np
import pytest

from common import cv2, assert_exact

import opencv_tpu as tcv
from opencv_tpu.imgcodecs import ffv1 as F


def _frames(n=3, h=48, w=64, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w, 3), np.uint8)
    grad = (np.add.outer(np.arange(h), np.arange(w)) * 2 % 256
            ).astype(np.uint8)
    out = [base, np.dstack([grad, grad // 2, 255 - grad])]
    for i in range(2, n):
        f = base.copy()
        f[5 * i:5 * i + 10, 3 * i:3 * i + 12] = (10 * i, 200, 30)
        out.append(f)
    return out


def _read_all(cap):
    out = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        out.append(f)
    return out


@pytest.mark.parametrize("wh", [(64, 48), (62, 46), (33, 47)])
def test_wheel_writes_we_read_exact(tmp_path, wh):
    w, h = wh
    frames = _frames(h=h, w=w)
    p = str(tmp_path / "ffv1_w.avi")
    wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"FFV1"), 10, (w, h))
    if not wr.isOpened():
        pytest.skip("wheel lacks FFV1 encoder")
    for f in frames:
        wr.write(f)
    wr.release()
    refs = _read_all(cv2.VideoCapture(p))   # wheel crops odd dims
    got = _read_all(tcv.VideoCapture(p))
    assert len(got) == len(refs) == len(frames)
    for g, r, f in zip(got, refs, frames):
        assert_exact(g, r)                  # bit-exact vs the wheel
        if (w % 2, h % 2) == (0, 0):
            assert_exact(g, f)              # and lossless vs source


def test_we_write_wheel_reads_exact(tmp_path):
    frames = _frames()
    p = str(tmp_path / "ffv1_o.avi")
    wr = tcv.VideoWriter(p, tcv.VideoWriter_fourcc(*"FFV1"), 10, (64, 48))
    for f in frames:
        wr.write(f)
    wr.release()
    refs = _read_all(cv2.VideoCapture(p))
    assert len(refs) == len(frames)
    for r, f in zip(refs, frames):
        assert_exact(r, f)


def test_self_roundtrip(tmp_path):
    frames = _frames(n=4, h=31, w=45, seed=9)
    p = str(tmp_path / "ffv1_s.avi")
    wr = tcv.VideoWriter(p, tcv.VideoWriter_fourcc(*"FFV1"), 10, (45, 31))
    for f in frames:
        wr.write(f)
    wr.release()
    got = _read_all(tcv.VideoCapture(p))
    assert len(got) == len(frames)
    for g, f in zip(got, frames):
        assert_exact(g, f)


def test_config_record_roundtrip():
    ex = F.build_extradata()
    assert F.crc32_ffv1(ex) == 0
    p = F.parse_extradata(ex)
    assert p.version == 3 and p.ac == 0 and p.colorspace == 1
    assert p.quant_tables[0][1] == 666      # 11x11x11 context model


def test_wheel_config_record_parses(tmp_path):
    """Parse the wheel's own ConfigurationRecord (4-plane, 2x2 slices)."""
    p = str(tmp_path / "ffv1_c.avi")
    wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"FFV1"), 10, (64, 48))
    if not wr.isOpened():
        pytest.skip("wheel lacks FFV1 encoder")
    wr.write(np.zeros((48, 64, 3), np.uint8))
    wr.release()
    import struct
    data = open(p, "rb").read()
    i = data.find(b"strf")
    size = struct.unpack("<I", data[i + 4:i + 8])[0]
    extra = data[i + 8:i + 8 + size][40:]
    cfg = F.parse_extradata(extra)
    assert cfg.version == 3
    assert cfg.ac == 0                      # Golomb-Rice
    assert cfg.colorspace == 1
    assert cfg.ec == 1


def test_run_mode_flat_frame():
    """Flat frames exercise golomb run coding; tiny output proves it."""
    img = np.full((32, 40, 3), 77, np.uint8)
    pkt = F.encode_frame_bgr(img)
    assert len(pkt) < 64
    out = F.decode_frame(pkt, F.build_extradata(), (40, 32))
    assert_exact(out, img)
