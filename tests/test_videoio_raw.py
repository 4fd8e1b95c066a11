"""Raw AVI codec interop vs the wheel's FFmpeg backend: I420/IYUV/
YV12/Y800/RGBA uncompressed streams, both directions."""

import numpy as np
import pytest

from common import cv2, assert_exact

import opencv_tpu as tcv


def _frames(n=3, seed=3):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 255, (48, 64, 3), np.uint8)
            for _ in range(n)]


def _read_all(cap):
    out = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        out.append(f)
    return out


@pytest.mark.parametrize("fcc", ["I420", "YV12", "Y800", "RGBA"])
def test_read_wheel_raw_avi(tmp_path, fcc):
    frames = _frames()
    p = str(tmp_path / f"w_{fcc}.avi")
    w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*fcc), 10, (64, 48))
    assert w.isOpened()
    for f in frames:
        w.write(f)
    w.release()
    refs = _read_all(cv2.VideoCapture(p))
    got = _read_all(tcv.VideoCapture(p))
    assert len(got) == len(refs) == 3
    for g, r in zip(got, refs):
        d = np.abs(g.astype(int) - r.astype(int))
        if fcc in ("Y800", "RGBA"):
            assert d.max() == 0, fcc
        else:   # YUV: our cvtColor vs FFmpeg swscale differ by <=3
            assert d.max() <= 3, (fcc, d.max())


@pytest.mark.parametrize("fcc", ["Y800", "RGBA"])
def test_write_raw_avi_wheel_reads_exact(tmp_path, fcc):
    frames = _frames(seed=4)
    p = str(tmp_path / f"o_{fcc}.avi")
    w = tcv.VideoWriter(p, tcv.VideoWriter_fourcc(*fcc), 10, (64, 48))
    for f in frames:
        w.write(f)
    w.release()
    refs = _read_all(cv2.VideoCapture(p))
    assert len(refs) == 3
    for f, r in zip(frames, refs):
        # Y800 write converts color with BT.601 luma (same weights as
        # cvtColor BGR2GRAY), matching the reference writer's conversion
        want = f if fcc == "RGBA" else np.repeat(
            cv2.cvtColor(f, cv2.COLOR_BGR2GRAY)[..., None], 3, 2)
        assert_exact(r, want)


def test_write_i420_wheel_reads(tmp_path):
    rng = np.random.default_rng(5)
    img = cv2.GaussianBlur(
        rng.integers(0, 255, (48, 64, 3), np.uint8), (11, 11), 4)
    p = str(tmp_path / "o_i420.avi")
    w = tcv.VideoWriter(p, tcv.VideoWriter_fourcc(*"I420"), 10,
                        (64, 48))
    for _ in range(2):
        w.write(img)
    w.release()
    refs = _read_all(cv2.VideoCapture(p))
    assert len(refs) == 2
    d = np.abs(refs[0].astype(int) - img.astype(int))
    assert d.mean() < 3 and d.max() < 24   # chroma-filter difference


def test_truncated_raw_frame_returns_false(tmp_path):
    """A truncated raw payload must yield (False, None), not raise
    (cv2 returns (False, None) on corrupt frames)."""
    frames = _frames(seed=7)
    p = str(tmp_path / "trunc.avi")
    w = tcv.VideoWriter(p, tcv.VideoWriter_fourcc(*"I420"), 10, (64, 48))
    for f in frames:
        w.write(f)
    w.release()
    data = open(p, "rb").read()
    open(p, "wb").write(data[:-100])  # cut into the last frame chunk
    cap = tcv.VideoCapture(p)
    results = []
    for _ in range(3):
        if not cap.grab():
            break
        results.append(cap.retrieve())
    assert results, "no frames parsed at all"
    ok_last, img_last = results[-1]
    assert ok_last is False or ok_last == False  # noqa: E712
    assert img_last is None
    for ok, img in results[:-1]:
        assert ok and img is not None


def test_read_wheel_fourcc0_avi(tmp_path):
    """fourcc=0 from the wheel's writer (it picks a raw layout itself —
    I420 on this build) reads back within the YUV-conversion tolerance."""
    frames = _frames(seed=8)
    p = str(tmp_path / "raw0.avi")
    w = cv2.VideoWriter(p, 0, 10, (64, 48))
    if not w.isOpened():
        pytest.skip("wheel cannot write fourcc-0 AVI")
    for f in frames:
        w.write(f)
    w.release()
    refs = _read_all(cv2.VideoCapture(p))
    got = _read_all(tcv.VideoCapture(p))
    if not refs:
        pytest.skip("wheel wrote no readable frames")
    assert len(got) == len(refs)
    for g, r in zip(got, refs):
        assert np.abs(g.astype(int) - r.astype(int)).max() <= 3


def test_read_dib_avi_bottom_up():
    """Hand-built BI_RGB AVI: payload is bottom-up rows of BGR
    triplets; the reader must flip vertically and keep channel order
    (cap_ffmpeg/container_avi DIB semantics)."""
    import struct
    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (48, 64, 3), np.uint8)  # BGR
    payload = img[::-1].tobytes()                       # bottom-up rows

    def chunk(ckid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return ckid + struct.pack("<I", len(body)) + body + pad

    w, h = 64, 48
    avih = struct.pack("<14I", 100000, 0, 0, 0x10, 1, 0, 1,
                       len(payload), w, h, 0, 0, 0, 0)
    strh = b"vids" + b"\x00" * 4 + struct.pack(
        "<IHHIIIIIIIII", 0, 0, 0, 0, 1, 10, 0, 1, len(payload),
        0xFFFFFFFF, 0, 0) + struct.pack("<4H", 0, 0, w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24,
                       b"\x00\x00\x00\x00", len(payload), 0, 0, 0, 0)
    strl = b"LIST" + struct.pack(
        "<I", 4 + len(chunk(b"strh", strh)) + len(chunk(b"strf", strf))
    ) + b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl_body = b"hdrl" + chunk(b"avih", avih) + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_items = chunk(b"00db", payload)
    movi = (b"LIST" + struct.pack("<I", 4 + len(movi_items)) + b"movi"
            + movi_items)
    body = b"AVI " + hdrl + movi
    data = b"RIFF" + struct.pack("<I", len(body)) + body

    import tempfile, os
    fd, p = tempfile.mkstemp(suffix=".avi")
    os.write(fd, data)
    os.close(fd)
    try:
        got = _read_all(tcv.VideoCapture(p))
    finally:
        os.remove(p)
    assert len(got) == 1
    assert_exact(got[0], img)


def test_self_roundtrip_raw(tmp_path):
    frames = _frames(seed=6)
    for fcc in ("I420", "YV12", "Y800", "RGBA"):
        p = str(tmp_path / f"rt_{fcc}.avi")
        w = tcv.VideoWriter(p, tcv.VideoWriter_fourcc(*fcc), 10,
                            (64, 48))
        for f in frames:
            w.write(f)
        w.release()
        got = _read_all(tcv.VideoCapture(p))
        assert len(got) == 3
        if fcc == "RGBA":
            for g, f in zip(got, frames):
                assert_exact(g, f)
