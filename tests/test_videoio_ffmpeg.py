"""FFmpeg adapter tier (CAP_FFMPEG analogue): compressed containers the
from-scratch tier doesn't cover — MP4/mp4v, H.264, XVID-in-AVI, VP9.

Reference parity target: modules/videoio/src/cap_ffmpeg.cpp (the
reference is itself an FFmpeg adapter for these payloads).  Decode is
asserted BIT-EXACT vs the wheel (both decode through libavcodec, which
is deterministic); encode is asserted readable-by-the-wheel with
bounded lossy error.
"""

import numpy as np
import pytest

from common import cv2

import opencv_tpu as tcv
from opencv_tpu import videoio_ffmpeg

pytestmark = pytest.mark.skipif(
    not videoio_ffmpeg.available(),
    reason="system FFmpeg dev stack not present")


def _frames(n=6):
    out = []
    for i in range(n):
        f = np.zeros((48, 64, 3), np.uint8)
        f[:, :, 0] = i * 20
        f[10 + i:20 + i, 10:30] = 200
        out.append(f)
    return out


def _read_all(cap):
    res = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        res.append(f)
    return res


@pytest.mark.parametrize("name,fcc", [
    ("a.mp4", "mp4v"), ("b.mp4", "avc1"), ("c.avi", "XVID")])
def test_read_wheel_compressed_bitexact(tmp_path, name, fcc):
    frames = _frames()
    p = str(tmp_path / name)
    w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*fcc), 10, (64, 48))
    if not w.isOpened():
        # the wheel cannot ENCODE this codec (e.g. no H.264 encoder);
        # generate with our adapter writer instead — both sides then
        # DECODE the same file, which is the parity under test
        from opencv_tpu.videoio_ffmpeg import FFmpegWriter
        wr = FFmpegWriter(p, cv2.VideoWriter_fourcc(*fcc), 10, 64, 48)
        assert wr.ok
        for f in frames:
            wr.write(f)
        wr.close()
    else:
        for f in frames:
            w.write(f)
        w.release()

    ours = tcv.VideoCapture(p)
    theirs = cv2.VideoCapture(p)
    assert ours.isOpened()
    a, b = _read_all(ours), _read_all(theirs)
    assert len(a) == len(b) == len(frames)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)  # same libavcodec -> bit-exact
    assert ours.get(tcv.CAP_PROP_FRAME_WIDTH) == 64
    assert ours.get(tcv.CAP_PROP_FRAME_COUNT) == len(frames)
    ours.release()


def test_seek_matches_wheel(tmp_path):
    frames = _frames(10)
    p = str(tmp_path / "seek.mp4")
    w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    for f in frames:
        w.write(f)
    w.release()
    ours = tcv.VideoCapture(p)
    theirs = cv2.VideoCapture(p)
    for idx in (7, 2, 9, 0, 4):
        ours.set(tcv.CAP_PROP_POS_FRAMES, idx)
        theirs.set(cv2.CAP_PROP_POS_FRAMES, idx)
        ok1, f1 = ours.read()
        ok2, f2 = theirs.read()
        assert ok1 and ok2
        assert np.array_equal(f1, f2), idx
    ours.release()


@pytest.mark.parametrize("name,fcc", [
    ("o1.mp4", "mp4v"), ("o2.mp4", "avc1"), ("o3.avi", "XVID"),
    ("o4.webm", "VP90")])
def test_write_wheel_reads(tmp_path, name, fcc):
    frames = _frames()
    p = str(tmp_path / name)
    w = tcv.VideoWriter(p, tcv.VideoWriter_fourcc(*fcc), 10, (64, 48))
    assert w.isOpened()
    for f in frames:
        w.write(f)
    w.release()

    cap = cv2.VideoCapture(p)
    assert cap.isOpened()
    got = _read_all(cap)
    assert len(got) == len(frames)
    # lossy codecs: the wheel's own mp4v round-trip of these frames has
    # maxdiff 75; ours must stay in the same class
    for x, y in zip(got, frames):
        assert np.abs(x.astype(int) - y.astype(int)).max() <= 90


def test_native_tier_still_first(tmp_path):
    # MJPG-in-AVI must keep routing to the from-scratch codec
    p = str(tmp_path / "nat.avi")
    w = tcv.VideoWriter(p, tcv.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
    for f in _frames(3):
        w.write(f)
    w.release()
    cap = tcv.VideoCapture(p)
    assert cap.isOpened() and cap._ff is None  # native parser, no adapter
    ok, f = cap.read()
    assert ok and f.shape == (48, 64, 3)


def test_grayscale_write(tmp_path):
    p = str(tmp_path / "g.mp4")
    w = tcv.VideoWriter(p, tcv.VideoWriter_fourcc(*"mp4v"), 10, (64, 48),
                        isColor=False)
    assert w.isOpened()
    g = np.tile(np.arange(64, dtype=np.uint8) * 4, (48, 1))
    for _ in range(3):
        w.write(g)
    w.release()
    cap = cv2.VideoCapture(p)
    ok, f = cap.read()
    assert ok and f.shape == (48, 64, 3)
