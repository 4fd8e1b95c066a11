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
        want = f if fcc == "RGBA" else np.repeat(
            f.mean(axis=2).astype(np.uint8)[..., None], 3, 2)
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
