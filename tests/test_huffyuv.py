"""HuffYUV ('HFYU') AVI codec vs the wheel's FFmpeg backend.

RGB24 HuffYUV is LOSSLESS, so both directions are bit-exact:
wheel-written files decode to the original frames, and our files read
back exactly through the wheel.  The 4:2:2 flavor (what the wheel
writes for isColor=False) is exact at the plane level; the final
YUV->BGR conversion differs from swscale by a small tolerance."""

import numpy as np
import pytest

from common import cv2, assert_exact

import opencv_tpu as tcv
from opencv_tpu.imgcodecs import huffyuv as H


def _frames(n=3, h=48, w=64, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w, 3), np.uint8)
    out = [base]
    for i in range(1, n):
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
    p = str(tmp_path / "hfyu_w.avi")
    wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"HFYU"), 10, (w, h))
    if not wr.isOpened():
        pytest.skip("wheel lacks HFYU encoder")
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
    p = str(tmp_path / "hfyu_o.avi")
    wr = tcv.VideoWriter(p, tcv.VideoWriter_fourcc(*"HFYU"), 10, (64, 48))
    for f in frames:
        wr.write(f)
    wr.release()
    refs = _read_all(cv2.VideoCapture(p))
    assert len(refs) == len(frames)
    for r, f in zip(refs, frames):
        assert_exact(r, f)


def test_self_roundtrip(tmp_path):
    frames = _frames(h=30, w=41, seed=9)
    p = str(tmp_path / "hfyu_rt.avi")
    wr = tcv.VideoWriter(p, tcv.VideoWriter_fourcc(*"HFYU"), 10, (41, 30))
    for f in frames:
        wr.write(f)
    wr.release()
    got = _read_all(tcv.VideoCapture(p))
    assert len(got) == len(frames)
    for g, f in zip(got, frames):
        assert_exact(g, f)


def test_wheel_gray_422_read(tmp_path):
    rng = np.random.default_rng(1)
    g = cv2.GaussianBlur(rng.integers(0, 255, (48, 64), np.uint8),
                         (7, 7), 2)
    p = str(tmp_path / "hfyu_g.avi")
    wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"HFYU"), 10,
                         (64, 48), isColor=False)
    if not wr.isOpened():
        pytest.skip("wheel lacks HFYU encoder")
    wr.write(g)
    wr.release()
    refs = _read_all(cv2.VideoCapture(p))
    got = _read_all(tcv.VideoCapture(p))
    assert len(got) == len(refs) == 1
    d = np.abs(got[0].astype(int) - refs[0].astype(int))
    assert d.max() <= 3, d.max()   # YUV->BGR conversion tolerance


def test_extradata_matches_wheel_format():
    # build_extradata must regenerate the classic stream tables exactly
    ed = H.build_extradata(24)
    pred, dec, bpp, tables = H.parse_extradata(ed)
    assert (pred, dec, bpp) == (0, 1, 24)
    assert tables[0] == tables[1] == tables[2] == list(H._CLASSIC_LENS)


def test_python_fallback_decoder():
    rng = np.random.default_rng(5)
    x = rng.integers(0, 256, (9, 11, 3), np.uint8)
    enc = H.encode_frame_bgr(x)
    swapped = H._bswap32(enc)
    bits = np.unpackbits(swapped[4:])
    syms = H._decode_syms_py(bits, H._CLASSIC_LENS, 3 * (9 * 11 - 1))
    fast = H._decode_syms(enc, [H._CLASSIC_LENS] * 3, 3 * (9 * 11 - 1))
    assert np.array_equal(syms, fast)
