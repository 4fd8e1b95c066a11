"""From-scratch MPEG-4 Part 2 (mp4v) decoder vs the wheel.

The wheel decodes mp4v through its FFmpeg backend; our decoder
(imgcodecs/mpeg4.py) must be BIT-EXACT against it — including P-frame
chains (any IDCT/MC rounding difference would accumulate as drift).
BGR comparisons use 16-aligned widths (the swscale YUV->BGR edge
handling differs between library builds on non-8-aligned widths; the
decoded YUV itself is exact for every size, covered via the adapter's
plane readout).
"""

import ctypes

import numpy as np
import pytest

from common import cv2

import opencv_tpu as tcv
from opencv_tpu import videoio_ffmpeg
from opencv_tpu.imgcodecs.mp4 import Mp4Demuxer
from opencv_tpu.imgcodecs import mpeg4 as M
from opencv_tpu.videoio import _NativeMp4Reader


def _wheel_mp4v(tmp_path, name, frames, fps=10):
    p = str(tmp_path / name)
    h, w = frames[0].shape[:2]
    wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert wr.isOpened()
    for f in frames:
        wr.write(f)
    wr.release()
    return p


def _read_all(cap):
    out = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        out.append(f)
    return out


def _moving_texture(n, h, w, seed=7, noise_box=True):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (h + 64, w + 64, 3), np.uint8)
    base = cv2.GaussianBlur(base, (7, 7), 2)
    out = []
    for i in range(n):
        dx, dy = int(2.5 * i) % 60, int(1.7 * i) % 60
        f = base[dy:dy + h, dx:dx + w].copy()
        if noise_box:   # hard block: exercises TCOEF escape modes
            f[10:30, 10:50] = rng.randint(0, 255, (20, 40, 3), np.uint8)
        out.append(f)
    return out


def test_intra_frame_bitexact(tmp_path):
    frames = [np.full((48, 64, 3), v, np.uint8) for v in (10, 100, 250)]
    p = _wheel_mp4v(tmp_path, "i.mp4", frames)
    ours = tcv.VideoCapture(p)
    assert isinstance(ours._ff, _NativeMp4Reader)  # native tier in use
    theirs = cv2.VideoCapture(p)
    a, b = _read_all(ours), _read_all(theirs)
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_p_frames_with_motion_bitexact(tmp_path):
    frames = _moving_texture(24, 96, 128)
    p = _wheel_mp4v(tmp_path, "m.mp4", frames, fps=25)
    ours, theirs = tcv.VideoCapture(p), cv2.VideoCapture(p)
    assert isinstance(ours._ff, _NativeMp4Reader)
    a, b = _read_all(ours), _read_all(theirs)
    assert len(a) == len(b) == 24
    for i, (x, y) in enumerate(zip(a, b)):
        assert np.array_equal(x, y), f"frame {i} drifted"


def test_large_motion_fcode_gt1(tmp_path):
    rng = np.random.RandomState(3)
    base = cv2.GaussianBlur(
        rng.randint(0, 255, (240 + 256, 320 + 256, 3), np.uint8), (5, 5), 1.5)
    frames = [base[(i * 37) % 250:(i * 37) % 250 + 240,
                   (i * 23) % 250:(i * 23) % 250 + 320].copy()
              for i in range(16)]
    p = _wheel_mp4v(tmp_path, "f.mp4", frames, fps=25)
    ours, theirs = tcv.VideoCapture(p), cv2.VideoCapture(p)
    a, b = _read_all(ours), _read_all(theirs)
    assert len(a) == len(b) == 16
    for i, (x, y) in enumerate(zip(a, b)):
        assert np.array_equal(x, y), f"frame {i}"


def test_seek_restarts_gop(tmp_path):
    frames = _moving_texture(20, 64, 64, noise_box=False)
    p = _wheel_mp4v(tmp_path, "s.mp4", frames)
    ours, theirs = tcv.VideoCapture(p), cv2.VideoCapture(p)
    for idx in (15, 3, 19, 0):
        ours.set(tcv.CAP_PROP_POS_FRAMES, idx)
        theirs.set(cv2.CAP_PROP_POS_FRAMES, idx)
        ok1, f1 = ours.read()
        ok2, f2 = theirs.read()
        assert ok1 and ok2
        assert np.array_equal(f1, f2), idx


@pytest.mark.skipif(not videoio_ffmpeg.available(),
                    reason="FFmpeg dev stack absent")
def test_unaligned_size_yuv_bitexact(tmp_path):
    """Width 100 (not 8-aligned): the decoded YUV planes must still be
    bit-exact; BGR conversion differences are a swscale-build artifact
    outside the decoder."""
    frames = _moving_texture(10, 70, 100, noise_box=False)
    p = _wheel_mp4v(tmp_path, "u.mp4", frames)
    data = open(p, "rb").read()
    d = Mp4Demuxer(data)
    dec = M.Mpeg4Decoder(d.extradata, d.width, d.height)
    lib = videoio_ffmpeg._get_lib()
    lib.ocvt_ff_reader_read_yuv420.restype = ctypes.c_int
    lib.ocvt_ff_reader_read_yuv420.argtypes = [ctypes.c_void_p] * 4
    rd = videoio_ffmpeg.FFmpegReader(p)
    w, h = rd.width, rd.height
    for off, sz in d.samples:
        mine = dec.decode(data[off:off + sz])
        y = np.empty((h, w), np.uint8)
        u = np.empty((h // 2, w // 2), np.uint8)
        v = np.empty((h // 2, w // 2), np.uint8)
        assert lib.ocvt_ff_reader_read_yuv420(
            rd._h, y.ctypes.data_as(ctypes.c_void_p),
            u.ctypes.data_as(ctypes.c_void_p),
            v.ctypes.data_as(ctypes.c_void_p))
        ref = np.concatenate([y.reshape(-1), u.reshape(-1),
                              v.reshape(-1)]).reshape(h * 3 // 2, w)
        assert np.array_equal(mine, ref)


def test_avc1_falls_back_to_adapter(tmp_path):
    if not videoio_ffmpeg.available():
        pytest.skip("adapter absent")
    frames = [np.full((48, 64, 3), 60, np.uint8)] * 3
    p = str(tmp_path / "a.mp4")
    # the wheel has no H.264 encoder; our adapter tier does (x264)
    wr = videoio_ffmpeg.FFmpegWriter(
        p, cv2.VideoWriter_fourcc(*"avc1"), 10, 64, 48)
    assert wr.ok
    for f in frames:
        wr.write(f)
    wr.close()
    c = tcv.VideoCapture(p)
    assert c.isOpened() and not isinstance(c._ff, _NativeMp4Reader)
    ok, f = c.read()
    assert ok and f.shape == (48, 64, 3)


def test_vol_rejects_unsupported_profiles():
    # MPEG-quant VOL -> Mpeg4Unsupported (falls to adapter in videoio)
    def vol_bits(quant_type):
        bits = "0" + "00000001" + "0"          # random_acc, VOTI, no ids
        bits += "0001"                          # aspect 1:1
        bits += "0"                             # no vol_control
        bits += "00" + "1"                      # rectangular, marker
        bits += format(10, "016b") + "1" + "0" + "1"   # timeres, mk, fixed, mk
        bits += format(64, "013b") + "1" + format(48, "013b") + "1"
        bits += "0" + "1" + "0" + "0"           # progressive, obmc, sprite, 8bit
        bits += "1" if quant_type else "0"
        if quant_type:
            bits += "00"                        # no custom matrices
        bits += "1" + "1" + "0" + "0"           # complexity off, resync off,
        bits += "000"                           # not partitioned, no scal + pad
        by = int(bits + "0" * (-len(bits) % 8), 2) \
            .to_bytes((len(bits) + 7) // 8, "big")
        return b"\x00\x00\x01\x20" + by
    M.Mpeg4Decoder(vol_bits(False))             # parses fine
    with pytest.raises(M.Mpeg4Unsupported):
        M.Mpeg4Decoder(vol_bits(True))


def test_idct_golden_regression():
    """idct_batch against golden vectors captured from the reference
    decode path's own 8-bit IDCT (verified bit-exact over 3k
    random/sparse blocks when the snapshot was made)."""
    rng = np.random.RandomState(11)
    blocks = []
    for i in range(32):
        b = rng.randint(-512, 512, (8, 8)).astype(np.int16)
        if i % 3 == 0:
            b[rng.rand(8, 8) < 0.7] = 0
        if i % 5 == 0:
            b[1:, :] = 0
        blocks.append(b)
    blocks = np.stack(blocks)
    out = M.idct_batch(blocks)
    # spot invariants: DC-only block maps to (dc*8+...) plateau
    dc = np.zeros((1, 8, 8), np.int16)
    dc[0, 0, 0] = 1024
    flat = M.idct_batch(dc)
    assert (flat == 128).all()
    # golden checksums over the batch (captured from the snapshot-time
    # implementation, itself verified 0/3000 mismatches vs the real
    # SSE2/AVX function linked out of the static archive)
    assert out.shape == (32, 8, 8)
    assert int(out.astype(np.int64).sum()) == -6612
    assert int((out.astype(np.int64)
                * np.arange(out.size).reshape(out.shape)).sum()) == -6336938
