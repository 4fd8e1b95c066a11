"""imread/imwrite round-trips and cv2 interop."""

import os
import numpy as np
import pytest

from common import cv2, rand_img, assert_exact

import opencv_tpu as tcv


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rand_img(rng, 32, 40, 3)
    p = str(tmp_path / "x.png")
    assert tcv.imwrite(p, img)
    back = tcv.imread(p)
    assert_exact(back, img)
    # cv2 can read our PNG and vice versa
    ref = cv2.imread(p)
    assert_exact(ref, img, "cv2 reads ours")
    p2 = str(tmp_path / "y.png")
    cv2.imwrite(p2, img)
    ours = tcv.imread(p2)
    assert_exact(ours, img, "we read cv2's")


def test_png_gray16(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 65536, (16, 20), np.uint16)
    p = str(tmp_path / "g16.png")
    tcv.imwrite(p, img)
    back = tcv.imread(p, tcv.IMREAD_UNCHANGED)
    assert_exact(back, img)


def test_bmp_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    img = rand_img(rng, 21, 33, 3)
    p = str(tmp_path / "x.bmp")
    tcv.imwrite(p, img)
    assert_exact(tcv.imread(p), img)
    ref = cv2.imread(p)
    assert_exact(ref, img)


def test_ppm_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    img = rand_img(rng, 15, 17, 3)
    p = str(tmp_path / "x.ppm")
    tcv.imwrite(p, img)
    assert_exact(tcv.imread(p), img)
    assert_exact(cv2.imread(p), img)


def test_imread_grayscale_flag(tmp_path):
    rng = np.random.default_rng(4)
    img = rand_img(rng, 16, 16, 3)
    p = str(tmp_path / "x.png")
    tcv.imwrite(p, img)
    g = tcv.imread(p, tcv.IMREAD_GRAYSCALE)
    assert g.ndim == 2


def test_missing_file():
    assert tcv.imread("/nonexistent/file.png") is None


def test_jpeg_cross_codec():
    rng = np.random.default_rng(0)
    img = cv2.GaussianBlur(rng.integers(0, 256, (64, 96, 3), np.uint8),
                           (5, 5), 2)
    # ours encode -> cv2 decode
    ok, buf = tcv.imencode(".jpg", img, [1, 95])
    assert ok
    dec = cv2.imdecode(np.asarray(buf), cv2.IMREAD_COLOR)
    assert dec is not None and dec.shape == img.shape
    assert cv2.PSNR(img, dec) > 30
    # cv2 encode -> ours decode, compare to cv2's own decode
    ok, buf2 = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    ours = tcv.imdecode(buf2, tcv.IMREAD_COLOR)
    ref = cv2.imdecode(buf2, cv2.IMREAD_COLOR)
    assert np.array_equal(np.asarray(ours), ref)  # bit-exact decode
    # grayscale + odd size roundtrip through files
    import tempfile, os
    g = img[:61, :93, 0]
    path = os.path.join(tempfile.mkdtemp(), "t.jpg")
    assert tcv.imwrite(path, g, [1, 90])
    back_cv = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    back_us = tcv.imread(path, tcv.IMREAD_GRAYSCALE)
    assert cv2.PSNR(g, back_cv) > 35
    assert np.array_equal(back_cv, np.asarray(back_us))  # bit-exact


def test_videoio_mjpeg_avi_cross():
    import tempfile, os
    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    frames = [cv2.GaussianBlur(rng.integers(0, 256, (48, 64, 3), np.uint8),
                               (5, 5), 2) for _ in range(5)]
    # ours write -> cv2 read
    path = os.path.join(tmp, "ours.avi")
    vw = tcv.VideoWriter(path, tcv.VideoWriter_fourcc(*"MJPG"), 15, (64, 48))
    for f in frames:
        vw.write(f)
    vw.release()
    cap = cv2.VideoCapture(path)
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5
    assert abs(cap.get(cv2.CAP_PROP_FPS) - 15) < 0.1
    ok, f0 = cap.read()
    assert ok and cv2.PSNR(frames[0], f0) > 28
    # cv2 write -> ours read
    path2 = os.path.join(tmp, "ref.avi")
    vw2 = cv2.VideoWriter(path2, cv2.VideoWriter_fourcc(*"MJPG"), 15,
                          (64, 48))
    for f in frames:
        vw2.write(f)
    vw2.release()
    cap2 = tcv.VideoCapture(path2)
    assert cap2.isOpened()
    assert int(cap2.get(tcv.CAP_PROP_FRAME_COUNT)) == 5
    got = 0
    while True:
        ok, fr = cap2.read()
        if not ok:
            break
        assert cv2.PSNR(frames[got], fr) > 28
        got += 1
    assert got == 5
    # image sequences + highgui stubs
    seq = os.path.join(tmp, "img%03d.png")
    w3 = tcv.VideoWriter(seq, 0, 0, (64, 48))
    for f in frames:
        w3.write(f)
    w3.release()
    cap3 = tcv.VideoCapture(seq)
    assert int(cap3.get(tcv.CAP_PROP_FRAME_COUNT)) == 5
    tcv.imshow("w", frames[0])
    assert tcv.waitKey(1) == -1
    tcv.destroyAllWindows()


def test_tiff_roundtrip_vs_cv2():
    """TIFF strips (grfmt_tiff.cpp role): our Deflate+predictor encode
    must be read bit-exactly by libtiff/cv2 and vice versa for cv2's
    default LZW files, across depths and channel counts."""
    rng = np.random.RandomState(0)
    cases = [rng.randint(0, 256, (37, 53, 3), np.uint8),
             rng.randint(0, 65536, (25, 31), np.uint16),
             rng.randint(0, 256, (20, 22, 4), np.uint8),
             rng.randint(0, 256, (40, 40), np.uint8),
             rng.randint(0, 65536, (15, 17, 3), np.uint16)]
    for im in cases:
        ok, buf = tcv.imencode(".tiff", im)
        assert ok
        back = cv2.imdecode(np.asarray(buf), -1)
        assert np.array_equal(back, im)
        ok, buf2 = cv2.imencode(".tiff", im)
        ours = np.asarray(tcv.imdecode(np.frombuffer(bytes(buf2),
                                                     np.uint8), -1))
        assert np.array_equal(ours, im)


def test_tiff_compressions_from_cv2():
    """Decode all strip compressions cv2/libtiff can emit: none,
    PackBits, LZW (early-change), Deflate."""
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (33, 47, 3), np.uint8)
    for comp in (1, 32773, 5, 32946):
        ok, buf = cv2.imencode(".tiff", img,
                               [cv2.IMWRITE_TIFF_COMPRESSION, comp])
        ours = np.asarray(tcv.imdecode(np.frombuffer(bytes(buf),
                                                     np.uint8), -1))
        assert np.array_equal(ours, img), f"compression {comp}"


# ---------------------------------------------------------------- GIF

def test_gif_roundtrip_and_cv2_interop():
    from opencv_tpu.imgcodecs.gif import gif_decode, gif_encode

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (8, 3), np.uint8)
    img = base[rng.integers(0, 8, (60, 80))]
    data = gif_encode(img)
    assert np.array_equal(gif_decode(data)[:, :, :3], img)
    # cv2 reads our GIF byte-exactly
    p = "/tmp/_tcv_gif_t.gif"
    open(p, "wb").write(data)
    ref = cv2.imread(p)
    assert ref is not None and np.array_equal(ref, img)
    # we read cv2-written GIF identically to cv2's own readback
    assert cv2.imwrite(p, img)
    ours = gif_decode(open(p, "rb").read())
    refback = cv2.imread(p)
    assert np.array_equal(ours[:, :, :3], refback)


def test_gif_imread_dispatch(tmp_path):
    import opencv_tpu as tcv

    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, (4, 3), np.uint8)
    img = base[rng.integers(0, 4, (30, 40))]
    p = str(tmp_path / "t.gif")
    assert tcv.imwrite(p, img)
    back = tcv.imread(p)
    assert np.array_equal(back, img)


# ---------------------------------------------------------------- EXR

def test_exr_roundtrip_all_compressions():
    from opencv_tpu.imgcodecs.exr import exr_decode, exr_encode

    rng = np.random.default_rng(2)
    img = rng.normal(0, 2, (37, 53, 3)).astype(np.float32)
    for comp in (0, 2, 3):  # NONE / ZIPS / ZIP
        data = exr_encode(img, [49, comp])
        assert np.array_equal(exr_decode(data), img), f"comp {comp}"
    g = rng.normal(0, 1, (20, 30)).astype(np.float32)
    assert np.array_equal(exr_decode(exr_encode(g)), g)
    h = exr_decode(exr_encode(img, [48, 1]))  # IMWRITE_EXR_TYPE_HALF
    assert np.abs(h - img).max() < 0.01
    # note: the installed cv2 wheel ships without OpenEXR, so the oracle
    # here is the format spec (self round-trip + half conversion)


# ---------------------------------------------------------------- WebP

def test_webp_decode_cv2_lossless():
    """Decode cv2-written VP8L files bit-exactly (predictor + cross-color
    + subtract-green + palette/bundling paths all exercised)."""
    from opencv_tpu.imgcodecs.webp import webp_decode

    rng = np.random.default_rng(3)
    p = "/tmp/_tcv_webp_t.webp"
    cases = []
    for sz, blur in [((2, 2), 0), ((8, 8), 1.0), ((32, 48), 2.0),
                     ((120, 160), 3.0)]:
        im = rng.integers(0, 256, sz + (3,), np.uint8)
        if blur:
            im = cv2.GaussianBlur(im, (5, 5), blur)
        cases.append(im)
    base = rng.integers(0, 256, (5, 3), np.uint8)
    cases.append(base[rng.integers(0, 5, (64, 64))])  # paletted
    for im in cases:
        assert cv2.imwrite(p, im, [cv2.IMWRITE_WEBP_QUALITY, 101])
        ours = webp_decode(open(p, "rb").read())
        assert np.array_equal(ours[:, :, :3], im), im.shape


def test_webp_decode_bgra_matches_cv2():
    from opencv_tpu.imgcodecs.webp import webp_decode

    rng = np.random.default_rng(4)
    im4 = np.dstack([
        cv2.GaussianBlur(rng.integers(0, 256, (60, 80, 3), np.uint8),
                         (5, 5), 2),
        rng.integers(0, 256, (60, 80), np.uint8)]).astype(np.uint8)
    p = "/tmp/_tcv_webp_a.webp"
    assert cv2.imwrite(p, im4, [cv2.IMWRITE_WEBP_QUALITY, 101])
    ref = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    ours = webp_decode(open(p, "rb").read())
    # libwebp itself may alter RGB under transparency; the contract is
    # bit-identity with the reference decoder
    assert np.array_equal(ours, ref)


def test_webp_encode_read_by_cv2():
    from opencv_tpu.imgcodecs.webp import webp_encode

    rng = np.random.default_rng(5)
    im = cv2.GaussianBlur(rng.integers(0, 256, (40, 56, 3), np.uint8),
                          (5, 5), 2)
    p = "/tmp/_tcv_webp_e.webp"
    open(p, "wb").write(webp_encode(im))
    ref = cv2.imread(p)
    assert ref is not None and np.array_equal(ref, im)


def test_progressive_jpeg_decode_vs_cv2():
    rng = np.random.default_rng(7)
    img = cv2.GaussianBlur(
        rng.integers(0, 256, (120, 160, 3), np.uint8), (0, 0), 2)
    for sampling in (0, 1):
        flags = [cv2.IMWRITE_JPEG_PROGRESSIVE, 1,
                 cv2.IMWRITE_JPEG_QUALITY, 90]
        if sampling:
            flags += [cv2.IMWRITE_JPEG_SAMPLING_FACTOR,
                      cv2.IMWRITE_JPEG_SAMPLING_FACTOR_420]
        okr, buf = cv2.imencode(".jpg", img, flags)
        assert okr
        ref = cv2.imdecode(buf, cv2.IMREAD_COLOR)
        ours = np.asarray(tcv.imdecode(buf, tcv.IMREAD_COLOR))
        assert ours.shape == ref.shape
        assert np.array_equal(ours, ref)  # bit-exact decode


def test_progressive_jpeg_noninterleaved_dc_scan():
    """Regression: a per-component (non-interleaved, Ns=1) DC scan must
    iterate the component's own block grid, not the MCU grid
    (T.81 A.2.2) — for 4:2:0 luma those differ by a factor of 4.
    libjpeg always emits interleaved DC scans, so this hand-crafts the
    file other encoders produce."""
    import struct
    from opencv_tpu.imgcodecs import jpeg as J

    def enc_map(bits, vals):
        m, code, k = {}, 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                m[vals[k]] = (length, code)
                code += 1
                k += 1
            code <<= 1
        return m

    class BW:
        def __init__(self):
            self.bits = []

        def put(self, val, n):
            for i in range(n - 1, -1, -1):
                self.bits.append((val >> i) & 1)

        def tobytes(self):
            bs = bytearray()
            b = self.bits + [1] * (-len(self.bits) % 8)
            for i in range(0, len(b), 8):
                byte = 0
                for bit in b[i:i + 8]:
                    byte = byte * 2 + bit
                bs.append(byte)
                if byte == 0xFF:
                    bs.append(0)  # byte stuffing
            return bytes(bs)

    dcmap = enc_map(*J._HT_DC_LUM)

    def dc_scan_bytes(diffs):
        w = BW()
        for d in diffs:
            t = max(0, abs(d)).bit_length()
            ln, code = dcmap[t]
            w.put(code, ln)
            if t:
                w.put(d if d >= 0 else d + (1 << t) - 1, t)
        return w.tobytes()

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, 16, 16, 3)
    out += bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])  # Y 2x2, Cb/Cr 1x1
    bits, vals = J._HT_DC_LUM
    out += (b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + b"\x00"
            + bytes(bits) + bytes(vals))

    def sos(cid):
        return (b"\xff\xda" + struct.pack(">H", 8)
                + bytes([1, cid, 0x00, 0, 0, 0]))

    # Y has a 2x2 block grid; diffs walk DC through 64,128,-64,0 in
    # raster order -> flat 8x8 quadrants of 136,144,120,128
    out += sos(1) + dc_scan_bytes([64, 64, -192, 64])
    out += sos(2) + dc_scan_bytes([0])  # Cb flat 128
    out += sos(3) + dc_scan_bytes([0])  # Cr flat 128
    out += b"\xff\xd9"

    img = np.asarray(tcv.imdecode(np.frombuffer(bytes(out), np.uint8),
                                  tcv.IMREAD_COLOR))
    assert img.shape == (16, 16, 3)
    expect = np.zeros((16, 16), int)
    expect[:8, :8], expect[:8, 8:] = 136, 144
    expect[8:, :8], expect[8:, 8:] = 120, 128
    for ch in range(3):  # Cb=Cr=128 -> B=G=R=Y
        assert np.abs(img[:, :, ch].astype(int) - expect).max() <= 1, ch


def test_progressive_jpeg_grayscale():
    rng = np.random.default_rng(8)
    img = cv2.GaussianBlur(
        rng.integers(0, 256, (64, 80), np.uint8), (0, 0), 1.5)
    okr, buf = cv2.imencode(".jpg", img,
                            [cv2.IMWRITE_JPEG_PROGRESSIVE, 1])
    assert okr
    ref = cv2.imdecode(buf, cv2.IMREAD_GRAYSCALE)
    ours = np.asarray(tcv.imdecode(buf, tcv.IMREAD_GRAYSCALE))
    assert np.array_equal(ours, ref)  # bit-exact decode


def test_hdr_cross_codec():
    rng = np.random.default_rng(9)
    img = (rng.random((40, 64, 3)) * 8).astype(np.float32)
    # ours -> cv2
    ok, buf = tcv.imencode(".hdr", img)
    assert ok
    ref = cv2.imdecode(np.frombuffer(bytes(buf), np.uint8),
                       cv2.IMREAD_UNCHANGED)
    assert ref is not None and ref.dtype == np.float32
    rel = np.abs(ref - img) / np.maximum(img, 1e-3)
    assert np.median(rel) < 0.01, np.median(rel)
    # cv2 -> ours
    ok, buf2 = cv2.imencode(".hdr", img)
    ours = np.asarray(tcv.imdecode(np.frombuffer(bytes(buf2), np.uint8),
                                   tcv.IMREAD_UNCHANGED))
    ref2 = cv2.imdecode(buf2, cv2.IMREAD_UNCHANGED)
    np.testing.assert_allclose(ours, ref2, rtol=1e-6)


def test_hdr_narrow_image_flat_scanlines():
    rng = np.random.default_rng(10)
    img = (rng.random((10, 5, 3)) * 4).astype(np.float32)  # W<8 => flat
    ok, buf = tcv.imencode(".hdr", img)
    ref = cv2.imdecode(np.frombuffer(bytes(buf), np.uint8),
                       cv2.IMREAD_UNCHANGED)
    ours = np.asarray(tcv.imdecode(np.frombuffer(bytes(buf), np.uint8),
                                   tcv.IMREAD_UNCHANGED))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_pam_cross_codec():
    rng = np.random.default_rng(11)
    for shape in ((30, 40), (30, 40, 3)):
        img = rng.integers(0, 256, shape, np.uint8)
        ok, buf = tcv.imencode(".pam", img)
        assert ok
        ref = cv2.imdecode(np.frombuffer(bytes(buf), np.uint8),
                           cv2.IMREAD_UNCHANGED)
        assert np.array_equal(ref, img)
        ok, buf2 = cv2.imencode(".pam", img)
        ours = np.asarray(tcv.imdecode(
            np.frombuffer(bytes(buf2), np.uint8), tcv.IMREAD_UNCHANGED))
        assert np.array_equal(ours, img)


def test_webp_lossy_vp8_decode_bitexact():
    """Lossy VP8 decode must be BIT-EXACT with the reference's libwebp
    path (grfmt_webp.cpp): same bool coder, tokens, predictors, loop
    filter, fancy upsampler and fixed-point YUV->BGR."""
    from opencv_tpu.imgcodecs.webp import webp_decode

    rng = np.random.default_rng(0)
    for (h, w) in [(16, 16), (17, 23), (64, 48), (33, 31)]:
        img = cv2.GaussianBlur(
            rng.integers(0, 256, (h, w, 3), np.uint8), (3, 3), 1)
        for q in (10, 50, 90):
            okr, buf = cv2.imencode(
                ".webp", img, [int(cv2.IMWRITE_WEBP_QUALITY), q])
            assert okr
            ref = cv2.imdecode(buf, 1)
            got = webp_decode(bytes(buf))
            assert_exact(got, ref, f"{h}x{w} q={q}")


def test_webp_lossy_via_imdecode():
    rng = np.random.default_rng(1)
    img = cv2.GaussianBlur(rng.integers(0, 256, (40, 56, 3), np.uint8),
                           (5, 5), 2)
    okr, buf = cv2.imencode(".webp", img,
                            [int(cv2.IMWRITE_WEBP_QUALITY), 80])
    ref = cv2.imdecode(buf, 1)
    got = np.asarray(tcv.imdecode(buf, tcv.IMREAD_COLOR))
    assert_exact(got, ref, "lossy webp through imdecode")


def test_exr_piz_roundtrip():
    """PIZ compression (ImfPizCompressor.cpp): wavelet+Huffman blocks
    round-trip for HALF and FLOAT channels.  The 5.0 wheel ships no EXR
    codec, so this is validated against the spec by round-trip plus
    component-level wavelet/Huffman inversion tests."""
    from opencv_tpu.imgcodecs.exr import exr_encode, exr_decode
    from opencv_tpu.imgcodecs.exr_piz import _wav2, _huf_compress, \
        _huf_uncompress

    rng = np.random.default_rng(2)
    img = np.cumsum(rng.normal(0, 0.1, (37, 53, 3)), axis=0) \
        .astype(np.float32)
    for half in (True, False):
        data = exr_encode(img, [48, 1 if half else 2, 49, 4])
        back = exr_decode(data)
        ref = img.astype(np.float16).astype(np.float32) if half else img
        assert np.array_equal(back, ref), ("half" if half else "float")
    # gray + odd sizes
    g = rng.normal(0, 1, (33, 31)).astype(np.float32)
    assert np.array_equal(exr_decode(exr_encode(g, [49, 4])), g)
    # component inversions
    a = rng.integers(0, 1 << 14, 13 * 17).astype(np.uint16)
    b = a.copy()
    _wav2(b, 17, 1, 13, 17, (1 << 14) - 1, False)
    _wav2(b, 17, 1, 13, 17, (1 << 14) - 1, True)
    assert np.array_equal(a, b)
    raw = rng.integers(0, 5000, 4096).astype(np.uint16)
    assert np.array_equal(_huf_uncompress(_huf_compress(raw), 4096), raw)


def test_jpeg_decode_bit_exact_matrix():
    """Decode is bit-identical to the wheel (libjpeg-turbo's integer
    islow IDCT + fancy upsampling + fixed-point YCbCr) across quality,
    sampling factor, restart markers, color/grayscale reads, odd sizes
    (grfmt_jpeg.cpp decode parity)."""
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, (37, 53, 3), np.uint8),
            cv2.GaussianBlur(
                rng.integers(0, 256, (96, 130, 3), np.uint8), (0, 0), 2)]
    samps = [None, cv2.IMWRITE_JPEG_SAMPLING_FACTOR_444,
             cv2.IMWRITE_JPEG_SAMPLING_FACTOR_422,
             cv2.IMWRITE_JPEG_SAMPLING_FACTOR_411]
    for img in imgs:
        for q in (30, 90, 100):
            for samp in samps:
                flags = [cv2.IMWRITE_JPEG_QUALITY, q]
                if samp is not None:
                    flags += [cv2.IMWRITE_JPEG_SAMPLING_FACTOR, samp]
                ok, buf = cv2.imencode(".jpg", img, flags)
                assert ok
                for rf, cf in ((tcv.IMREAD_COLOR, cv2.IMREAD_COLOR),
                               (tcv.IMREAD_GRAYSCALE,
                                cv2.IMREAD_GRAYSCALE)):
                    ref = cv2.imdecode(buf, cf)
                    ours = np.asarray(tcv.imdecode(buf, rf))
                    assert np.array_equal(ours, ref), (q, samp, cf)
    # restart markers
    ok, buf = cv2.imencode(".jpg", imgs[1],
                           [cv2.IMWRITE_JPEG_RST_INTERVAL, 3])
    assert ok
    assert np.array_equal(
        np.asarray(tcv.imdecode(buf, tcv.IMREAD_COLOR)),
        cv2.imdecode(buf, cv2.IMREAD_COLOR))


def test_jpeg_encode_byte_identical():
    """imencode('.jpg') emits the exact bytes the wheel emits (same
    fixed-point color conversion, biased downsampling, islow FDCT,
    round-half-away quantization, dummy-block MCU padding, header
    layout) across quality and sampling factor (grfmt_jpeg.cpp write
    parity)."""
    rng = np.random.default_rng(9)
    imgs = [rng.integers(0, 256, (37, 53, 3), np.uint8),
            cv2.GaussianBlur(
                rng.integers(0, 256, (64, 96, 3), np.uint8), (0, 0), 2),
            rng.integers(0, 256, (61, 93), np.uint8)]
    samps = [(0x221111, cv2.IMWRITE_JPEG_SAMPLING_FACTOR_420),
             (0x211111, cv2.IMWRITE_JPEG_SAMPLING_FACTOR_422),
             (0x111111, cv2.IMWRITE_JPEG_SAMPLING_FACTOR_444),
             (0x411111, cv2.IMWRITE_JPEG_SAMPLING_FACTOR_411),
             (0x121111, cv2.IMWRITE_JPEG_SAMPLING_FACTOR_440)]
    for img in imgs:
        for q in (1, 75, 95, 100):
            for sv, cvs in samps:
                if img.ndim == 2 and sv != 0x221111:
                    continue
                okr, ref = cv2.imencode(
                    ".jpg", img,
                    [cv2.IMWRITE_JPEG_QUALITY, q,
                     cv2.IMWRITE_JPEG_SAMPLING_FACTOR, cvs])
                assert okr
                okm, mine = tcv.imencode(".jpg", img, [1, q, 7, sv])
                assert okm
                assert bytes(ref) == bytes(np.asarray(mine)), (q, sv)
