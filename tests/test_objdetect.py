"""objdetect: ArUco vs the cv2 oracle."""

import numpy as np

from common import cv2

import opencv_tpu as tcv
from opencv_tpu import aruco


DICT_PAIRS = [
    (aruco.DICT_4X4_50, "DICT_4X4_50"),
    (aruco.DICT_5X5_100, "DICT_5X5_100"),
    (aruco.DICT_6X6_250, "DICT_6X6_250"),
    (aruco.DICT_7X7_50, "DICT_7X7_50"),
    (aruco.DICT_ARUCO_ORIGINAL, "DICT_ARUCO_ORIGINAL"),
    (aruco.DICT_APRILTAG_16h5, "DICT_APRILTAG_16H5"),
    (aruco.DICT_APRILTAG_36h11, "DICT_APRILTAG_36H11"),
    (aruco.DICT_ARUCO_MIP_36h12, "DICT_ARUCO_MIP_36H12"),
]


def test_aruco_dictionaries_match_cv2():
    for ours_id, name in DICT_PAIRS:
        ours = aruco.getPredefinedDictionary(ours_id)
        ref = cv2.aruco.getPredefinedDictionary(getattr(cv2.aruco, name))
        assert np.array_equal(ours.bytesList, ref.bytesList), name
        assert ours.markerSize == ref.markerSize


def test_aruco_generate_marker_exact():
    d_our = aruco.getPredefinedDictionary(aruco.DICT_6X6_250)
    d_ref = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_6X6_250)
    for mid in (0, 13, 99, 249):
        for side in (8, 64, 101):
            np.testing.assert_array_equal(
                aruco.generateImageMarker(d_our, mid, side),
                cv2.aruco.generateImageMarker(d_ref, mid, side))


def test_aruco_detect_matches_cv2():
    d_our = aruco.getPredefinedDictionary(aruco.DICT_5X5_100)
    d_ref = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_5X5_100)
    scene = np.full((260, 340), 255, np.uint8)
    for mid, (x, y, side) in [(3, (20, 20, 60)), (55, (150, 30, 80)),
                              (90, (60, 140, 72))]:
        scene[y:y + side, x:x + side] = cv2.aruco.generateImageMarker(
            d_ref, mid, side)
    for angle in (0, 15):
        M = cv2.getRotationMatrix2D((170, 130), angle, 1.0)
        img = cv2.warpAffine(scene, M, (340, 260), borderValue=255)
        img = np.clip(img.astype(int) + np.random.default_rng(0).integers(
            -6, 6, img.shape), 0, 255).astype(np.uint8)
        c_r, i_r, _ = cv2.aruco.ArucoDetector(d_ref).detectMarkers(img)
        c_o, i_o, _ = aruco.ArucoDetector(d_our).detectMarkers(img)
        ids_r = sorted(i_r.ravel().tolist()) if i_r is not None else []
        ids_o = sorted(i_o.ravel().tolist()) if i_o is not None else []
        assert ids_o == ids_r, (angle, ids_r, ids_o)
        ref_map = {int(i): np.asarray(c) for i, c in zip(i_r.ravel(), c_r)}
        for i, c in zip(i_o.ravel(), c_o):
            d = np.abs(ref_map[int(i)] - np.asarray(c)).max()
            assert d <= 1.0, (angle, int(i), d)


def test_qrcode_detect_and_decode():
    det = tcv.QRCodeDetector()
    texts = ["HELLO TPU 123", "opencv_tpu round one", "1234567890",
             "The quick brown fox jumps over the lazy dog 42!"]
    for txt in texts:
        enc = cv2.QRCodeEncoder_create()
        code = enc.encode(txt)
        big = cv2.resize(code, None, fx=8, fy=8,
                         interpolation=cv2.INTER_NEAREST)
        big = cv2.copyMakeBorder(big, 32, 32, 32, 32,
                                 cv2.BORDER_CONSTANT, value=255)
        out, pts, straight = det.detectAndDecode(big)
        assert out == txt, (txt, out)
        assert pts is not None and pts.shape == (1, 4, 2)
        assert straight is not None
        # cv2 detects at the same location (corner agreement)
        ref_txt, ref_pts, _ = cv2.QRCodeDetector().detectAndDecode(big)
        assert ref_txt == txt
        d = np.abs(np.sort(pts.reshape(4, 2), axis=0)
                   - np.sort(np.asarray(ref_pts).reshape(4, 2), axis=0))
        assert d.max() < 6, d.max()
    # noisy + slightly scaled
    enc = cv2.QRCodeEncoder_create()
    code = enc.encode("NOISE TEST 99")
    big = cv2.resize(code, None, fx=7, fy=7,
                     interpolation=cv2.INTER_NEAREST)
    big = cv2.copyMakeBorder(big, 25, 25, 25, 25, cv2.BORDER_CONSTANT,
                             value=255)
    rng = np.random.default_rng(0)
    noisy = np.clip(big.astype(int) + rng.integers(-25, 25, big.shape),
                    0, 255).astype(np.uint8)
    out, pts, _ = det.detectAndDecode(noisy)
    assert out == "NOISE TEST 99"


def test_hog_people_detection():
    """HOG detectMultiScale with the bundled INRIA people SVM (the 5.0
    wheel dropped HOGDescriptor; validated on real people in the
    reference's sample images)."""
    import os
    path = "/root/reference/samples/data/basketball1.png"
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference sample data unavailable")
    img = cv2.imread(path)
    hog = tcv.HOGDescriptor()
    assert hog.getDescriptorSize() == 3780
    det = tcv.HOGDescriptor.getDefaultPeopleDetector()
    assert len(det) == 3781
    hog.setSVMDetector(det)
    rects, weights = hog.detectMultiScale(img, hitThreshold=0.0,
                                          winStride=(8, 8))
    assert len(rects) >= 1
    # detections land on the players (right half of the court view)
    for (x, y, w, h) in rects:
        assert 300 < x + w / 2 < 640 and 150 < y + h / 2 < 450, (x, y, w, h)
    # pure noise: no detections
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, (256, 192, 3), np.uint8)
    r2, _ = hog.detectMultiScale(noise, hitThreshold=0.0)
    assert len(r2) == 0


def test_group_rectangles():
    rects = [(10, 10, 50, 100), (12, 11, 50, 100), (9, 10, 52, 98),
             (200, 50, 40, 80)]
    out, w = tcv.groupRectangles(rects, 1, 0.2)
    assert len(out) == 1 and w[0] == 3
    assert abs(out[0][0] - 10) <= 2


def test_haar_cascade_face_detection():
    import os
    xml = ("/root/reference/data/haarcascades/"
           "haarcascade_frontalface_default.xml")
    lena = "/root/reference/samples/data/lena.jpg"
    if not (os.path.exists(xml) and os.path.exists(lena)):
        import pytest
        pytest.skip("reference data unavailable")
    cc = tcv.CascadeClassifier(xml)
    assert not cc.empty()
    img = cv2.imread(lena)
    faces = cc.detectMultiScale(img, 1.2, 3, minSize=(60, 60))
    assert len(faces) >= 1
    # the classic lena face: centered around (290, 290), size ~170
    centers = [(x + w / 2, y + h / 2) for (x, y, w, h) in faces]
    assert any(abs(cx - 290) < 60 and abs(cy - 285) < 60
               for cx, cy in centers), faces
    # flat image: no faces
    flat = np.full((200, 200), 128, np.uint8)
    assert len(cc.detectMultiScale(flat, 1.2, 3)) == 0


def _make_yunet_like_onnx(path, H=96, W=96, seed=0):
    """YuNet-architecture ONNX with random weights: 12 outputs named
    cls_/obj_/bbox_/kps_{8,16,32} shaped (1, rows*cols, C) like the real
    model — lets cv2.FaceDetectorYN and ours run the same file."""
    from opencv_tpu.dnn.importers import _GraphBuilder

    rng = np.random.default_rng(seed)
    gb = _GraphBuilder("yunet_like")
    gb.input("input")
    for d in (1, 3, H, W):  # cv2's importer requires input shape info
        gb.g.input[0].type.tensor_type.shape.dim.add().dim_value = d
    for s in (8, 16, 32):
        pooled = f"p{s}"
        gb.node("AveragePool", ["input"], [pooled],
                kernel_shape=[s, s], strides=[s, s])
        for name, ch, sig, std in (("cls", 1, True, 0.4),
                                   ("obj", 1, True, 0.4),
                                   ("bbox", 4, False, 0.003),
                                   ("kps", 10, False, 0.01)):
            w = rng.normal(0, std, (ch, 3, 1, 1)).astype(np.float32)
            b = rng.normal(0, std, (ch,)).astype(np.float32)
            gb.init(f"w_{name}_{s}", w)
            gb.init(f"b_{name}_{s}", b)
            conv = f"{name}_{s}_conv"
            gb.node("Conv", [pooled, f"w_{name}_{s}", f"b_{name}_{s}"],
                    [conv], kernel_shape=[1, 1], strides=[1, 1],
                    pads=[0, 0, 0, 0])
            act = conv
            if sig:
                act = f"{name}_{s}_sig"
                gb.node("Sigmoid", [conv], [act])
            tr = f"{name}_{s}_tr"
            gb.node("Transpose", [act], [tr], perm=[0, 2, 3, 1])
            gb.init(f"shape_{name}_{s}", np.asarray([1, -1, ch], np.int64))
            gb.node("Reshape", [tr, f"shape_{name}_{s}"], [f"{name}_{s}"])
            gb.output(f"{name}_{s}")
            for d in (1, (H // s) * (W // s), ch):
                gb.g.output[-1].type.tensor_type.shape.dim.add() \
                    .dim_value = d
    with open(path, "wb") as f:
        f.write(gb.model.SerializeToString())


def test_face_detector_yn_vs_cv2(tmp_path):
    """FaceDetectorYN post-processing parity: same random-weight YuNet
    variant, same image -> identical detections (face_detect.cpp:160)."""
    path = str(tmp_path / "yunet_like.onnx")
    _make_yunet_like_onnx(path)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (96, 96, 3), np.uint8)

    ref = cv2.FaceDetectorYN_create(path, "", (96, 96), 0.45, 0.3, 50)
    _, rfaces = ref.detect(img)
    ours = tcv.FaceDetectorYN_create(path, "", (96, 96), 0.45, 0.3, 50)
    _, ofaces = ours.detect(img)

    if rfaces is None:
        assert ofaces is None or len(ofaces) == 0
        return
    assert ofaces is not None and len(ofaces) == len(rfaces), \
        (len(rfaces), 0 if ofaces is None else len(ofaces))
    # order can differ on score ties; sort by score then x
    r = rfaces[np.lexsort((rfaces[:, 0], rfaces[:, 14]))]
    o = ofaces[np.lexsort((ofaces[:, 0], ofaces[:, 14]))]
    assert np.allclose(r, o, atol=1e-3), np.abs(r - o).max()


def test_face_recognizer_sf_align_and_match(tmp_path):
    """FaceRecognizerSF: alignCrop geometry + feature/match flow with a
    tiny random embedding net (cosine/L2 parity with cv2)."""
    from opencv_tpu.dnn.importers import _GraphBuilder

    rng = np.random.default_rng(2)
    gb = _GraphBuilder("sface_like")
    gb.input("input")
    for d in (1, 3, 112, 112):
        gb.g.input[0].type.tensor_type.shape.dim.add().dim_value = d
    w = rng.normal(0, 0.1, (16, 3, 112, 112)).astype(np.float32)
    gb.init("w", w)
    gb.node("Conv", ["input", "w"], ["emb4"],
            kernel_shape=[112, 112], strides=[1, 1], pads=[0, 0, 0, 0])
    gb.init("shape", np.asarray([1, 16], np.int64))
    gb.node("Reshape", ["emb4", "shape"], ["emb"])
    gb.output("emb")
    for d in (1, 16):
        gb.g.output[-1].type.tensor_type.shape.dim.add().dim_value = d
    path = str(tmp_path / "sface_like.onnx")
    with open(path, "wb") as f:
        f.write(gb.model.SerializeToString())

    img = rng.integers(0, 256, (200, 200, 3), np.uint8)
    face = np.zeros(15, np.float32)
    face[:4] = [40, 40, 100, 100]
    face[4:14] = [70, 80, 120, 80, 95, 105, 75, 130, 115, 130]

    ref = cv2.FaceRecognizerSF_create(path, "")
    ours = tcv.FaceRecognizerSF_create(path, "")
    ra = ref.alignCrop(img, face)
    oa = ours.alignCrop(img, face)
    assert ra.shape == oa.shape == (112, 112, 3)
    d = np.abs(ra.astype(int) - oa.astype(int))
    assert d.mean() < 2.0, d.mean()  # alignment geometry parity

    f1r = ref.feature(ra)
    f1o = ours.feature(ra.copy())
    assert np.allclose(f1r.ravel(), f1o.ravel(), rtol=1e-4, atol=0.5)
    f2 = ref.feature(ref.alignCrop(img, face + 2))
    cr = ref.match(f1r, f2, cv2.FaceRecognizerSF_FR_COSINE)
    co = ours.match(f1o, f2, 0)
    assert abs(cr - co) < 1e-4


_EANL_BITS = {0: "0001101", 1: "0011001", 2: "0010011", 3: "0111101",
              4: "0100011", 5: "0110001", 6: "0101111", 7: "0111011",
              8: "0110111", 9: "0001011"}
_EAN13_PAR = {0: "LLLLLL", 1: "LLGLGG", 2: "LLGGLG", 3: "LLGGGL",
              4: "LGLLGG", 5: "LGGLLG", 6: "LGGGLL", 7: "LGLGLG",
              8: "LGLGGL", 9: "LGGLGL"}


def _render_ean13(digits12, module=3, height=90, quiet=24):
    """Render an EAN-13 barcode image from spec (12 digits + checksum)."""
    d = [int(c) for c in digits12]
    s = sum(x * (3 if i % 2 else 1) for i, x in enumerate(d))
    d.append((10 - s % 10) % 10)
    first, left, right = d[0], d[1:7], d[7:]
    bits = "101"
    for dig, p in zip(left, _EAN13_PAR[first]):
        l = _EANL_BITS[dig]
        if p == "L":
            bits += l
        else:  # G = reversed complement of L reversed... G = reverse of R
            r = "".join("1" if c == "0" else "0" for c in l)
            bits += r[::-1]
    bits += "01010"
    for dig in right:
        l = _EANL_BITS[dig]
        bits += "".join("1" if c == "0" else "0" for c in l)  # R = ~L
    bits += "101"
    row = np.full((quiet * 2 + len(bits)) * module, 255, np.uint8)
    for i, b in enumerate(bits):
        if b == "1":
            row[(quiet + i) * module:(quiet + i + 1) * module] = 0
    img = np.tile(row, (height, 1))
    pad = np.full((40, img.shape[1]), 255, np.uint8)
    return "".join(str(x) for x in d), np.vstack([pad, img, pad])


def test_barcode_ean13_decode():
    code, img = _render_ean13("590123412345")
    ours = tcv.barcode_BarcodeDetector()
    ok, infos, types, pts = ours.detectAndDecode(img)
    assert ok, "no barcode decoded"
    assert code in infos, (code, infos)
    assert "EAN_13" in types

    ref = cv2.barcode_BarcodeDetector()
    r = ref.detectAndDecode(img)  # 5.0 wheel: (infos, types, corners)
    rinfos = r[1] if len(r) == 4 else r[0]
    if any(rinfos):  # reference wheel also decodes it: texts must agree
        assert code in rinfos, (code, rinfos)


def test_barcode_rotated_and_decode_api():
    code, img = _render_ean13("401234567890")
    M = cv2.getRotationMatrix2D((img.shape[1] / 2, img.shape[0] / 2),
                                180.0, 1.0)
    rot = cv2.warpAffine(img, M, (img.shape[1], img.shape[0]),
                         borderValue=255)
    ours = tcv.barcode_BarcodeDetector()
    ok, infos, types, pts = ours.detectAndDecode(rot)
    assert ok and code in infos, (code, infos)


def test_charuco_board_and_detector():
    """CharucoBoard render must be BIT-IDENTICAL to the reference; the
    detector must find the same markers and interpolate the same corners
    (charuco_detector.cpp LocalHom path)."""
    d_r = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_50)
    board_r = cv2.aruco.CharucoBoard((5, 4), 40.0, 30.0, d_r)
    img = board_r.generateImage((420, 340), marginSize=10)

    d_o = tcv.aruco.getPredefinedDictionary(tcv.aruco.DICT_4X4_50)
    board_o = tcv.aruco.CharucoBoard((5, 4), 40.0, 30.0, d_o)
    img_o = board_o.generateImage((420, 340), marginSize=10)
    assert np.array_equal(img, img_o), "board render differs"

    cc_r, ci_r, mc_r, mi_r = cv2.aruco.CharucoDetector(board_r) \
        .detectBoard(img)
    cc_o, ci_o, mc_o, mi_o = tcv.aruco.CharucoDetector(board_o) \
        .detectBoard(img)
    assert set(np.ravel(mi_o)) == set(np.ravel(mi_r))
    ri = {int(i): c for i, c in zip(ci_r.ravel(), cc_r.reshape(-1, 2))}
    oi = {int(i): c for i, c in zip(ci_o.ravel(), cc_o.reshape(-1, 2))}
    assert set(ri) == set(oi), "charuco corner id sets differ"
    d = [np.linalg.norm(ri[i] - oi[i]) for i in ri]
    assert np.max(d) < 0.15, f"corner distance max {np.max(d)}"


def test_charuco_rotated_view():
    """Detection under a perspective view: same ids, corners < 0.5px."""
    d_r = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_5X5_100)
    board_r = cv2.aruco.CharucoBoard((6, 5), 30.0, 22.0, d_r)
    img = board_r.generateImage((480, 400), marginSize=16)
    src = np.float32([[0, 0], [479, 0], [479, 399], [0, 399]])
    dst = np.float32([[14, 22], [462, 8], [470, 380], [6, 390]])
    Hm = cv2.getPerspectiveTransform(src, dst)
    warped = cv2.warpPerspective(img, Hm, (480, 400), borderValue=255)

    cc_r, ci_r, _, _ = cv2.aruco.CharucoDetector(board_r).detectBoard(warped)
    d_o = tcv.aruco.getPredefinedDictionary(tcv.aruco.DICT_5X5_100)
    board_o = tcv.aruco.CharucoBoard((6, 5), 30.0, 22.0, d_o)
    cc_o, ci_o, _, _ = tcv.aruco.CharucoDetector(board_o).detectBoard(warped)
    assert ci_r is not None and ci_o is not None
    ri = {int(i): c for i, c in zip(ci_r.ravel(), cc_r.reshape(-1, 2))}
    oi = {int(i): c for i, c in zip(ci_o.ravel(), cc_o.reshape(-1, 2))}
    common = set(ri) & set(oi)
    assert len(common) >= 0.9 * max(len(ri), len(oi))
    d = [np.linalg.norm(ri[i] - oi[i]) for i in common]
    assert np.mean(d) < 0.5, f"mean corner dist {np.mean(d)}"


def test_haar_cascade_tilted_features():
    """A tilted-feature cascade (smile) agrees with cv2 on real data."""
    import os
    xml = ("/root/reference/data/haarcascades/haarcascade_smile.xml")
    lena = "/root/reference/samples/data/lena.jpg"
    if not (os.path.exists(xml) and os.path.exists(lena)):
        import pytest
        pytest.skip("reference data unavailable")
    cc = tcv.CascadeClassifier(xml)
    assert not cc.empty() and cc._has_tilted
    # (the installed cv2 wheel has no CascadeClassifier to compare with;
    # validated structurally + on real data)
    img = cv2.imread(lena)
    mouth = img[300:380, 220:350]  # lena's mouth region
    ours = cc.detectMultiScale(mouth, 1.1, 2, minSize=(20, 20))
    assert len(ours) >= 1, "smile cascade fires nowhere on a real mouth"
    flat = np.full((120, 120), 128, np.uint8)
    assert len(cc.detectMultiScale(flat, 1.1, 3)) == 0


def test_qrcode_encoder_vs_cv2():
    """Our QRCodeEncoder must be bit-exact with the reference encoder
    (qrcode_encoder.cpp) across modes, versions and EC levels."""
    import numpy as np
    ours = tcv.QRCodeEncoder_create()
    ref = cv2.QRCodeEncoder_create()
    for text in ["HELLO WORLD 123", "1234567890", "lower case bytes!",
                 "x" * 200, "9" * 60]:
        assert np.array_equal(ours.encode(text), ref.encode(text)), text
    for lvl in range(4):
        wp = cv2.QRCodeEncoder.Params()
        wp.correction_level = lvl
        got = tcv.QRCodeEncoder(correction_level=lvl).encode("EC TEST 77")
        assert np.array_equal(got, cv2.QRCodeEncoder_create(wp)
                              .encode("EC TEST 77")), lvl


def test_qrcode_encode_decode_roundtrip():
    """Encode with ours, decode with the wheel's detector."""
    import numpy as np
    m = tcv.QRCodeEncoder_create().encode("ROUNDTRIP OK 99")
    big = cv2.resize(m, None, fx=8, fy=8,
                     interpolation=cv2.INTER_NEAREST)
    det = cv2.QRCodeDetector()
    txt, pts, _ = det.detectAndDecode(big)
    assert txt == "ROUNDTRIP OK 99", txt
