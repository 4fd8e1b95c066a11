"""Minimal FlatBuffers builder + TFLite model writer for tests.

Implements just enough of the FlatBuffers wire format (tables, vtables,
vectors, strings, prepend-style construction with end-relative offsets)
to emit small .tflite graphs that BOTH cv2.dnn.readNetFromTFLite and
opencv_tpu.dnn.tflite can parse — giving a true cross-oracle test
without a TensorFlow dependency.
"""

import struct

import numpy as np


class FBB:
    """Prepend-style FlatBuffers builder (offsets measured from end)."""

    def __init__(self):
        self.buf = bytearray()
        self.minalign = 1
        self._vt = None
        self._obj_start = 0

    def offset(self):
        return len(self.buf)

    def _prepend(self, b):
        self.buf[:0] = b

    def pad(self, n):
        if n:
            self._prepend(b"\x00" * n)

    def prep(self, size, additional=0):
        self.minalign = max(self.minalign, size)
        total = len(self.buf) + additional
        self.pad((-total) % size)

    def push_scalar(self, fmt, v, size):
        self.prep(size)
        self._prepend(struct.pack("<" + fmt, v))
        return self.offset()

    def push_uoffset(self, target_off):
        self.prep(4)
        val = len(self.buf) + 4 - target_off
        self._prepend(struct.pack("<I", val))
        return self.offset()

    # ---- vectors / strings ----
    def vector(self, arr):
        """Scalar vector from a numpy array; returns its offset."""
        arr = np.ascontiguousarray(arr)
        es = arr.dtype.itemsize
        self.prep(4, arr.nbytes)
        self.prep(es, arr.nbytes)
        self._prepend(arr.tobytes())
        self._prepend(struct.pack("<I", arr.size))
        return self.offset()

    def offset_vector(self, offs):
        """Vector of uoffsets (tables/strings); returns its offset."""
        self.prep(4, 4 * len(offs))
        for o in reversed(offs):
            val = len(self.buf) + 4 - o
            self._prepend(struct.pack("<I", val))
        self._prepend(struct.pack("<I", len(offs)))
        return self.offset()

    def string(self, s):
        b = s.encode("utf-8")
        self.prep(4, len(b) + 1)
        self._prepend(b + b"\x00")
        self._prepend(struct.pack("<I", len(b)))
        return self.offset()

    # ---- tables ----
    def start(self):
        self._vt = {}
        self._obj_start = self.offset()

    def slot_scalar(self, fid, fmt, v, size, default=0):
        if v == default:
            return
        self.push_scalar(fmt, v, size)
        self._vt[fid] = self.offset()

    def slot_uoffset(self, fid, target_off):
        if target_off is None:
            return
        self.push_uoffset(target_off)
        self._vt[fid] = self.offset()

    def end(self):
        # soffset placeholder
        self.prep(4)
        self._prepend(b"\x00" * 4)
        table_off = self.offset()
        table_size = table_off - self._obj_start
        nslots = (max(self._vt) + 1) if self._vt else 0
        vt_len = 4 + 2 * nslots
        entries = [0] * nslots
        for fid, foff in self._vt.items():
            entries[fid] = table_off - foff
        vt = struct.pack("<HH", vt_len, table_size)
        vt += b"".join(struct.pack("<H", e) for e in entries)
        self.prep(2)
        self._prepend(vt)
        vt_off = self.offset()
        # patch soffset at table start (position from front)
        pos = len(self.buf) - table_off
        struct.pack_into("<i", self.buf, pos, vt_off - table_off)
        self._vt = None
        return table_off

    def finish(self, root_off, file_id=None):
        if file_id:
            self.prep(self.minalign, 8)
            self._prepend(file_id.encode("ascii")[:4])
        else:
            self.prep(self.minalign, 4)
        self._prepend(struct.pack("<I", len(self.buf) + 4 - root_off))
        return bytes(self.buf)


# --------------------------------------------------------------- tflite

TT_FLOAT32 = 0
TT_INT32 = 2


def _buffer(fb, data=None):
    dv = fb.vector(np.frombuffer(data, np.uint8)) if data else None
    fb.start()
    fb.slot_uoffset(0, dv)
    return fb.end()


def _tensor(fb, shape, ttype, buffer_idx, name):
    sv = fb.vector(np.asarray(shape, np.int32))
    nv = fb.string(name)
    fb.start()
    fb.slot_uoffset(0, sv)
    fb.slot_scalar(1, "b", ttype, 1)
    fb.slot_scalar(2, "I", buffer_idx, 4)
    fb.slot_uoffset(3, nv)
    return fb.end()


def _opcode(fb, builtin):
    fb.start()
    # deprecated_builtin_code (field 0, byte) for codes < 127;
    # builtin_code (field 3, int32) always
    fb.slot_scalar(0, "b", min(builtin, 127), 1)
    fb.slot_scalar(3, "i", builtin, 4)
    return fb.end()


def _operator(fb, opcode_index, inputs, outputs, opts_type=0, opts_off=None):
    iv = fb.vector(np.asarray(inputs, np.int32))
    ov = fb.vector(np.asarray(outputs, np.int32))
    fb.start()
    fb.slot_scalar(0, "I", opcode_index, 4)
    fb.slot_uoffset(1, iv)
    fb.slot_uoffset(2, ov)
    fb.slot_scalar(3, "B", opts_type, 1)
    fb.slot_uoffset(4, opts_off)
    return fb.end()


def build_tflite_convnet(seed=0):
    """Small float32 convnet: CONV_2D(SAME,relu) -> MAX_POOL_2D ->
    DEPTHWISE_CONV_2D(SAME) -> RESHAPE -> FULLY_CONNECTED -> SOFTMAX.

    Returns (tflite_bytes, input_shape_nhwc, weights_dict).
    """
    rng = np.random.default_rng(seed)
    H = W = 8
    CIN, COUT = 3, 4
    wconv = rng.normal(0, 0.5, (COUT, 3, 3, CIN)).astype(np.float32)  # OHWI
    bconv = rng.normal(0, 0.2, (COUT,)).astype(np.float32)
    wdw = rng.normal(0, 0.5, (1, 3, 3, COUT)).astype(np.float32)      # 1HWO
    bdw = rng.normal(0, 0.2, (COUT,)).astype(np.float32)
    fc_in = (H // 2) * (W // 2) * COUT
    NCLS = 5
    wfc = rng.normal(0, 0.3, (NCLS, fc_in)).astype(np.float32)
    bfc = rng.normal(0, 0.1, (NCLS,)).astype(np.float32)

    fb = FBB()

    # buffers (0 must be empty sentinel)
    b_empty = _buffer(fb)
    b_wconv = _buffer(fb, wconv.tobytes())
    b_bconv = _buffer(fb, bconv.tobytes())
    b_wdw = _buffer(fb, wdw.tobytes())
    b_bdw = _buffer(fb, bdw.tobytes())
    b_shape = _buffer(fb, np.asarray([1, fc_in], np.int32).tobytes())
    b_wfc = _buffer(fb, wfc.tobytes())
    b_bfc = _buffer(fb, bfc.tobytes())
    buffers = fb.offset_vector([b_empty, b_wconv, b_bconv, b_wdw, b_bdw,
                                b_shape, b_wfc, b_bfc])

    tens = []
    tens.append(_tensor(fb, [1, H, W, CIN], TT_FLOAT32, 0, "input"))     # 0
    tens.append(_tensor(fb, list(wconv.shape), TT_FLOAT32, 1, "wconv"))  # 1
    tens.append(_tensor(fb, [COUT], TT_FLOAT32, 2, "bconv"))             # 2
    tens.append(_tensor(fb, [1, H, W, COUT], TT_FLOAT32, 0, "conv_out"))  # 3
    tens.append(_tensor(fb, [1, H // 2, W // 2, COUT], TT_FLOAT32, 0,
                        "pool_out"))                                      # 4
    tens.append(_tensor(fb, list(wdw.shape), TT_FLOAT32, 3, "wdw"))      # 5
    tens.append(_tensor(fb, [COUT], TT_FLOAT32, 4, "bdw"))               # 6
    tens.append(_tensor(fb, [1, H // 2, W // 2, COUT], TT_FLOAT32, 0,
                        "dw_out"))                                        # 7
    tens.append(_tensor(fb, [2], TT_INT32, 5, "new_shape"))              # 8
    tens.append(_tensor(fb, [1, fc_in], TT_FLOAT32, 0, "flat"))          # 9
    tens.append(_tensor(fb, list(wfc.shape), TT_FLOAT32, 6, "wfc"))      # 10
    tens.append(_tensor(fb, [NCLS], TT_FLOAT32, 7, "bfc"))               # 11
    tens.append(_tensor(fb, [1, NCLS], TT_FLOAT32, 0, "fc_out"))         # 12
    tens.append(_tensor(fb, [1, NCLS], TT_FLOAT32, 0, "prob"))           # 13
    tensors = fb.offset_vector(tens)

    # option tables
    def conv_opts(act=0):
        fb.start()
        fb.slot_scalar(0, "b", 0, 1, default=-1)  # padding SAME (=0, force)
        fb.slot_scalar(1, "i", 1, 4, default=-1)
        fb.slot_scalar(2, "i", 1, 4, default=-1)
        fb.slot_scalar(3, "b", act, 1, default=-1)
        return fb.end()

    def dw_opts():
        fb.start()
        fb.slot_scalar(0, "b", 0, 1, default=-1)
        fb.slot_scalar(1, "i", 1, 4, default=-1)
        fb.slot_scalar(2, "i", 1, 4, default=-1)
        fb.slot_scalar(3, "i", 1, 4, default=-1)  # depth_multiplier
        fb.slot_scalar(4, "b", 0, 1, default=-1)
        return fb.end()

    def pool_opts():
        fb.start()
        fb.slot_scalar(0, "b", 1, 1, default=-1)  # padding VALID
        fb.slot_scalar(1, "i", 2, 4, default=-1)
        fb.slot_scalar(2, "i", 2, 4, default=-1)
        fb.slot_scalar(3, "i", 2, 4, default=-1)
        fb.slot_scalar(4, "i", 2, 4, default=-1)
        return fb.end()

    def fc_opts():
        fb.start()
        fb.slot_scalar(0, "b", 0, 1, default=-1)  # activation NONE
        return fb.end()

    def softmax_opts():
        fb.start()
        fb.slot_scalar(0, "f", 1.0, 4, default=-1.0)  # beta
        return fb.end()

    def reshape_opts(shape):
        sv = fb.vector(np.asarray(shape, np.int32))
        fb.start()
        fb.slot_uoffset(0, sv)
        return fb.end()

    co = conv_opts(act=1)       # fused RELU
    dwo = dw_opts()
    po = pool_opts()
    fco = fc_opts()
    smo = softmax_opts()
    ro = reshape_opts([1, fc_in])

    ops = []
    # BuiltinOptions union types: Conv2DOptions=1, DepthwiseConv2DOptions=2,
    # Pool2DOptions=5, ReshapeOptions=13, FullyConnectedOptions=8,
    # SoftmaxOptions=9
    ops.append(_operator(fb, 0, [0, 1, 2], [3], 1, co))      # CONV_2D
    ops.append(_operator(fb, 1, [3], [4], 5, po))            # MAX_POOL_2D
    ops.append(_operator(fb, 2, [4, 5, 6], [7], 2, dwo))     # DW_CONV
    ops.append(_operator(fb, 3, [7, 8], [9], 13, ro))        # RESHAPE
    ops.append(_operator(fb, 4, [9, 10, 11], [12], 8, fco))  # FC
    ops.append(_operator(fb, 5, [12], [13], 9, smo))         # SOFTMAX
    operators = fb.offset_vector(ops)

    inputs_v = fb.vector(np.asarray([0], np.int32))
    outputs_v = fb.vector(np.asarray([13], np.int32))
    sg_name = fb.string("main")
    fb.start()
    fb.slot_uoffset(0, tensors)
    fb.slot_uoffset(1, inputs_v)
    fb.slot_uoffset(2, outputs_v)
    fb.slot_uoffset(3, operators)
    fb.slot_uoffset(4, sg_name)
    subgraph = fb.end()
    subgraphs = fb.offset_vector([subgraph])

    opc = [_opcode(fb, 3), _opcode(fb, 17), _opcode(fb, 4),
           _opcode(fb, 22), _opcode(fb, 9), _opcode(fb, 25)]
    opcodes = fb.offset_vector(opc)

    desc = fb.string("opencv_tpu test net")
    fb.start()
    fb.slot_scalar(0, "I", 3, 4)  # version
    fb.slot_uoffset(1, opcodes)
    fb.slot_uoffset(2, subgraphs)
    fb.slot_uoffset(3, desc)
    fb.slot_uoffset(4, buffers)
    model = fb.end()

    data = fb.finish(model, "TFL3")
    weights = dict(wconv=wconv, bconv=bconv, wdw=wdw, bdw=bdw,
                   wfc=wfc, bfc=bfc)
    return data, (1, H, W, CIN), weights
