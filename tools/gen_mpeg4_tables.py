"""Snapshot the normative ISO 14496-2 / H.263 VLC tables into
opencv_tpu/imgcodecs/mpeg4_tables.npz.

These are spec constants (ISO/IEC 14496-2 Tables B-6..B-19: MCBPC,
CBPY, MV, TCOEF run/level codes, DC size codes, DC scaler and scan
tables) — every conforming codec carries byte-identical copies.  Like
tools/gen_lab_luts.py and the VP8 token tables, they are captured ONCE
from the system libavcodec static archive (NOT from /root/reference)
and committed as data; the decoder logic in imgcodecs/mpeg4.py is
original.

Usage: python tools/gen_mpeg4_tables.py
"""

import json
import os
import subprocess
import tempfile

import numpy as np

ARCHIVE = "/usr/lib/x86_64-linux-gnu/libavcodec.a"
OBJECTS = ["h263data.o", "mpeg4video.o", "mathtables.o", "mpegvideodata.o"]

# symbol -> (object file, npz key, dtype, reshape)
SYMBOLS = {
    "ff_h263_intra_MCBPC_code": ("h263data.o", "intra_mcbpc_code", "u1", None),
    "ff_h263_intra_MCBPC_bits": ("h263data.o", "intra_mcbpc_bits", "u1", None),
    "ff_h263_inter_MCBPC_code": ("h263data.o", "inter_mcbpc_code", "u1", None),
    "ff_h263_inter_MCBPC_bits": ("h263data.o", "inter_mcbpc_bits", "u1", None),
    "ff_h263_cbpy_tab": ("h263data.o", "cbpy_tab", "u1", (-1, 2)),
    "ff_mvtab": ("h263data.o", "mvtab", "u1", (-1, 2)),
    "ff_inter_vlc": ("h263data.o", "inter_vlc", "<u2", (-1, 2)),
    "ff_inter_run": ("h263data.o", "inter_run", "i1", None),
    "ff_inter_level": ("h263data.o", "inter_level", "i1", None),
    "ff_mpeg4_intra_vlc": ("mpeg4video.o", "intra_vlc", "<u2", (-1, 2)),
    "ff_mpeg4_intra_run": ("mpeg4video.o", "intra_run", "i1", None),
    "ff_mpeg4_intra_level": ("mpeg4video.o", "intra_level", "i1", None),
    "ff_mpeg4_DCtab_lum": ("mpeg4video.o", "dctab_lum", "u1", (-1, 2)),
    "ff_mpeg4_DCtab_chrom": ("mpeg4video.o", "dctab_chrom", "u1", (-1, 2)),
    "ff_mpeg4_y_dc_scale_table": ("mpeg4video.o", "y_dc_scale", "u1", None),
    "ff_mpeg4_c_dc_scale_table": ("mpeg4video.o", "c_dc_scale", "u1", None),
    "ff_zigzag_direct": ("mathtables.o", "zigzag", "u1", None),
    "ff_alternate_horizontal_scan": ("mpegvideodata.o", "alt_horiz", "u1", None),
    "ff_alternate_vertical_scan": ("mpegvideodata.o", "alt_vert", "u1", None),
}


def _symtab(obj_path):
    import subprocess, re
    out = subprocess.run(["objdump", "-t", obj_path], capture_output=True,
                         text=True, check=True).stdout
    syms = {}
    for line in out.splitlines():
        m = re.match(r"^([0-9a-f]+)\s+g\s+O\s+(\S+)\s+([0-9a-f]+)\s+(\S+)$",
                     line.strip())
        if m:
            off, sec, size, name = m.groups()
            syms[name] = (sec, int(off, 16), int(size, 16))
    return syms


def _section_bytes(obj_path, section, tmpdir):
    import subprocess, os
    out = os.path.join(tmpdir, "sec.bin")
    subprocess.run(["objcopy", "-O", "binary",
                    f"--only-section={section}", obj_path, out], check=True)
    with open(out, "rb") as f:
        return f.read()


def main():
    out_path = os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..",
        "opencv_tpu", "imgcodecs", "mpeg4_tables.npz"))
    arrs = {}
    with tempfile.TemporaryDirectory() as td:
        subprocess.run(["ar", "x", ARCHIVE] + OBJECTS, cwd=td, check=True)
        cache = {}
        for sym, (obj, key, dtype, shape) in SYMBOLS.items():
            objp = os.path.join(td, obj)
            if obj not in cache:
                cache[obj] = (_symtab(objp), {})
            syms, secs = cache[obj]
            assert sym in syms, f"{sym} not found in {obj}"
            sec, off, size = syms[sym]
            if sec not in secs:
                secs[sec] = _section_bytes(objp, sec, td)
            raw = secs[sec][off:off + size]
            a = np.frombuffer(raw, dtype=dtype).copy()
            if shape:
                a = a.reshape(shape)
            arrs[key] = a
    np.savez_compressed(out_path, **arrs)
    print("wrote", out_path)
    for k, a in arrs.items():
        print(f"  {k}: {a.shape} {a.dtype} head={a.ravel()[:6].tolist()}")


if __name__ == "__main__":
    main()
