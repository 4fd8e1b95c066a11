"""FileStorage persistence (core/src/persistence.cpp) — JSON backend.

Writes/reads the reference's JSON format: matrices as
{"type_id": "opencv-matrix", "rows", "cols", "dt", "data"} so files are
interchangeable with the reference's FileStorage JSON mode.  XML/YAML
are round-2 gaps (no yaml in the stdlib).
"""

from __future__ import annotations

import json

import numpy as np

__all__ = ["FileStorage", "FILE_STORAGE_READ", "FILE_STORAGE_WRITE"]

FILE_STORAGE_READ = 0
FILE_STORAGE_WRITE = 1
FILE_STORAGE_APPEND = 2

_DT = {"u": np.uint8, "c": np.int8, "w": np.uint16, "s": np.int16,
       "i": np.int32, "f": np.float32, "d": np.float64}
_DT_INV = {np.dtype(v): k for k, v in _DT.items()}


class FileNode:
    def __init__(self, val):
        self._v = val

    def empty(self):
        return self._v is None

    def isNone(self):
        return self._v is None

    def real(self):
        return float(self._v)

    def string(self):
        return str(self._v)

    def mat(self):
        v = self._v
        if isinstance(v, dict) and v.get("type_id") == "opencv-matrix":
            dt = v["dt"]
            cn = 1
            if len(dt) > 1 and dt[0].isdigit():
                cn = int(dt[:-1])
                dt = dt[-1]
            arr = np.asarray(v["data"], _DT[dt])
            shape = (v["rows"], v["cols"]) if cn == 1 \
                else (v["rows"], v["cols"], cn)
            return arr.reshape(shape)
        return np.asarray(v)

    def __getitem__(self, key):
        return FileNode(self._v.get(key) if isinstance(self._v, dict) else None)


class FileStorage:
    def __init__(self, filename=None, flags=FILE_STORAGE_READ):
        self._data = {}
        self._file = filename
        self._mode = flags
        self._open = False
        if filename:
            self.open(filename, flags)

    def open(self, filename, flags):
        self._file = filename
        self._mode = flags
        if flags == FILE_STORAGE_READ:
            with open(filename) as f:
                self._data = json.load(f)
        else:
            self._data = {}
        self._open = True
        return True

    def isOpened(self):
        return self._open

    def write(self, name, value):
        if isinstance(value, np.ndarray):
            cn = value.shape[2] if value.ndim == 3 else 1
            dt = _DT_INV[value.dtype]
            if cn > 1:
                dt = f"{cn}{dt}"
            self._data[name] = {
                "type_id": "opencv-matrix",
                "rows": int(value.shape[0]),
                "cols": int(value.shape[1]) if value.ndim >= 2 else 1,
                "dt": dt,
                "data": np.asarray(value).ravel().tolist(),
            }
        elif isinstance(value, (int, float, str)):
            self._data[name] = value
        else:
            self._data[name] = value

    def getNode(self, name):
        return FileNode(self._data.get(name))

    def release(self):
        if self._mode in (FILE_STORAGE_WRITE, FILE_STORAGE_APPEND) \
                and self._file:
            with open(self._file, "w") as f:
                json.dump(self._data, f)
        self._open = False
