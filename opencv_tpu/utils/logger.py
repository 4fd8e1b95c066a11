"""Leveled tag-based logging (core/include/opencv2/core/utils/logger.hpp,
core/src/logger.cpp).

Levels and env control mirror the reference: OPENCV_TPU_LOG_LEVEL accepts
the same names (SILENT/FATAL/ERROR/WARNING/INFO/DEBUG/VERBOSE) or numbers.
"""

from __future__ import annotations

import os
import sys
import time

LOG_LEVEL_SILENT = 0
LOG_LEVEL_FATAL = 1
LOG_LEVEL_ERROR = 2
LOG_LEVEL_WARNING = 3
LOG_LEVEL_INFO = 4
LOG_LEVEL_DEBUG = 5
LOG_LEVEL_VERBOSE = 6

_NAMES = {"SILENT": 0, "FATAL": 1, "ERROR": 2, "WARNING": 3, "WARN": 3,
          "INFO": 4, "DEBUG": 5, "VERBOSE": 6}
_LEVEL_TAG = {1: "F", 2: "E", 3: "W", 4: "I", 5: "D", 6: "V"}


def _initial_level() -> int:
    v = os.environ.get("OPENCV_TPU_LOG_LEVEL",
                       os.environ.get("OPENCV_LOG_LEVEL", "WARNING"))
    v = v.strip().upper()
    if v.isdigit():
        return int(v)
    return _NAMES.get(v, LOG_LEVEL_WARNING)


_level = _initial_level()


def setLogLevel(level: int) -> int:
    global _level
    prev = _level
    _level = level
    return prev


def getLogLevel() -> int:
    return _level


def log(level: int, msg: str, tag: str = "global"):
    if level <= _level and level > 0:
        ts = time.strftime("%H:%M:%S")
        print(f"[{_LEVEL_TAG.get(level, '?')} {ts} {tag}] {msg}",
              file=sys.stderr)
