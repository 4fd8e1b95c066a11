"""highgui (modules/highgui) — headless stubs.

TPU hosts have no display; the API surface exists so pipelines written
against the reference import and run. imshow stores the last image per
window (retrievable for tests/debugging), waitKey returns immediately.
"""

from __future__ import annotations

import numpy as np

__all__ = ["imshow", "waitKey", "pollKey", "namedWindow", "destroyWindow",
           "destroyAllWindows", "moveWindow", "resizeWindow",
           "setMouseCallback", "createTrackbar", "getTrackbarPos",
           "setTrackbarPos", "getWindowProperty", "setWindowProperty",
           "WINDOW_NORMAL", "WINDOW_AUTOSIZE", "WND_PROP_VISIBLE"]

WINDOW_NORMAL = 0
WINDOW_AUTOSIZE = 1
WND_PROP_VISIBLE = 4

_windows = {}
_trackbars = {}


def namedWindow(winname, flags=WINDOW_AUTOSIZE):
    _windows.setdefault(winname, None)


def imshow(winname, mat):
    _windows[winname] = np.asarray(mat)


def waitKey(delay=0):
    return -1


def pollKey():
    return -1


def destroyWindow(winname):
    _windows.pop(winname, None)


def destroyAllWindows():
    _windows.clear()


def moveWindow(winname, x, y):
    pass


def resizeWindow(winname, w, h):
    pass


def setMouseCallback(winname, onMouse, param=None):
    pass


def createTrackbar(name, winname, value, count, onChange):
    _trackbars[(winname, name)] = value


def getTrackbarPos(name, winname):
    return _trackbars.get((winname, name), 0)


def setTrackbarPos(name, winname, pos):
    _trackbars[(winname, name)] = pos


def getWindowProperty(winname, prop):
    return 1.0 if winname in _windows else -1.0


def setWindowProperty(winname, prop, value):
    pass
