"""Every constant we define must match cv2's numeric value — the enum values
are part of the API contract (SURVEY §8.11)."""

import pytest

cv2 = pytest.importorskip("cv2")

import opencv_tpu as K


# Every constant tracks the installed 5.0 oracle wheel (including the
# SolvePnPMethod renumbering that dropped DLS/UPNP).
_REF_NOT_WHEEL = {}


def test_constants_match_cv2():
    mismatched = []
    checked = 0
    for name in dir(K):
        if name.startswith("_"):
            continue
        val = getattr(K, name)
        if not isinstance(val, int):
            continue
        if name in _REF_NOT_WHEEL:
            checked += 1
            if _REF_NOT_WHEEL[name] != val:
                mismatched.append((name, val, _REF_NOT_WHEEL[name]))
            continue
        if hasattr(cv2, name):
            checked += 1
            if getattr(cv2, name) != val:
                mismatched.append((name, val, getattr(cv2, name)))
    assert checked > 100, f"only {checked} constants cross-checked"
    assert not mismatched, f"constant mismatches: {mismatched}"
