"""Every constant we define must match cv2's numeric value — the enum values
are part of the API contract (SURVEY §8.11)."""

import pytest

cv2 = pytest.importorskip("cv2")

import opencv_tpu as K


# Our contract is the 4.12 reference (/root/reference).  The installed
# oracle wheel is OpenCV 5.0, which dropped SOLVEPNP_DLS/UPNP and
# renumbered the SolvePnPMethod enum (calib3d.hpp:465-479 in 4.12 vs 5.0);
# those names are checked against the reference, not the wheel.
_REF_NOT_WHEEL = {
    "SOLVEPNP_AP3P": 5, "SOLVEPNP_IPPE": 6, "SOLVEPNP_IPPE_SQUARE": 7,
    "SOLVEPNP_SQPNP": 8, "SOLVEPNP_DLS": 3, "SOLVEPNP_UPNP": 4,
}


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
