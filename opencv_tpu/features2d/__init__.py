from .keypoint import KeyPoint  # noqa: F401
from .fast import FAST, FastFeatureDetector, FastFeatureDetector_create  # noqa: F401
