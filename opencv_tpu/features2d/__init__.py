from .keypoint import KeyPoint  # noqa: F401
from .fast import FAST, FastFeatureDetector, FastFeatureDetector_create  # noqa: F401
from .orb import ORB, ORB_create  # noqa: F401
from .matchers import BFMatcher, FlannBasedMatcher, DMatch, hamming_distance_matrix  # noqa: F401
from .sift import SIFT, SIFT_create  # noqa: F401
from .agast import AGAST, AgastFeatureDetector, AgastFeatureDetector_create  # noqa: F401
from .blob import (  # noqa: F401
    SimpleBlobDetector, SimpleBlobDetector_create, SimpleBlobDetector_Params,
)
from .mser import MSER, MSER_create  # noqa: F401
from .gftt import GFTTDetector, GFTTDetector_create  # noqa: F401
from .brisk import BRISK, BRISK_create  # noqa: F401
