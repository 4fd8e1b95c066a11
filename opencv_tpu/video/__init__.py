from .bgsub import (  # noqa: F401
    BackgroundSubtractorMOG2,
    createBackgroundSubtractorMOG2,
)
from .lk import calcOpticalFlowPyrLK  # noqa: F401
from .kalman import KalmanFilter  # noqa: F401
from .meanshift import meanShift, CamShift  # noqa: F401
