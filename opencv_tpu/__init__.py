"""opencv_tpu — a TPU-native image-processing framework.

A from-scratch rebuild of the capabilities of OpenCV (reference:
Itseez/opencv 4.12-dev) designed for TPU hardware: batched NHWC image
arrays in HBM, jnp/XLA primitive compositions and Pallas kernels for the
hot paths, `jax.sharding` meshes for multi-chip scaling, and a cv2-style
Python surface whose integer paths are bit-exact with the reference.

Typical use::

    import opencv_tpu as cv
    gray = cv.cvtColor(img, cv.COLOR_BGR2GRAY)
    blurred = cv.GaussianBlur(gray, (5, 5), 1.5)

Every function accepts cv2-style per-image arrays ((H, W) or (H, W, C))
and, TPU-natively, batched (N, H, W, C) arrays; everything is traceable
under `jax.jit`, so whole pipelines compile into one XLA program (the
role G-API plays in the reference).
"""

from .constants import *  # noqa: F401,F403
from . import constants as _K

from .ops.color import cvtColor
from .ops.filter import (
    getGaussianKernel,
    GaussianBlur,
    sepFilter2D,
    filter2D,
    blur,
    boxFilter,
    sqrBoxFilter,
)
from .ops.resize import resize
from .ops.warp import (
    warpAffine,
    warpPerspective,
    remap,
    invertAffineTransform,
    getRotationMatrix2D,
    getAffineTransform,
    getPerspectiveTransform,
)
from .ops.deriv import (
    getDerivKernels,
    Sobel,
    Scharr,
    Laplacian,
    spatialGradient,
)
from .ops.morph import (
    erode,
    dilate,
    morphologyEx,
    getStructuringElement,
    morphologyDefaultBorderValue,
)
from .ops.pyramids import pyrDown, pyrUp, buildPyramid
from .ops.thresh import threshold, adaptiveThreshold
from .ops.integral import integral, integral2, integral3
from .core.borders import copy_make_border as copyMakeBorder
from .core.borders import border_interpolate as borderInterpolate

__version__ = "0.1.0"

__all__ = [name for name in dir() if not name.startswith("_")]
