from .denoise import fastNlMeansDenoising, fastNlMeansDenoisingColored  # noqa: F401
from .hdr import (  # noqa: F401
    createMergeMertens, MergeMertens,
    createMergeDebevec, MergeDebevec,
    createCalibrateDebevec, CalibrateDebevec,
    createTonemap, Tonemap,
    createTonemapDrago, TonemapDrago,
    createTonemapReinhard, TonemapReinhard,
)
from .inpaint import inpaint, INPAINT_NS, INPAINT_TELEA  # noqa: F401
