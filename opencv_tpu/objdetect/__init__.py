from .hog import HOGDescriptor  # noqa: F401
from . import aruco  # noqa: F401
from .qrcode import QRCodeDetector  # noqa: F401
