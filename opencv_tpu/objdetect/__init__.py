from .hog import HOGDescriptor  # noqa: F401
