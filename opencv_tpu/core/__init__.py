from . import arrays, borders, fixedpoint  # noqa: F401
