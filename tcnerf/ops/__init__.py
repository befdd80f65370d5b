from .interpolate import bilinear_gather  # noqa: F401
