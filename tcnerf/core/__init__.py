from . import se3, rays, sampling, projection, encoding, render  # noqa: F401
