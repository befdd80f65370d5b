from .transform import Affine  # noqa: F401
