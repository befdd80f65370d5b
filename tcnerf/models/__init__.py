from .renderer import MVNeRFRenderer  # noqa: F401
