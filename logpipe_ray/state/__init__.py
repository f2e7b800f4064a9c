from .manifest import Manifest  # noqa: F401
