from . import lie, cameras  # noqa: F401
