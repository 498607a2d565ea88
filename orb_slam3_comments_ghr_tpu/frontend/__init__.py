from .types import Features, empty_features  # noqa: F401
from .extractor import extract  # noqa: F401
