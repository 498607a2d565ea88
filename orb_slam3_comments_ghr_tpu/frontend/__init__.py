from .types import Features, empty_features  # noqa: F401
from .extractor import extract as extract_unrolled  # noqa: F401
from .batched import extract_batched as extract  # noqa: F401
