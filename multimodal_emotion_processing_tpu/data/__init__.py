from . import masking, synthetic  # noqa: F401
from .loader import Batcher, prefetch_to_device  # noqa: F401
