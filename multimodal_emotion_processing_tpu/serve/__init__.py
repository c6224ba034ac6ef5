from .stream import StreamingPredictor  # noqa: F401
