from .ensemble import Ensemble, threshold_sweep, apply_thresholds  # noqa: F401
