"""multimodal_emotion_processing_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework
for multimodal (text/audio/video) multi-label emotion recognition.

Re-designed from scratch with the capabilities of the reference PyTorch research
codebase `youngzhou97qz/Multimodal-emotion-processing` (five standalone training
scripts) as one framework:

  configs    — typed configs, one per reference entry point
               (mosei_trans, mosei_realformer, rencecps, ren_mme, robot_demo)
  ops        — core math: residual-score attention (einsum reference + fused
               Pallas TPU kernel), ZLPR multi-label loss, pooling
  models     — layers / 9-stream cross-modal grid / transition & recurrent heads
  data       — corpus parsers, masking/crop semantics, synthetic fixtures,
               prefetching host loader (C++ fast path in `runtime`)
  train      — jitted train/eval engine, optax + plateau LR, k-fold driver,
               Orbax checkpointing, metrics
  eval       — ensembling, vectorized threshold sweeps, reports
  serve      — low-latency batch-1 streaming inference
  parallel   — device mesh build + sharding specs (dp/tp), multi-host init
  utils      — torch-compatible initializers, logging
"""

__version__ = "0.1.0"

from . import configs  # noqa: F401


def get_config(name: str):
    """Shorthand for configs.get(name)."""
    return configs.get(name)


def build(name_or_config):
    """Build a model from a config name or ExperimentConfig."""
    from .models import build_model

    cfg = (configs.get(name_or_config) if isinstance(name_or_config, str)
           else name_or_config)
    return build_model(cfg)
