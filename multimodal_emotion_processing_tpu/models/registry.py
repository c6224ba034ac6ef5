"""Model registry: one builder per head type; configs pick the head."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

from . import heads


@dataclasses.dataclass(frozen=True)
class ModelDef:
    """A functional model: params = init(key); logits = apply(params, batch)."""

    cfg: Any
    init: Callable
    apply: Callable


_HEADS = {
    "concat_trans": (heads.init_concat_trans, heads.apply_concat_trans),
    "concat_linear": (heads.init_concat_linear, heads.apply_concat_linear),
    "state_transfer": (heads.init_state_transfer, heads.apply_state_transfer),
    "grid_only": (heads.init_grid_only, heads.apply_grid_only),
}


def build_model(cfg) -> ModelDef:
    """cfg: a ModelConfig (or ExperimentConfig, whose .model is used)."""
    mcfg = getattr(cfg, "model", cfg)
    if mcfg.head not in _HEADS:
        raise ValueError(f"unknown head {mcfg.head!r}")
    init_fn, apply_fn = _HEADS[mcfg.head]

    def init(key):
        return init_fn(key, mcfg)

    def apply(params, batch, *, rng=None, train=False, impl="xla",
              stacked=None):
        # `stacked`: per-trace realformer stream-stacking override (see
        # models/grid.apply_grid) — a static Python arg, thread-safe
        return apply_fn(params, mcfg, batch, rng=rng, train=train, impl=impl,
                        stacked=stacked)

    return ModelDef(cfg=mcfg, init=init, apply=apply)
