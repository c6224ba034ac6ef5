"""AOT serving export: serialize the batch-1 ensemble predictor to a
portable StableHLO artifact (`jax.export`).

The reference deploys by copying five .py scripts plus four .pt files and
re-running torch on the target (robot_demo.py:583-590); here the WHOLE
serving computation — k-member vmapped ensemble, logit mean, calibrated
sigmoid — plus the trained weights serialize to one self-contained blob that
any JAX runtime of a compatible version can deserialize and call, with no
model code on the serving host.

    blob = export_predictor(model, members, offsets, example_sample)
    Path("predictor.shlo").write_bytes(blob)
    # serving host:
    fn = load_predictor(Path("predictor.shlo").read_bytes())
    pred, probs = fn(batch1)

Weights ride inside the artifact as jit-time constants (closure capture).
These models are MBs, not GBs — embedding beats a sidecar weights file for
deployment simplicity.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport


def _batch1_spec(sample: Dict[str, np.ndarray]) -> Dict[str, jax.ShapeDtypeStruct]:
    return {k: jax.ShapeDtypeStruct((1,) + np.asarray(v).shape,
                                    np.asarray(v).dtype)
            for k, v in sample.items() if k != "label"}


def export_predictor(model, params_list: Sequence, offsets: Sequence[float],
                     example_sample: Dict[str, np.ndarray], *,
                     platforms: Sequence[str] = ("tpu", "cpu")) -> bytes:
    """Serialize the ensemble serving function (weights embedded) for the
    given platforms.  `example_sample` fixes the batch-1 input shapes."""
    from .stream import ensemble_serve_fn  # ONE serving computation

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
    run = ensemble_serve_fn(model, offsets)

    def serve_fn(batch):
        return run(stacked, batch)

    exported = jexport.export(jax.jit(serve_fn), platforms=tuple(platforms))(
        _batch1_spec(example_sample))
    return exported.serialize()


def load_predictor(blob: bytes):
    """Deserialize an exported predictor; returns `fn(batch1) -> (pred, probs)`.
    The call runs under jit on whatever platform the host has (must be one of
    the export's platforms)."""
    exported = jexport.deserialize(blob)
    return jax.jit(exported.call)
