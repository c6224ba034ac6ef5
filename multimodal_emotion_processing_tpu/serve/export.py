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


def _batch_spec(sample: Dict[str, np.ndarray],
                batch_size: int) -> Dict[str, jax.ShapeDtypeStruct]:
    return {k: jax.ShapeDtypeStruct((batch_size,) + np.asarray(v).shape,
                                    np.asarray(v).dtype)
            for k, v in sample.items() if k != "label"}


def export_predictor(model, params_list: Sequence, offsets: Sequence[float],
                     example_sample: Dict[str, np.ndarray], *,
                     platforms: Sequence[str] = ("tpu", "cpu"),
                     batch_size: int = 1, dtype: str = "float32") -> bytes:
    """Serialize the ensemble serving function (weights embedded) for the
    given platforms.  `example_sample` fixes the per-sample input shapes;
    `batch_size` fixes the (static) batch axis.  batch_size=1 exports the
    live predictor's computation (serve/stream.ensemble_serve_fn —
    outputs (E,)/(E',)); batch_size>1 exports the micro-batching server's
    bucket program (serve/server.batched_ensemble_fn — outputs (B, E)/
    (B, E')), so a model-code-free serving host can run the same bucketed
    dispatch `BatchingServer` runs (export one blob per bucket size)."""
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
    if batch_size == 1:
        from .stream import ensemble_serve_fn  # ONE serving computation

        run = ensemble_serve_fn(model, offsets, dtype=dtype)
    else:
        from .server import batched_ensemble_fn  # the bucket program

        run = batched_ensemble_fn(model, offsets, dtype=dtype)

    def serve_fn(batch):
        return run(stacked, batch)

    exported = jexport.export(jax.jit(serve_fn), platforms=tuple(platforms))(
        _batch_spec(example_sample, batch_size))
    return exported.serialize()


def load_predictor(blob: bytes):
    """Deserialize an exported predictor; returns `fn(batch1) -> (pred, probs)`.
    The call runs under jit on whatever platform the host has (must be one of
    the export's platforms)."""
    exported = jexport.deserialize(blob)
    return jax.jit(exported.call)
