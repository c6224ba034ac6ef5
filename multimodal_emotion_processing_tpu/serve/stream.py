"""Streaming single-sample inference — the robot-demo p50-latency path
(robot_demo.py:594-640).

TPU-native design: the k ensemble members run as ONE vmapped, jitted forward
(the reference loops 4 sequential model calls per sample, robot_demo.py:611-614);
batch-1 shapes are compiled once and reused; the calibrated per-emotion sigmoid
(offsets at robot_demo.py:609) is fused into the same program.

Measured: the vmapped 4-member batch-1 compute is ~0.16 ms on v5e.  End-to-end
predict() latency is dominated by the relay round-trip on this image
(bench/latency.py: compute-only p50 30.7 ms — almost all dispatch+fetch RTT —
end-to-end 63.6 ms incl. the sample H2D; sub-ms on a directly attached host).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def ensemble_serve_fn(model, offsets: Sequence[float], *, impl: str = "xla",
                      stacked=None):
    """THE serving computation, shared by the live predictor and the AOT
    export (serve/export.py): k-member vmapped batch-1 forward → logit mean
    → calibrated sigmoid(pred − offsets).  Validates at trace time that the
    model's head actually produces per-sample logit vectors (the paragraph
    `state_transfer` head returns per-clip (B, P, E) logits and is an eval
    protocol, not a serving one)."""
    off = jnp.asarray(offsets, jnp.float32)
    if off.shape[0] == 0:
        raise ValueError(
            "serving needs calibrated per-emotion offsets; this config has "
            "none (its thresholds are swept at eval time) — serve a config "
            "with fixed thresholds or pass offsets explicitly")

    def run(member_params, batch):
        logits = jax.vmap(
            lambda p: model.apply(p, batch, train=False, impl=impl,
                                  stacked=stacked)
        )(member_params)                            # (k, 1, E)
        if logits.ndim != 3:
            raise ValueError(
                f"serving expects per-sample logits (k, 1, E); this model "
                f"returns shape {logits.shape[1:]} per member — the "
                "paragraph model is not a serving head")
        pred = jnp.mean(logits, axis=0)[0]          # (E,)
        probs = jax.nn.sigmoid(pred[: off.shape[0]] - off)
        return pred, probs

    return run


class StreamingPredictor:
    def __init__(self, model, params_list: Sequence, offsets: Sequence[float],
                 *, impl: str = "xla", stacked_grid: bool = False):
        """`stacked_grid`: trace the ensemble forward with the stacked
        realformer grid path (models/grid.apply_grid stacked=True).  Measured
        SLOWER at reference shapes under honest sync (robot -26%, realformer
        -4% batch infer; batch-1 p50 unchanged, relay-RTT-bound) — kept
        selectable for shapes where 3 fat chains beat 9 thin ones (unequal
        lengths are padded to the max and sliced back, so robot_demo
        qualifies too; a no-op for non-realformer block types)."""
        self.model = model
        self.k = len(params_list)
        self.stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
        self.offsets = jnp.asarray(offsets, jnp.float32)
        # the flag is baked into the traced program as a static argument —
        # retraces (e.g. a new input dtype) keep it; no global state, no
        # cross-thread exposure
        self._jitted = jax.jit(ensemble_serve_fn(
            model, offsets, impl=impl,
            stacked=True if stacked_grid else None))

    def _run(self, stacked, batch):
        return self._jitted(stacked, batch)

    def warmup(self, sample: Dict[str, np.ndarray]) -> None:
        jax.block_until_ready(self._run(self.stacked, self._batch1(sample)))

    @staticmethod
    def _batch1(sample: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        return {k: np.expand_dims(np.asarray(v), 0) for k, v in sample.items()
                if k != "label"}

    def predict(self, sample: Dict[str, np.ndarray]):
        """Returns (raw ensemble logits (E,), calibrated probabilities)."""
        pred, probs = self._run(self.stacked, self._batch1(sample))
        return np.asarray(pred), np.asarray(probs)

    def emotions(self, sample, names: Sequence[str]) -> Dict[str, float]:
        """The demo printout: emotion -> rounded calibrated probability
        (robot_demo.py:616-622)."""
        _, probs = self.predict(sample)
        return {n: round(float(p), 2) for n, p in zip(names, probs)}
