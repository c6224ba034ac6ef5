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
                      stacked=None, dtype: str = "float32"):
    """THE serving computation, shared by the live predictor and the AOT
    export (serve/export.py): k-member vmapped batch-1 forward → logit mean
    → calibrated sigmoid(pred − offsets).  Validates at trace time that the
    model's head actually produces per-sample logit vectors (the paragraph
    `state_transfer` head returns per-clip (B, P, E) logits and is an eval
    protocol, not a serving one).  `dtype="bfloat16"` runs the forward in
    bf16 (train.engine.infer_cast); the calibrated sigmoid stays f32."""
    off = jnp.asarray(offsets, jnp.float32)
    if off.shape[0] == 0:
        raise ValueError(
            "serving needs calibrated per-emotion offsets; this config has "
            "none (its thresholds are swept at eval time) — serve a config "
            "with fixed thresholds or pass offsets explicitly")

    def run(member_params, batch):
        from ..train.engine import infer_cast, infer_upcast

        member_params, batch = infer_cast(member_params, batch, dtype)
        logits = jax.vmap(
            lambda p: infer_upcast(model.apply(p, batch, train=False,
                                               impl=impl, stacked=stacked))
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
                 *, impl: str = "xla", stacked_grid: bool = False,
                 dtype: str = "float32", wire_dtype: str = "float32"):
        """`stacked_grid`: trace the ensemble forward with the stacked
        realformer grid path (models/grid.apply_grid stacked=True).  Measured
        SLOWER at reference shapes under honest sync (robot -26%, realformer
        -4% batch infer; batch-1 p50 unchanged, relay-RTT-bound) — kept
        selectable for shapes where 3 fat chains beat 9 thin ones (unequal
        lengths are padded to the max and sliced back, so robot_demo
        qualifies too; a no-op for non-realformer block types).

        `wire_dtype`: dtype of the PACKED input buffer predict() ships to the
        device ("float32" default = lossless; "float16" halves the wire bytes
        for relay-attached hosts at a ~1e-3 feature quantization — the same
        trade data/loader.cast_for_transfer offers training).  Unpacking
        upcasts to f32 on device before the forward."""
        self.model = model
        self.k = len(params_list)
        self.stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
        self.offsets = jnp.asarray(offsets, jnp.float32)
        self.n_off = int(self.offsets.shape[0])
        # the flag is baked into the traced program as a static argument —
        # retraces (e.g. a new input dtype) keep it; no global state, no
        # cross-thread exposure
        self._serve_fn = ensemble_serve_fn(
            model, offsets, impl=impl,
            stacked=True if stacked_grid else None, dtype=dtype)
        self._jitted = jax.jit(self._serve_fn)
        self._wire = np.dtype(wire_dtype)
        # packed-layout state, built lazily from the first sample's shapes
        self._pack_keys: tuple = ()
        self._pack_shapes: tuple = ()
        self._packed_jitted = None

    def _run(self, stacked, batch):
        return self._jitted(stacked, batch)

    def warmup(self, sample: Dict[str, np.ndarray]) -> None:
        jax.block_until_ready(self._run(self.stacked, self._batch1(sample)))
        self._build_packed(sample)
        np.asarray(self._packed_jitted(self.stacked, self._pack(sample)))

    @staticmethod
    def _batch1(sample: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        return {k: np.expand_dims(np.asarray(v), 0) for k, v in sample.items()
                if k != "label"}

    # ---- packed single-buffer serving path --------------------------------
    # The relay-attached host pays one round-trip PER transfer: the dict path
    # ships six arrays up (l/v/a + 3 masks) and fetches two down
    # (pred, probs) — eight trips per sample.  predict() instead packs the
    # sample into ONE flat host buffer (a ~200 KB memcpy, microseconds),
    # ships it in one put, and the jitted program unpacks on device, runs the
    # same ensemble forward, and concatenates (pred ++ probs) into one output
    # fetched in one trip.  Same math, 2 round-trips total.  Measured on the
    # relay image: e2e p50 92.8 ms (dict path, BENCH_r04) → ~= compute-leg
    # p50 + one put (bench.py latency_batch1 records both legs).

    def _build_packed(self, sample: Dict[str, np.ndarray]) -> None:
        if self._packed_jitted is not None:
            return
        keys = tuple(k for k in sample if k != "label")
        shapes = tuple(tuple(np.asarray(sample[k]).shape) for k in keys)
        sizes = tuple(int(np.prod(s)) for s in shapes)
        serve, wire = self._serve_fn, self._wire

        def packed_run(stacked, buf):
            batch, ofs = {}, 0
            for k, shp, n in zip(keys, shapes, sizes):
                flat = jax.lax.dynamic_slice_in_dim(buf, ofs, n)
                batch[k] = flat.astype(jnp.float32).reshape((1,) + shp)
                ofs += n
            pred, probs = serve(stacked, batch)
            return jnp.concatenate([pred, probs])

        self._pack_keys, self._pack_shapes = keys, shapes
        self._packed_jitted = jax.jit(packed_run)

    def _pack(self, sample: Dict[str, np.ndarray]) -> np.ndarray:
        self._build_packed(sample)
        for k, shp in zip(self._pack_keys, self._pack_shapes):
            got = tuple(np.asarray(sample[k]).shape)
            if got != shp:
                # the packed program bakes the first sample's shapes in; a
                # mismatched later sample would silently slice garbage —
                # fail loudly instead (per-config shapes are fixed, so this
                # only fires on caller error)
                raise ValueError(
                    f"packed predict: sample[{k!r}] shape {got} != "
                    f"{shp} from warmup; use a predictor per config/shape "
                    "or predict_unpacked()")
        return np.concatenate(
            [np.asarray(sample[k], self._wire).ravel()
             for k in self._pack_keys])

    def predict(self, sample: Dict[str, np.ndarray]):
        """Returns (raw ensemble logits (E,), calibrated probabilities).
        Uses the packed 2-round-trip path (one put, one fetch)."""
        self._build_packed(sample)
        out = np.asarray(self._packed_jitted(self.stacked,
                                             self._pack(sample)))
        return out[: out.shape[0] - self.n_off], out[out.shape[0] - self.n_off:]

    def predict_unpacked(self, sample: Dict[str, np.ndarray]):
        """The dict-in/two-arrays-out path (one transfer per array) — kept
        for parity testing and for directly-attached hosts where transfer
        count doesn't matter."""
        pred, probs = self._run(self.stacked, self._batch1(sample))
        return np.asarray(pred), np.asarray(probs)

    def emotions(self, sample, names: Sequence[str]) -> Dict[str, float]:
        """The demo printout: emotion -> rounded calibrated probability
        (robot_demo.py:616-622)."""
        _, probs = self.predict(sample)
        return {n: round(float(p), 2) for n, p in zip(names, probs)}


class ParagraphStreamingPredictor:
    """Stateful per-clip streaming for the recurrent `state_transfer` head —
    the serving mode the reference cannot do.

    The reference's paragraph model (others/realformer.py:266-286) only runs
    on complete P_LEN=6 windows: a live consumer would have to buffer six
    clips, re-run the whole 108-attention-call window per new clip, and still
    get answers P_LEN clips late.  Here the recurrence carry `(out, feats)`
    is held ON DEVICE per ensemble member between calls, so each arriving
    clip costs ONE k-member vmapped grid forward plus the O(E²) gated
    recurrence — and emitting clip t streamed equals column t of the
    whole-window eval logits exactly (tested: tests/test_train_eval.py::
    test_paragraph_streaming_matches_whole_window).

    `reset()` starts a new paragraph (the reference's t=0 case: the first
    clip's output is its own out_t1, no carry).  `weights`: per-member logit
    blend — the reference blends members 1&2 of 5 at 0.6/0.4
    (others/realformer.py:420); default is the uniform ensemble mean."""

    def __init__(self, model, params_list: Sequence,
                 offsets: Sequence[float], *, weights=None, impl: str = "xla",
                 stacked_grid: bool = False, dtype: str = "float32"):
        from ..models import heads
        from ..train.engine import infer_cast, infer_upcast

        cfg = model.cfg
        if cfg.head != "state_transfer":
            raise ValueError(
                f"ParagraphStreamingPredictor serves the recurrent "
                f"state_transfer head; config has head={cfg.head!r} — use "
                "StreamingPredictor")
        off = jnp.asarray(offsets, jnp.float32)
        if off.shape[0] == 0:
            raise ValueError(
                "serving needs calibrated per-emotion offsets; pass the "
                "swept thresholds (eval --sweep-thresholds persists them)")
        self.model = model
        self.k = len(params_list)
        self.stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
        w = (jnp.asarray(weights, jnp.float32) if weights is not None
             else jnp.full((self.k,), 1.0 / self.k, jnp.float32))
        if w.shape != (self.k,):
            raise ValueError(f"weights must have shape ({self.k},)")
        e = cfg.n_emotions
        self._zero_state = {
            "out": jnp.zeros((self.k, 1, e), jnp.float32),
            "feats": jnp.zeros((self.k, 1, e), jnp.float32),
            "started": jnp.zeros((), jnp.bool_),
        }
        stacked_flag = True if stacked_grid else None

        def step(member_params, state, batch):
            # bf16 forward compute when dtype says so; the recurrence/blend
            # math below stays f32 (infer_upcast on the clip outputs)
            member_params, batch = infer_cast(member_params, batch, dtype)
            out_t1, feats = jax.vmap(
                lambda p: heads.state_transfer_clip(
                    p, cfg, batch["l"], batch["v"], batch["a"],
                    batch["l_mask"], batch["v_mask"], batch["a_mask"],
                    train=False, impl=impl, stacked=stacked_flag)
            )(member_params)                       # (k, 1, E) each
            out_t1, feats = infer_upcast(out_t1), infer_upcast(feats)
            # gated recurrence per member (others/realformer.py:280-282),
            # batched over the member axis
            alpha = jax.nn.sigmoid(feats + state["feats"])
            out_t0 = jnp.tanh(jnp.einsum(
                "kbe,kef->kbf", state["out"], member_params["trans"]))
            rec = (1.0 - alpha) * out_t1 + alpha * out_t0
            # first clip of a paragraph: out = out_t1 (reference t=0)
            out = jnp.where(state["started"], rec, out_t1)
            pred = jnp.einsum("k,kbe->be", w, out)[0]       # (E,)
            probs = jax.nn.sigmoid(pred[: off.shape[0]] - off)
            new_state = {"out": out, "feats": feats,
                         "started": jnp.ones((), jnp.bool_)}
            return pred, probs, new_state

        self._jitted = jax.jit(step)
        self._state = self._zero_state

    def reset(self) -> None:
        """Start a new paragraph: the next clip is t=0 (no carry)."""
        self._state = self._zero_state

    _CLIP_KEYS = ("l", "v", "a", "l_mask", "v_mask", "a_mask")

    @classmethod
    def _clip1(cls, clip: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        return {k: np.expand_dims(np.asarray(clip[k]), 0)
                for k in cls._CLIP_KEYS}

    def warmup(self, clip: Dict[str, np.ndarray]) -> None:
        jax.block_until_ready(
            self._jitted(self.stacked, self._zero_state, self._clip1(clip)))

    def push(self, clip: Dict[str, np.ndarray]):
        """Feed the next clip; returns (raw blended logits (E,), calibrated
        probabilities).  State advances — call reset() between paragraphs."""
        pred, probs, self._state = self._jitted(
            self.stacked, self._state, self._clip1(clip))
        return np.asarray(pred), np.asarray(probs)

    def emotions(self, clip, names: Sequence[str]) -> Dict[str, float]:
        _, probs = self.push(clip)
        return {n: round(float(p), 2) for n, p in zip(names, probs)}
