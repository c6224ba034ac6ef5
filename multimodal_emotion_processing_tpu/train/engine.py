"""Jitted training engine: one engine, five configs (the reference's five
hand-rolled train/valid/run loops — cmu-mosei/run.py:354-420 and friends —
become data over this module).

Design notes (TPU):
  * the whole step (forward, ZLPR loss, optional R-Drop KL / clip-mask, backward,
    global-norm clip, Adam(W) update) is a single jitted function — one XLA
    program per step, no host round-trips except the scalar loss fetch;
  * the learning rate rides `optax.inject_hyperparams` so the host-side
    ReduceLROnPlateau controller (schedule.py) can change it between epochs
    without recompiling;
  * under a device mesh the same step is jitted with sharded in/out specs
    (parallel/mesh.py); gradients are reduced by XLA-inserted psums over ICI.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.loss import zlpr_loss, symmetric_sigmoid_kl
from . import schedule


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    rng: jax.Array
    step: jax.Array


def make_optimizer(tcfg):
    """AdamW (torch defaults: wd=0.01) or Adam, after global-norm clipping at
    CLIP=1.0 — order matches the reference (clip then step,
    cmu-mosei/run.py:368-369)."""

    def factory(learning_rate, weight_decay):
        if tcfg.optimizer == "adamw":
            opt = optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                              weight_decay=weight_decay)
        elif tcfg.optimizer == "adam":
            # plain Adam has no decoupled decay; the injected value is
            # carried but unused (keeps one opt_state structure per engine)
            opt = optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
        else:
            raise ValueError(tcfg.optimizer)
        return optax.chain(optax.clip_by_global_norm(tcfg.grad_clip), opt)

    return optax.inject_hyperparams(factory)(
        learning_rate=tcfg.lr,
        weight_decay=getattr(tcfg, "weight_decay", 0.01))


def _cast_tree(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree)


def upcast_wire(batch):
    """Undo the loader's wire-format compression (data/loader.py
    cast_for_transfer): half-precision batch leaves are an H2D/staging byte
    optimization, never a compute dtype — restore float32 before any math.
    int8-quantized leaves dequantize against their '<key>__wire_scale'
    rows (the scale keys are consumed and dropped here).
    (bf16 COMPUTE stays opt-in via tcfg.compute_dtype, applied after this in
    batch_loss; a bf16-wire + bf16-compute round trip is value-identical.)
    No-op on float32 batches, so it is safe at the head of every step."""
    from ..data.loader import WIRE_SCALE_SUFFIX

    out = {}
    for k, v in batch.items():
        if k.endswith(WIRE_SCALE_SUFFIX):
            continue
        s = batch.get(k + WIRE_SCALE_SUFFIX)
        if s is not None:
            s = jnp.asarray(s)
            out[k] = v.astype(jnp.float32) * s.reshape(
                s.shape + (1,) * (v.ndim - s.ndim))
        elif v.dtype in (jnp.float16, jnp.bfloat16):
            out[k] = v.astype(jnp.float32)
        else:
            out[k] = v
    return out


#: loss-side vectors that must stay f32 under bf16 compute (batch_loss)
_KEEP_F32 = ("sample_weight", "clip_mask")


def wire_to_bf16(batch):
    """upcast_wire fused with the bf16 compute cast: every floating wire
    leaf (f32 staged, f16/bf16 half-width wire, int8-quantized) lands
    DIRECTLY in bf16 — value-identical to upcast_wire-then-cast (one round
    either way; the int8 dequant multiply stays f32) without materializing
    an f32 copy of the whole batch in the step.  The loss-side keep-set
    vectors restore to f32 exactly like upcast_wire."""
    from ..data.loader import WIRE_SCALE_SUFFIX

    out = {}
    for k, v in batch.items():
        if k.endswith(WIRE_SCALE_SUFFIX):
            continue
        s = batch.get(k + WIRE_SCALE_SUFFIX)
        if s is not None:
            s = jnp.asarray(s)
            x = v.astype(jnp.float32) * s.reshape(
                s.shape + (1,) * (v.ndim - s.ndim))
            out[k] = x.astype(jnp.float32 if k in _KEEP_F32 else jnp.bfloat16)
        elif jnp.issubdtype(v.dtype, jnp.floating):
            out[k] = v.astype(jnp.float32 if k in _KEEP_F32 else jnp.bfloat16)
        else:
            out[k] = v
    return out


def batch_loss(model, tcfg, params, batch, rng, train: bool, impl: str):
    """The reference loss contract: ZLPR mean (+ clip-validity masking for the
    paragraph model, + symmetric KL in training for Ren-MME R-Drop).

    Batches may be zero-padded to a static size (data/loader.py); the optional
    `sample_weight` (1 for real rows, 0 for padding) makes the weighted mean
    equal the reference's mean over the unpadded batch — no recompiles, no
    semantic drift.
    """
    if getattr(tcfg, "compute_dtype", "float32") == "bfloat16":
        # mixed precision: bf16 activations/weights on the MXU, fp32 master
        # params (caller's `params`) and fp32 loss/score math — including the
        # loss-side weight/mask vectors: a bf16 jnp.sum(sample_weight) rounds
        # above 256 and would silently mis-scale the weighted mean.
        # Wire leaves go STRAIGHT to bf16 (wire_to_bf16) instead of riding
        # upcast_wire's f32 trip first: x→bf16 and x→f32→bf16 round to the
        # same value for every wire dtype, and skipping the f32 materialize
        # of the whole batch removes a full-batch convert+relayout from the
        # step (part of the 16.5 ms/step input-copy cost the s1024 trace
        # showed; bf16-staged batches then enter with zero converts).
        params = _cast_tree(params, jnp.bfloat16)
        batch = wire_to_bf16(batch)
    else:
        batch = upcast_wire(batch)
    logits = model.apply(params, batch, rng=rng, train=train, impl=impl)
    if logits.dtype == jnp.bfloat16:
        logits = logits.astype(jnp.float32)  # loss math never in bf16
    per_sample = zlpr_loss(logits, batch["label"])
    if tcfg.clip_mask_loss:
        per_sample = per_sample * batch["clip_mask"]  # (B, P)
    w = batch.get("sample_weight")
    if w is None:
        loss = jnp.mean(per_sample)
    else:
        denom = jnp.sum(w) * (per_sample.shape[1] if per_sample.ndim == 2 else 1)
        wb = w[:, None] if per_sample.ndim == 2 else w
        loss = jnp.sum(per_sample * wb) / jnp.maximum(denom, 1.0)
    if tcfg.rdrop_kl and train:
        loss = loss + symmetric_sigmoid_kl(
            logits, pair_weight=None if w is None else w[::2])
    return loss


def _accum_value_and_grad(model, tcfg, impl, params, batch, sub,
                          accum_steps: int):
    """Gradient accumulation: split the batch into `accum_steps` sequential
    micro-batches (lax.scan — peak activation memory shrinks ~A-fold) and
    recombine EXACTLY to the full-batch loss/gradient.

    batch_loss is a weighted mean whose denominators are all proportional to
    the micro-batch's sample-weight total d_i (plain mean: d_i = rows; padded
    mean: sum(w) x a constant P; the R-Drop KL's pair denominator is d_i/2) —
    so weighting each micro loss/grad by d_i and dividing by sum(d_i) is the
    exact full-batch value, zero-weight padding rows included.  The reference
    has no equivalent (fixed B=64/16 fits any GPU); this exists for scaled
    configs (bench/scaling.py) whose activations outgrow HBM before the
    model does.

    Dropout draws a fold_in(sub, i) key per micro-batch, so stochastic runs
    differ from the unaccumulated step (mask shapes differ anyway); with
    dropout off the equality is exact (tested)."""
    batch = upcast_wire(batch)  # keep the d_i sums in f32 wire-independent
    rows = batch["label"].shape[0]
    if rows % accum_steps:
        raise ValueError(f"accum_steps={accum_steps} must divide the batch "
                         f"rows ({rows})")
    micro_rows = rows // accum_steps
    if tcfg.rdrop_kl and micro_rows % 2:
        raise ValueError("R-Drop needs even micro-batches (adjacent "
                         f"duplicate pairs); rows/accum_steps = {micro_rows}")
    micros = jax.tree.map(
        lambda x: x.reshape((accum_steps, micro_rows) + x.shape[1:]), batch)

    def body(carry, xs):
        i, mb = xs
        w = mb.get("sample_weight")
        d = jnp.sum(w) if w is not None else jnp.asarray(micro_rows,
                                                         jnp.float32)

        def loss_fn(p):
            return batch_loss(model, tcfg, p, mb, jax.random.fold_in(sub, i),
                              True, impl)

        loss_i, g_i = jax.value_and_grad(loss_fn)(params)
        lsum, gsum, dsum = carry
        gsum = jax.tree.map(lambda a, g: a + d * g, gsum, g_i)
        return (lsum + d * loss_i, gsum, dsum + d), None

    zeros = jax.tree.map(jnp.zeros_like, params)
    (lsum, gsum, dsum), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), zeros, jnp.zeros((), jnp.float32)),
        (jnp.arange(accum_steps), micros))
    denom = jnp.maximum(dsum, 1.0)  # all-padding batch: 0 loss, 0 grads
    return lsum / denom, jax.tree.map(lambda g: g / denom, gsum)


def _make_step_fn(model, tcfg, tx, *, impl: str, fused: bool,
                  accum_steps: int = 1):
    """The un-jitted single-step body shared by make_train_step (one dispatch
    per step) and make_scan_train_step (k steps per dispatch)."""

    def step(state: TrainState, batch):
        from jax.flatten_util import ravel_pytree

        rng, sub = jax.random.split(state.rng)

        def loss_fn(params):
            return batch_loss(model, tcfg, params, batch, sub, True, impl)

        if accum_steps > 1:
            loss, grads = _accum_value_and_grad(model, tcfg, impl,
                                                state.params, batch, sub,
                                                accum_steps)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
        if fused:
            gflat = ravel_pytree(grads)[0]
            pflat, unravel = ravel_pytree(state.params)
            updates, opt_state = tx.update(gflat, state.opt_state, pflat)
            params = unravel(optax.apply_updates(pflat, updates))
        else:
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, rng, state.step + 1), loss

    return step


def make_train_step(model, tcfg, *, impl: str = "xla", donate: bool = True,
                    fused: Optional[bool] = None, accum_steps: int = 1):
    """One jitted program per step.

    `accum_steps`: gradient accumulation — A sequential micro-batches per
    optimizer step, exact full-batch loss/gradient (see
    _accum_value_and_grad).  Memory knob, not a throughput knob.

    fused=True runs the optimizer over ONE flattened vector (mathematically
    identical: global-norm clip is global, AdamW is elementwise) — ~100
    per-leaf optimizer kernels collapse into a handful.  Crucially the ravel
    happens AFTER autodiff (per-leaf value_and_grad, then flatten grads +
    params for the update): differentiating THROUGH unravel compiled
    pathologically on this backend (8.2 ms/step).  The round-2 "0.40 vs
    1.29 ms/step" win was a submission-side artifact; honest round-3 A/B is
    a wash on wall-clock, but the fused update still submits ~100 fewer
    buffer arguments per dispatch — kept as the reference-dims default.  At
    s1024 the ravel/unravel copies of the 57.6M-param vector flip the sign
    (per-leaf +2.3%, interleaved A/B 2026-08-19), so the scale presets set
    tcfg.fused_optimizer=False; fused=None (default) takes the config's
    choice.  The sharded/TP path (parallel/mesh) requires fused=False
    (per-leaf sharding specs on the optimizer state).
    """
    if fused is None:
        fused = getattr(tcfg, "fused_optimizer", True)
    tx = make_optimizer(tcfg)
    step = _make_step_fn(model, tcfg, tx, impl=impl, fused=fused,
                         accum_steps=accum_steps)
    return (_wrap_fused_init(tx) if fused else tx,
            jax.jit(step, donate_argnums=(0,) if donate else ()))


def make_scan_train_step(model, tcfg, *, impl: str = "xla",
                         donate: bool = True, fused: Optional[bool] = None):
    """k sequential optimizer steps in ONE dispatch: `lax.scan` over a batch
    pytree whose leaves carry a leading micro-batch axis (k, B, ...).

    Identical math to k calls of make_train_step's program (same RNG
    splitting, same update order) — only the dispatch count changes.  At
    these model sizes a step is ~0.4 ms of device work, so per-dispatch
    launch/transfer overhead is a first-order cost (especially over this
    image's network-relayed chip); chaining steps amortizes it.  Returns
    (state, losses(k,)) — losses stay on device like Trainer's epoch loop.
    """
    if fused is None:
        fused = getattr(tcfg, "fused_optimizer", True)
    tx = make_optimizer(tcfg)
    step = _make_step_fn(model, tcfg, tx, impl=impl, fused=fused)

    def scan_step(state: TrainState, batches):
        return jax.lax.scan(step, state, batches)

    return (_wrap_fused_init(tx) if fused else tx,
            jax.jit(scan_step, donate_argnums=(0,) if donate else ()))


def make_eval_step(model, tcfg, *, impl: str = "xla"):
    def step(params, batch):
        return batch_loss(model, tcfg, params, batch, None, False, impl)

    return jax.jit(step)


def make_scan_eval_step(model, tcfg, *, impl: str = "xla"):
    """Eval losses for a stacked (k, B, ...) batch pytree in one dispatch;
    returns (k,) per-batch losses."""
    def step(params, batches):
        return jax.lax.scan(
            lambda _, b: (None, batch_loss(model, tcfg, params, b, None,
                                           False, impl)),
            None, batches)[1]

    return jax.jit(step)


def infer_cast(params, batch, dtype: str):
    """bf16 COMPUTE for the inference path — the forward-only twin of
    batch_loss's mixed-precision block (same keep-set: the loss-side
    weight/mask vectors stay f32).  Logit upcast is the caller's job
    (infer_upcast) so score/threshold math never runs in bf16."""
    if dtype != "bfloat16":
        return params, batch
    keep = {"sample_weight", "clip_mask"}
    params = _cast_tree(params, jnp.bfloat16)
    batch = {k: (v if k in keep else _cast_tree(v, jnp.bfloat16))
             for k, v in batch.items()}
    return params, batch


def infer_upcast(logits):
    return logits.astype(jnp.float32) if logits.dtype == jnp.bfloat16 \
        else logits


def make_predict_step(model, *, impl: str = "xla", dtype: str = "float32"):
    def step(params, batch):
        p, b = infer_cast(params, upcast_wire(batch), dtype)
        return infer_upcast(model.apply(p, b, train=False, impl=impl))

    return jax.jit(step)


def make_scan_predict_step(model, *, impl: str = "xla",
                           dtype: str = "float32"):
    """Forward over a stacked batch pytree (k, B, ...) in ONE dispatch —
    the inference-side twin of make_scan_train_step (same dispatch-overhead
    amortization; logits come back as (k, B, E))."""
    def one(params, b):
        p, b = infer_cast(params, upcast_wire(b), dtype)
        return infer_upcast(model.apply(p, b, train=False, impl=impl))

    def step(params, batches):
        return jax.lax.scan(
            lambda _, b: (None, one(params, b)),
            None, batches)[1]

    return jax.jit(step)


def _wrap_fused_init(tx):
    """A tx whose init takes the RAW params pytree and initializes the
    optimizer over the flattened vector — the fused step's target.  The
    step-builders return this whenever their step runs the fused update, so
    init_state needs no fused flag of its own: tx.init always matches the
    step it was built with."""
    from jax.flatten_util import ravel_pytree

    return tx._replace(init=lambda params, _tx=tx: _tx.init(
        ravel_pytree(params)[0]))


def init_state(model, tx, seed: int, *, fused: Optional[bool] = None
               ) -> TrainState:
    """Fresh TrainState for `tx`.  Since round 4 the step-builders return a
    tx whose init already targets the right optimizer form (_wrap_fused_init
    when the step is fused), so the default just calls tx.init(params).
    `fused=True` remains for callers holding a RAW make_optimizer tx that
    they pair with a fused step body; raveling an already-flat target is a
    no-op, so passing True with a wrapped tx stays correct."""
    from jax.flatten_util import ravel_pytree

    k_params, k_rng = jax.random.split(jax.random.PRNGKey(seed))
    params = model.init(k_params)
    opt_target = ravel_pytree(params)[0] if fused else params
    return TrainState(params, tx.init(opt_target), k_rng,
                      jnp.zeros((), jnp.int32))


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Update the LR injected by inject_hyperparams without recompiling."""
    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    opt_state = state.opt_state._replace(hyperparams=hp)  # NamedTuple
    return dataclasses.replace(state, opt_state=opt_state)


@dataclasses.dataclass
class EpochStats:
    train_loss: float
    valid_loss: float
    steps: int
    samples: int  # REAL samples (zero-weight padding rows excluded, counted
    # host-side from the numpy sample_weight before the device transfer —
    # Trainer._iter's counter; no device fetch, prefetch pipeline unaffected)
    seconds: float

    @property
    def samples_per_sec(self) -> float:
        return self.samples / max(self.seconds, 1e-9)


class Trainer:
    """Epoch driver: fresh loaders per epoch, plateau LR, early stop, best-ckpt.

    `train_loader` / `valid_loader` are zero-arg callables returning an iterable
    of batch dicts (device-ready numpy/jnp), mirroring the reference's
    regenerate-generators-per-epoch pattern (cmu-mosei/run.py:404-405).
    """

    def __init__(self, model, tcfg, *, impl: str = "xla",
                 checkpoint_cb: Optional[Callable] = None,
                 log_cb: Optional[Callable] = None,
                 prefetch: int = 2,
                 profile_dir: Optional[str] = None,
                 scan_steps: int = 1,
                 mesh=None, tp: bool = False, accum_steps: int = 1,
                 transfer_dtype=None):
        """`profile_dir`: capture a jax.profiler trace of epoch 1 (steady
        state, post-compile) into this directory — view with Perfetto or the
        TensorBoard profile plugin.

        `scan_steps`: chain this many train/eval steps into one dispatch via
        lax.scan over host-stacked batch groups (data/loader.stack_batches).
        Identical math and RNG chain to scan_steps=1 (tested); chaining
        amortizes the per-dispatch overhead — honest win 1.1-3.8x by config
        (bench/all_configs.py; the round-2 "12-49x" was a sync artifact).
        The epoch tail (< scan_steps batches) runs as a
        smaller stack — one extra compile, constant across epochs.

        `mesh`: a jax.sharding.Mesh ('data'[, 'model'] axes) — batches are
        placed sharded on 'data' by the prefetch worker, params/optimizer
        state replicated (or TP-sharded with tp=True), and XLA inserts the
        gradient all-reduce over ICI (parallel/mesh.py).  Identical math to
        single-device (the psum-mean over shards IS the full-batch mean);
        requires the per-step batch rows to divide the 'data' axis size.
        The optimizer runs per-leaf (fused flat-vector state cannot carry
        per-leaf shardings).

        `transfer_dtype` ("float16"/"bfloat16"/"int8"): compressed H2D wire
        format — float32 batch leaves are cast in the loader/prefetch worker
        and restored to f32 in-graph (upcast_wire) before any math.
        Half-floats halve the per-batch transfer bytes (the data-fed
        bottleneck on relay/PCIe-bound hosts); int8 quarters the feature
        bytes with per-sample scales (composes with a mesh — the (B,) scale
        leaves shard on 'data' — but not with scan_steps > 1 under a mesh);
        lossy ~1e-3 (f16) / ~0.4% of per-sample max (int8) on features,
        exact on 0/1 masks/labels/weights; default None keeps bit-exact
        torch-parity numerics."""
        from ..data.loader import resolve_transfer_dtype

        self.transfer_dtype = resolve_transfer_dtype(transfer_dtype)
        if self.transfer_dtype == "int8" and mesh is not None and scan_steps > 1:
            # per-batch int8 composes with a mesh (the (B,) scale leaves
            # shard on 'data' like any other leaf), but scan chunks cast
            # AFTER stacking — (s,)-shaped group scales have no data axis to
            # slice and per-group granularity degrades precision anyway
            raise ValueError(
                "int8 wire does not compose with mesh + scan_steps > 1 "
                "(group-level scales cannot slice the 'data' axis); drop "
                "scan_steps or use float16/bfloat16")
        self.model = model
        self.tcfg = tcfg
        self.mesh = mesh
        # mesh path: per-leaf optimizer state; single-chip honors the
        # config's measured winner (TrainConfig.fused_optimizer)
        self.fused = mesh is None and getattr(tcfg, "fused_optimizer", True)
        if mesh is not None:
            from ..parallel.mesh import make_sharded_train_step

            self.tx, self.train_step, self._place = make_sharded_train_step(
                model, tcfg, mesh, impl=impl, tp=tp)
        else:
            self._place = None
            self.tx, self.train_step = make_train_step(
                model, tcfg, impl=impl, accum_steps=accum_steps)
        if accum_steps > 1 and mesh is not None:
            # DP already divides the per-device batch by the mesh's data
            # axis; composing both would need sharded micro-slices — not
            # supported (use a bigger dp or a smaller batch instead)
            raise ValueError("accum_steps > 1 is single-device only "
                             "(the mesh's data axis already shrinks the "
                             "per-device batch)")
        self.eval_step = make_eval_step(model, tcfg, impl=impl)
        self.scan_steps = scan_steps
        if scan_steps > 1:
            if accum_steps > 1:
                raise ValueError("accum_steps > 1 does not compose with "
                                 "scan_steps > 1 (pick one dispatch-shape "
                                 "knob)")
            _, self.train_step_scan = make_scan_train_step(
                model, tcfg, impl=impl, fused=self.fused)
            self.eval_step_scan = make_scan_eval_step(model, tcfg, impl=impl)
        self.checkpoint_cb = checkpoint_cb
        self.log_cb = log_cb
        self.prefetch = prefetch
        self.profile_dir = profile_dir

    def _batch_sharding(self, scan: bool):
        """NamedSharding for incoming batches: rows sharded over 'data'
        (scan stacks carry a leading (k,) step axis that stays unsharded)."""
        if self.mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(self.mesh, P(None, "data") if scan else P("data"))

    def _iter(self, loader, counter: Optional[dict] = None):
        """`counter`: mutated with {"n": real samples, "rows": dispatched
        rows} counted HOST-side from the numpy sample_weight before the
        device transfer — exact without any device fetch (EpochStats.samples
        previously counted zero-weight padding rows)."""
        it = iter(loader())
        scan = self.scan_steps > 1
        if scan:
            from ..data.loader import stack_batches

            it = stack_batches(it, self.scan_steps)
        if counter is not None:
            def counting(inner):
                for b in inner:
                    w = b.get("sample_weight")
                    rows = int(np.prod(b["label"].shape[:2]) if scan
                               else b["label"].shape[0])
                    counter["rows"] += rows
                    counter["n"] += (int(np.asarray(w).sum())
                                     if w is not None else rows)
                    yield b

            it = counting(it)
        if self.prefetch:
            from ..data.loader import prefetch_to_device

            return prefetch_to_device(it, size=self.prefetch,
                                      sharding=self._batch_sharding(scan),
                                      data_axis=1 if scan else 0,
                                      transfer_dtype=self.transfer_dtype)
        if self.transfer_dtype is not None:
            from ..data.loader import cast_for_transfer

            it = (cast_for_transfer(b, self.transfer_dtype) for b in it)
        if self.mesh is not None:
            from ..parallel.mesh import put_global_batch

            sh = self._batch_sharding(scan)
            return (put_global_batch(b, sh, data_axis=1 if scan else 0)
                    for b in it)
        return it

    def fit(self, train_loader, valid_loader, *, state: Optional[TrainState] = None,
            epochs: Optional[int] = None, seed: Optional[int] = None,
            start_epoch: int = 0, plateau=None, stopper=None, last_cb=None):
        """`start_epoch`/`plateau`/`stopper` inject a restored resume point
        (train/checkpoint.py restore_last); `last_cb(state, epoch, plateau,
        stopper)` fires after every epoch so the driver can persist it."""
        tcfg = self.tcfg
        state = state if state is not None else init_state(
            self.model, self.tx, tcfg.seed if seed is None else seed,
            fused=self.fused)
        if self._place is not None:
            # mesh path: replicate (or TP-shard) params/optimizer onto the
            # mesh — also re-places a host-restored resume state
            state = self._place(state)
        plateau = plateau or schedule.PlateauState(
            lr=tcfg.lr, factor=tcfg.plateau_factor,
            patience=tcfg.plateau_patience)
        stopper = stopper or schedule.EarlyStop(patience=tcfg.early_stop,
                                                save_guard=tcfg.save_guard)
        history = []
        from ..utils.logging import profile_trace

        n_epochs = tcfg.epochs if epochs is None else epochs
        # a restored stopper that already fired must not train further —
        # the uninterrupted run stopped at that epoch, so resume is a no-op
        # (kfold then marks the fold done).  Guarded on start_epoch > 0:
        # a FRESH stopper with patience=0 (early_stop overridden to 0) starts
        # with bad == patience and must still train — only an actual resume
        # carries a fired stopper
        if start_epoch > 0 and stopper.bad >= stopper.patience:
            return state, history
        # profile the first post-compile epoch RELATIVE to where this run
        # starts (resume included); runs with a single remaining epoch
        # profile it (compile included) rather than silently producing nothing
        profile_epoch = (start_epoch + 1 if n_epochs - start_epoch > 1
                         else start_epoch)
        for epoch in range(start_epoch, n_epochs):
            with profile_trace(self.profile_dir
                               if epoch == profile_epoch else None):
                t0 = time.perf_counter()
                scan = self.scan_steps > 1
                train_fn = self.train_step_scan if scan else self.train_step
                eval_fn = self.eval_step_scan if scan else self.eval_step
                # losses stay on-device until epoch end — fetching per step
                # would serialize host and chip and defeat the prefetch pipeline
                losses, n_steps = [], 0
                counter = {"n": 0, "rows": 0}
                for batch in self._iter(train_loader, counter):
                    state, loss = train_fn(state, batch)
                    losses.append(loss)
                    n_steps += int(loss.shape[0]) if loss.ndim else 1
                tr_loss = (float(sum(np.sum(x) for x in jax.device_get(losses)))
                           if losses else 0.0)
                va_losses = [eval_fn(state.params, batch)
                             for batch in self._iter(valid_loader)]
                va_steps = sum(int(x.shape[0]) if x.ndim else 1
                               for x in va_losses)
                va_loss = (float(sum(np.sum(x)
                                     for x in jax.device_get(va_losses)))
                           if va_losses else 0.0)
            stats = EpochStats(
                train_loss=tr_loss / max(n_steps, 1),
                valid_loss=va_loss / max(va_steps, 1),
                steps=n_steps, samples=counter["n"],
                seconds=time.perf_counter() - t0,
            )
            history.append(stats)
            if self.log_cb:
                self.log_cb(epoch, stats)
            new_lr = plateau.step(stats.valid_loss)
            state = set_learning_rate(state, new_lr)
            save, stop = stopper.step(stats.valid_loss)
            if save and self.checkpoint_cb:
                self.checkpoint_cb(state, epoch, stats.valid_loss)
            if last_cb:
                last_cb(state, epoch, plateau, stopper)
            if stop:
                break
        return state, history
