"""Device mesh + sharding specs.

The reference has no distributed code at all (single `cuda:0`, SURVEY §2.4);
parallelism here is native to the new framework and fully XLA-driven: pick a
`Mesh`, annotate `NamedSharding`s, and let pjit/GSPMD insert the collectives
(gradient psums ride ICI; no hand-written comm layer).

Axes:
  * `data`  — batch sharding; the primary (and at these model sizes,
    sufficient) strategy.  Gradients are reduced by XLA-inserted psum.
  * `model` — optional tensor parallelism for demonstration/scaling: attention
    projection kernels shard on their output feature axis, which (heads being
    a reshape of that axis) head-shards the score tensors; classifiers shard
    on their input axis.  Head counts (6/8) divide evenly.

Pipeline/expert parallelism are unsupported by design (1-2 layer models, no
MoE — SURVEY §2.4); sequence/context parallelism is bounded by construction
(max 275 tokens) and unnecessary.

Multi-host: call `jax.distributed.initialize()` before `make_mesh`; per-host
batch slicing is the loader's job.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(**kwargs) -> None:
    """Multi-host init: call once per process before make_mesh on TPU pods.
    Thin wrapper so entry points don't import jax.distributed directly."""
    jax.distributed.initialize(**kwargs)


def process_batch_slice(global_batch_size: int) -> slice:
    """The per-process slice of a globally-sharded batch (host data loading
    is per-process on pods; each host feeds its local shard).  The global
    batch must divide evenly — silently dropping remainder rows would lose
    data AND break the sharded global shape."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(f"global_batch_size ({global_batch_size}) must be "
                         f"divisible by process_count ({n})")
    per = global_batch_size // n
    lo = jax.process_index() * per
    return slice(lo, lo + per)


def sharding_tree(batch, sharding):
    """Normalize `sharding` to a per-leaf pytree matching `batch`: a single
    Sharding broadcasts to every leaf; an already-matching pytree (e.g.
    `batch_sharding`'s dict) passes through."""
    from jax.sharding import Sharding

    if isinstance(sharding, Sharding):
        return jax.tree.map(lambda _: sharding, batch)
    if (jax.tree_util.tree_structure(sharding)
            != jax.tree_util.tree_structure(batch)):
        raise ValueError("sharding must be a single Sharding or a pytree "
                         "matching the batch structure")
    return sharding


def put_global_batch(batch, sharding, *, data_axis: int = 0):
    """Place a host-assembled GLOBAL batch onto a (possibly multi-process)
    mesh.  Single-process: plain sharded device_put.  Multi-process (TPU
    pods; every process assembles the same deterministic global batch —
    seeded Batcher order is process-independent): each process transfers only
    ITS slice of the data axis (`process_batch_slice`) and the global array
    is assembled from the per-process local shards — host→device traffic is
    1/process_count per host and no cross-host data exchange happens at all.
    `sharding`: one Sharding for every leaf, or a per-leaf pytree (e.g.
    `batch_sharding`'s dict).  `data_axis`: which axis the 'data' mesh axis
    shards (0 for plain batches, 1 for scan-stacked (k, B, ...) groups)."""
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)

    def put(x, sh):
        sl = process_batch_slice(x.shape[data_axis])
        idx = (slice(None),) * data_axis + (sl,)
        return jax.make_array_from_process_local_data(sh, x[idx], x.shape)

    return jax.tree.map(put, batch, sharding_tree(batch, sharding))


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    n = n_data * n_model
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def batch_spec(batch) -> dict:
    """PartitionSpec pytree: every batch leaf sharded on axis 0 over 'data'."""
    return jax.tree.map(lambda _: P("data"), batch)


def batch_sharding(mesh: Mesh, batch) -> dict:
    return jax.tree.map(lambda _: NamedSharding(mesh, P("data")), batch)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _is_matrix(x) -> bool:
    return hasattr(x, "ndim") and x.ndim == 2


def tp_param_spec(params, enable: bool = True):
    """Tensor-parallel spec: 2-D kernels inside attention blocks shard on the
    output axis (P(None, 'model')); everything else replicates.  GSPMD
    propagates through the head-split reshapes and inserts the collectives.
    Demonstrative at these sizes — replicate (enable=False) is the default."""

    # realformer blocks project Q/K/V (wq/wk/wv present), so their attention
    # context arrives head-sharded and proj should be ROW-parallel (local
    # contraction + one psum; column-sharding forced an all-gather of the
    # context).  Minus blocks have no QKV projections — their context is
    # replicated, so COLUMN-parallel proj feeds the row-parallel minus with
    # a single psum there instead.  Decided PER BLOCK (a tree mixing block
    # types would otherwise force extra resharding collectives on the
    # minority blocks): a block subtree = the path prefix above the leaf's
    # ('proj'|'wq'|...) parent.
    qkv_blocks = {
        tuple(getattr(p, "key", getattr(p, "name", "")) for p in path[:-2])
        for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]
        if len(path) >= 2
        and getattr(path[-2], "key", getattr(path[-2], "name", "")) == "wq"}

    def spec_for(path, leaf):
        if not enable or not _is_matrix(leaf):
            return P()
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        parent = names[-2] if len(names) >= 2 else ""
        if "blocks" in names and names[-1] == "w":
            if parent in ("wq", "wk", "wv", "ffn1"):
                return P(None, "model")  # column-parallel first matmuls
            if parent == "proj":
                block_has_qkv = tuple(names[:-2]) in qkv_blocks
                return P("model", None) if block_has_qkv else P(None, "model")
            if parent in ("minus", "ffn2"):
                return P("model", None)  # row-parallel second matmuls
        # classifiers shard on their input (pooled-feature) axis; the output
        # axis is the handful of emotion logits and must stay whole
        if parent == "classifier" and names[-1] == "w":
            return P("model", None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(mesh: Mesh, params, *, tp: bool = False):
    specs = tp_param_spec(params, enable=tp)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def make_sharded_train_step(model, tcfg, mesh: Mesh, *, impl: str = "xla",
                            tp: bool = False):
    """Jit the train step over the mesh: batch sharded on 'data', state
    replicated (or TP-sharded); XLA emits the gradient all-reduce."""
    from ..train import engine as eng

    tx = eng.make_optimizer(tcfg)
    # ONE step-body implementation for single-chip and mesh paths (per-leaf
    # optimizer here: fused flat-vector state cannot carry per-leaf shardings)
    step = eng._make_step_fn(model, tcfg, tx, impl=impl, fused=False)

    def place_state(state):
        params = shard_params(mesh, state.params, tp=tp)

        def opt_put(x):
            return jax.device_put(x, NamedSharding(mesh, P()))

        # keep existing PER-LEAF optimizer state (mid-training continuation);
        # a flat/fused opt_state (the single-chip engine default) cannot be
        # sharded per-leaf, so it is re-initialized — loudly
        fresh = tx.init(state.params)
        same = (jax.tree_util.tree_structure(state.opt_state)
                == jax.tree_util.tree_structure(fresh))
        if not same:
            import sys

            print("[parallel.mesh] incoming opt_state is fused/mismatched; "
                  "re-initializing optimizer moments for the mesh (training "
                  "momentum/LR state is reset)", file=sys.stderr)
        opt_state = jax.tree.map(opt_put, state.opt_state if same else fresh)
        return eng.TrainState(params, opt_state,
                              jax.device_put(state.rng, NamedSharding(mesh, P())),
                              jax.device_put(state.step, NamedSharding(mesh, P())))

    jitted = jax.jit(step)
    return tx, jitted, place_state
