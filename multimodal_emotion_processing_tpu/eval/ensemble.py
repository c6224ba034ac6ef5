"""Ensembling and threshold selection.

The reference reloads k loss-tagged checkpoints and averages logits at test
time (cmu-mosei/run.py:446-477: mean/4; others/realformer.py:420: 0.6/0.4
blend; Ren-MME/run.py:727: sum).  Its realformer threshold sweep re-runs full
inference 400 times (others/realformer.py:411-441); here logits are computed
ONCE — the k member forwards run as a single vmapped pass over stacked
parameter pytrees — and every threshold is evaluated from the cached logits
(SURVEY §7.3.7).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..train import metrics


class Ensemble:
    """k same-architecture members, evaluated in one vmapped forward."""

    def __init__(self, model, params_list: Sequence, weights: Optional[Sequence[float]] = None,
                 *, combine: str = "mean", impl: str = "xla", stacked=None,
                 mesh=None, dtype: str = "float32"):
        self.model = model
        self.k = len(params_list)
        self.stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
        # `dtype`: bf16 COMPUTE for the vmapped forward (the inference twin
        # of train.compute_dtype; scaled presets default to it) — members
        # are cast ONCE here (inference has no f32 master-weight obligation),
        # batches per call, logits upcast to f32 before combining so the
        # threshold/score math stays exact
        self.dtype = dtype
        if dtype == "bfloat16":
            from ..train.engine import _cast_tree

            self.stacked = _cast_tree(self.stacked, jnp.bfloat16)
        # `mesh`: shard batch inference over the 'data' axis of a
        # jax.sharding.Mesh — members replicate, every batch leaf shards on
        # its leading (batch) axis, and GSPMD partitions the vmapped
        # forward; identical logits to single-device (no cross-sample op in
        # any model family).  The inference-side counterpart of
        # run_experiment(dp=); multi-process meshes transfer only each
        # host's slice (parallel.mesh.put_global_batch).
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import replicated_sharding

            self.stacked = jax.device_put(self.stacked,
                                          replicated_sharding(mesh))
        if weights is not None:
            self.weights = jnp.asarray(weights, jnp.float32)
        elif combine == "mean":
            self.weights = jnp.full((self.k,), 1.0 / self.k, jnp.float32)
        else:  # 'sum' (Ren-MME)
            self.weights = jnp.ones((self.k,), jnp.float32)

        # `stacked`: stacked realformer grid (models/grid.apply_grid) —
        # per-trace static arg; measured slower at reference shapes under
        # honest sync (ENGINEERING_NOTES), kept selectable
        def member_logits(params, batch):
            from ..train.engine import infer_cast, infer_upcast, upcast_wire

            # accept half-width wire batches (data/loader.cast_for_transfer);
            # no-op on float32.  params are already cast (construction);
            # infer_cast here casts the batch leaves (params re-cast is a
            # no-op on an already-bf16 tree)
            params, batch = infer_cast(params, upcast_wire(batch), dtype)
            return infer_upcast(model.apply(params, batch, train=False,
                                            impl=impl, stacked=stacked))

        self._member_logits = member_logits
        self._vmapped = jax.jit(jax.vmap(member_logits, in_axes=(0, None)))

    def logits(self, batch) -> jnp.ndarray:
        """Weighted-combined ensemble logits for one batch."""
        if self.mesh is not None:
            from ..parallel.mesh import batch_sharding, put_global_batch

            n_data = self.mesh.shape["data"]
            b = next(iter(
                v.shape[0] for v in jax.tree_util.tree_leaves(batch)))
            if b % n_data:
                raise ValueError(
                    f"batch size {b} must divide the mesh 'data' axis "
                    f"({n_data}) for sharded inference — pick a batch_size "
                    f"divisible by dp")
            batch = put_global_batch(batch, batch_sharding(self.mesh, batch))
        per_member = self._vmapped(self.stacked, batch)  # (k, B, ...)
        w = self.weights.reshape((self.k,) + (1,) * (per_member.ndim - 1))
        return jnp.sum(per_member * w, axis=0)

    def predict_all(self, loader, *, transfer_dtype=None) -> np.ndarray:
        """Concatenated combined logits over a loader; honors sample_weight
        padding by dropping padded rows.  `transfer_dtype`
        ("float16"/"bfloat16"): cast float32 leaves to a half-width wire
        format before the implicit H2D transfer (upcast in-graph) — the
        training side's +40% data-fed win applies to batch inference too."""
        from ..data.loader import cast_for_transfer, resolve_transfer_dtype

        wire = resolve_transfer_dtype(transfer_dtype)
        outs = []
        for batch in loader() if callable(loader) else loader:
            lg = np.asarray(self.logits(cast_for_transfer(batch, wire)))
            w = batch.get("sample_weight")
            if w is not None:
                lg = lg[np.asarray(w) > 0]
            outs.append(lg)
        return np.concatenate(outs, axis=0)


    def predict_all_staged(self, samples: Sequence, batch_size: int, *,
                           transfer_dtype=None) -> np.ndarray:
        """Device-resident bulk scoring: stage the WHOLE dataset in HBM once
        (train/device_epochs.stage_dataset — optionally f16/bf16/int8
        compressed), then compute every batch's combined ensemble logits in
        ONE dispatch (`lax.scan` over contiguous static-shape slices).
        Removes both per-batch costs of `predict_all` — the H2D put and the
        dispatch round-trip — the inference-side analogue of the
        device-resident training drivers (honest A/B there: 2.3×).  Returns
        exactly `predict_all`'s concatenated logits (padding rows dropped
        via the staged sample_weight); same math, same member forward."""
        if self.mesh is not None:
            raise ValueError(
                "staged prediction does not compose with mesh= sharding — "
                "use the per-batch path (predict_all) on a mesh")
        from ..train.device_epochs import stage_dataset

        data, _ = stage_dataset(list(samples), pad_to_multiple=batch_size,
                                transfer_dtype=transfer_dtype)
        n_rows = int(data["sample_weight"].shape[0])
        n_ev = n_rows // batch_size
        member_fn = self._member_logits
        w = self.weights

        def run(d):
            def body(c, j):
                batch = jax.tree.map(
                    lambda x: jax.lax.dynamic_slice_in_dim(
                        x, j * batch_size, batch_size), d)
                per = jax.vmap(member_fn, in_axes=(0, None))(self.stacked,
                                                             batch)
                return c, jnp.sum(
                    per * w.reshape((self.k,) + (1,) * (per.ndim - 1)),
                    axis=0)

            return jax.lax.scan(body, None, jnp.arange(n_ev))[1]

        lg = np.asarray(jax.jit(run)(data))        # (n_ev, B, ...)
        lg = lg.reshape((n_rows,) + lg.shape[2:])
        keep = np.asarray(jax.device_get(data["sample_weight"])) > 0
        return lg[keep]


def group_average(logits: np.ndarray, group_ids: Sequence[int],
                  labels: Optional[np.ndarray] = None):
    """Average logit rows sharing a group id (order-preserving by first
    appearance); labels reduce to the group's first row.  This is the
    reference's two-crop test protocol: one prediction per sentence PAIR from
    the mean of its head/tail crop logits (cmu-mosei/run.py:462,477-480)."""
    logits = np.asarray(logits)
    gids = np.asarray(group_ids)
    uniq, first_idx, inverse = np.unique(gids, return_index=True,
                                         return_inverse=True)
    order = np.argsort(first_idx)  # preserve first-appearance order
    summed = np.zeros((len(uniq), logits.shape[-1]), np.float64)
    np.add.at(summed, inverse, logits)
    counts = np.bincount(inverse, minlength=len(uniq))
    avg = (summed / counts[:, None]).astype(logits.dtype)[order]
    if labels is None:
        return avg
    return avg, np.asarray(labels)[first_idx[order]]


def apply_thresholds(logits: np.ndarray, thresholds: Sequence[float],
                     emotion_index: Sequence[int]) -> np.ndarray:
    """Binary predictions: pred[:, j] = logits[:, emotion_index[j]] > thresholds[j]."""
    logits = np.asarray(logits)
    cols = np.stack([logits[:, idx] for idx in emotion_index], axis=1)
    return (cols > np.asarray(thresholds)[None, :]).astype(np.int32)


def threshold_sweep(
    logits: np.ndarray,
    labels: np.ndarray,
    thresholds: Sequence[float],
    emotion_index: Sequence[int],
    emotion_names: Sequence[str],
    *,
    metric: Callable = metrics.weighted_f1,
) -> Dict[str, Dict[str, float]]:
    """Per-emotion best threshold by the given metric, from CACHED logits —
    one inference pass total (vs the reference's sweep re-running inference
    per threshold).  Returns {emotion: {t, f1, acc}}."""
    logits = np.asarray(logits)
    labels = np.asarray(labels)
    best = {}
    for j, name in enumerate(emotion_names):
        col = logits[:, emotion_index[j]]
        lab = labels[:, emotion_index[j]]
        b = {"t": 0.0, "f1": -1.0, "acc": 0.0}
        for t in thresholds:
            pred = (col > t).astype(np.int32)
            f1 = metric(lab, pred)
            if f1 > b["f1"]:
                b = {"t": float(t), "f1": float(f1),
                     "acc": metrics.accuracy(lab, pred)}
        best[name] = b
    return best


def realformer_threshold_grid(n: int = 400):
    """The reference's sweep grid: t/200 - 1 for t in range(400)
    (others/realformer.py:411-412)."""
    return [t / 200 - 1.0 for t in range(n)]


def robot_threshold_grid(n: int = 13):
    """robot_demo.py:532-533: i/10 - 1 for i in range(13)."""
    return [i / 10 - 1.0 for i in range(n)]


def joint_threshold_grid(
    logits: np.ndarray,
    labels: np.ndarray,
    grids: Sequence[Sequence[float]],
    emotion_index: Sequence[int],
    emotion_names: Sequence[str],
) -> Dict[str, object]:
    """Ren-MME's JOINT threshold grid search (Ren-MME/run.py:582-613): score
    every combination of per-emotion thresholds by micro-F1 + macro-F1 of the
    full multi-label matrix, keep the first maximizer in nested-loop order.

    The reference re-binarizes the whole prediction matrix per combination
    (its executed grid is degenerate — one value per emotion); here the
    per-emotion (TP, FP, FN) count curves are computed ONCE per threshold and
    every combination is scored by broadcast-summing count tables — micro-F1
    couples emotions only through ΣTP/ΣFP/ΣFN, macro-F1 is separable — so a
    g^8 grid costs O(N·Σg) counting + O(Πg) adds instead of O(N·Πg).
    Non-degenerate grids are fully supported (guarded at ~2e7 combinations).

    Returns {"thresholds": {name: t}, "objective", "micro_f1", "macro_f1"}.
    """
    logits = np.asarray(logits)
    labels = np.asarray(labels)
    e = len(emotion_names)
    sizes = [len(g) for g in grids]
    total = int(np.prod(sizes))
    if total > 20_000_000:
        raise ValueError(f"grid product {total} too large; coarsen the grids")
    tp, fp, fn, f1e = [], [], [], []
    for j in range(e):
        col = logits[:, emotion_index[j]][:, None]      # (N, 1)
        lab = labels[:, emotion_index[j]][:, None] > 0  # (N, 1)
        pred = col > np.asarray(grids[j], col.dtype)[None, :]  # (N, g_j)
        tp_j = np.sum(pred & lab, axis=0).astype(np.float64)
        fp_j = np.sum(pred & ~lab, axis=0).astype(np.float64)
        fn_j = np.sum(~pred & lab, axis=0).astype(np.float64)
        shape = [1] * e
        shape[j] = sizes[j]
        tp.append(tp_j.reshape(shape))
        fp.append(fp_j.reshape(shape))
        fn.append(fn_j.reshape(shape))
        denom = 2 * tp_j + fp_j + fn_j
        f1e.append(np.divide(2 * tp_j, denom, out=np.zeros_like(denom),
                             where=denom > 0).reshape(shape))
    tp_sum = sum(tp)    # broadcast to the full (g_1, ..., g_e) table
    denom = 2 * tp_sum + sum(fp) + sum(fn)
    micro = np.divide(2 * tp_sum, denom, out=np.zeros_like(denom),
                      where=denom > 0)
    macro = sum(np.broadcast_to(x, micro.shape) / e for x in f1e)
    obj = micro + macro
    # np.argmax C-order = the reference's nested-loop order (love outermost),
    # strict-> keeps the FIRST maximizer exactly like its `f1 > temp_max`
    best = np.unravel_index(int(np.argmax(obj)), obj.shape)
    return {
        "thresholds": {emotion_names[j]: float(grids[j][best[j]])
                       for j in range(e)},
        "objective": float(obj[best]),
        "micro_f1": float(micro[best]),
        "macro_f1": float(np.broadcast_to(macro, obj.shape)[best]),
    }


def ren_mme_joint_grids(per: int = 5, lo: float = -4.2, hi: float = -1.0):
    """A non-degenerate default grid for the joint search, spanning the
    reference's tuned threshold range (love -3.6 ... anxi -1.2,
    Ren-MME/run.py:582-589): `per` evenly spaced values per emotion."""
    pts = [lo + (hi - lo) * i / (per - 1) for i in range(per)]
    return [list(pts) for _ in range(8)]
