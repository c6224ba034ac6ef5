"""Vmapped hyperparameter sweep: every (learning-rate x seed) candidate
trains in ONE compiled program.

The reference tunes nothing programmatically — its learning rate is a
hand-edited module constant (``LR = 1e-3``, cmu-mosei/run.py:33) and trying
another value means editing the script and re-running the whole fold loop.
On TPU these dim-96 models underfill the chip so badly (~2% MFU at
reference shapes — docs/ENGINEERING_NOTES.md) that hyperparameter search is
nearly free: the candidate axis becomes a vmap axis, exactly like the fold
axis in train/vmap_kfold.py, and the WHOLE sweep — every candidate x every
epoch, with per-candidate plateau-LR + early-stop controllers in-graph —
runs as a single dispatch (the `run_kfold_fully_compiled` pattern over a
hyperparameter axis instead of a fold axis).

Sweep semantics (designed for clean ablations):

  * candidates are the (lr x wd) grid (wd optional — AdamW weight decay
    rides `optax.inject_hyperparams` exactly like the LR); member i trains
    candidate ``i // seeds_per_lr`` with init seed
    ``tcfg.seed + (i % seeds_per_lr)`` — candidates SHARE init seeds and
    per-epoch shuffle orders, so a pair of members differing only in a
    hyperparameter sees bit-identical batches from bit-identical inits:
    the trajectory delta is that hyperparameter's effect alone;
  * every member trains on the SAME train/valid split (unlike k-fold, whose
    axis varies the data);
  * the per-member controllers are the reference's own loop semantics
    (ReduceLROnPlateau x0.1 with the 1e-4 relative threshold, early stop
    with the save-guard quirk, best-checkpoint tracking) — the sweep ranks
    candidates by exactly the criterion the reference's manual tuner reads
    off its logs: best validation loss;
  * a seeds_per_lr=1 sweep member with lr == tcfg.lr reproduces
    train/device_epochs.fit_fully_compiled's trajectory (same RNG chain,
    same shuffle keys — tested).

Use ``run_lr_sweep`` directly, or ``pipelines.run_lr_sweep_experiment`` /
``cli sweep --lrs ...`` for the config-named form.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.sync import fetch_scalar
from .engine import EpochStats
from .vmap_kfold import _fold_fns, _set_fold_lrs, _slice_fold


@dataclasses.dataclass
class SweepMember:
    lr: float
    wd: float
    seed: int
    best_valid_loss: float
    best_epoch: int          # -1 when the guard never passed
    stop_epoch: int          # last epoch the member actually trained
    history: List[EpochStats]
    best_params: dict


@dataclasses.dataclass
class SweepResult:
    members: List[SweepMember]
    winner: int              # index into members (lowest best_valid_loss)
    seconds: float

    def table(self):
        """Rows sorted best-first: (lr, seed, best_valid_loss, best_epoch)."""
        order = sorted(range(len(self.members)),
                       key=lambda i: self.members[i].best_valid_loss)
        return [{"rank": r + 1, "lr": self.members[i].lr,
                 "wd": self.members[i].wd,
                 "seed": self.members[i].seed,
                 "best_valid_loss": self.members[i].best_valid_loss,
                 "best_epoch": self.members[i].best_epoch,
                 "stop_epoch": self.members[i].stop_epoch}
                for r, i in enumerate(order)]


def run_lr_sweep(
    train_samples: Sequence,
    valid_samples: Sequence,
    model,
    tcfg,
    *,
    lrs: Sequence[float],
    wds: Optional[Sequence[float]] = None,
    seeds_per_lr: int = 1,
    epochs: Optional[int] = None,
    impl: str = "xla",
    duplicate: bool = False,
    log_cb=None,
    transfer_dtype=None,
) -> SweepResult:
    """Train len(lrs) * len(wds or [default]) * seeds_per_lr candidates in
    one dispatch and rank them by best validation loss.  Device-resident
    (datasets staged in HBM once), fully compiled (controllers in-graph) —
    see the module docstring for the member layout and ablation guarantees.

    `wds`: optional AdamW weight-decay candidates — the grid becomes
    (lr x wd x seed), all still one compiled program (weight decay rides
    `optax.inject_hyperparams` exactly like the LR, so varying it is a
    vector set, not a recompile).  Adam configs carry but ignore it
    (engine.make_optimizer).

    `transfer_dtype` ("float16"/"bfloat16"): stage the datasets half-width
    (device_epochs.stage_dataset; the steps upcast in-graph)."""
    from .device_epochs import (controller_step, gather_rows,
                                padded_eval_indices, stage_dataset)

    lrs = [float(x) for x in lrs]
    if not lrs:
        raise ValueError("lrs must be non-empty")
    if seeds_per_lr < 1:
        raise ValueError(f"seeds_per_lr must be >= 1, got {seeds_per_lr}")
    S = seeds_per_lr
    default_wd = getattr(tcfg, "weight_decay", 0.01)
    cands = [(lr, float(wd)) for lr in lrs
             for wd in (wds if wds else [default_wd])]
    m = len(cands) * S
    member_lrs_py = [cands[i // S][0] for i in range(m)]  # exact, reporting
    member_wds_py = [cands[i // S][1] for i in range(m)]
    member_lrs = np.asarray(member_lrs_py, np.float32)            # (m,)
    member_seeds = np.asarray([tcfg.seed + (i % S) for i in range(m)])

    single_init, single_step, single_eval = _fold_fns(model, tcfg, impl)
    bs = tcfg.batch_size
    rows = bs * (2 if duplicate else 1)
    train_data, n_train = stage_dataset(list(train_samples),
                                        transfer_dtype=transfer_dtype)
    n_steps_tr = n_train // bs
    if n_steps_tr == 0:
        raise ValueError(f"sweep needs >= {bs} train samples, have {n_train}")
    valid_data, _ = stage_dataset(list(valid_samples), pad_to_multiple=bs,
                                  transfer_dtype=transfer_dtype)
    n_ev = int(valid_data["sample_weight"].shape[0]) // bs

    n_epochs = tcfg.epochs if epochs is None else epochs
    # per-SEED shuffle keys, identical scheme to fit_device_resident /
    # fit_fully_compiled (PRNGKey(seed + 777) folded with the epoch) so a
    # member whose seed is tcfg.seed replays the single-run batch order
    seed_keys = jnp.stack([jax.random.PRNGKey(int(tcfg.seed + s) + 777)
                           for s in range(S)])                    # (S, 2)
    f32 = jnp.float32

    def train_epoch(states_, e):
        keys_s = jax.vmap(jax.random.fold_in, (0, None))(seed_keys, e)
        perms = jax.vmap(
            lambda kk: jax.random.permutation(kk, n_train))(keys_s)  # (S, n)
        rowids = jnp.tile(perms, (len(cands), 1))                 # (m, n)
        if duplicate:
            rowids = jnp.repeat(rowids, 2, axis=1)

        def body(st, i):
            idx = jax.lax.dynamic_slice_in_dim(rowids, i * rows, rows, axis=1)
            return jax.vmap(single_step)(st, gather_rows(train_data, idx))

        states_, losses = jax.lax.scan(body, states_, jnp.arange(n_steps_tr))
        return states_, jnp.mean(losses, axis=0)                  # (m,)

    def eval_mean(states_):
        def body(c, j):
            batch = jax.tree.map(
                lambda x: jax.lax.dynamic_slice_in_dim(x, j * bs, bs),
                valid_data)
            if duplicate:
                batch = jax.tree.map(lambda x: jnp.repeat(x, 2, axis=0), batch)
            return c, jax.vmap(single_eval, in_axes=(0, None))(c, batch)

        return jnp.mean(jax.lax.scan(body, states_, jnp.arange(n_ev))[1],
                        axis=0)                                   # (m,)

    def _bcast(mask, leaf):
        return mask.reshape((m,) + (1,) * (leaf.ndim - 1))

    def whole_run(states0):
        init = (states0,
                (jnp.asarray(member_lrs),                 # controller: lr
                 jnp.full((m,), jnp.inf, f32),            #   plateau best
                 jnp.zeros((m,), jnp.int32),              #   plateau bad
                 jnp.full((m,), jnp.inf, f32),            #   stopper best
                 jnp.zeros((m,), jnp.int32)),             #   stopper bad
                jnp.zeros((m,), bool),                    # stopped
                states0.params,                           # best params
                jnp.full((m,), jnp.inf, f32),             # best losses
                jnp.full((m,), -1, jnp.int32),            # best epochs
                jnp.zeros((m,), bool),                    # guard-passed save
                jnp.full((m,), jnp.nan, f32))             # last valid

        def epoch_step(carry, e):
            def live(carry):
                st, ctrl, stopped, bp, bl, bep, savedany, _ = carry
                active = ~stopped
                st = _set_fold_lrs(st, ctrl[0])
                st, tr = train_epoch(st, e)
                va = eval_mean(st)
                ctrl, save, stop_now = controller_step(va, ctrl, tcfg,
                                                       active=active)
                bp = jax.tree.map(
                    lambda new, old: jnp.where(_bcast(save, new), new, old),
                    st.params, bp)
                bl = jnp.where(save, va, bl)
                bep = jnp.where(save, e, bep)
                savedany = savedany | save
                fb = stop_now & ~savedany   # guard never passed: stop-time
                bp = jax.tree.map(
                    lambda new, old: jnp.where(_bcast(fb, new), new, old),
                    st.params, bp)
                bl = jnp.where(fb, va, bl)
                stopped = stopped | stop_now
                return ((st, ctrl, stopped, bp, bl, bep, savedany, va),
                        (tr, va, active))

            def skip(carry):
                nans = jnp.full((m,), jnp.nan, f32)
                return carry, (nans, nans, jnp.zeros((m,), bool))

            return jax.lax.cond(jnp.all(carry[2]), skip, live, carry)

        return jax.lax.scan(epoch_step, init, jnp.arange(n_epochs))

    run = jax.jit(whole_run, donate_argnums=(0,))
    t0 = time.perf_counter()
    states0 = jax.jit(jax.vmap(single_init))(jnp.asarray(member_seeds))
    if wds:
        # per-member decay vector (the plateau controller only rewrites the
        # learning_rate entry, so this persists through the whole run)
        hp = dict(states0.opt_state.hyperparams)
        hp["weight_decay"] = jnp.asarray(member_wds_py, jnp.float32)
        states0 = dataclasses.replace(
            states0, opt_state=states0.opt_state._replace(hyperparams=hp))
    final, (tr, va, active) = run(states0)
    states = _set_fold_lrs(final[0], final[1][0])
    bp, bl, bep, savedany, last_va = final[3:8]
    stopped_v = final[2]
    fetch_scalar(va)  # honest sync (utils/sync.py): block_until_ready acks
    # large programs early on this image's relay
    dt = time.perf_counter() - t0
    tr, va, active, bl, bep, savedany, stopped_v, last_va = (
        np.asarray(jax.device_get(x))
        for x in (tr, va, active, bl, bep, savedany, stopped_v, last_va))
    hasb = savedany | stopped_v
    n_live = int(active.any(axis=1).sum())
    bp_host = jax.device_get(bp)
    final_params_host = jax.device_get(states.params)

    members: List[SweepMember] = []
    for i in range(m):
        hist = []
        stop_epoch = -1
        for e in range(n_live):
            if not active[e, i]:
                continue
            stats = EpochStats(float(tr[e, i]), float(va[e, i]), n_steps_tr,
                               n_steps_tr * rows, dt / max(n_live, 1))
            hist.append(stats)
            stop_epoch = e
            if log_cb:
                tag = f"lr{member_lrs_py[i]:g}"
                if wds:
                    tag += f"_wd{member_wds_py[i]:g}"
                log_cb(f"{tag}_s{int(member_seeds[i])}", e, stats)
        if hasb[i]:
            params_i = _slice_fold(bp_host, i)
            loss_i = float(bl[i])
        else:  # epoch budget exhausted without a save: final params
            params_i = _slice_fold(final_params_host, i)
            loss_i = float(last_va[i]) if n_live else float("inf")
        members.append(SweepMember(
            lr=member_lrs_py[i], wd=member_wds_py[i],
            seed=int(member_seeds[i]),
            best_valid_loss=loss_i, best_epoch=int(bep[i]),
            stop_epoch=stop_epoch, history=hist, best_params=params_i))
    winner = int(np.argmin([mm.best_valid_loss for mm in members]))
    return SweepResult(members=members, winner=winner, seconds=dt)


__all__ = ["run_lr_sweep", "SweepResult", "SweepMember"]
