"""k-fold bagging driver: the reference's one-model-per-contiguous-fold scheme
(cmu-mosei/run.py:422-444: shuffle once, carve k fixed-size validation folds,
train one model on the complement of each; realformer uses 20% folds,
others/realformer.py:366-386)."""

from __future__ import annotations

import random
from typing import Callable, List, Optional, Sequence, Tuple

from .engine import Trainer
from .checkpoint import CheckpointStore


def contiguous_folds(n: int, k: int, fold_size: Optional[int] = None
                     ) -> List[Tuple[slice, List[range]]]:
    """Fold i validates on a contiguous slice and trains on the rest.

    With `fold_size` (the reference's explicit 4096/6720/744 carvings),
    fold i validates [i*size, (i+1)*size).  Without it, boundaries follow
    the realformer script's fractional carving `int(n * i/k)`
    (others/realformer.py:368-386) — the LAST fold's validation runs to n,
    so the tail samples ARE validated (and folds can differ by one sample
    when k does not divide n; the vmapped drivers need equal folds and fall
    back in that case — pipelines logs it)."""
    if fold_size is not None and fold_size * k <= n:
        bounds = [i * fold_size for i in range(k + 1)]
    else:
        # int(n * (i/k)) reproduces the reference's int(n*0.2*i) float
        # semantics (i/k rounds to the same double as the 0.2/0.4/... literals)
        bounds = [int(n * (i / k)) for i in range(k)] + [n]
    out = []
    for i in range(k):
        lo, hi = bounds[i], bounds[i + 1]
        out.append((slice(lo, hi), [range(0, lo), range(hi, n)]))
    return out


def run_kfold(
    samples: Sequence,
    make_loaders: Callable,
    model,
    tcfg,
    *,
    store: Optional[CheckpointStore] = None,
    name_prefix: str = "model",
    fold_size: Optional[int] = None,
    epochs: Optional[int] = None,
    impl: str = "xla",
    shuffle_seed: int = 0,
    log_cb=None,
    resume: bool = False,
    scan_steps: int = 1,
    mesh=None,
    tp: bool = False,
    seeds_per_fold: int = 1,
    accum_steps: int = 1,
    transfer_dtype=None,
    profile_dir: Optional[str] = None,
):
    """Train tcfg.n_folds * seeds_per_fold models.
    `make_loaders(train_samples, valid_samples)` -> (train_loader,
    valid_loader) zero-arg callables.

    Returns list of (final TrainState, history) per member; best checkpoints
    go to `store` under '{name_prefix}_{i+1}'.  `seeds_per_fold`
    (beyond-reference): member i trains fold i % tcfg.n_folds with init seed
    tcfg.seed + i — the layout the vmapped driver uses, so the first
    n_folds members are identical to a seeds_per_fold=1 run and extra seeds
    only extend the bagged ensemble.

    With a store, every epoch also persists a resume point (full train state
    + plateau/early-stop schedule); `resume=True` restarts an interrupted
    driver: completed folds are skipped (their best checkpoints stay valid)
    and a mid-fold interruption continues from its last finished epoch with
    params/optimizer/RNG/LR/counters restored.  Loader epoch order restarts
    from the loader's own seed — with shuffle disabled the resumed trajectory
    equals the uninterrupted one exactly (tested).
    """
    import dataclasses

    from . import schedule
    from .engine import init_state

    samples = list(samples)
    rng = random.Random(shuffle_seed)
    rng.shuffle(samples)  # shuffle ONCE, before carving (cmu-mosei/run.py:423)
    results = []
    # one Trainer for all folds: the jitted step compiles once and is reused
    # (per-fold rebuild recompiled XLA programs k times)
    current = {"name": None}

    def last_cb(state, epoch, plateau, stopper):
        store.save_last(current["name"], state, epoch, {
            "plateau": dataclasses.asdict(plateau),
            "stopper": dataclasses.asdict(stopper),
        })

    trainer = Trainer(
        model, tcfg, impl=impl, scan_steps=scan_steps, mesh=mesh, tp=tp,
        accum_steps=accum_steps, transfer_dtype=transfer_dtype,
        profile_dir=profile_dir,
        checkpoint_cb=(lambda state, epoch, vl:
                       store.save_best(current["name"], state, epoch, vl))
        if store is not None else None,
        log_cb=(lambda e, s: log_cb(current["name"], e, s)) if log_cb else None)
    if seeds_per_fold < 1:
        raise ValueError(f"seeds_per_fold must be >= 1, got {seeds_per_fold}")
    folds = contiguous_folds(len(samples), tcfg.n_folds, fold_size)
    for i in range(tcfg.n_folds * seeds_per_fold):
        valid_sl, train_ranges = folds[i % tcfg.n_folds]
        name = f"{name_prefix}_{i + 1}"
        current["name"] = name
        if resume and store is not None and store.is_done(name):
            results.append((None, []))
            continue
        valid = samples[valid_sl]
        train = [samples[j] for r in train_ranges for j in r]
        train_loader, valid_loader = make_loaders(train, valid)
        state = None
        start_epoch = 0
        plateau = stopper = None
        if resume and store is not None:
            restored = store.restore_last(
                name, init_state(model, trainer.tx, seed=tcfg.seed + i,
                                 fused=trainer.fused))
            if restored is not None:
                state, entry = restored
                start_epoch = entry["epoch"] + 1
                sched = entry.get("schedule", {})
                if "plateau" in sched:
                    plateau = schedule.PlateauState(**sched["plateau"])
                if "stopper" in sched:
                    stopper = schedule.EarlyStop(**sched["stopper"])
        state, history = trainer.fit(
            train_loader, valid_loader, epochs=epochs, seed=tcfg.seed + i,
            state=state, start_epoch=start_epoch, plateau=plateau,
            stopper=stopper, last_cb=last_cb if store is not None else None)
        # eval-only passes (epochs=0) must not mark the fold trained — a
        # later --resume would skip it and report the partial checkpoints as
        # a finished run
        if store is not None and (tcfg.epochs if epochs is None else epochs) > 0:
            store.mark_done(name)
        results.append((state, history))
    return results
