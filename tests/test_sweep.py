"""Vmapped hyperparameter sweep (train/sweep.py): member semantics,
single-run equivalence, ranking, and the pipelines/CLI front door."""

import pytest

import dataclasses

import numpy as np

from multimodal_emotion_processing_tpu import configs
from multimodal_emotion_processing_tpu.data.synthetic import synthetic_dataset
from multimodal_emotion_processing_tpu.models import build_model
from multimodal_emotion_processing_tpu.train.device_epochs import (
    fit_fully_compiled)
from multimodal_emotion_processing_tpu.train.sweep import run_lr_sweep


def _exp(**train_kw):
    exp = configs.get("rencecps")
    return dataclasses.replace(
        exp,
        model=dataclasses.replace(exp.model, dim=16),
        train=dataclasses.replace(exp.train, batch_size=8, **train_kw))


def _split(exp, n=64, seed=0):
    samples = synthetic_dataset("rencecps", exp.model, n=n, seed=seed)
    return samples[16:], samples[:16]  # train, valid


def test_sweep_member_matches_fully_compiled_run():
    """A seeds_per_lr=1 member at lr == tcfg.lr replays
    fit_fully_compiled's RNG chain and shuffle keys: same trajectory, same
    stop/best epochs (deltas are vmap reduction order only)."""
    exp = _exp(early_stop=2)
    model = build_model(exp)
    train, valid = _split(exp)

    _, hist, _, best_epoch, best_loss = fit_fully_compiled(
        model, exp.train, train, valid, epochs=4)
    res = run_lr_sweep(train, valid, model, exp.train,
                       lrs=[exp.train.lr], epochs=4)
    mem = res.members[0]
    assert res.winner == 0
    assert mem.lr == exp.train.lr and mem.seed == exp.train.seed
    assert len(mem.history) == len(hist)
    for a, b in zip(mem.history, hist):
        np.testing.assert_allclose(a.train_loss, b.train_loss,
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(a.valid_loss, b.valid_loss,
                                   rtol=2e-3, atol=2e-3)
    assert mem.best_epoch == best_epoch
    np.testing.assert_allclose(mem.best_valid_loss, best_loss,
                               rtol=2e-3, atol=2e-3)


def test_sweep_duplicate_lr_members_are_identical():
    """Two members with the same (lr, seed) are the same computation inside
    one vmapped program — identical trajectories, bit for bit."""
    exp = _exp()
    model = build_model(exp)
    train, valid = _split(exp, seed=1)

    res = run_lr_sweep(train, valid, model, exp.train,
                       lrs=[exp.train.lr, exp.train.lr], epochs=3)
    a, b = res.members
    assert [e.valid_loss for e in a.history] == \
        [e.valid_loss for e in b.history]
    assert [e.train_loss for e in a.history] == \
        [e.train_loss for e in b.history]
    assert a.best_valid_loss == b.best_valid_loss


def test_sweep_member_layout_ranking_and_ablation_axes():
    """lrs x seeds layout: member i = (lrs[i // S], seed + i % S); the table
    sorts best-first; LR groups share inits/batch orders so distinct LRs
    produce distinct trajectories from the same start."""
    exp = _exp()
    model = build_model(exp)
    train, valid = _split(exp, seed=2)

    lrs = [1e-3, 1e-5]
    res = run_lr_sweep(train, valid, model, exp.train, lrs=lrs,
                       seeds_per_lr=2, epochs=2)
    assert [m.lr for m in res.members] == [1e-3, 1e-3, 1e-5, 1e-5]
    assert [m.seed for m in res.members] == [exp.train.seed,
                                             exp.train.seed + 1] * 2
    # same seed, different LR: different trajectory (the LR's effect alone)
    tr_a = [e.train_loss for e in res.members[0].history]
    tr_b = [e.train_loss for e in res.members[2].history]
    assert tr_a != tr_b
    table = res.table()
    losses = [row["best_valid_loss"] for row in table]
    assert losses == sorted(losses)
    assert res.members[res.winner].best_valid_loss == losses[0]
    assert table[0]["lr"] == res.members[res.winner].lr


def test_sweep_wd_grid_axis():
    """wds extends the grid to (lr x wd x seed): weight decay rides
    inject_hyperparams like the LR (no recompile, a vector set).  A member
    at the config's default wd reproduces the single-run driver; a wd=0.9
    member diverges from it."""
    exp = _exp()
    model = build_model(exp)
    train, valid = _split(exp, seed=4)

    _, hist, _, _, _ = fit_fully_compiled(model, exp.train, train, valid,
                                          epochs=3)
    res = run_lr_sweep(train, valid, model, exp.train, lrs=[exp.train.lr],
                       wds=[exp.train.weight_decay, 0.9], epochs=3)
    assert [m.wd for m in res.members] == [exp.train.weight_decay, 0.9]
    default_member, heavy_member = res.members
    for a, b in zip(default_member.history, hist):
        np.testing.assert_allclose(a.train_loss, b.train_loss,
                                   rtol=2e-3, atol=2e-3)
    tr_default = [e.train_loss for e in default_member.history]
    tr_heavy = [e.train_loss for e in heavy_member.history]
    assert tr_default != tr_heavy
    assert all("wd" in row for row in res.table())


def test_optimizer_injects_weight_decay():
    """make_optimizer exposes weight_decay as an injected hyperparameter and
    AdamW actually applies it."""
    import dataclasses as dc

    import jax.numpy as jnp

    from multimodal_emotion_processing_tpu.train.engine import make_optimizer

    tcfg = configs.get("rencecps").train
    tx = make_optimizer(tcfg)
    params = jnp.ones((4,))
    state = tx.init(params)
    assert "weight_decay" in state.hyperparams
    grads = jnp.zeros((4,))  # decay-only update isolates the wd term
    upd_default, _ = tx.update(grads, state, params)

    tx9 = make_optimizer(dc.replace(tcfg, weight_decay=0.9))
    upd_heavy, _ = tx9.update(grads, tx9.init(params), params)
    assert float(jnp.abs(upd_heavy).sum()) > float(jnp.abs(upd_default).sum())
    np.testing.assert_allclose(np.asarray(upd_heavy),
                               np.asarray(upd_default) * (0.9 / 0.01),
                               rtol=1e-6)


@pytest.mark.slow
def test_sweep_rdrop_duplicate_matches_fully_compiled():
    """The R-Drop duplication path (Ren-MME semantics) matches the
    single-run driver the same way the plain path does."""
    exp = configs.get("ren_mme")
    exp = dataclasses.replace(
        exp,
        model=dataclasses.replace(exp.model, dim=16, l_len=6, v_len=6,
                                  a_len=8),
        train=dataclasses.replace(exp.train, batch_size=4))
    model = build_model(exp)
    samples = synthetic_dataset("ren_mme", exp.model, n=24, seed=5)
    train, valid = samples[8:], samples[:8]

    _, hist, _, best_epoch, _ = fit_fully_compiled(
        model, exp.train, train, valid, epochs=2, duplicate=True)
    res = run_lr_sweep(train, valid, model, exp.train, lrs=[exp.train.lr],
                       epochs=2, duplicate=True)
    mem = res.members[0]
    assert len(mem.history) == len(hist)
    for a, b in zip(mem.history, hist):
        np.testing.assert_allclose(a.valid_loss, b.valid_loss,
                                   rtol=2e-3, atol=2e-3)
    assert mem.best_epoch == best_epoch


def test_sweep_experiment_front_door(tmp_path):
    """pipelines.run_lr_sweep_experiment: fold-0 split, report dict, winner
    persisted as '<config>_sweep_winner'."""
    from multimodal_emotion_processing_tpu.pipelines import (
        run_lr_sweep_experiment)
    from multimodal_emotion_processing_tpu.train.checkpoint import (
        CheckpointStore)

    out = run_lr_sweep_experiment(
        "rencecps", lrs=[1e-3, 1e-4], n_train=64, epochs=2, quiet=True,
        overrides={"model": {"dim": 16}, "train": {"batch_size": 8}},
        checkpoint_dir=str(tmp_path))
    assert len(out["table"]) == 2
    assert out["winner"]["lr"] in (1e-3, 1e-4)
    assert out["table"][0]["best_valid_loss"] == \
        out["winner"]["best_valid_loss"]
    store = CheckpointStore(str(tmp_path))
    assert "rencecps_sweep_winner" in store.manifest


def test_sweep_cli_parser():
    """The sweep subcommand parses and validates --lrs."""
    from multimodal_emotion_processing_tpu.cli import build_parser

    args = build_parser().parse_args(
        ["sweep", "rencecps", "--lrs", "1e-3,3e-4", "--seeds-per-lr", "2",
         "--wds", "0.0,0.01"])
    assert args.cmd == "sweep" and args.lrs == "1e-3,3e-4"
    assert args.seeds_per_lr == 2 and args.wds == "0.0,0.01"
