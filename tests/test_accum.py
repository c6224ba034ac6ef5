"""Gradient accumulation (engine._accum_value_and_grad): exact full-batch
equivalence, including zero-weight padding rows and the R-Drop KL term."""

import dataclasses

import numpy as np
import pytest

import jax

from multimodal_emotion_processing_tpu import configs
from multimodal_emotion_processing_tpu.data.synthetic import synthetic_dataset
from multimodal_emotion_processing_tpu.models import build_model
from multimodal_emotion_processing_tpu.train.engine import (init_state,
                                                            make_train_step)


def _batch(samples, pad_zero_weight=0):
    """Stack samples struct-of-arrays; optionally append zero-weight padding
    rows like data/loader.Batcher's final partial batch."""
    soa = {k: np.stack([np.asarray(s[k]) for s in samples])
           for k in samples[0]}
    n = len(samples)
    if pad_zero_weight:
        soa = {k: np.concatenate(
            [v, np.zeros((pad_zero_weight,) + v.shape[1:], v.dtype)])
            for k, v in soa.items()}
        w = np.zeros(n + pad_zero_weight, np.float32)
        w[:n] = 1.0
        soa["sample_weight"] = w
    return soa


def _run_steps(exp, batches, accum_steps):
    model = build_model(exp)
    tx, step = make_train_step(model, exp.train, accum_steps=accum_steps,
                               donate=False)
    state = init_state(model, tx, exp.train.seed)
    losses = []
    for b in batches:
        state, loss = step(state, b)
        losses.append(float(loss))
    return state, losses


def test_accum_matches_full_batch_with_padding():
    """accum_steps=4 equals accum_steps=1 exactly (dropout off), including a
    batch whose tail rows are zero-weight padding."""
    exp = configs.get("rencecps")
    exp = dataclasses.replace(
        exp, model=dataclasses.replace(exp.model, dim=16),
        train=dataclasses.replace(exp.train, batch_size=8))
    samples = synthetic_dataset("rencecps", exp.model, n=14, seed=0)
    batches = [_batch(samples[:8]), _batch(samples[8:], pad_zero_weight=2)]

    s1, l1 = _run_steps(exp, batches, accum_steps=1)
    s4, l4 = _run_steps(exp, batches, accum_steps=4)
    np.testing.assert_allclose(l4, l1, rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s4.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-6)


def test_accum_rdrop_kl_exact():
    """The R-Drop KL's pair-weighted denominator is proportional to the
    micro-batch weight total, so the d_i-weighted recombination stays exact
    (dropout forced off for determinism)."""
    exp = configs.get("ren_mme")
    exp = dataclasses.replace(
        exp, model=dataclasses.replace(exp.model, dim=16, l_len=6, v_len=6,
                                       a_len=8, dropout=0.0),
        train=dataclasses.replace(exp.train, batch_size=4))
    samples = synthetic_dataset("ren_mme", exp.model, n=4, seed=1)
    # R-Drop adjacent duplication like data/loader.Batcher(duplicate=True)
    dup = [s for s in samples for _ in range(2)]
    batches = [_batch(dup)]  # 8 rows = 4 duplicate pairs

    s1, l1 = _run_steps(exp, batches, accum_steps=1)
    s2, l2 = _run_steps(exp, batches, accum_steps=2)
    np.testing.assert_allclose(l2, l1, rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s2.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-6)


def test_accum_validation_errors():
    exp = configs.get("rencecps")
    exp = dataclasses.replace(
        exp, model=dataclasses.replace(exp.model, dim=16),
        train=dataclasses.replace(exp.train, batch_size=8))
    samples = synthetic_dataset("rencecps", exp.model, n=8, seed=2)
    with pytest.raises(ValueError, match="must divide"):
        _run_steps(exp, [_batch(samples)], accum_steps=3)

    rexp = configs.get("ren_mme")
    rexp = dataclasses.replace(
        rexp, model=dataclasses.replace(rexp.model, dim=16, l_len=6, v_len=6,
                                        a_len=8),
        train=dataclasses.replace(rexp.train, batch_size=3))
    rsamples = synthetic_dataset("ren_mme", rexp.model, n=3, seed=3)
    dup = [s for s in rsamples for _ in range(2)]  # 6 rows = 3 pairs
    with pytest.raises(ValueError, match="even micro-batches"):
        _run_steps(rexp, [_batch(dup)], accum_steps=2)  # micro of 3 rows


def test_pipeline_accum_matches_plain():
    """run_experiment(accum_steps=2) reproduces the accum_steps=1 sequential
    trajectories (exact recombination; deltas are f32 reduction order)."""
    from multimodal_emotion_processing_tpu.pipelines import run_experiment

    kw = dict(n_train=32, n_test=8, epochs=2, quiet=True, vmap_folds=False,
              overrides={"model": {"dim": 16},
                         "train": {"batch_size": 8, "n_folds": 2}})
    r1 = run_experiment("rencecps", **kw)
    r2 = run_experiment("rencecps", accum_steps=2, **kw)
    for h1, h2 in zip(r1.fold_histories, r2.fold_histories):
        assert len(h1) == len(h2)
        for a, b in zip(h1, h2):
            np.testing.assert_allclose(b.train_loss, a.train_loss,
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(b.valid_loss, a.valid_loss,
                                       rtol=1e-5, atol=1e-5)


def test_trainer_accum_guards():
    """accum_steps doesn't compose with scan_steps or a mesh."""
    from multimodal_emotion_processing_tpu.train.engine import Trainer

    exp = configs.get("rencecps")
    exp = dataclasses.replace(exp,
                              model=dataclasses.replace(exp.model, dim=16))
    model = build_model(exp)
    with pytest.raises(ValueError, match="does not compose"):
        Trainer(model, exp.train, scan_steps=2, accum_steps=2)
