"""Scaled production presets (configs.SCALE_POINTS -> mosei_trans_s*).

The reference runs at exactly one model size (dim 96, cmu-mosei/run.py:37-42).
The scaled presets are beyond-reference: the same flagship architecture grown
to MXU-filling dims, with the measured-faster bfloat16 compute default
(docs/ENGINEERING_NOTES.md "MFU scaling sweep").  These tests pin the preset
surface: registry, family resolution for samplers/corpus adapters, and an
actual train step at the s256 point.
"""

import pytest

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_emotion_processing_tpu import configs
from multimodal_emotion_processing_tpu.data.loader import Batcher
from multimodal_emotion_processing_tpu.data.synthetic import synthetic_dataset
from multimodal_emotion_processing_tpu.models import build_model
from multimodal_emotion_processing_tpu.train import engine as eng


def test_scaled_presets_registered_and_consistent():
    for point, spec in configs.SCALE_POINTS.items():
        name = f"mosei_trans_{point}"
        exp = configs.get(name)
        assert exp.name == name
        assert exp.model.dim == spec["dim"]
        assert exp.model.n_heads == spec["n_heads"]
        assert exp.train.batch_size == spec["batch_size"]
        # bf16 default is the measured win at scale; f32 stays selectable
        assert exp.train.compute_dtype == "bfloat16"
        # bench/scaling.py sweeps the SAME points (single source of truth)
        from multimodal_emotion_processing_tpu.bench.scaling import POINTS
        assert POINTS[point]["dim"] == spec["dim"]
        # eval semantics inherited from the flagship family
        base = configs.get("mosei_trans")
        assert exp.thresholds == base.thresholds
        assert exp.emotion_names == base.emotion_names


def test_family_resolution():
    assert configs.family("mosei_trans_s256") == "mosei_trans"
    assert configs.family("mosei_trans_s1024") == "mosei_trans"
    assert configs.family("mosei_trans") == "mosei_trans"
    assert configs.family("robot_demo") == "robot_demo"


def test_scaled_synthetic_sampler_rides_family():
    exp = configs.get("mosei_trans_s256")
    s = synthetic_dataset(exp.name, exp.model, 2, 0)
    assert s[0]["l"].shape == (2, exp.model.l_len, exp.model.l_dim)
    assert s[0]["a"].shape == (2, exp.model.a_len, exp.model.a_dim)


@pytest.mark.slow
def test_scaled_preset_trains_dp_tp_on_mesh():
    """mosei_trans_s256 composes with dp=4 x tp=2 on the CPU mesh: the
    preset's 8 heads TP-shard (the interesting part at scale), batches shard
    on 'data', and an end-to-end mini experiment (folds + ensemble eval)
    finishes finite in the preset's bf16 compute.  Sequence lengths are
    shortened for CPU time — dim/heads stay the preset's."""
    from multimodal_emotion_processing_tpu.pipelines import run_experiment

    res = run_experiment(
        "mosei_trans_s256", synthetic_data=True, n_train=24, n_test=8,
        epochs=1, quiet=True, dp=4, tp=2,
        overrides={"model": {"l_len": 4, "v_len": 6, "a_len": 8},
                   "train": {"n_folds": 2, "batch_size": 8}})
    losses = [e.valid_loss for h in res.fold_histories for e in h]
    assert losses and all(np.isfinite(losses))
    assert res.report is not None


def test_s256_train_step_runs_and_is_bigger():
    """One real AdamW+ZLPR step at the s256 point (batch shrunk to 2 for CPU
    time): loss finite, params move, and the preset is genuinely a bigger
    model than the flagship."""
    exp = configs.get("mosei_trans_s256")
    exp = dataclasses.replace(
        exp, train=dataclasses.replace(exp.train, batch_size=2))
    model = build_model(exp)
    params = model.init(jax.random.PRNGKey(0))

    def nparams(tree):
        return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))

    base = build_model(configs.get("mosei_trans"))
    assert nparams(params) > 4 * nparams(base.init(jax.random.PRNGKey(0)))

    samples = synthetic_dataset(exp.name, exp.model, 2, 0)
    batch = next(iter(Batcher(samples, 2, shuffle=False, pad_final=False)()))
    tx, step = eng.make_train_step(model, exp.train)
    state = eng.init_state(model, tx, seed=0)
    p0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    state, loss = step(state, jax.device_put(batch))
    assert jnp.isfinite(loss)
    p1 = jax.tree_util.tree_leaves(state.params)
    # some leaf moved (the layer-1 'c' gates have zero gradient by design —
    # scores_prev is None in the first block of every stream)
    assert any(not np.allclose(a, b) for a, b in zip(p0, p1))
