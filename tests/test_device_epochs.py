"""Device-resident epoch training (train/device_epochs.py): one dispatch per
epoch over an HBM-staged dataset."""

import dataclasses

import numpy as np

import jax

from multimodal_emotion_processing_tpu import configs
from multimodal_emotion_processing_tpu.data.loader import Batcher
from multimodal_emotion_processing_tpu.data.synthetic import synthetic_dataset
from multimodal_emotion_processing_tpu.models import build_model
from multimodal_emotion_processing_tpu.train import engine as eng
from multimodal_emotion_processing_tpu.train import device_epochs as dev


def tiny_exp(name="rencecps", **tr):
    exp = configs.get(name)
    m = exp.model
    if name == "rencecps":
        m = dataclasses.replace(m, dim=16)
    else:
        m = dataclasses.replace(m, l_len=4, v_len=6, a_len=8, dim=12,
                                n_heads=2, l_dim=5, v_dim=4, a_dim=3)
    t = dataclasses.replace(exp.train, batch_size=8, **tr)
    return dataclasses.replace(exp, model=m, train=t)


def test_stage_dataset_padding():
    samples = [{"x": np.full((3,), i, np.float32)} for i in range(10)]
    data, n = dev.stage_dataset(samples, pad_to_multiple=4)
    assert n == 10
    assert data["x"].shape == (12, 3)
    np.testing.assert_array_equal(np.asarray(data["sample_weight"]),
                                  [1] * 10 + [0] * 2)
    np.testing.assert_array_equal(np.asarray(data["x"][10:]), 0.0)


def test_device_eval_epoch_matches_host_batches():
    """Per-batch eval losses from the staged scan equal the host loader +
    eval_step path on the same params (incl. the padded final batch)."""
    exp = tiny_exp()
    model = build_model(exp)
    samples = synthetic_dataset("rencecps", exp.model, 21, seed=0)  # 21/8: pad
    params = model.init(jax.random.PRNGKey(3))

    host_step = eng.make_eval_step(model, exp.train)
    host = [float(host_step(params, b))
            for b in Batcher(samples, 8, shuffle=False)()]

    data, _ = dev.stage_dataset(samples, pad_to_multiple=8)
    epoch = dev.make_eval_epoch(model, exp.train,
                                int(data["sample_weight"].shape[0]))
    staged = np.asarray(epoch(params, data))
    np.testing.assert_allclose(staged, host, rtol=1e-6, atol=1e-7)


def test_device_train_epoch_learns_and_matches_step_math():
    """The scanned epoch decreases loss, and with a fixed (identity-order)
    permutation its first step equals one make_train_step call on the same
    gathered batch."""
    exp = tiny_exp()
    model = build_model(exp)
    samples = synthetic_dataset("rencecps", exp.model, 32, seed=1)
    tx, epoch = dev.make_train_epoch(model, exp.train, len(samples))
    state = eng.init_state(model, tx, seed=0)

    key = jax.random.PRNGKey(9)
    state1, losses1 = epoch(state, dev.stage_dataset(samples)[0], key)
    assert losses1.shape == (4,)
    assert np.isfinite(np.asarray(losses1)).all()
    for _ in range(6):
        state1, losses = epoch(state1, dev.stage_dataset(samples)[0],
                               jax.random.fold_in(key, 1))
    assert float(np.mean(np.asarray(losses))) < float(
        np.mean(np.asarray(losses1)))

    # cross-check one step: the gathered batch under the device permutation
    # fed through make_train_step gives the same first-step loss
    perm = np.asarray(jax.random.permutation(key, len(samples)))
    batch0 = {k: np.stack([samples[i][k] for i in perm[:8]])
              for k in samples[0]}
    # init from the tx make_train_step RETURNS — its init targets the same
    # optimizer form as the step (engine._wrap_fused_init, round 4)
    tx2, step = eng.make_train_step(model, exp.train, donate=False)
    st = eng.init_state(model, tx2, seed=0)
    _, loss0 = step(st, batch0)
    np.testing.assert_allclose(float(loss0), float(np.asarray(losses1)[0]),
                               rtol=1e-6, atol=1e-7)


def test_device_train_epoch_rdrop_duplicate_rows():
    """duplicate=True draws each sample twice adjacently (R-Drop) — the KL
    term sees two stochastic forwards of the same rows."""
    exp = tiny_exp("ren_mme", rdrop_kl=True)
    model = build_model(exp)
    samples = synthetic_dataset("ren_mme", exp.model, 16, seed=2)
    tx, epoch = dev.make_train_epoch(model, exp.train, len(samples),
                                     duplicate=True)
    state = eng.init_state(model, tx, seed=0)
    data, _ = dev.stage_dataset(samples)
    state, losses = epoch(state, data, jax.random.PRNGKey(0))
    assert losses.shape == (2,)
    assert np.isfinite(np.asarray(losses)).all()


def test_fit_device_resident_driver():
    """The epoch driver mirrors Trainer.fit's schedule contract: plateau LR,
    early stop, save-guarded best checkpoints."""
    exp = tiny_exp(epochs=6, early_stop=2)
    model = build_model(exp)
    samples = synthetic_dataset("rencecps", exp.model, 40, seed=3)
    saved = []
    state, hist = dev.fit_device_resident(
        model, exp.train, samples[:32], samples[32:], seed=0,
        checkpoint_cb=lambda s, e, vl: saved.append((e, vl)))
    assert 1 <= len(hist) <= 6
    assert all(np.isfinite([h.train_loss, h.valid_loss]).all() for h in hist)
    assert saved and saved[0][0] == 0  # first epoch always improves from inf
    # each checkpointed loss strictly improves on the previous one
    vls = [vl for _, vl in saved]
    assert all(b < a for a, b in zip(vls, vls[1:]))


def test_fit_fully_compiled_matches_device_resident():
    """The one-dispatch whole-run driver must reproduce fit_device_resident's
    trajectory exactly: same per-epoch losses, same stop epoch, same best
    (saved) epoch and params — the plateau/early-stop controllers moved
    in-graph are semantics-preserving."""
    exp = tiny_exp(epochs=10, early_stop=3, plateau_patience=1,
                   save_guard=0.009)
    model = build_model(exp)
    train = synthetic_dataset("rencecps", exp.model, 40, seed=1)
    valid = synthetic_dataset("rencecps", exp.model, 13, seed=2)

    saves = []
    ref_state, ref_hist = dev.fit_device_resident(
        model, exp.train, train, valid,
        checkpoint_cb=lambda st, e, vl: saves.append(
            (e, vl, jax.tree.map(np.asarray, st.params))))
    state, hist, best_params, best_epoch, best_loss = dev.fit_fully_compiled(
        model, exp.train, train, valid)

    assert len(hist) == len(ref_hist)
    for a, b in zip(hist, ref_hist):
        np.testing.assert_allclose(a.train_loss, b.train_loss,
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(a.valid_loss, b.valid_loss,
                                   rtol=1e-6, atol=1e-7)
    assert saves, "reference run never saved a best checkpoint"
    ref_e, ref_vl, ref_params = saves[-1]
    assert best_epoch == ref_e
    np.testing.assert_allclose(best_loss, ref_vl, rtol=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves(best_params),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)
    for x, y in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)


def test_fit_fully_compiled_stops_early_and_skips_compute():
    """Epochs after the stop take the no-compute cond branch: the history is
    trimmed and shorter than the requested epoch count."""
    exp = tiny_exp(epochs=30, early_stop=2, plateau_patience=0)
    model = build_model(exp)
    train = synthetic_dataset("rencecps", exp.model, 24, seed=3)
    valid = synthetic_dataset("rencecps", exp.model, 8, seed=4)
    _, hist, _, _, _ = dev.fit_fully_compiled(model, exp.train, train, valid)
    assert 0 < len(hist) < 30
