"""Engine / eval / serve / checkpoint tests: metrics vs sklearn, ensemble
equivalence, threshold sweep, checkpoint round-trip, k-fold smoke, schedules."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_emotion_processing_tpu import configs
from multimodal_emotion_processing_tpu.data.loader import Batcher
from multimodal_emotion_processing_tpu.data.synthetic import synthetic_dataset
from multimodal_emotion_processing_tpu.eval import Ensemble, threshold_sweep, apply_thresholds
from multimodal_emotion_processing_tpu.eval.report import evaluate, transition_matrix
from multimodal_emotion_processing_tpu.models import build_model
from multimodal_emotion_processing_tpu.serve import StreamingPredictor
from multimodal_emotion_processing_tpu.train import engine as eng
from multimodal_emotion_processing_tpu.train import metrics, schedule
from multimodal_emotion_processing_tpu.train.checkpoint import CheckpointStore
from multimodal_emotion_processing_tpu.train.kfold import contiguous_folds, run_kfold


def tiny_exp(name="rencecps", **overrides):
    exp = configs.get(name)
    m = exp.model
    if name == "rencecps":
        m = dataclasses.replace(m, dim=16)
    else:
        m = dataclasses.replace(m, l_len=4, v_len=6, a_len=8, dim=12, n_heads=2,
                                l_dim=5, v_dim=4, a_dim=3, p_len=3,
                                v_dims_multires=(4, 6, 8))
    t = dataclasses.replace(exp.train, batch_size=8, **overrides)
    return dataclasses.replace(exp, model=m, train=t)


# ---------------------------------------------------------------------------
# metrics vs sklearn
# ---------------------------------------------------------------------------

def test_metrics_match_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, 200)
    p = rng.integers(0, 2, 200)
    assert metrics.accuracy(y, p) == pytest.approx(sk.accuracy_score(y, p))
    assert metrics.weighted_f1(y, p) == pytest.approx(
        sk.f1_score(y, p, average="weighted"))
    Y = rng.integers(0, 2, (100, 8))
    P = rng.integers(0, 2, (100, 8))
    ours = metrics.micro_macro_prf(Y, P)
    assert ours["micro_f1"] == pytest.approx(sk.f1_score(Y, P, average="micro"))
    assert ours["macro_f1"] == pytest.approx(sk.f1_score(Y, P, average="macro"))
    assert ours["micro_precision"] == pytest.approx(
        sk.precision_score(Y, P, average="micro"))
    assert ours["macro_recall"] == pytest.approx(
        sk.recall_score(Y, P, average="macro"))


# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------

def test_plateau_matches_torch_semantics():
    p = schedule.PlateauState(lr=1.0, factor=0.1, patience=2)
    # improving
    assert p.step(1.0) == 1.0
    assert p.step(0.5) == 1.0
    # stagnating: patience 2 -> reduce on the 3rd bad epoch
    assert p.step(0.5) == 1.0
    assert p.step(0.5) == 1.0
    assert p.step(0.5) == pytest.approx(0.1)


def test_early_stop_save_guard_quirk():
    s = schedule.EarlyStop(patience=2, save_guard=0.009)
    save, stop = s.step(0.5)
    assert save and not stop
    # new min BELOW guard: no save AND counter increments (reference `and`)
    save, stop = s.step(0.001)
    assert not save and not stop
    save, stop = s.step(0.002)
    assert not save and stop  # bad == patience


# ---------------------------------------------------------------------------
# ensemble / thresholds
# ---------------------------------------------------------------------------

def test_ensemble_matches_individual_mean():
    exp = tiny_exp("rencecps")
    model = build_model(exp)
    ps = [model.init(jax.random.PRNGKey(i)) for i in range(3)]
    batch = {"feat": jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 2, 16)).astype(np.float32))}
    ens = Ensemble(model, ps)
    got = np.asarray(ens.logits(batch))
    want = np.mean([np.asarray(model.apply(p, batch)) for p in ps], axis=0)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)

    weighted = Ensemble(model, ps[:2], weights=[0.6, 0.4])
    got_w = np.asarray(weighted.logits(batch))
    want_w = 0.6 * np.asarray(model.apply(ps[0], batch)) + \
        0.4 * np.asarray(model.apply(ps[1], batch))
    np.testing.assert_allclose(got_w, want_w, rtol=2e-5, atol=2e-6)


def test_threshold_sweep_and_apply():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((500, 3)).astype(np.float32)
    labels = (logits + 0.3 * rng.standard_normal((500, 3)) > 0.4).astype(np.int32)
    sweep = threshold_sweep(logits, labels, [t / 20 - 1 for t in range(40)],
                            emotion_index=(0, 1, 2), emotion_names=("a", "b", "c"))
    for emo in ("a", "b", "c"):
        assert 0.2 < sweep[emo]["t"] < 0.6  # recovers the generating threshold
        assert sweep[emo]["f1"] > 0.8
    preds = apply_thresholds(logits, [sweep[e]["t"] for e in ("a", "b", "c")],
                             (0, 1, 2))
    assert preds.shape == (500, 3)


def test_evaluate_report_shape():
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((100, 9)).astype(np.float32)
    labels = rng.integers(0, 2, (100, 9))
    rep = evaluate(logits, labels, thresholds=[0.0] * 8,
                   emotion_index=tuple(range(8)),
                   emotion_names=tuple("abcdefgh"))
    assert set(rep["per_emotion"]) == set("abcdefgh")
    assert "micro_f1" in rep and "macro_f1" in rep


# ---------------------------------------------------------------------------
# end-to-end smoke: k-fold train -> checkpoint -> ensemble -> thresholds
# ---------------------------------------------------------------------------

def test_kfold_checkpoint_ensemble_smoke(tmp_path):
    exp = tiny_exp("rencecps", n_folds=2, epochs=999)
    model = build_model(exp)
    samples = synthetic_dataset("rencecps", exp.model, n=64, seed=0)
    store = CheckpointStore(str(tmp_path / "ckpts"))

    def make_loaders(train, valid):
        return (Batcher(train, exp.train.batch_size, seed=1),
                Batcher(valid, exp.train.batch_size, shuffle=False))

    results = run_kfold(samples, make_loaders, model, exp.train, store=store,
                        name_prefix="m", epochs=3)
    assert len(results) == 2
    for _, hist in results:
        assert hist[-1].train_loss < hist[0].train_loss  # learning

    names = store.best_members("m")
    assert names == ["m_1", "m_2"]
    params_like = model.init(jax.random.PRNGKey(0))
    members = [store.restore_params(n, params_like) for n in names]
    ens = Ensemble(model, members)
    test_loader = Batcher(samples[:16], 8, shuffle=False)
    logits = ens.predict_all(test_loader)
    assert logits.shape == (16, 9)
    labels = np.stack([s["label"] for s in samples[:16]])
    rep = evaluate(logits, labels, exp.thresholds, exp.emotion_index,
                   exp.emotion_names)
    assert "per_emotion" in rep
    # transition-matrix dump (T9)
    tm = transition_matrix(members)
    assert tm.shape == (9, 9, 9) and np.isfinite(tm).all()


def test_checkpoint_full_state_roundtrip(tmp_path):
    exp = tiny_exp("rencecps")
    model = build_model(exp)
    tx, step = eng.make_train_step(model, exp.train, donate=False)
    state = eng.init_state(model, tx, seed=3)
    batch = next(iter(Batcher(synthetic_dataset("rencecps", exp.model, 8), 8)()))
    state, _ = step(state, batch)
    store = CheckpointStore(str(tmp_path))
    store.save_best("m", state, epoch=0, valid_loss=1.23)

    fresh = eng.init_state(model, tx, seed=99)
    restored = store.restore_state("m", fresh)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 1
    # resumed state steps identically to the original
    s1, l1 = step(state, batch)
    s2, l2 = step(restored, batch)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_streaming_predictor():
    exp = tiny_exp("robot_demo")
    model = build_model(exp)
    ps = [model.init(jax.random.PRNGKey(i)) for i in range(4)]
    sample = synthetic_dataset("robot_demo", exp.model, 1, seed=5)[0]
    sp = StreamingPredictor(model, ps, offsets=exp.thresholds)
    sp.warmup(sample)
    pred, probs = sp.predict(sample)
    assert pred.shape == (7,) and probs.shape == (6,)
    assert ((probs >= 0) & (probs <= 1)).all()
    emos = sp.emotions(sample, exp.emotion_names)
    assert set(emos) == set(exp.emotion_names)
    # calibrated sigmoid: prob = sigmoid(logit - offset)
    np.testing.assert_allclose(
        probs, 1 / (1 + np.exp(-(pred[:6] - np.asarray(exp.thresholds)))),
        rtol=1e-5)


def _kfold_run(tmp_path, sub, *, epochs, resume=False, n=32, crash_at=None):
    """crash_at=(fold_name, epoch): raise mid-run AFTER that epoch's resume
    point has been saved (simulating preemption)."""
    from multimodal_emotion_processing_tpu.train.kfold import run_kfold

    exp = tiny_exp("rencecps", n_folds=2, epochs=99)
    model = build_model(exp)
    samples = synthetic_dataset("rencecps", exp.model, n, seed=0)
    store = CheckpointStore(str(tmp_path / sub))
    losses = {}

    orig_save_last = store.save_last

    def save_last(name, state, epoch, schedule=None):
        orig_save_last(name, state, epoch, schedule)
        if crash_at is not None and (name, epoch) == crash_at:
            raise KeyboardInterrupt("simulated preemption")

    store.save_last = save_last

    def log_cb(name, epoch, stats):
        losses.setdefault(name, []).append((stats.train_loss, stats.valid_loss))

    def make_loaders(train, valid):
        return (Batcher(train, exp.train.batch_size, shuffle=False),
                Batcher(valid, exp.train.batch_size, shuffle=False))

    results = run_kfold(samples, make_loaders, model, exp.train, store=store,
                        name_prefix="m", epochs=epochs, resume=resume,
                        log_cb=log_cb)
    return results, store, losses


def test_kfold_resume_matches_uninterrupted(tmp_path):
    """Crash mid-fold-1 after epoch 1's resume point, resume: the stitched
    trajectory must EXACTLY equal the uninterrupted run (params/optimizer/
    RNG/LR/counters all restored; shuffle disabled so data order aligns)."""
    full, _, full_losses = _kfold_run(tmp_path, "full", epochs=5)
    try:
        _kfold_run(tmp_path, "resumable", epochs=5, crash_at=("m_1", 1))
        assert False, "crash did not fire"
    except KeyboardInterrupt:
        pass
    resumed, store, res_losses = _kfold_run(tmp_path, "resumable", epochs=5,
                                            resume=True)
    # fold 1: epochs 0-1 before the crash, 2-4 after resume; fold 2: all 5
    assert len(res_losses["m_1"]) == 3 and len(res_losses["m_2"]) == 5
    assert res_losses["m_1"] == full_losses["m_1"][2:]
    assert res_losses["m_2"] == full_losses["m_2"]
    for (s_full, _), (s_res, _) in zip(full, resumed):
        for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                        jax.tree_util.tree_leaves(s_res.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kfold_resume_skips_done_folds(tmp_path):
    _, store, _ = _kfold_run(tmp_path, "ck", epochs=2)
    assert store.is_done("m_1") and store.is_done("m_2")
    resumed, store2, losses = _kfold_run(tmp_path, "ck", epochs=2, resume=True)
    # both folds skipped: no new training happened
    assert all(state is None and hist == [] for state, hist in resumed)
    assert losses == {}
    assert store2.best_members("m") == ["m_1", "m_2"]


def test_export_predictor_roundtrip(tmp_path):
    """AOT serving export: serialize the ensemble predictor to a StableHLO
    blob, deserialize WITHOUT model code, and match the live predictor."""
    from multimodal_emotion_processing_tpu.serve import (
        export_predictor, load_predictor)

    exp = tiny_exp("robot_demo")
    model = build_model(exp)
    ps = [model.init(jax.random.PRNGKey(i)) for i in range(3)]
    sample = synthetic_dataset("robot_demo", exp.model, 1, seed=6)[0]
    sp = StreamingPredictor(model, ps, offsets=exp.thresholds)
    pred_ref, probs_ref = sp.predict(sample)

    blob = export_predictor(model, ps, exp.thresholds, sample,
                            platforms=("cpu",))
    path = tmp_path / "predictor.shlo"
    path.write_bytes(blob)
    fn = load_predictor(path.read_bytes())
    batch1 = {k: np.expand_dims(np.asarray(v), 0) for k, v in sample.items()
              if k != "label"}
    pred, probs = fn(batch1)
    np.testing.assert_allclose(np.asarray(pred), pred_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(probs), probs_ref, rtol=1e-5, atol=1e-5)


def test_export_predictor_bucket_batch(tmp_path):
    """`export --batch N` (N>1): the exported blob runs the micro-batching
    server's bucket program — per-row outputs equal the batch-1 export's
    on the same samples (no cross-sample op in the model family)."""
    from multimodal_emotion_processing_tpu.serve import (
        export_predictor, load_predictor)
    from multimodal_emotion_processing_tpu.serve.server import \
        batched_ensemble_fn

    exp = tiny_exp("robot_demo")
    model = build_model(exp)
    ps = [model.init(jax.random.PRNGKey(i)) for i in range(2)]
    samples = synthetic_dataset("robot_demo", exp.model, 4, seed=7)
    batch = {k: np.stack([np.asarray(s[k]) for s in samples])
             for k in samples[0] if k != "label"}

    blob = export_predictor(model, ps, exp.thresholds, samples[0],
                            platforms=("cpu",), batch_size=4)
    fn = load_predictor(blob)
    pred, probs = fn(batch)
    assert np.asarray(pred).shape[0] == 4

    # oracle: the live bucket program on the same stacked members
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *ps)
    want_pred, want_probs = batched_ensemble_fn(
        model, exp.thresholds)(stacked, batch)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(want_pred),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(want_probs),
                               rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError, match="batch_size"):
        export_predictor(model, ps, exp.thresholds, samples[0],
                         platforms=("cpu",), batch_size=0)


def test_bfloat16_compute_trains():
    import jax.numpy as jnp
    from multimodal_emotion_processing_tpu.data.loader import Batcher
    from multimodal_emotion_processing_tpu.data.synthetic import synthetic_dataset

    exp = tiny_exp("rencecps")
    exp = dataclasses.replace(
        exp, train=dataclasses.replace(exp.train, compute_dtype="bfloat16"))
    model = build_model(exp)
    tx, step = eng.make_train_step(model, exp.train, donate=False)
    state = eng.init_state(model, tx, seed=0)
    batch = next(iter(Batcher(synthetic_dataset("rencecps", exp.model, 8), 8)()))
    losses = []
    for _ in range(10):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # learns in bf16
    # master params stay fp32
    assert all(x.dtype == jnp.float32
               for x in jax.tree_util.tree_leaves(state.params)
               if jnp.issubdtype(x.dtype, jnp.floating))


def test_group_average_crop_protocol():
    from multimodal_emotion_processing_tpu.eval.ensemble import group_average

    logits = np.array([[1.0, 3.0], [3.0, 5.0], [10.0, 20.0]], np.float32)
    labels = np.array([[1, 0], [1, 0], [0, 1]], np.int32)
    # rows 0,1 are two crops of pair 7; row 2 is pair 3 (single crop)
    avg, lab = group_average(logits, [7, 7, 3], labels)
    np.testing.assert_allclose(avg, [[2.0, 4.0], [10.0, 20.0]])
    np.testing.assert_array_equal(lab, [[1, 0], [0, 1]])


def test_fused_optimizer_matches_per_leaf():
    """The flat-vector optimizer path is mathematically identical to per-leaf
    (global-norm clip is global; AdamW is elementwise)."""
    exp = tiny_exp("rencecps")
    model = build_model(exp)
    batch = next(iter(Batcher(synthetic_dataset("rencecps", exp.model, 8), 8)()))
    losses = {}
    for fused in (False, True):
        tx, step = eng.make_train_step(model, exp.train, donate=False,
                                       fused=fused)
        state = eng.init_state(model, tx, seed=0, fused=fused)
        ls = []
        for _ in range(4):
            state, loss = step(state, batch)
            ls.append(float(loss))
        losses[fused] = ls
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5, atol=1e-6)


def test_scan_train_step_matches_sequential():
    """k scanned micro-steps in one dispatch == k sequential dispatches:
    same RNG split chain, same update order, same losses and params."""
    exp = tiny_exp("rencecps")
    model = build_model(exp)
    k = 4
    batches = [next(iter(Batcher(synthetic_dataset("rencecps", exp.model, 8,
                                                   seed=s), 8)()))
               for s in range(k)]

    tx, step = eng.make_train_step(model, exp.train, donate=False)
    state_seq = eng.init_state(model, tx, seed=0)
    seq_losses = []
    for b in batches:
        state_seq, loss = step(state_seq, b)
        seq_losses.append(float(loss))

    tx2, scan_step = eng.make_scan_train_step(model, exp.train, donate=False)
    state_scan = eng.init_state(model, tx2, seed=0)
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *batches)
    state_scan, losses = scan_step(state_scan, stacked)

    np.testing.assert_allclose(np.asarray(losses), seq_losses,
                               rtol=1e-5, atol=1e-6)
    assert int(state_scan.step) == int(state_seq.step) == k
    for a, b in zip(jax.tree_util.tree_leaves(state_scan.params),
                    jax.tree_util.tree_leaves(state_seq.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_trainer_scan_steps_matches_plain():
    """Trainer(scan_steps=k) — k chained steps per dispatch, tail as a smaller
    stack — produces the same per-epoch losses, step counts, and final params
    as the one-dispatch-per-step path."""
    exp = tiny_exp("rencecps")
    samples = synthetic_dataset("rencecps", exp.model, 56, seed=0)
    model = build_model(exp)

    def loaders():
        # 40/8 = 5 train batches -> one stack of 3 + tail of 2;
        # 16/8 = 2 valid batches -> a single tail stack of 2
        tr = Batcher(samples[:40], 8, shuffle=True, seed=5)
        va = Batcher(samples[40:], 8, shuffle=False)
        return (lambda: tr()), (lambda: va())

    results = {}
    for k in (1, 3):
        trainer = eng.Trainer(model, exp.train, scan_steps=k)
        tr, va = loaders()
        state, hist = trainer.fit(tr, va, epochs=2, seed=0)
        results[k] = (hist, state)

    h1, h3 = results[1][0], results[3][0]
    assert len(h1) == len(h3) == 2
    for a, b in zip(h1, h3):
        assert a.steps == b.steps == 5
        np.testing.assert_allclose(a.train_loss, b.train_loss,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(a.valid_loss, b.valid_loss,
                                   rtol=1e-5, atol=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves(results[1][1].params),
                    jax.tree_util.tree_leaves(results[3][1].params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


def test_async_checkpoint_roundtrip(tmp_path):
    exp = tiny_exp("rencecps")
    model = build_model(exp)
    tx, step = eng.make_train_step(model, exp.train, donate=False)
    state = eng.init_state(model, tx, seed=7)
    store = CheckpointStore(str(tmp_path), use_async=True)
    store.save_best("m", state, epoch=0, valid_loss=2.0)
    store.save_best("m2", state, epoch=1, valid_loss=1.5)  # joins first save
    store.wait()
    p = store.restore_params("m2", model.init(jax.random.PRNGKey(0)))
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batcher_deterministic_order():
    """Deterministic-data-order check (SURVEY §5 race-detection analogue):
    same seed -> identical batch stream; different seed -> different order."""
    samples = [{"x": np.full((2,), i, np.float32)} for i in range(32)]
    a = [b["x"][:, 0].tolist() for b in Batcher(samples, 8, seed=3)()]
    b = [b["x"][:, 0].tolist() for b in Batcher(samples, 8, seed=3)()]
    c = [b["x"][:, 0].tolist() for b in Batcher(samples, 8, seed=4)()]
    assert a == b
    assert a != c


def test_report_formatting_and_save(tmp_path):
    import json
    from multimodal_emotion_processing_tpu.eval.report import (
        format_report, save_report)

    rep = {"per_emotion": {"happ": {"acc": 0.9, "f1": 0.8}},
           "micro_f1": 0.7, "macro_f1": 0.6}
    text = format_report(rep, title="t")
    assert "happ_acc: 0.9" in text and "micro_f1: 0.7" in text
    path = str(tmp_path / "r.json")
    save_report(rep, path)
    assert json.load(open(path)) == rep


def test_eval_only_does_not_mark_done(tmp_path):
    """epochs=0 (the eval CLI path) must not mark folds trained — a later
    --resume would otherwise skip training entirely and report the partial
    checkpoints as a finished run."""
    _, store, _ = _kfold_run(tmp_path, "ck0", epochs=0)
    assert not store.is_done("m_1") and not store.is_done("m_2")


def test_save_last_crash_window_falls_back(tmp_path):
    """A preemption that destroys the newest resume slot (the delete-then-
    save window) must fall back to the previous epoch's slot: save_last
    alternates last_a/last_b and keeps the prior manifest entry."""
    import shutil

    from multimodal_emotion_processing_tpu.train import engine as eng

    exp = tiny_exp("rencecps", n_folds=2, epochs=9)
    model = build_model(exp)
    store = CheckpointStore(str(tmp_path / "ck"))
    tx = eng.make_optimizer(exp.train)
    s0 = eng.init_state(model, tx, seed=0)
    s1 = eng.init_state(model, tx, seed=1)
    store.save_last("m_1", s0, 0, {"tag": 0})
    store.save_last("m_1", s1, 1, {"tag": 1})
    # the two epochs landed in different slots
    a = store.manifest["m_1"]["last_prev"]["path"]
    b = store.manifest["m_1"]["last"]["path"]
    assert a != b
    # simulate the crash window: the newest slot is gone/partial
    shutil.rmtree(b)
    restored = store.restore_last("m_1", eng.init_state(model, tx, seed=7))
    assert restored is not None
    state, entry = restored
    assert entry["epoch"] == 0 and entry["schedule"] == {"tag": 0}
    for x, y in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(s0.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_last_after_fallback_preserves_surviving_slot(tmp_path):
    """After a fallback resume (newest slot destroyed), the next save_last
    must overwrite the BROKEN slot, not the surviving one — otherwise a
    second preemption leaves no resume point at all."""
    import shutil

    from multimodal_emotion_processing_tpu.train import engine as eng

    exp = tiny_exp("rencecps", n_folds=2, epochs=9)
    model = build_model(exp)
    store = CheckpointStore(str(tmp_path / "ck"))
    tx = eng.make_optimizer(exp.train)
    states = [eng.init_state(model, tx, seed=i) for i in range(3)]
    store.save_last("m_1", states[0], 0)
    store.save_last("m_1", states[1], 1)
    surviving = store.manifest["m_1"]["last_prev"]["path"]   # epoch 0
    shutil.rmtree(store.manifest["m_1"]["last"]["path"])     # crash window
    store.save_last("m_1", states[2], 2)
    # epoch 2 landed in the broken slot; the surviving epoch-0 slot intact
    assert store.manifest["m_1"]["last"]["epoch"] == 2
    assert store.manifest["m_1"]["last_prev"]["path"] == surviving
    assert store.manifest["m_1"]["last_prev"]["epoch"] == 0
    import os
    assert os.path.isdir(surviving)
    # destroy the new save too: fallback still finds epoch 0
    shutil.rmtree(store.manifest["m_1"]["last"]["path"])
    state, entry = store.restore_last("m_1", eng.init_state(model, tx, seed=9))
    assert entry["epoch"] == 0


def test_restore_last_surfaces_structural_mismatch(tmp_path):
    """A COMPLETE checkpoint that fails to restore (e.g. resuming under a
    changed model config) must raise, not silently retrain from scratch."""
    import pytest

    from multimodal_emotion_processing_tpu.train import engine as eng

    exp = tiny_exp("rencecps", n_folds=2, epochs=9)
    model = build_model(exp)
    store = CheckpointStore(str(tmp_path / "ck"))
    tx = eng.make_optimizer(exp.train)
    store.save_last("m_1", eng.init_state(model, tx, seed=0), 0)
    # a different model FAMILY has a different param tree structure
    other_exp = tiny_exp("ren_mme", n_folds=2, epochs=9)
    other = build_model(other_exp)
    other_tx = eng.make_optimizer(other_exp.train)
    with pytest.raises(Exception):
        store.restore_last("m_1", eng.init_state(other, other_tx, seed=0))


def test_streaming_predictor_stacked_grid_parity():
    """stacked_grid=True traces the stacked realformer fast path (serving
    ~+64% measured); probabilities must equal the unrolled trace.  The robot
    config's UNEQUAL lengths (tiny: 4/6/8) now qualify via pad-to-max."""
    exp = tiny_exp("robot_demo")
    model = build_model(exp)
    ps = [model.init(jax.random.PRNGKey(i)) for i in range(2)]
    sample = synthetic_dataset("robot_demo", exp.model, 1, seed=3)[0]
    plain = StreamingPredictor(model, ps, offsets=exp.thresholds)
    fast = StreamingPredictor(model, ps, offsets=exp.thresholds,
                              stacked_grid=True)
    p0, pr0 = plain.predict(sample)
    p1, pr1 = fast.predict(sample)
    np.testing.assert_allclose(p1, p0, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(pr1, pr0, rtol=2e-5, atol=2e-5)


def test_streaming_predictor_packed_path_parity():
    """predict() ships ONE packed buffer and fetches ONE concatenated output
    (2 round-trips on a relay-attached host vs 8 for the dict path); the
    values must equal predict_unpacked() exactly — same serve_fn, the packed
    program only reshapes the identical bytes."""
    exp = tiny_exp("mosei_trans")
    model = build_model(exp)
    ps = [model.init(jax.random.PRNGKey(i)) for i in range(3)]
    sp = StreamingPredictor(model, ps, offsets=exp.thresholds)
    for seed in (3, 11):
        sample = synthetic_dataset("mosei_trans", exp.model, 1, seed=seed)[0]
        p0, pr0 = sp.predict_unpacked(sample)
        p1, pr1 = sp.predict(sample)
        np.testing.assert_allclose(p1, p0, rtol=0, atol=1e-6)
        np.testing.assert_allclose(pr1, pr0, rtol=0, atol=1e-6)
    assert p1.shape == (exp.model.n_emotions,)
    assert pr1.shape == (len(exp.thresholds),)


def test_streaming_predictor_packed_rejects_shape_drift():
    """The packed program bakes the warmup sample's shapes in; a later
    sample with different shapes must fail loudly, not slice garbage."""
    import pytest

    exp = tiny_exp("mosei_trans")
    model = build_model(exp)
    ps = [model.init(jax.random.PRNGKey(0))]
    sp = StreamingPredictor(model, ps, offsets=exp.thresholds)
    sample = synthetic_dataset("mosei_trans", exp.model, 1, seed=1)[0]
    sp.predict(sample)
    bad = dict(sample)
    bad["a"] = np.concatenate([sample["a"], sample["a"]], axis=-2)
    with pytest.raises(ValueError, match="packed predict"):
        sp.predict(bad)


def test_streaming_predictor_packed_f16_wire():
    """wire_dtype='float16' halves the packed put bytes; probabilities stay
    within feature-quantization tolerance of the f32 wire."""
    exp = tiny_exp("mosei_trans")
    model = build_model(exp)
    ps = [model.init(jax.random.PRNGKey(i)) for i in range(2)]
    sample = synthetic_dataset("mosei_trans", exp.model, 1, seed=5)[0]
    f32 = StreamingPredictor(model, ps, offsets=exp.thresholds)
    f16 = StreamingPredictor(model, ps, offsets=exp.thresholds,
                             wire_dtype="float16")
    assert f16._pack(sample).dtype == np.float16
    p0, pr0 = f32.predict(sample)
    p1, pr1 = f16.predict(sample)
    np.testing.assert_allclose(p1, p0, rtol=0, atol=5e-3)
    np.testing.assert_allclose(pr1, pr0, rtol=0, atol=5e-3)


def test_streaming_predictor_rejects_unservable_configs():
    """Empty offsets (swept-threshold configs) and per-clip paragraph heads
    must error clearly instead of silently serving empty/zero outputs."""
    from multimodal_emotion_processing_tpu.serve.stream import ensemble_serve_fn

    exp = tiny_exp("rencecps")
    model = build_model(exp)
    with pytest.raises(ValueError, match="offsets"):
        StreamingPredictor(model, [model.init(jax.random.PRNGKey(0))],
                           offsets=())

    pexp = tiny_exp("mosei_realformer")
    pmodel = build_model(pexp)
    run = ensemble_serve_fn(pmodel, offsets=(0.1,) * 6)
    stacked = jax.tree.map(lambda *x: jnp.stack(x),
                           *[pmodel.init(jax.random.PRNGKey(0))])
    sample = synthetic_dataset("mosei_realformer", pexp.model, 1, seed=0)[0]
    batch = {k: np.expand_dims(np.asarray(v), 0) for k, v in sample.items()
             if k != "label"}
    with pytest.raises(ValueError, match="paragraph"):
        run(stacked, batch)


def test_contiguous_folds_reference_fractional_carving():
    """Without fold_size, boundaries follow the realformer script's
    int(n * i/k) carving (others/realformer.py:368-386): the LAST fold's
    validation includes the tail."""
    folds = contiguous_folds(103, 5)
    bounds = [(sl.start, sl.stop) for sl, _ in folds]
    assert bounds == [(0, 20), (20, 41), (41, 61), (61, 82), (82, 103)]
    # every sample is validated by exactly one fold
    covered = sorted(x for sl, _ in folds for x in range(sl.start, sl.stop))
    assert covered == list(range(103))
    # explicit fold_size keeps the reference's fixed carving (tail train-only)
    fixed = contiguous_folds(100, 2, fold_size=40)
    assert [(sl.start, sl.stop) for sl, _ in fixed] == [(0, 40), (40, 80)]


def test_resume_does_not_train_past_fired_stop():
    """A restored stopper whose patience already fired must make fit a
    no-op — the uninterrupted run stopped there (resume between the stop
    epoch's save_last and mark_done must not train extra epochs)."""
    exp = tiny_exp("rencecps")
    model = build_model(exp)
    trainer = eng.Trainer(model, exp.train)
    samples = synthetic_dataset("rencecps", exp.model, 16, seed=0)
    loader = lambda: iter(Batcher(samples, 8, shuffle=False)())
    fired = schedule.EarlyStop(patience=2, bad=2, best=0.5)
    state, hist = trainer.fit(loader, loader, epochs=5, start_epoch=3,
                              stopper=fired)
    assert hist == []


def test_fresh_patience_zero_still_trains():
    """A FRESH stopper with early_stop=0 starts with bad == patience == 0;
    the resume no-op guard must not fire (ADVICE r2): the run trains at
    least one epoch and stops on the first non-improving one."""
    exp = tiny_exp("rencecps", early_stop=0)
    model = build_model(exp)
    trainer = eng.Trainer(model, exp.train)
    samples = synthetic_dataset("rencecps", exp.model, 16, seed=0)
    loader = lambda: iter(Batcher(samples, 8, shuffle=False)())
    state, hist = trainer.fit(loader, loader, epochs=5)
    assert len(hist) >= 1


def test_bf16_weighted_loss_keeps_f32_denominator():
    """sample_weight must not be cast to bf16: jnp.sum of 257 ones rounds
    to 256 in bf16, mis-scaling the weighted mean."""
    exp = tiny_exp("rencecps")
    exp = dataclasses.replace(
        exp, train=dataclasses.replace(exp.train, compute_dtype="bfloat16"))
    model = build_model(exp)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    n = 257
    feat = rng.standard_normal((n + 7, 2, exp.model.dim)).astype(np.float32)
    label = rng.integers(0, 2, (n + 7, 9)).astype(np.int32)
    w = np.zeros(n + 7, np.float32)
    w[:n] = 1.0
    padded = {"feat": feat, "label": label, "sample_weight": w}
    unpadded = {"feat": feat[:n], "label": label[:n]}
    lp = float(eng.batch_loss(model, exp.train, params, padded, None, False,
                              "xla"))
    lu = float(eng.batch_loss(model, exp.train, params, unpadded, None, False,
                              "xla"))
    np.testing.assert_allclose(lp, lu, rtol=1e-3)


def test_joint_threshold_grid_matches_reference_loop():
    """joint_threshold_grid == a brute-force replica of the reference's
    nested loops (Ren-MME/run.py:582-613): binarize per combination, score
    sklearn micro+macro F1, keep the FIRST strict maximizer."""
    sk = pytest.importorskip("sklearn.metrics")
    import itertools

    from multimodal_emotion_processing_tpu.eval.ensemble import (
        joint_threshold_grid)

    rng = np.random.default_rng(42)
    n, e = 60, 8
    logits = rng.standard_normal((n, e)).astype(np.float32) * 2 - 1
    labels = (rng.random((n, e)) > 0.6).astype(np.int32)
    grids = [[-1.5, -0.5, 0.5], [-1.0, 0.0], [-0.8, 0.2, 1.0], [-0.3],
             [-2.0, 0.0], [-1.2, -0.2], [0.1, 0.6], [-0.7, 0.3]]
    names = ("love", "anxi", "sorr", "joyy", "expe", "hate", "ange", "surp")

    got = joint_threshold_grid(logits, labels, grids, tuple(range(e)), names)

    best_obj, best_combo, best_micro, best_macro = 0.0, None, 0.0, 0.0
    for combo in itertools.product(*grids):  # C-order == nested-loop order
        bina = (logits > np.asarray(combo)[None, :]).astype(np.int32)
        f1 = (sk.f1_score(labels, bina, average="micro", zero_division=0)
              + sk.f1_score(labels, bina, average="macro", zero_division=0))
        if f1 > best_obj:
            best_obj, best_combo = f1, combo
            best_micro = sk.f1_score(labels, bina, average="micro",
                                     zero_division=0)
            best_macro = sk.f1_score(labels, bina, average="macro",
                                     zero_division=0)
    assert tuple(got["thresholds"][nm] for nm in names) == best_combo
    np.testing.assert_allclose(got["objective"], best_obj, rtol=1e-12)
    np.testing.assert_allclose(got["micro_f1"], best_micro, rtol=1e-12)
    np.testing.assert_allclose(got["macro_f1"], best_macro, rtol=1e-12)


def test_joint_threshold_grid_reference_degenerate():
    """The reference's executed single-value grid reduces to its fixed
    thresholds (Ren-MME/run.py:582-589)."""
    from multimodal_emotion_processing_tpu import configs
    from multimodal_emotion_processing_tpu.eval.ensemble import (
        joint_threshold_grid)

    exp = configs.get("ren_mme")
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((40, 9)).astype(np.float32)
    labels = (rng.random((40, 9)) > 0.5).astype(np.int32)
    grids = [[t] for t in exp.thresholds]
    got = joint_threshold_grid(logits, labels, grids, exp.emotion_index,
                               exp.emotion_names)
    assert [got["thresholds"][n] for n in exp.emotion_names] == \
        list(exp.thresholds)


def test_epoch_stats_counts_real_samples_not_padding():
    """EpochStats.samples excludes zero-weight padding rows (the final
    partial batch pads to batch_size): 20 samples at batch 8 -> 20, not 24."""
    exp = tiny_exp("rencecps")
    model = build_model(exp)
    trainer = eng.Trainer(model, exp.train)
    samples = synthetic_dataset("rencecps", exp.model, 20, seed=0)
    loader = lambda: iter(Batcher(samples, 8, shuffle=False)())
    _, hist = trainer.fit(loader, loader, epochs=1)
    assert hist[0].samples == 20
    assert hist[0].steps == 3  # 8+8+4(padded) rows dispatched


# ---------------------------------------------------------------------------
# dynamic micro-batching server (serve/server.py)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_batching_server_groups_and_matches_batch1():
    """Concurrent submits group into one bucketed batch; every result is
    numerically identical to the batch-1 StreamingPredictor for the same
    members (no cross-row op in any model family)."""
    from multimodal_emotion_processing_tpu.serve import BatchingServer

    exp = tiny_exp("robot_demo")
    model = build_model(exp)
    ps = [model.init(jax.random.PRNGKey(i)) for i in range(3)]
    samples = synthetic_dataset("robot_demo", exp.model, 5, seed=11)
    sp = StreamingPredictor(model, ps, offsets=exp.thresholds)

    with BatchingServer(model, ps, offsets=exp.thresholds,
                        max_delay_ms=500.0, buckets=(1, 2, 4, 8)) as srv:
        srv.warmup(samples[0])
        futs = [srv.submit(s) for s in samples]
        results = [f.result(timeout=60) for f in futs]
        stats = srv.stats()

    assert stats["requests"] == 5
    # all five were in flight before the collector's delay expired -> one
    # batch, padded up to the bucket of 8
    assert stats["batches"] == 1 and stats["by_bucket"][8] == 1
    assert stats["padded_rows"] == 3
    for s, (pred, probs) in zip(samples, results):
        ref_pred, ref_probs = sp.predict(s)
        np.testing.assert_allclose(pred, ref_pred, atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(probs, ref_probs, atol=1e-5, rtol=1e-5)
        assert ((probs >= 0) & (probs <= 1)).all()


def test_batching_server_single_request_and_shutdown():
    from multimodal_emotion_processing_tpu.serve import BatchingServer

    exp = tiny_exp("robot_demo")
    model = build_model(exp)
    ps = [model.init(jax.random.PRNGKey(i)) for i in range(2)]
    sample = synthetic_dataset("robot_demo", exp.model, 1, seed=3)[0]

    srv = BatchingServer(model, ps, offsets=exp.thresholds, max_delay_ms=1.0)
    pred, probs = srv.predict(sample)
    assert pred.shape == (7,) and probs.shape == (6,)
    assert srv.stats()["by_bucket"][1] == 1
    srv.close()
    with pytest.raises(RuntimeError):
        srv.submit(sample)


def test_batching_server_delivers_errors_and_survives():
    """A malformed request resolves its future with the exception; the
    collector thread stays alive for later good requests."""
    from multimodal_emotion_processing_tpu.serve import BatchingServer

    exp = tiny_exp("robot_demo")
    model = build_model(exp)
    ps = [model.init(jax.random.PRNGKey(i)) for i in range(2)]
    good = synthetic_dataset("robot_demo", exp.model, 1, seed=3)[0]
    bad = {k: v[..., :2] if k == "l" else v for k, v in good.items()}

    with BatchingServer(model, ps, offsets=exp.thresholds,
                        max_delay_ms=1.0) as srv:
        with pytest.raises(Exception):
            srv.submit(bad).result(timeout=60)
        pred, _ = srv.predict(good)
        assert pred.shape == (7,)


def test_paragraph_streaming_matches_whole_window():
    """Per-clip stateful streaming equals the whole-window eval logits
    column-for-column (the recurrence carry held on device between calls),
    under the reference's 0.6/0.4 member blend; reset() restarts t=0."""
    from multimodal_emotion_processing_tpu.serve import (
        ParagraphStreamingPredictor)

    exp = tiny_exp("mosei_realformer")
    model = build_model(exp)
    ps = [model.init(jax.random.PRNGKey(i)) for i in range(2)]
    sample = synthetic_dataset("mosei_realformer", exp.model, 1, seed=3)[0]
    batch = {k: np.expand_dims(np.asarray(v), 0) for k, v in sample.items()
             if k != "label"}
    whole = np.stack([np.asarray(jax.jit(model.apply)(p, batch))[0]
                      for p in ps])                       # (k, P, E)
    weights = (0.6, 0.4)  # others/realformer.py:420
    blended = np.einsum("k,kpe->pe", np.asarray(weights), whole)
    offsets = (0.1, -0.3, -0.5, -0.6, -0.3, -0.5)

    sp = ParagraphStreamingPredictor(model, ps, offsets=offsets,
                                     weights=weights)
    plen = sample["l"].shape[0]
    for t in range(plen):
        clip = {k: sample[k][t] for k in
                ("l", "v", "a", "l_mask", "v_mask", "a_mask")}
        pred, probs = sp.push(clip)
        np.testing.assert_allclose(pred, blended[t], rtol=3e-5, atol=3e-5)
        np.testing.assert_allclose(
            probs, 1 / (1 + np.exp(-(pred - np.asarray(offsets)))),
            rtol=1e-5)
    # reset() starts a new paragraph: clip 0 semantics again
    sp.reset()
    clip0 = {k: sample[k][0] for k in
             ("l", "v", "a", "l_mask", "v_mask", "a_mask")}
    pred, _ = sp.push(clip0)
    np.testing.assert_allclose(pred, blended[0], rtol=3e-5, atol=3e-5)
    emos = sp.emotions(clip0, exp.emotion_names)
    assert set(emos) == set(exp.emotion_names)


def test_paragraph_streaming_rejects_wrong_head_and_bad_weights():
    from multimodal_emotion_processing_tpu.serve import (
        ParagraphStreamingPredictor)

    exp = tiny_exp("robot_demo")
    model = build_model(exp)
    with pytest.raises(ValueError, match="state_transfer"):
        ParagraphStreamingPredictor(
            model, [model.init(jax.random.PRNGKey(0))], offsets=(0.1,) * 6)

    pexp = tiny_exp("mosei_realformer")
    pmodel = build_model(pexp)
    ps = [pmodel.init(jax.random.PRNGKey(0))]
    with pytest.raises(ValueError, match="offsets"):
        ParagraphStreamingPredictor(pmodel, ps, offsets=())
    with pytest.raises(ValueError, match="weights"):
        ParagraphStreamingPredictor(pmodel, ps, offsets=(0.1,) * 6,
                                    weights=(0.5, 0.5))


def test_bf16_inference_close_to_f32():
    """dtype="bfloat16" on the inference path (the forward twin of
    train.compute_dtype): logits come back f32, close to the exact-f32
    path; Ensemble casts its stacked members once at construction."""
    exp = tiny_exp("mosei_trans")
    model = build_model(exp)
    ps = [model.init(jax.random.PRNGKey(i)) for i in range(2)]
    samples = synthetic_dataset("mosei_trans", exp.model, 8, seed=0)
    batch = next(iter(Batcher(samples, 8, shuffle=False)()))

    f32 = eng.make_predict_step(model)(ps[0], batch)
    b16 = eng.make_predict_step(model, dtype="bfloat16")(ps[0], batch)
    assert b16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(b16), np.asarray(f32),
                               rtol=0.05, atol=0.05)

    ens32 = Ensemble(model, ps)
    ens16 = Ensemble(model, ps, dtype="bfloat16")
    leaf = jax.tree_util.tree_leaves(ens16.stacked)[0]
    assert leaf.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(ens16.logits(batch)),
                               np.asarray(ens32.logits(batch)),
                               rtol=0.05, atol=0.05)
    # staged bulk scoring shares the member forward -> bf16 rides along
    staged = ens16.predict_all_staged(samples, 8)
    np.testing.assert_allclose(staged, np.asarray(ens16.logits(batch)),
                               rtol=1e-5, atol=1e-5)


def test_bf16_serving_close_to_f32():
    exp = tiny_exp("robot_demo")
    model = build_model(exp)
    ps = [model.init(jax.random.PRNGKey(i)) for i in range(2)]
    sample = synthetic_dataset("robot_demo", exp.model, 1, seed=1)[0]
    p32 = StreamingPredictor(model, ps, offsets=exp.thresholds)
    p16 = StreamingPredictor(model, ps, offsets=exp.thresholds,
                             dtype="bfloat16")
    pred32, probs32 = p32.predict(sample)
    pred16, probs16 = p16.predict(sample)
    assert pred16.dtype == np.float32
    np.testing.assert_allclose(pred16, pred32, rtol=0.05, atol=0.05)
    np.testing.assert_allclose(probs16, probs32, rtol=0.05, atol=0.02)
