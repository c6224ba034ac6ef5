"""Offline batch-prediction front door (pipelines.run_predict, CLI
`predict`, eval/predictions.py).

The reference keeps no per-sample prediction artifact — its eval loops
reduce straight to metrics (cmu-mosei/run.py:456-487) and its only
per-sample output is the demo print (robot_demo.py:594-649).  These tests
pin the table math (calibrated probs = the serving rule
sigmoid(logit - threshold), decisions = eval's logit > threshold), the
three writers, and the checkpoint-restoring pipeline path.
"""

import json

import numpy as np
import pytest

from multimodal_emotion_processing_tpu.eval.ensemble import apply_thresholds
from multimodal_emotion_processing_tpu.eval.predictions import (
    prediction_table, write_predictions)

TINY_MOSEI = {"model": {"l_len": 4, "v_len": 6, "a_len": 8, "dim": 12,
                        "n_heads": 2, "l_dim": 5, "v_dim": 4, "a_dim": 3},
              "train": {"n_folds": 2, "batch_size": 8}}


def test_prediction_table_math():
    rng = np.random.RandomState(0)
    logits = rng.randn(10, 7).astype(np.float32)
    labels = (rng.rand(10, 7) > 0.5).astype(np.float32)
    th = [0.1, -0.3, 0.0]
    idx = [2, 0, 5]
    names = ["a", "b", "c"]
    t = prediction_table(logits, th, idx, names, labels=labels)
    assert t["named_logits"].shape == t["probs"].shape == (10, 3)
    np.testing.assert_allclose(
        t["probs"],
        1 / (1 + np.exp(-(logits[:, idx] - np.asarray(th)))), rtol=1e-6)
    np.testing.assert_array_equal(t["pred"], apply_thresholds(logits, th, idx))
    np.testing.assert_array_equal(t["labels"], labels[:, idx].astype(np.int32))
    # decisions agree with probs > 0.5 (same threshold, sigmoid monotone)
    np.testing.assert_array_equal(t["pred"], (t["probs"] > 0.5).astype(np.int32))


def test_prediction_table_validates_lengths():
    with pytest.raises(ValueError, match="thresholds"):
        prediction_table(np.zeros((2, 4)), [0.0], [0, 1], ["x", "y"])


def test_writers_round_trip(tmp_path):
    rng = np.random.RandomState(1)
    logits = rng.randn(6, 4).astype(np.float32)
    t = prediction_table(logits, [0.0, 0.5], [1, 3], ["joy", "fear"],
                         labels=(rng.rand(6, 4) > 0.5).astype(np.float32))

    npz = str(tmp_path / "p.npz")
    write_predictions(npz, t)
    z = np.load(npz)
    np.testing.assert_array_equal(z["pred"], t["pred"])
    np.testing.assert_allclose(z["probs"], t["probs"], rtol=1e-6)
    assert list(z["emotions"]) == ["joy", "fear"]

    csv = str(tmp_path / "p.csv")
    write_predictions(csv, t)
    lines = open(csv).read().strip().split("\n")
    assert lines[0] == ("index,joy_logit,fear_logit,joy_prob,fear_prob,"
                        "joy_pred,fear_pred,joy_label,fear_label")
    assert len(lines) == 7
    row0 = lines[1].split(",")
    assert int(row0[5]) == int(t["pred"][0, 0])

    jsonl = str(tmp_path / "p.jsonl")
    write_predictions(jsonl, t)
    objs = [json.loads(x) for x in open(jsonl)]
    assert len(objs) == 6
    assert objs[2]["pred"]["fear"] == int(t["pred"][2, 1])
    assert abs(objs[2]["probs"]["joy"] - float(t["probs"][2, 0])) < 1e-6

    with pytest.raises(ValueError, match="format"):
        write_predictions(str(tmp_path / "p.txt"), t)


def test_run_predict_from_checkpoints(tmp_path):
    """Train a tiny 2-fold run, then predict offline from its checkpoints:
    decisions must be exactly apply_thresholds over the table's own logits,
    and the two-crop test pairs must collapse to one row per pair."""
    from multimodal_emotion_processing_tpu.pipelines import (run_experiment,
                                                             run_predict)

    ck = str(tmp_path / "ck")
    run_experiment("mosei_trans", synthetic_data=True, n_train=24, n_test=8,
                   epochs=1, checkpoint_dir=ck, quiet=True,
                   overrides=TINY_MOSEI)
    out = str(tmp_path / "preds.npz")
    t = run_predict("mosei_trans", checkpoint_dir=ck, n_test=8, output=out,
                    overrides=TINY_MOSEI, quiet=True)
    assert t["members"] == 2
    # synthetic mosei_trans test samples are two-crop pairs: rows == pairs
    assert t["rows"] == t["logits"].shape[0]
    from multimodal_emotion_processing_tpu import configs

    exp = configs.get("mosei_trans")
    np.testing.assert_array_equal(
        t["pred"],
        apply_thresholds(t["logits"], t["thresholds"], exp.emotion_index))
    assert t["thresholds"] == [pytest.approx(x) for x in exp.thresholds]
    z = np.load(out)
    np.testing.assert_array_equal(z["pred"], t["pred"])
    assert "labels" in z.files  # synthetic split carries labels


def test_run_predict_real_corpus_tree(tmp_path):
    """Train on a miniature real-layout MOSEI tree, then predict offline
    over its test split: the two-crop pairs must collapse to one row per
    pair (group_average), outputs finite, file written."""
    import dataclasses

    from corpus_fixtures import build_mosei_tree
    from multimodal_emotion_processing_tpu import configs, pipelines

    ov = {"model": {"l_dim": 12, "v_dim": 7, "a_dim": 9, "l_len": 8,
                    "v_len": 10, "a_len": 12, "dim": 24, "n_heads": 2},
          "train": {"batch_size": 8, "n_folds": 2, "fold_size": None}}
    exp = configs.get("mosei_trans")
    build_mosei_tree(tmp_path, dataclasses.replace(exp.model, **ov["model"]),
                     seed=0)
    ck = str(tmp_path / "ck")
    pipelines.run_experiment("mosei_trans", synthetic_data=False,
                             data_root=str(tmp_path), epochs=1, quiet=True,
                             overrides=ov, checkpoint_dir=ck)
    out = str(tmp_path / "p.npz")
    t = pipelines.run_predict("mosei_trans", checkpoint_dir=ck,
                              synthetic_data=False, data_root=str(tmp_path),
                              overrides=ov, output=out, quiet=True)
    assert t["rows"] > 0
    assert np.isfinite(t["logits"]).all()
    _, test_units, _ = pipelines.load_real_data(
        configs.with_overrides(exp, ov), str(tmp_path))
    assert t["rows"] == len({int(s["group"]) for s in test_units})
    assert np.load(out)["pred"].shape == (t["rows"], 6)


def test_calibration_report_matches_bruteforce():
    """ECE + reliability bins vs a direct numpy loop, including the
    p == 1.0 edge landing in the last bin and empty-bin handling."""
    from multimodal_emotion_processing_tpu.eval.predictions import \
        calibration_report

    rng = np.random.RandomState(3)
    n, e = 200, 2
    logits = rng.randn(n, 4).astype(np.float32)
    labels = (rng.rand(n, 4) > 0.5).astype(np.float32)
    t = prediction_table(logits, [0.0, 0.2], [0, 2], ["a", "b"],
                         labels=labels)
    t["probs"][0, 0] = 1.0  # exact-1.0 edge case
    rep = calibration_report(t, n_bins=5)

    for j, name in enumerate(["a", "b"]):
        p, y = t["probs"][:, j].astype(np.float64), t["labels"][:, j]
        want = 0.0
        for b in range(5):
            lo, hi = b / 5, (b + 1) / 5
            m = (p >= lo) & (p < hi) if b < 4 else (p >= lo) & (p <= hi)
            if m.sum():
                want += m.sum() / n * abs(p[m].mean() - y[m].mean())
        assert rep["per_emotion"][name]["ece"] == pytest.approx(want)
        counts = [bb["count"] for bb in rep["per_emotion"][name]["bins"]]
        assert sum(counts) == n
    assert rep["mean_ece"] == pytest.approx(
        np.mean([rep["per_emotion"][k]["ece"] for k in ("a", "b")]))
    # a perfectly-calibrated constant predictor: ECE == |p - base rate|
    t2 = prediction_table(np.zeros((100, 1), np.float32), [0.0], [0], ["x"],
                          labels=np.ones((100, 1), np.float32))
    r2 = calibration_report(t2, n_bins=2)
    assert r2["per_emotion"]["x"]["ece"] == pytest.approx(0.5)

    with pytest.raises(ValueError, match="labels"):
        calibration_report(prediction_table(logits, [0.0], [0], ["a"]))


def test_cli_predict_calibration_flag(tmp_path, capsys):
    from multimodal_emotion_processing_tpu.cli import main

    out = str(tmp_path / "p.npz")
    main(["predict", "rencecps", "--init-random", "--n-test", "16",
          "--output", out, "--calibration", "--quiet"])
    summary = json.loads(capsys.readouterr().out)
    cal = summary["calibration"]
    assert set(cal["per_emotion"]) == set(summary["emotions"])
    assert 0.0 <= cal["mean_ece"] <= 1.0


def test_run_predict_split_selection(tmp_path):
    """--split train/test/all: synthetic splits differ (different seeds);
    on a real mosei tree, the train split's pair-level units flatten with
    fresh crop-group ids (rows == train pairs) and 'all' rebases test
    groups above train's so crop averaging never merges across splits."""
    import dataclasses

    from corpus_fixtures import build_mosei_tree
    from multimodal_emotion_processing_tpu import configs, pipelines

    kw = dict(init_random=True, n_test=8, quiet=True)
    t_test = pipelines.run_predict("rencecps", split="test", **kw)
    t_train = pipelines.run_predict("rencecps", split="train", **kw)
    t_all = pipelines.run_predict("rencecps", split="all", **kw)
    assert not np.allclose(t_test["logits"], t_train["logits"])
    assert t_all["rows"] == t_test["rows"] + t_train["rows"]
    np.testing.assert_allclose(t_all["logits"][:t_train["rows"]],
                               t_train["logits"], rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError, match="split"):
        pipelines.run_predict("rencecps", split="valid", **kw)

    ov = {"model": {"l_dim": 12, "v_dim": 7, "a_dim": 9, "l_len": 8,
                    "v_len": 10, "a_len": 12, "dim": 24, "n_heads": 2},
          "train": {"batch_size": 8, "n_folds": 2, "fold_size": None}}
    exp = configs.get("mosei_trans")
    build_mosei_tree(tmp_path, dataclasses.replace(exp.model, **ov["model"]),
                     seed=0)
    rkw = dict(init_random=True, synthetic_data=False,
               data_root=str(tmp_path), overrides=ov, quiet=True)
    train_units, test_units, _ = pipelines.load_real_data(
        configs.with_overrides(exp, ov), str(tmp_path))
    tr = pipelines.run_predict("mosei_trans", split="train", **rkw)
    assert tr["rows"] == len(train_units)  # one row per PAIR unit
    al = pipelines.run_predict("mosei_trans", split="all", **rkw)
    n_test_pairs = len({int(s["group"]) for s in test_units})
    assert al["rows"] == len(train_units) + n_test_pairs


def test_run_predict_requires_members(tmp_path):
    from multimodal_emotion_processing_tpu.pipelines import run_predict

    with pytest.raises(ValueError, match="checkpoint_dir required"):
        run_predict("rencecps", n_test=8, quiet=True)
    # a store with no members of this config name fails with a named error
    (tmp_path / "empty").mkdir()
    with pytest.raises(ValueError, match="no trained members"):
        run_predict("rencecps", checkpoint_dir=str(tmp_path / "empty"),
                    n_test=8, quiet=True)


def test_run_predict_mesh_dp_matches_single_device():
    """Sharded batch inference (Ensemble(mesh=), predict --dp N): logits over
    an 8-device CPU mesh 'data' axis equal the single-device run — members
    replicate, batches shard, GSPMD partitions the vmapped forward."""
    from multimodal_emotion_processing_tpu.pipelines import run_predict

    kw = dict(n_test=16, init_random=True, quiet=True)
    t1 = run_predict("rencecps", **kw)
    t8 = run_predict("rencecps", dp=8, **kw)
    np.testing.assert_allclose(t8["logits"], t1["logits"],
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_array_equal(t8["pred"], t1["pred"])


def test_run_predict_mesh_dp_rejects_indivisible_batch():
    from multimodal_emotion_processing_tpu.pipelines import run_predict

    with pytest.raises(ValueError, match="divisible"):
        run_predict("rencecps", dp=8, n_test=16, init_random=True,
                    quiet=True, overrides={"train": {"batch_size": 12}})


def test_run_predict_device_resident_matches_host_fed(tmp_path):
    """Staged bulk scoring (Ensemble.predict_all_staged, predict
    --device-resident): one HBM staging + one scan dispatch must reproduce
    the per-batch host-fed logits exactly — including a non-divisible
    sample count exercising the padded tail."""
    from multimodal_emotion_processing_tpu.pipelines import (run_experiment,
                                                             run_predict)

    ck = str(tmp_path / "ck")
    run_experiment("mosei_trans", synthetic_data=True, n_train=24, n_test=8,
                   epochs=1, checkpoint_dir=ck, quiet=True,
                   overrides=TINY_MOSEI)
    kw = dict(checkpoint_dir=ck, n_test=11, overrides=TINY_MOSEI, quiet=True)
    host = run_predict("mosei_trans", **kw)
    staged = run_predict("mosei_trans", device_resident=True, **kw)
    assert staged["rows"] == host["rows"]
    np.testing.assert_allclose(staged["logits"], host["logits"],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(staged["pred"], host["pred"])
    # int8 staging composes: per-sample scales ride the staged dict
    staged_i8 = run_predict("mosei_trans", device_resident=True,
                            transfer_dtype="int8", **kw)
    np.testing.assert_allclose(staged_i8["logits"], host["logits"],
                               rtol=0.3, atol=0.15)


def test_run_predict_device_resident_rejects_dp():
    from multimodal_emotion_processing_tpu.pipelines import run_predict

    with pytest.raises(ValueError, match="does not compose"):
        run_predict("rencecps", init_random=True, n_test=8, dp=8,
                    device_resident=True, quiet=True)


def test_cli_predict_init_random(tmp_path, capsys):
    """`predict --init-random` smoke: writes the file, prints the summary."""
    from multimodal_emotion_processing_tpu.cli import main

    out = str(tmp_path / "p.jsonl")
    main(["predict", "rencecps", "--init-random", "--n-test", "8",
          "--output", out, "--quiet"])
    summary = json.loads(capsys.readouterr().out)
    assert summary["rows"] == 8
    assert summary["members"] == 1
    assert set(summary["positives"]) == set(summary["emotions"])
    assert len(open(out).readlines()) == 8


def test_eval_under_dp_mesh_matches_single_device(tmp_path):
    """`eval --dp 8`: run_experiment(epochs=0) restoring the same trained
    members must produce the identical metric report whether ensemble
    inference runs single-device or sharded over the 8-device CPU mesh."""
    from multimodal_emotion_processing_tpu.pipelines import run_experiment

    ov = {"train": {"n_folds": 2, "batch_size": 8, "fold_size": None}}
    ck = str(tmp_path / "ck")
    run_experiment("rencecps", synthetic_data=True, n_train=32, n_test=16,
                   epochs=1, checkpoint_dir=ck, quiet=True, overrides=ov)
    kw = dict(synthetic_data=True, n_train=32, n_test=16, epochs=0,
              checkpoint_dir=ck, quiet=True, overrides=ov)
    single = run_experiment("rencecps", **kw).report
    sharded = run_experiment("rencecps", dp=8, **kw).report
    assert sharded["macro_f1"] == pytest.approx(single["macro_f1"])
    assert sharded["micro_f1"] == pytest.approx(single["micro_f1"])
    np.testing.assert_allclose(
        [sharded["per_emotion"][e]["f1"] for e in sharded["per_emotion"]],
        [single["per_emotion"][e]["f1"] for e in single["per_emotion"]])


def test_cli_checkpoints_inspection(tmp_path, capsys):
    """`checkpoints <dir>`: manifest-driven store summary — members ranked
    by valid loss, artifact kinds, resume points, disk usage."""
    from multimodal_emotion_processing_tpu.cli import main
    from multimodal_emotion_processing_tpu.pipelines import run_experiment

    ck = str(tmp_path / "ck")
    run_experiment("rencecps", synthetic_data=True, n_train=32, n_test=8,
                   epochs=1, checkpoint_dir=ck, quiet=True,
                   overrides={"train": {"n_folds": 2, "batch_size": 8,
                                        "fold_size": None}})
    main(["checkpoints", ck])
    out = json.loads(capsys.readouterr().out)
    assert len(out["members"]) >= 2
    ranked = out["ranked_by_valid_loss"]
    losses = [out["members"][n]["valid_loss"] for n in ranked]
    assert losses == sorted(losses)
    first = out["members"][ranked[0]]
    assert "params" in first["kinds"]
    assert first["bytes"] > 0 and out["total_bytes"] > 0
    # prefix filter narrows to matching member names
    main(["checkpoints", ck, "--prefix", "rencecps_1"])
    narrowed = json.loads(capsys.readouterr().out)
    assert set(narrowed["members"]) == {
        n for n in out["members"] if n.startswith("rencecps_1")}


def test_best_members_exact_name_matching(tmp_path):
    """best_members must NOT pull sibling artifacts into the ensemble:
    `<cfg>_sweep_winner` (run_lr_sweep_experiment) and scaled-preset
    members `<cfg>_s256_*` share a store with `<cfg>_<i>` fold members;
    a raw startswith would ensemble them (shape-mismatched restore for
    the presets).  Numeric member order: 10 sorts after 2."""
    import jax

    from multimodal_emotion_processing_tpu import configs
    from multimodal_emotion_processing_tpu.models import build_model
    from multimodal_emotion_processing_tpu.train.checkpoint import \
        CheckpointStore

    exp = configs.get("rencecps")
    p = build_model(exp).init(jax.random.PRNGKey(0))
    store = CheckpointStore(str(tmp_path))
    for name in ("cfg_1", "cfg_2", "cfg_10", "cfg_sweep_winner",
                 "cfg_s256_1", "other_1"):
        store.save_params(name, p, valid_loss=1.0)
    assert store.best_members("cfg") == ["cfg_1", "cfg_2", "cfg_10"]
    assert store.best_members("cfg_s256") == ["cfg_s256_1"]
    assert set(store.best_members()) == {"cfg_1", "cfg_2", "cfg_10",
                                         "cfg_sweep_winner", "cfg_s256_1",
                                         "other_1"}


def test_sharding_tree_normalization():
    """put_global_batch's sharding normalization: one Sharding broadcasts
    per leaf; a matching pytree (batch_sharding's dict — the multi-host
    Ensemble path) passes through; a mismatched pytree is rejected."""
    import jax
    from jax.sharding import PartitionSpec as P

    from multimodal_emotion_processing_tpu.parallel.mesh import (
        batch_sharding, make_mesh, replicated_sharding, sharding_tree)

    mesh = make_mesh(n_data=8, n_model=1)
    batch = {"a": np.zeros((8, 3)), "b": np.zeros((8,))}
    one = replicated_sharding(mesh)
    tree = sharding_tree(batch, one)
    assert set(tree) == {"a", "b"} and tree["a"] is one
    per_leaf = batch_sharding(mesh, batch)
    assert sharding_tree(batch, per_leaf) is per_leaf
    assert per_leaf["a"].spec == P("data")
    with pytest.raises(ValueError, match="pytree"):
        sharding_tree(batch, {"a": one})


def test_sweep_only_store_serves_its_winner(tmp_path):
    """A store holding only `<cfg>_sweep_winner` (sweep ran, no k-fold
    train) still predicts/serves: the winner is the fallback single member
    — while a store with BOTH keeps the winner out of the fold ensemble."""
    import jax

    from multimodal_emotion_processing_tpu import configs, pipelines
    from multimodal_emotion_processing_tpu.models import build_model
    from multimodal_emotion_processing_tpu.train.checkpoint import \
        CheckpointStore

    exp = configs.get("rencecps")
    p = build_model(exp).init(jax.random.PRNGKey(5))
    store = CheckpointStore(str(tmp_path))
    store.save_params("rencecps_sweep_winner", p, valid_loss=2.0,
                      imported=False)
    t = pipelines.run_predict("rencecps", checkpoint_dir=str(tmp_path),
                              n_test=8, quiet=True)
    assert t["members"] == 1
    store.save_params("rencecps_1", p, valid_loss=2.1)
    store.save_params("rencecps_2", p, valid_loss=2.2)
    t2 = pipelines.run_predict("rencecps", checkpoint_dir=str(tmp_path),
                               n_test=8, quiet=True)
    assert t2["members"] == 2  # winner excluded once fold members exist


def test_tuned_thresholds_persist_and_flow(tmp_path):
    """A swept eval persists its tuned thresholds as a store artifact
    (thresholds.json); predict and the serve/export offset resolution pick
    them up automatically; explicit thresholds still win; a changed
    emotion set invalidates the artifact.  (The reference hand-edits swept
    values back into its scripts.)"""
    import argparse

    from multimodal_emotion_processing_tpu import configs, pipelines
    from multimodal_emotion_processing_tpu.cli import _resolve_offsets

    ck = str(tmp_path / "ck")
    ov = {"train": {"n_folds": 2, "batch_size": 8, "fold_size": None}}
    res = pipelines.run_experiment(
        "mosei_trans", synthetic_data=True, n_train=24, n_test=16, epochs=1,
        checkpoint_dir=ck, quiet=True, sweep_thresholds=True,
        overrides=TINY_MOSEI)
    assert res.sweep is not None
    exp = configs.get("mosei_trans")
    stored = pipelines.load_tuned_thresholds(ck, "mosei_trans", exp)
    assert stored == [res.sweep[e]["t"] for e in exp.emotion_names]

    t = pipelines.run_predict("mosei_trans", checkpoint_dir=ck,
                              overrides=TINY_MOSEI, n_test=8, quiet=True)
    assert t["thresholds"] == pytest.approx(stored)
    # explicit thresholds still win
    t2 = pipelines.run_predict("mosei_trans", checkpoint_dir=ck,
                               overrides=TINY_MOSEI, n_test=8, quiet=True,
                               thresholds=[0.5] * 6)
    assert t2["thresholds"] == [0.5] * 6

    args = argparse.Namespace(checkpoint_dir=ck, config="mosei_trans")
    assert list(_resolve_offsets(args, exp)) == stored
    args_none = argparse.Namespace(checkpoint_dir=None, config="mosei_trans")
    assert _resolve_offsets(args_none, exp) == exp.thresholds
    # a different config family ignores the artifact
    assert pipelines.load_tuned_thresholds(
        ck, "rencecps", configs.get("rencecps")) is None


def test_run_meta_written_to_artifact_dirs(tmp_path):
    """Every run keeping artifacts records its reproducibility manifest:
    resolved config (post-overrides), driver knobs, data mode, env."""
    from multimodal_emotion_processing_tpu.pipelines import run_experiment

    ck, lg = str(tmp_path / "ck"), str(tmp_path / "logs")
    run_experiment("rencecps", synthetic_data=True, n_train=16, n_test=8,
                   epochs=1, checkpoint_dir=ck, log_dir=lg, quiet=True,
                   scan_steps=2,
                   overrides={"train": {"n_folds": 2, "batch_size": 4,
                                        "fold_size": None}})
    for d in (ck, lg):
        meta = json.load(open(f"{d}/run_meta.json"))
        assert meta["config"] == "rencecps"
        assert meta["resolved_config"]["train"]["batch_size"] == 4
        assert meta["drivers"]["scan_steps"] == 2
        assert meta["data"]["synthetic"] is True
        assert meta["env"]["jax"] and meta["env"]["devices"]
    # the checkpoints CLI surfaces it
    from multimodal_emotion_processing_tpu.cli import main
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["checkpoints", ck])
    assert json.loads(buf.getvalue())["run_meta"] == f"{ck}/run_meta.json"

    # an eval-only pass over the same store (the `eval` CLI path: epochs=0,
    # same --checkpoint-dir) must NOT clobber the training run's provenance
    before = open(f"{ck}/run_meta.json").read()
    run_experiment("rencecps", synthetic_data=True, n_train=16, n_test=8,
                   epochs=0, checkpoint_dir=ck, quiet=True,
                   overrides={"train": {"n_folds": 2, "batch_size": 4,
                                        "fold_size": None}})
    assert open(f"{ck}/run_meta.json").read() == before


def test_cli_predict_requires_member_source(tmp_path):
    from multimodal_emotion_processing_tpu.cli import main

    with pytest.raises(SystemExit, match="checkpoint-dir"):
        main(["predict", "rencecps", "--output", str(tmp_path / "p.npz")])
