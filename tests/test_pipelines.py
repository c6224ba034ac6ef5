"""Pipeline + CLI smoke tests (tiny synthetic configs, CPU)."""

import json

import numpy as np
import pytest

from multimodal_emotion_processing_tpu.pipelines import run_experiment


def test_rencecps_pipeline_end_to_end(tmp_path):
    res = run_experiment(
        "rencecps", synthetic_data=True, n_train=48, n_test=16, epochs=2,
        checkpoint_dir=str(tmp_path / "ck"), log_dir=str(tmp_path / "logs"),
        quiet=True,
        overrides={"train": {"n_folds": 2, "batch_size": 8}})
    assert res.report is not None
    assert len(res.fold_histories) == 2
    assert (tmp_path / "ck" / "manifest.json").exists()
    assert (tmp_path / "logs" / "rencecps_1.csv").exists()


def test_mosei_trans_pipeline_tiny():
    res = run_experiment(
        "mosei_trans", synthetic_data=True, n_train=24, n_test=8, epochs=1,
        quiet=True,
        overrides={"model": {"l_len": 4, "v_len": 6, "a_len": 8, "dim": 12,
                             "n_heads": 2, "l_dim": 5, "v_dim": 4, "a_dim": 3},
                   "train": {"n_folds": 2, "batch_size": 8}})
    assert set(res.report["per_emotion"]) == {"happ", "sadn", "ange", "disg",
                                              "surp", "fear"}


@pytest.mark.slow
def test_realformer_pipeline_flattens_clips():
    res = run_experiment(
        "mosei_realformer", synthetic_data=True, n_train=12, n_test=6, epochs=1,
        quiet=True, sweep_thresholds=True,
        overrides={"model": {"l_len": 4, "v_len": 4, "a_len": 4, "dim": 12,
                             "n_heads": 2, "l_dim": 5, "v_dim": 4, "a_dim": 3,
                             "p_len": 3},
                   "train": {"n_folds": 2, "batch_size": 4}})
    assert res.sweep is not None
    assert set(res.sweep) == {"happ", "sadn", "ange", "surp", "disg", "fear"}


@pytest.mark.slow
def test_ren_mme_pipeline_rdrop():
    res = run_experiment(
        "ren_mme", synthetic_data=True, n_train=16, n_test=8, epochs=1,
        quiet=True,
        overrides={"model": {"l_len": 4, "v_len": 6, "a_len": 8, "dim": 16,
                             "n_heads": 2, "l_dim": 5, "v_dim": 4, "a_dim": 3},
                   "train": {"n_folds": 2, "batch_size": 4}})
    assert res.report is not None


ROBOT_OV = {"model": {"l_len": 4, "v_len": 6, "a_len": 8, "dim": 12,
                      "n_heads": 2, "n_layers": 1, "ffn": 1, "l_dim": 5,
                      "a_dim": 4, "v_dims_multires": (3, 5, 7)},
            "train": {"n_folds": 2, "batch_size": 4}}


@pytest.mark.slow
def test_robot_demo_pipeline_and_serve(tmp_path):
    """Full robot path: grid_only head + multires batch keys through training
    and ensemble eval, then the serving path with the reference's calibrated
    sigmoid offsets (robot_demo.py:594-622)."""
    import dataclasses

    import jax

    from multimodal_emotion_processing_tpu import configs
    from multimodal_emotion_processing_tpu.data.synthetic import synthetic_dataset
    from multimodal_emotion_processing_tpu.models import build_model
    from multimodal_emotion_processing_tpu.serve import StreamingPredictor

    res = run_experiment(
        "robot_demo", synthetic_data=True, n_train=16, n_test=8, epochs=1,
        quiet=True, checkpoint_dir=str(tmp_path / "ck"), overrides=ROBOT_OV)
    assert res.report is not None
    assert set(res.report["per_emotion"]) == {"happ", "sadn", "ange", "disg",
                                              "surp", "fear"}

    exp = configs.get("robot_demo")
    exp = dataclasses.replace(
        exp, model=dataclasses.replace(exp.model, **ROBOT_OV["model"]))
    model = build_model(exp)
    params_like = model.init(jax.random.PRNGKey(0))
    store = res.store
    members = [store.restore_params(n, params_like)
               for n in store.best_members("robot_demo")]
    sp = StreamingPredictor(model, members, offsets=exp.thresholds)
    sample = synthetic_dataset("robot_demo", exp.model, 1, seed=3)[0]
    emotions = sp.emotions(sample, exp.emotion_names)
    assert set(emotions) == set(exp.emotion_names)
    assert all(0.0 <= p <= 1.0 for p in emotions.values())


def test_run_logger_writes_tensorboard_by_default(tmp_path):
    """Reference parity: TB scalars always written alongside the txt log
    (cmu-mosei/run.py:397,408)."""
    import os

    from multimodal_emotion_processing_tpu.utils.logging import RunLogger

    class Stats:
        train_loss, valid_loss, samples_per_sec = 1.0, 2.0, 3.0

    lg = RunLogger(str(tmp_path), "run1")
    lg.log_epoch(0, Stats())
    lg.close()
    assert (tmp_path / "run1.csv").exists()
    assert any(f.startswith("events.") for f in os.listdir(tmp_path))


def test_cli_eval_from_checkpoints(tmp_path, capsys):
    """`eval` reloads the trained ensemble members from the store (the
    reference's reload-by-filename step, cmu-mosei/run.py:446-453) and
    reproduces the training run's report without training."""
    import json as _json

    from multimodal_emotion_processing_tpu.cli import main

    common = ["rencecps", "--n-train", "48", "--n-test", "16", "--quiet",
              "--checkpoint-dir", str(tmp_path / "ck"),
              "--set", "train.n_folds=2", "--set", "train.batch_size=8"]
    main(["train", "--epochs", "2"] + common)
    train_out = capsys.readouterr().out
    main(["eval"] + common)
    eval_out = capsys.readouterr().out
    assert _json.loads(train_out) == _json.loads(eval_out)


def test_cli_async_checkpoint_experiment(tmp_path, capsys):
    """`train --async-checkpoint` (per-epoch saves through Orbax's async
    checkpointer) produces a store that a plain `eval` reloads to the same
    report — in-flight saves are joined before any restore/return."""
    import json as _json

    from multimodal_emotion_processing_tpu.cli import main

    common = ["rencecps", "--n-train", "48", "--n-test", "16", "--quiet",
              "--checkpoint-dir", str(tmp_path / "ck"),
              "--set", "train.n_folds=2", "--set", "train.batch_size=8"]
    main(["train", "--epochs", "2", "--async-checkpoint"] + common)
    train_out = capsys.readouterr().out
    main(["eval"] + common)
    eval_out = capsys.readouterr().out
    assert _json.loads(train_out) == _json.loads(eval_out)


def test_run_experiment_deterministic():
    """Two identical runs produce identical loss trajectories — the
    deterministic-data-order check standing in for a race detector on this
    single-controller runtime (SURVEY §5)."""
    kw = dict(synthetic_data=True, n_train=24, n_test=8, epochs=2, quiet=True,
              overrides={"model": {"l_len": 4, "v_len": 6, "a_len": 8,
                                   "dim": 12, "n_heads": 2, "l_dim": 5,
                                   "v_dim": 4, "a_dim": 3},
                         "train": {"n_folds": 2, "batch_size": 8}})
    r1 = run_experiment("mosei_trans", **kw)
    r2 = run_experiment("mosei_trans", **kw)
    t1 = [(e.train_loss, e.valid_loss) for h in r1.fold_histories for e in h]
    t2 = [(e.train_loss, e.valid_loss) for h in r2.fold_histories for e in h]
    assert t1 == t2


def test_cli_configs(capsys):
    from multimodal_emotion_processing_tpu.cli import main

    main(["configs"])
    out = capsys.readouterr().out
    for name in ("mosei_trans", "mosei_realformer", "rencecps", "ren_mme",
                 "robot_demo"):
        assert name in out


def test_cli_parse_overrides():
    from multimodal_emotion_processing_tpu.cli import parse_overrides

    ov = parse_overrides(["train.batch_size=32", "model.n_layers=2",
                          "train.compute_dtype=bfloat16"])
    assert ov["train"]["batch_size"] == 32
    assert ov["model"]["n_layers"] == 2
    assert ov["train"]["compute_dtype"] == "bfloat16"  # non-JSON -> string
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        parse_overrides(["batch_size=32"])  # missing section


def test_run_experiment_one_dispatch():
    """--one-dispatch: the whole k-fold experiment as a single dispatch,
    through the full pipeline (train -> ensemble -> report)."""
    res = run_experiment(
        "rencecps", synthetic_data=True, n_train=44, n_test=16, epochs=2,
        quiet=True, one_dispatch=True,
        overrides={"model": {"dim": 16}, "train": {"batch_size": 8,
                                                   "n_folds": 2}})
    assert res.report is not None
    assert all(len(h) == 2 for h in res.fold_histories)


# ---------------------------------------------------------------------------
# First-class data-parallel training (pipelines --dp/--tp): new-framework
# obligation (SURVEY §2.4; the reference is single-device, cmu-mosei/run.py:18)
# ---------------------------------------------------------------------------

_TINY_DP = {"model": {"l_len": 4, "v_len": 6, "a_len": 8, "dim": 12,
                      "n_heads": 2, "l_dim": 5, "v_dim": 4, "a_dim": 3},
            "train": {"n_folds": 2, "batch_size": 8}}


@pytest.mark.slow
def test_run_experiment_dp8_matches_single_device():
    """run_experiment('mosei_trans', dp=8) over the 8-virtual-device CPU mesh
    trains end-to-end (k folds + ensemble eval) with the SAME trajectory as
    single-device: the sharded step's psum-mean over shards IS the full-batch
    mean, so only f32 reduction-order noise differs."""
    kw = dict(synthetic_data=True, n_train=24, n_test=8, epochs=2, quiet=True,
              overrides=_TINY_DP)
    single = run_experiment("mosei_trans", **kw)
    dp = run_experiment("mosei_trans", dp=8, **kw)
    t1 = np.asarray([(e.train_loss, e.valid_loss)
                     for h in single.fold_histories for e in h])
    t2 = np.asarray([(e.train_loss, e.valid_loss)
                     for h in dp.fold_histories for e in h])
    assert t1.shape == t2.shape and len(t1) > 0
    np.testing.assert_allclose(t2, t1, rtol=2e-4, atol=2e-5)
    assert dp.report is not None


@pytest.mark.slow
def test_run_experiment_dp_tp_mesh_with_checkpoints(tmp_path):
    """dp=4 x tp=2 trains with TP-sharded params, saves best/resume
    checkpoints of sharded state, and a --resume restart on the same mesh
    completes the run (restored host state is re-placed onto the mesh)."""
    kw = dict(synthetic_data=True, n_train=24, n_test=8, quiet=True,
              overrides=_TINY_DP, checkpoint_dir=str(tmp_path / "ck"))
    full = run_experiment("mosei_trans", dp=4, tp=2, epochs=2, **kw)
    assert (tmp_path / "ck" / "manifest.json").exists()
    resumed = run_experiment("mosei_trans", dp=4, tp=2, epochs=3,
                             resume=True, **kw)
    # folds were marked done at epochs=2; resume must not retrain them
    hist_lens = [len(h) for h in resumed.fold_histories]
    assert all(l in (0, 1) for l in hist_lens) or resumed.report is not None
    assert full.report is not None


def test_run_experiment_dp_rejects_indivisible_batch():
    with pytest.raises(ValueError, match="divide"):
        run_experiment("mosei_trans", dp=3, synthetic_data=True, n_train=24,
                       n_test=8, epochs=1, quiet=True, overrides=_TINY_DP)


def test_cli_serve_concurrent(capsys):
    """`serve --concurrent N` routes through the micro-batching server: N
    synthetic requests, emotions printed for the first, batching stats on
    stderr.  --set shrinks the model so the random-member fallback is fast."""
    from multimodal_emotion_processing_tpu.cli import main

    sets = []
    for k, v in ROBOT_OV["model"].items():
        sets += ["--set", f"model.{k}={list(v) if isinstance(v, tuple) else v}"]
    main(["serve", "robot_demo", "--concurrent", "5",
          "--max-delay-ms", "200"] + sets)
    captured = capsys.readouterr()
    assert "request 1 of 5" in captured.out
    for emo in ("happ", "sadn", "fear"):
        assert emo in captured.out
    assert "req/s" in captured.err and "by_bucket" in captured.err


_REALF_OV = {"model": {"l_len": 4, "v_len": 4, "a_len": 4, "dim": 12,
                       "n_heads": 2, "l_dim": 5, "v_dim": 4, "a_dim": 3,
                       "p_len": 3}}


def test_cli_serve_state_transfer_streams_clips(capsys):
    """`serve mosei_realformer` routes through ParagraphStreamingPredictor:
    one synthetic paragraph served clip-by-clip with carried state, one
    emotions line per clip; the stateless fronts are rejected."""
    from multimodal_emotion_processing_tpu.cli import main

    sets = []
    for k, v in _REALF_OV["model"].items():
        sets += ["--set", f"model.{k}={v}"]
    sets += ["--thresholds=0.1,-0.3,-0.5,-0.6,-0.3,-0.5"]
    main(["serve", "mosei_realformer"] + sets)
    captured = capsys.readouterr()
    assert "Streaming paragraph (3 clips" in captured.out
    for t in range(3):
        assert f"clip {t}:" in captured.out
    assert "ms/clip" in captured.err

    with pytest.raises(SystemExit, match="clip-by-clip"):
        main(["serve", "mosei_realformer", "--concurrent", "2"] + sets)


def test_run_experiment_seeds_per_fold(tmp_path):
    """seeds_per_fold=2 through the pipeline: the store carries k*S members
    and the ensemble report covers them all."""
    res = run_experiment(
        "rencecps", synthetic_data=True, n_train=48, n_test=16, epochs=2,
        quiet=True, checkpoint_dir=str(tmp_path / "ck"), seeds_per_fold=2,
        overrides={"model": {"dim": 16},
                   "train": {"n_folds": 2, "batch_size": 8}})
    assert len(res.store.best_members("rencecps")) == 4
    assert len(res.fold_histories) == 4
    assert res.report is not None and "macro_f1" in res.report


def test_run_experiment_resume_vmapped_driver(tmp_path):
    """Default-driver (vmapped) runs are resumable now: the whole-stack
    resume point continues the run instead of silently restarting on the
    sequential driver."""
    kw = dict(synthetic_data=True, n_train=48, n_test=16, quiet=True,
              checkpoint_dir=str(tmp_path / "ck"),
              overrides={"model": {"dim": 16},
                         "train": {"n_folds": 2, "batch_size": 8}})
    run_experiment("rencecps", epochs=2, **kw)
    manifest = (tmp_path / "ck" / "manifest.json").read_text()
    assert "__vmstack" in manifest
    resumed = run_experiment("rencecps", epochs=4, resume=True, **kw)
    # resumed histories cover all 4 epochs (2 restored + 2 new)
    assert all(len(h) == 4 for h in resumed.fold_histories)
    assert resumed.report is not None


def test_mesh_scan_steps_compositions():
    """dp + scan_steps through BOTH drivers: the vmapped host-fed path's
    (s, k, B, ...) sharded chunks (bsh_scan) and the sequential Trainer's
    data_axis=1 stacks — bit-equal to scan_steps=1 on the CPU mesh (scan
    chaining is identical math; the composition itself is what's pinned)."""
    ov = {"train": {"n_folds": 2, "batch_size": 8}, "model": {"dim": 16}}
    kw = dict(synthetic_data=True, n_train=32, n_test=8, epochs=2,
              quiet=True, overrides=ov)
    base = run_experiment("rencecps", dp=4, **kw)
    tb = np.asarray([(e.train_loss, e.valid_loss)
                     for h in base.fold_histories for e in h])
    for extra in (dict(scan_steps=2), dict(scan_steps=2, vmap_folds=False)):
        r = run_experiment("rencecps", dp=4, **extra, **kw)
        t = np.asarray([(e.train_loss, e.valid_loss)
                        for h in r.fold_histories for e in h])
        np.testing.assert_allclose(t, tb, rtol=2e-6, atol=2e-7)
        assert r.report is not None


def test_load_config_file_plain_and_errors(tmp_path):
    """SURVEY §5: configs "resolvable from CLI/JSON" — a JSON document with
    a base-config name plus model/train override sections resolves through
    configs.load_config_file + with_overrides; unknown keys raise."""
    import json as _json

    import pytest

    from multimodal_emotion_processing_tpu import configs

    f = tmp_path / "exp.json"
    f.write_text(_json.dumps({"config": "mosei_trans",
                              "model": {"dim": 12, "n_heads": 2},
                              "train": {"batch_size": 8}}))
    name, ov = configs.load_config_file(str(f))
    assert name == "mosei_trans"
    exp = configs.with_overrides(configs.get(name), ov)
    assert (exp.model.dim, exp.model.n_heads, exp.train.batch_size) == (12, 2, 8)

    bad = tmp_path / "bad.json"
    bad.write_text(_json.dumps({"config": "mosei_trans", "optimizer": "sgd"}))
    with pytest.raises(ValueError, match="unknown top-level"):
        configs.load_config_file(str(bad))


def test_with_overrides_coerces_list_to_tuple():
    """JSON has no tuples: list overrides of tuple-typed fields (e.g.
    model.v_dims_multires from a config file or --set) coerce back so the
    resolved config round-trips dataclass-equal."""
    from multimodal_emotion_processing_tpu import configs

    exp = configs.with_overrides(
        configs.get("robot_demo"),
        {"model": {"v_dims_multires": [16, 32, 64]}})
    assert exp.model.v_dims_multires == (16, 32, 64)
    assert isinstance(exp.model.v_dims_multires, tuple)


def test_apply_config_file_namespace_semantics(tmp_path):
    """apply_config_file: positional .json resolves to (name, prepended
    --set pairs) so explicit --set still wins; missing file / missing name /
    override-less commands fail with a clear message."""
    import argparse
    import json as _json

    import pytest

    from multimodal_emotion_processing_tpu.cli import (apply_config_file,
                                                       parse_overrides)

    f = tmp_path / "exp.json"
    f.write_text(_json.dumps({"config": "rencecps",
                              "model": {"dim": 16},
                              "train": {"batch_size": 8}}))
    args = argparse.Namespace(cmd="train", config=str(f),
                              set=["model.dim=24"])
    apply_config_file(args)
    assert args.config == "rencecps"
    ov = parse_overrides(args.set)
    assert ov["model"]["dim"] == 24  # CLI --set beats the file
    assert ov["train"]["batch_size"] == 8  # file value survives

    # plain registry names (no .json suffix) pass through untouched
    args2 = argparse.Namespace(cmd="train", config="rencecps", set=[])
    apply_config_file(args2)
    assert args2.config == "rencecps" and args2.set == []

    with pytest.raises(SystemExit, match="does not exist"):
        apply_config_file(argparse.Namespace(
            cmd="train", config=str(tmp_path / "missing.json"), set=[]))
    unnamed = tmp_path / "unnamed.json"
    unnamed.write_text(_json.dumps({"train": {"batch_size": 8}}))
    with pytest.raises(SystemExit, match="names no base config"):
        apply_config_file(argparse.Namespace(
            cmd="train", config=str(unnamed), set=[]))
    # commands without --set (e.g. check-data) refuse override-carrying files
    with pytest.raises(SystemExit, match="takes no config overrides"):
        apply_config_file(argparse.Namespace(cmd="check-data", config=str(f)))


def test_cli_config_file_train_and_run_meta_reproduction(tmp_path, capsys):
    """End-to-end: `train <file>.json` trains the file's config, and the
    run's recorded run_meta.json feeds back through load_config_file to
    reproduce the exact resolved ExperimentConfig (field-for-field),
    closing the record->reproduce loop."""
    import json as _json

    from multimodal_emotion_processing_tpu import configs
    from multimodal_emotion_processing_tpu.cli import main

    f = tmp_path / "exp.json"
    f.write_text(_json.dumps({"config": "rencecps",
                              "model": {"dim": 12},
                              "train": {"n_folds": 2, "batch_size": 8,
                                        "epochs": 1}}))
    ck = tmp_path / "ck"
    main(["train", str(f), "--n-train", "24", "--n-test", "8", "--quiet",
          "--checkpoint-dir", str(ck)])
    capsys.readouterr()

    meta_path = ck / "run_meta.json"
    assert meta_path.exists()
    meta = _json.loads(meta_path.read_text())
    assert meta["config"] == "rencecps"
    assert meta["resolved_config"]["model"]["dim"] == 12

    name, ov = configs.load_config_file(str(meta_path))
    reproduced = configs.with_overrides(configs.get(name), ov)
    expected = configs.with_overrides(
        configs.get("rencecps"),
        {"model": {"dim": 12},
         "train": {"n_folds": 2, "batch_size": 8, "epochs": 1}})
    assert reproduced == expected
