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


def test_ren_mme_pipeline_rdrop():
    res = run_experiment(
        "ren_mme", synthetic_data=True, n_train=16, n_test=8, epochs=1,
        quiet=True,
        overrides={"model": {"l_len": 4, "v_len": 6, "a_len": 8, "dim": 16,
                             "n_heads": 2, "l_dim": 5, "v_dim": 4, "a_dim": 3},
                   "train": {"n_folds": 2, "batch_size": 4}})
    assert res.report is not None


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
