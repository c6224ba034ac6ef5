"""Autotune front door: the measured record's structure, winner margins, and
the --tuned CLI merge semantics (explicit flags win, config mismatch fails)."""

import json

import pytest

from multimodal_emotion_processing_tpu.bench import autotune
from multimodal_emotion_processing_tpu import cli


def test_tune_scan_arm_record_structure():
    rec = autotune.tune("rencecps", arms=["scan"], steps=2, reps=1,
                        scan_ks=(2,))
    assert rec["config"] == "rencecps"
    assert rec["platform"]
    pd = rec["measured"]["per_dispatch"]
    assert pd["train_sps"] > 0 and pd["infer_sps"] > 0
    assert set(rec["measured"]["scan_train_sps"]) == {"1", "2"}
    assert rec["winners"]["scan_steps"] in (1, 2)
    # margin rule: a winner other than 1 must actually clear MARGIN
    rows = rec["measured"]["scan_train_sps"]
    if rec["winners"]["scan_steps"] == 2:
        assert rows["2"] >= autotune.MARGIN * rows["1"]


def test_tune_lossy_arm_gated():
    rec = autotune.tune("rencecps", arms=["transfer"], steps=2, reps=1)
    assert "datafed_train_sps" not in rec["measured"]
    assert "transfer_dtype" not in rec["winners"]
    rec = autotune.tune("rencecps", arms=["transfer"], steps=2, reps=1,
                        allow_lossy=True)
    assert set(rec["measured"]["datafed_train_sps"]) == {"float32", "int8",
                                                         "float16"}
    assert rec["winners"]["transfer_dtype"] in (None, "int8", "float16")


@pytest.mark.slow
def test_tune_remat_arm_and_apply(tmp_path):
    """The remat arm measures per-block jax.checkpoint on/off; a True winner
    rides --tuned into the generic --set override (explicit --set wins)."""
    # mosei_trans: remat actually wraps its grid blocks (rencecps has none)
    rec = autotune.tune("mosei_trans", arms=["remat"], steps=2, reps=1)
    rows = rec["measured"]["remat_train_sps"]
    assert rows["on"] > 0 and rows["off"] > 0
    assert isinstance(rec["winners"]["remat"], bool)

    path = _tuned_file(tmp_path, winners={"remat": True})
    args = cli.build_parser().parse_args(
        ["train", "rencecps", "--tuned", path])
    applied = autotune.apply_tuned(args, path)
    assert applied == {"remat": True} and "model.remat=true" in args.set

    args = cli.build_parser().parse_args(
        ["train", "rencecps", "--tuned", path, "--set", "model.remat=false"])
    applied = autotune.apply_tuned(args, path)
    assert applied == {} and args.set == ["model.remat=false"]

    # a False winner applies symmetrically (a tuned remat=false matters when
    # the config default is remat-on, e.g. the scale presets) — ADVICE r4
    path = _tuned_file(tmp_path, winners={"remat": False})
    args = cli.build_parser().parse_args(
        ["train", "rencecps", "--tuned", path])
    applied = autotune.apply_tuned(args, path)
    assert applied == {"remat": False} and "model.remat=false" in args.set


def test_tune_stacked_arm_skipped_for_minus_family():
    rec = autotune.tune("rencecps", arms=["stacked"], steps=2, reps=1)
    assert "stacked_infer_sps" not in rec["measured"]
    assert "stacked" not in rec["winners"]


def _tuned_file(tmp_path, config="rencecps", winners=None):
    path = tmp_path / "tuned.json"
    path.write_text(json.dumps({
        "config": config,
        "winners": winners or {"scan_steps": 32, "impl": "pallas",
                               "transfer_dtype": "int8", "stacked": True},
    }))
    return str(path)


def test_apply_tuned_fills_defaults_only(tmp_path):
    path = _tuned_file(tmp_path)
    args = cli.build_parser().parse_args(
        ["train", "rencecps", "--tuned", path])
    applied = autotune.apply_tuned(args, path)
    assert args.scan_steps == 32 and applied["scan_steps"] == 32
    assert args.impl == "pallas"
    assert args.transfer_dtype == "int8"
    assert "stacked" not in applied  # train has no stacked_grid arg

    # explicit flags win over the file
    args = cli.build_parser().parse_args(
        ["train", "rencecps", "--tuned", path,
         "--scan-steps", "8", "--impl", "cp"])
    applied = autotune.apply_tuned(args, path)
    assert args.scan_steps == 8 and args.impl == "cp"
    assert "scan_steps" not in applied and "impl" not in applied


def test_apply_tuned_serve_stacked(tmp_path):
    path = _tuned_file(tmp_path, config="robot_demo",
                       winners={"stacked": True, "scan_steps": 16})
    args = cli.build_parser().parse_args(["serve", "--tuned", path])
    applied = autotune.apply_tuned(args, path)
    assert args.stacked_grid is True and applied["stacked"] is True
    assert "scan_steps" not in applied  # serve has no scan-steps arg


def test_apply_tuned_config_mismatch(tmp_path):
    path = _tuned_file(tmp_path, config="mosei_trans")
    args = cli.build_parser().parse_args(
        ["train", "rencecps", "--tuned", path])
    with pytest.raises(SystemExit, match="tuned for config"):
        autotune.apply_tuned(args, path)


def test_apply_tuned_losing_winners_are_noops(tmp_path):
    path = _tuned_file(tmp_path, winners={
        "scan_steps": 1, "impl": "xla", "transfer_dtype": None,
        "stacked": False})
    args = cli.build_parser().parse_args(
        ["train", "rencecps", "--tuned", path])
    applied = autotune.apply_tuned(args, path)
    # since configs carry a preferred attn_impl (scale presets default to
    # 'flash'), a measured 'xla' winner is a real PIN, not a no-op — it must
    # override the config preference; the other defaults stay no-ops
    assert applied == {"impl": "xla"}
    assert args.scan_steps == 1 and args.impl == "xla"
    assert args.transfer_dtype is None
