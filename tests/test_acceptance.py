"""Acceptance flow (SURVEY §7.4; eval/acceptance.py) end-to-end on miniature
layout-faithful fixture corpora with torch-oracle `.pt` checkpoints — the
exact flow a reference user runs with the REAL artifacts (docs/REAL_DATA.md
"Acceptance")."""

import dataclasses
import os

import numpy as np
import torch

from multimodal_emotion_processing_tpu import configs
from multimodal_emotion_processing_tpu.eval.acceptance import (
    GOLDEN_DEMO_EXPECTED, run_acceptance)

import torch_reference as tref
from corpus_fixtures import build_mosei_tree, build_robot_tree

MOSEI_OV = {
    "model": {"l_dim": 12, "v_dim": 7, "a_dim": 9, "l_len": 8, "v_len": 10,
              "a_len": 12, "dim": 24, "n_heads": 2},
    "train": {"batch_size": 8, "n_folds": 2, "fold_size": None},
}


def _save_pts(tmp_path, make_oracle, n=2, base_loss=2.18):
    """Reference-convention loss-tagged .pt files ('{name}_{loss:.4s}.pt',
    cmu-mosei/run.py:446-453) from independently-seeded torch oracles."""
    pts = []
    for i in range(n):
        torch.manual_seed(i)
        oracle = make_oracle()
        path = str(tmp_path / f"model_{i + 1}_{base_loss + i / 100:.4}.pt")
        torch.save(oracle.state_dict(), path)
        pts.append(path)
    return pts


def test_acceptance_mosei_torch_import_and_metrics(tmp_path):
    """mosei_trans: validate -> import 2 reference .pt files -> ensemble eval
    with the reference protocol; the report carries per-emotion acc/F1 for
    exactly the reference's evaluated emotion set."""
    exp = configs.get("mosei_trans")
    m = dataclasses.replace(exp.model, **MOSEI_OV["model"])
    root = tmp_path / "corpus"
    build_mosei_tree(root, m, seed=0)
    pts = _save_pts(tmp_path, lambda: tref.ConcatTrans(m))

    report = run_acceptance("mosei_trans", str(root),
                            checkpoint_dir=str(tmp_path / "ck"),
                            torch_ckpts=pts, overrides=MOSEI_OV)
    assert report["ok"] and report["data_check"]["ok"]
    assert report["imported_members"] == ["mosei_trans_1", "mosei_trans_2"]
    # the filename-embedded valid losses rode into the manifest
    per = report["metrics"]["per_emotion"]
    assert set(per) == set(exp.emotion_names)
    for stats in per.values():
        assert 0.0 <= stats["f1"] <= 1.0 and 0.0 <= stats["acc"] <= 1.0


def test_acceptance_robot_golden_demo(tmp_path):
    """robot_demo: the golden-demo block — calibrated serving probabilities
    (sigmoid(logit − offset), robot_demo.py:609) for named corpus clips under
    the imported torch ensemble, reported next to the reference's expected
    output (robot_demo.py:643-649)."""
    ov = {
        "model": {"l_dim": 16, "a_dim": 10, "l_len": 5, "v_len": 6,
                  "a_len": 7, "dim": 18, "n_heads": 3, "n_layers": 1,
                  "ffn": 1, "v_dims_multires": (4, 8, 12)},
        "train": {"batch_size": 4, "n_folds": 2},
    }
    exp = configs.get("robot_demo")
    m = dataclasses.replace(exp.model, **ov["model"])
    root = tmp_path / "corpus"
    os.makedirs(root)
    # full cet_1..1487 doc range: the loader iterates it verbatim
    # (data/robot.ren_label_name_dict), same as the reference
    build_robot_tree(root, m, n_clips=6, seed=4)
    pts = _save_pts(tmp_path, lambda: tref.RobotMultiClass(m), base_loss=1.31)

    report = run_acceptance("robot_demo", str(root),
                            checkpoint_dir=str(tmp_path / "ck"),
                            torch_ckpts=pts, demo_clips=["clip0[0]",
                                                         "clip3[0]"],
                            overrides=ov)
    assert report["ok"] and report["data_check"]["ok"]
    demo = report["golden_demo"]
    assert demo["members"] == ["robot_demo_1", "robot_demo_2"]
    assert demo["reference_expected"] == GOLDEN_DEMO_EXPECTED
    assert set(demo["clips"]) == {"clip0[0]", "clip3[0]"}
    for probs in demo["clips"].values():
        assert set(probs) == set(exp.emotion_names)
        assert all(0.0 <= p <= 1.0 for p in probs.values())


def test_acceptance_bad_tree_fails_closed(tmp_path):
    """A broken corpus stops the flow at the validation step — no import, no
    eval, ok=False (the reference's equivalent is a stack trace halfway
    through loading, cmu-mosei/run.py:45-61)."""
    root = tmp_path / "corpus"
    os.makedirs(root)  # empty: labels.txt and .csd files missing
    report = run_acceptance("mosei_trans", str(root),
                            checkpoint_dir=str(tmp_path / "ck"),
                            overrides=MOSEI_OV)
    assert report["ok"] is False
    assert report["data_check"]["problems"]
    assert "metrics" not in report and "imported_members" not in report


def test_acceptance_refuses_member_clobber(tmp_path):
    """Re-importing over existing members needs force=True (mirrors the
    import-torch CLI contract)."""
    import pytest

    exp = configs.get("mosei_trans")
    m = dataclasses.replace(exp.model, **MOSEI_OV["model"])
    root = tmp_path / "corpus"
    build_mosei_tree(root, m, seed=1)
    pts = _save_pts(tmp_path, lambda: tref.ConcatTrans(m), n=1)

    kw = dict(checkpoint_dir=str(tmp_path / "ck"), torch_ckpts=pts,
              overrides=MOSEI_OV)
    assert run_acceptance("mosei_trans", str(root), **kw)["ok"]
    with pytest.raises(ValueError, match="force"):
        run_acceptance("mosei_trans", str(root), **kw)
    assert run_acceptance("mosei_trans", str(root), force=True, **kw)["ok"]


def test_acceptance_train_from_scratch_mosei(tmp_path):
    """--train-from-scratch: validate -> k-fold train on the real tree with
    the reference protocol -> reference-protocol ensemble eval, ONE report —
    per-fold best valid losses sit next to the reference's recorded ones
    (cmu-mosei/run.py:447-453 filenames) for the side-by-side."""
    from multimodal_emotion_processing_tpu.eval.acceptance import (
        REFERENCE_FOLD_LOSSES)

    exp = configs.get("mosei_trans")
    m = dataclasses.replace(exp.model, **MOSEI_OV["model"])
    root = tmp_path / "corpus"
    build_mosei_tree(root, m, seed=2)

    report = run_acceptance("mosei_trans", str(root),
                            checkpoint_dir=str(tmp_path / "ck"),
                            overrides=MOSEI_OV, train_from_scratch=True,
                            epochs=2)
    assert report["ok"] and report["data_check"]["ok"]
    tr = report["trained"]
    n_folds = MOSEI_OV["train"]["n_folds"]
    assert len(tr["fold_best_valid_losses"]) == n_folds
    assert all(isinstance(x, float) for x in tr["fold_best_valid_losses"])
    assert all(1 <= e <= 2 for e in tr["epochs_ran"])
    assert tr["reference_expected"] == REFERENCE_FOLD_LOSSES["mosei_trans"]
    # the trained ensemble was evaluated with the reference decision protocol
    per = report["metrics"]["per_emotion"]
    assert set(per) == set(exp.emotion_names)
    # trained members landed in the store for later serving/eval
    from multimodal_emotion_processing_tpu.train.checkpoint import (
        CheckpointStore)
    store = CheckpointStore(str(tmp_path / "ck"))
    assert len(store.best_members("mosei_trans")) == n_folds


def test_acceptance_train_from_scratch_robot_golden_demo(tmp_path):
    """robot_demo --train-from-scratch: train on the real tree, then the
    golden-demo block runs on the JUST-TRAINED members (no .pt import)."""
    ov = {
        "model": {"l_dim": 16, "a_dim": 10, "l_len": 5, "v_len": 6,
                  "a_len": 7, "dim": 18, "n_heads": 3, "n_layers": 1,
                  "ffn": 1, "v_dims_multires": (4, 8, 12)},
        "train": {"batch_size": 4, "n_folds": 2},
    }
    exp = configs.get("robot_demo")
    m = dataclasses.replace(exp.model, **ov["model"])
    root = tmp_path / "corpus"
    os.makedirs(root)
    build_robot_tree(root, m, n_clips=6, seed=9)

    report = run_acceptance("robot_demo", str(root),
                            checkpoint_dir=str(tmp_path / "ck"),
                            overrides=ov, train_from_scratch=True, epochs=1,
                            demo_clips=["clip1[0]"])
    assert report["ok"]
    assert len(report["trained"]["fold_best_valid_losses"]) == 2
    demo = report["golden_demo"]
    assert set(demo["clips"]) == {"clip1[0]"}
    assert demo["reference_expected"] == GOLDEN_DEMO_EXPECTED
    for probs in demo["clips"].values():
        assert set(probs) == set(exp.emotion_names)


def test_acceptance_train_from_scratch_rejects_torch_ckpts(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="train-from-scratch"):
        run_acceptance("mosei_trans", str(tmp_path),
                       checkpoint_dir=str(tmp_path / "ck"),
                       torch_ckpts=["x.pt"], train_from_scratch=True)
