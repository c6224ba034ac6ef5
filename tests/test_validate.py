"""check-data corpus validation (data/validate.py): green on the fixture
trees, precise on sabotaged ones, exit-1 through the CLI."""

import dataclasses
import json
import os
import shutil

import pytest

from multimodal_emotion_processing_tpu import configs
from multimodal_emotion_processing_tpu.data.validate import validate_tree

from corpus_fixtures import (
    build_mosei_tree, build_ren_mme_tree, build_rencecps_tree,
    build_robot_tree,
)


def _model(name, ov):
    return dataclasses.replace(configs.get(name).model, **ov)


MOSEI_OV = {"l_dim": 12, "v_dim": 7, "a_dim": 9, "l_len": 8, "v_len": 10,
            "a_len": 12, "dim": 24, "n_heads": 2}


def test_validate_mosei_fixture_tree(tmp_path):
    build_mosei_tree(tmp_path, _model("mosei_trans", MOSEI_OV))
    rep = validate_tree("mosei_trans", str(tmp_path))
    assert rep["ok"], rep["problems"]
    assert rep["checks"]["labels.txt"]["ok"]
    assert rep["checks"]["text.csd.coverage"]["ok"]
    assert rep["checks"]["standard_test_fold"]["ok"]


def test_validate_reports_all_problems_not_just_first(tmp_path):
    build_mosei_tree(tmp_path, _model("mosei_trans", MOSEI_OV))
    os.remove(tmp_path / "COAVAREP.csd")
    os.remove(tmp_path / "standard_test_fold.txt")
    rep = validate_tree("mosei_trans", str(tmp_path))
    assert not rep["ok"]
    joined = " ".join(rep["problems"])
    assert "COAVAREP" in joined
    # both problems surface in ONE run
    assert any("standard_test_fold" in p for p in rep["problems"])
    # the intact pieces still report ok
    assert rep["checks"]["labels.txt"]["ok"]


def test_validate_rencecps_and_doc_range(tmp_path):
    build_rencecps_tree(tmp_path)
    rep = validate_tree("rencecps", str(tmp_path))
    assert rep["ok"], rep["problems"]
    assert rep["checks"]["doc_range"]["ok"]
    os.remove(tmp_path / "1487_txt_hier_sents_202002" / "cet_1000.txt")
    rep = validate_tree("rencecps", str(tmp_path))
    assert not rep["ok"]
    assert "1000" in rep["checks"]["doc_range"]["detail"]


def test_validate_ren_mme_video_holes_tolerated(tmp_path):
    """The video fallback chain makes holes legal — coverage is reported,
    not failed (Ren-MME/run.py:79-91)."""
    build_ren_mme_tree(tmp_path, _model("ren_mme", {
        "l_len": 4, "v_len": 6, "a_len": 8, "dim": 12, "n_heads": 2,
        "l_dim": 5, "v_dim": 4, "a_dim": 3}))
    rep = validate_tree("ren_mme", str(tmp_path))
    assert rep["ok"], rep["problems"]
    assert "fallback" in rep["checks"]["video_feat.coverage"]["detail"]
    shutil.rmtree(tmp_path / "audio_feat")
    rep = validate_tree("ren_mme", str(tmp_path))
    assert not rep["ok"]
    assert any("audio_feat" in p for p in rep["problems"])


def test_validate_robot_tree(tmp_path):
    build_robot_tree(tmp_path, _model("robot_demo", {
        "l_len": 4, "v_len": 6, "a_len": 8, "dim": 12, "n_heads": 2,
        "l_dim": 5, "v_dim": 4, "a_dim": 3, "v_dims_multires": (4, 6, 8)}))
    rep = validate_tree("robot_demo", str(tmp_path))
    assert rep["ok"], rep["problems"]


def test_validate_missing_root_and_cli(tmp_path, capsys):
    rep = validate_tree("mosei_trans", str(tmp_path / "nope"))
    assert not rep["ok"]

    from multimodal_emotion_processing_tpu.cli import main

    build_mosei_tree(tmp_path, _model("mosei_trans", MOSEI_OV))
    main(["check-data", "mosei_trans", "--data-root", str(tmp_path)])
    out = json.loads(capsys.readouterr().out)
    assert out["ok"]
    os.remove(tmp_path / "labels.txt")
    with pytest.raises(SystemExit):
        main(["check-data", "mosei_trans", "--data-root", str(tmp_path)])
