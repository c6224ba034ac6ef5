"""End-to-end real-corpus-path tests: miniature on-disk corpus trees
(corpus_fixtures.py) driven through `pipelines.run_experiment(...,
synthetic_data=False)` for all five configs, covering `load_real_data`
including the mosei .csd bindings (cmu-mosei/run.py:45-61), the Ren-CECps
doc-range parsers (rencecps/run.py:30-101), the Ren-MME missing-video
fallback on a real hole in the tree (Ren-MME/run.py:79-91), and the robot
multires/.pk + substitution path (robot_demo.py:56-284)."""

import math
import os

import numpy as np
import pytest

from multimodal_emotion_processing_tpu import configs, pipelines
from multimodal_emotion_processing_tpu.data import mosei_folds

from corpus_fixtures import (
    build_mosei_tree, build_ren_mme_tree, build_rencecps_tree,
    build_robot_tree,
)


def _model(exp, overrides):
    import dataclasses

    return dataclasses.replace(exp.model, **overrides.get("model", {}))


def _run(name, root, overrides, **kw):
    res = pipelines.run_experiment(
        name, synthetic_data=False, data_root=str(root), epochs=1,
        quiet=True, overrides=overrides, **kw)
    for hist in res.fold_histories:
        for ep in hist:
            assert math.isfinite(ep.train_loss)
            assert math.isfinite(ep.valid_loss)
    return res


MOSEI_OV = {
    "model": {"l_dim": 12, "v_dim": 7, "a_dim": 9, "l_len": 8, "v_len": 10,
              "a_len": 12, "dim": 24, "n_heads": 2},
    "train": {"batch_size": 8, "n_folds": 2, "fold_size": None},
}


def test_mosei_trans_real_tree(tmp_path):
    exp = configs.get("mosei_trans")
    build_mosei_tree(tmp_path, _model(exp, MOSEI_OV), seed=0)
    res = _run("mosei_trans", tmp_path, MOSEI_OV)
    assert res.report is not None
    assert set(res.report["per_emotion"]) == set(exp.emotion_names)


@pytest.mark.slow
def test_mosei_realformer_real_tree(tmp_path):
    ov = {
        "model": {"l_dim": 12, "v_dim": 7, "a_dim": 9, "l_len": 10,
                  "v_len": 10, "a_len": 10, "dim": 24, "n_heads": 2,
                  "n_layers": 1, "ffn": 1, "p_len": 3},
        "train": {"batch_size": 8, "n_folds": 2},
    }
    exp = configs.get("mosei_realformer")
    build_mosei_tree(tmp_path, _model(exp, ov), seed=1)
    res = _run("mosei_realformer", tmp_path, ov, sweep_thresholds=True)
    assert res.report is not None and res.sweep is not None


@pytest.fixture(scope="session")
def ren_tree(tmp_path_factory):
    """Shared full-range Ren-CECps tree (tok_dim=16: robot reads raw tokens,
    rencecps flattens to 3*16=48)."""
    root = tmp_path_factory.mktemp("ren_corpus")
    build_rencecps_tree(root, tok_dim=16, seed=2)
    return root


def test_rencecps_real_tree(ren_tree):
    ov = {"model": {"l_dim": 48, "dim": 48},
          "train": {"batch_size": 64, "n_folds": 2, "fold_size": None}}
    res = _run("rencecps", ren_tree, ov)
    assert res.report is not None
    # full doc range parsed: >1000 train pairs materialized
    assert res.fold_histories


@pytest.mark.slow
def test_ren_mme_real_tree(tmp_path):
    ov = {
        "model": {"l_dim": 8, "v_dim": 6, "a_dim": 5, "l_len": 6, "v_len": 7,
                  "a_len": 9, "dim": 16, "n_heads": 2},
        "train": {"batch_size": 4, "n_folds": 2, "fold_size": None},
    }
    exp = configs.get("ren_mme")
    build_ren_mme_tree(tmp_path, _model(exp, ov), seed=3, missing_video="1_1_3")
    res = _run("ren_mme", tmp_path, ov)
    assert res.report is not None


def test_ren_mme_fallback_uses_previous_video(tmp_path):
    """The hole at 1_1_3 must resolve to 1_1_2's features (first candidate in
    the name→prev→next→prev-prev chain, Ren-MME/run.py:79-91)."""
    import dataclasses

    from multimodal_emotion_processing_tpu.data import masking, ren_mme
    from multimodal_emotion_processing_tpu.data.sources import NpyDirSource

    exp = configs.get("ren_mme")
    m = dataclasses.replace(exp.model, l_dim=8, v_dim=6, a_dim=5,
                            l_len=6, v_len=7, a_len=9)
    build_ren_mme_tree(tmp_path, m, seed=3, missing_video="1_1_3")
    asm = ren_mme.RenMmeAssembler(
        m,
        NpyDirSource(os.path.join(tmp_path, "text_feat")),
        NpyDirSource(os.path.join(tmp_path, "video_feat")),
        NpyDirSource(os.path.join(tmp_path, "audio_feat"), transpose=True),
    )
    sample = asm.sample_for("1_1_3", [0] * 9)
    prev_feat = np.load(os.path.join(tmp_path, "video_feat", "1_1_2.npy"))
    expect, _ = masking.pad_or_truncate(prev_feat.astype(np.float32), m.v_len)
    np.testing.assert_array_equal(sample["v"][1], expect)


@pytest.mark.slow
def test_robot_demo_real_tree(ren_tree, tmp_path):
    ov = {
        "model": {"l_dim": 16, "a_dim": 10, "l_len": 5, "v_len": 6,
                  "a_len": 7, "dim": 18, "n_heads": 3, "n_layers": 1,
                  "ffn": 1, "v_dims_multires": (4, 8, 12)},
        "train": {"batch_size": 4, "n_folds": 2},
    }
    # share the session Ren tree via symlinks inside the robot root
    for d in ("1487_txt_hier_sents_202002", "1487_xml_doc_segmented_utf8",
              "ren_text_feat"):
        os.symlink(os.path.join(ren_tree, d), os.path.join(tmp_path, d))
    exp = configs.get("robot_demo")
    build_robot_tree(tmp_path, _model(exp, ov), seed=4)
    res = _run("robot_demo", tmp_path, ov)
    assert res.report is None  # robot has no held-out test split
    assert res.fold_histories


def test_standard_test_fold_resolution(tmp_path):
    path = os.path.join(tmp_path, mosei_folds.FOLD_FILENAME)
    with open(path, "w") as f:
        f.write("# comment\nvidA\nvidB\n\n")
    assert mosei_folds.standard_test_fold(str(tmp_path)) == {"vidA", "vidB"}
    assert mosei_folds.standard_test_fold(explicit=["x"]) == {"x"}
    with pytest.raises(FileNotFoundError, match="standard_test_fold.txt"):
        mosei_folds.standard_test_fold(str(tmp_path / "nope"))


# ---------------------------------------------------------------------------
# The ONE real corpus artifact shipped with the reference:
# /root/reference/cmu-mosei/labels.txt (23,249 lines incl. header).  The
# reference records the expected outcome of parsing it under the standard
# fold: 18,586 train / 4,662 test sentence pairs (comment cmu-mosei/run.py:56).
# The standard test-fold video list itself is mmsdk-distributed and absent
# from this image, so the exact split assertion activates only when a fold
# source is available; everything fold-independent is asserted always.
# ---------------------------------------------------------------------------

REAL_LABELS = "/root/reference/cmu-mosei/labels.txt"

needs_real_labels = pytest.mark.skipif(
    not os.path.exists(REAL_LABELS), reason="reference labels.txt not present")


@needs_real_labels
def test_real_labels_full_parse():
    from multimodal_emotion_processing_tpu.data import mosei

    train, test, labels = mosei.parse_labels(REAL_LABELS, test_videos=set())
    # one (prev, cur) pair per sentence line: the 'no_name' head of each
    # paragraph group adds exactly one slot per group and drops one pair
    # (cmu-mosei/run.py:74-90); 23,248 sentence lines -> 23,248 pairs total,
    # = 18,586 + 4,662 (the reference's recorded split, cmu-mosei/run.py:56)
    assert len(train) == 18586 + 4662 == 23248
    assert len(test) == 0
    assert len(labels) == 23248  # every sentence labeled exactly once
    assert all(len(v) == 7 for v in labels.values())
    # paragraph grouping is by consecutive lines; in the real file every
    # video's lines are contiguous, so groups == videos == 3,292
    starts = [p for p in train if p[0] == mosei.NO_NAME]
    assert len(starts) == 3292
    # within-video chain: each pair's previous is the preceding pair's current
    chains = {}
    for prev, cur in train:
        vid = cur.split("[")[0]
        if prev == mosei.NO_NAME:
            chains[vid] = [prev, cur]
        else:
            assert chains[vid][-1] == prev, (vid, prev)
            chains[vid].append(cur)
    assert len(chains) == 3292


@needs_real_labels
def test_real_labels_time_sorted_spot_check():
    """Ordering spot-check on a real video whose file order != time order:
    -3g5yACwYnA's six clips appear as [0]@82.753, [1]@119.919, [2]@4.840,
    [3]@13.211, [4]@26.541, [5]@74.083 (labels.txt:3-5 and two later lines) —
    time-sorting must chain [2]->[3]->[4]->[5]->[0]->[1]."""
    from multimodal_emotion_processing_tpu.data import mosei

    train, _, _ = mosei.parse_labels(REAL_LABELS, test_videos=set())
    vid_pairs = [p for p in train if p[1].startswith("-3g5yACwYnA[")]
    got = [vid_pairs[0][0]] + [p[1] for p in vid_pairs]
    want = [mosei.NO_NAME] + [f"-3g5yACwYnA[{i}]" for i in (2, 3, 4, 5, 0, 1)]
    assert got == want


@needs_real_labels
def test_real_labels_standard_split_counts(tmp_path):
    """The reference-recorded 18,586/4,662 split (cmu-mosei/run.py:56) —
    exact when a standard-fold source exists (fold file or mmsdk)."""
    from multimodal_emotion_processing_tpu.data import mosei

    try:
        fold = mosei_folds.standard_test_fold()
    except FileNotFoundError:
        pytest.skip("standard test-fold list unavailable in this image "
                    "(needs mmsdk or a standard_test_fold.txt)")
    train, test, _ = mosei.parse_labels(REAL_LABELS, test_videos=fold)
    assert len(train) == 18586
    assert len(test) == 4662
