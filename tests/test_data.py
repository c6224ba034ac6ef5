"""Data-layer tests: masking semantics, corpus parsers over synthetic
filesystem fixtures, batcher behavior."""

import os
import pickle

import numpy as np
import pytest

from multimodal_emotion_processing_tpu import configs
from multimodal_emotion_processing_tpu.data import masking, mosei, rencecps, ren_mme, robot
from multimodal_emotion_processing_tpu.data.loader import Batcher
from multimodal_emotion_processing_tpu.data.sources import (
    DictSource, SyntheticSource, NpyDirSource)


# ---------------------------------------------------------------------------
# masking
# ---------------------------------------------------------------------------

def test_summary_masking_short_sequence():
    m = np.arange(12, dtype=np.float32).reshape(4, 3)
    feats, masks = masking.summary_masking(m, m_len=10)
    assert len(feats) == 1
    f, mk = feats[0], masks[0]
    assert f.shape == (10, 3)
    np.testing.assert_array_equal(f[0], m.max(0))   # max
    np.testing.assert_array_equal(f[1], m.min(0))   # min
    np.testing.assert_array_equal(f[2], m.mean(0))  # mean
    np.testing.assert_array_equal(f[3:7], m)
    np.testing.assert_array_equal(f[7:], 0)
    np.testing.assert_array_equal(mk, [1]*7 + [0]*3)


def test_summary_masking_two_crops():
    m = np.arange(20, dtype=np.float32).reshape(10, 2)
    feats, masks = masking.summary_masking(m, m_len=8)  # 10 >= 8-3
    assert len(feats) == 2
    head, tail = feats
    np.testing.assert_array_equal(head[3:], m[:5])       # head-anchored crop
    np.testing.assert_array_equal(tail[3:], m[10 - 5:])  # tail-anchored crop
    np.testing.assert_array_equal(head[:3], tail[:3])    # shared summary tokens
    assert masks[0].all() and masks[1].all()


def test_summary_masking_sanitizes_audio():
    m = np.ones((4, 3), np.float32)
    m[1, 2] = np.inf
    m[2, 0] = np.nan
    feats, _ = masking.summary_masking(m, 10, is_audio=True)
    assert np.isfinite(feats[0]).all()
    assert feats[0][4, 2] == masking.SANITIZE_VALUE  # row 1 is at offset 3+1


def test_simple_masking_sanitizes_after_pad():
    m = np.full((3, 2), np.inf, np.float32)
    f, mk = masking.simple_masking(m, 5)
    assert (f[:3] == masking.SANITIZE_VALUE).all()
    assert (f[3:] == 0).all()
    np.testing.assert_array_equal(mk, [1, 1, 1, 0, 0])


def test_pad_or_subsample_stride_off_by_one():
    # reference: gap = 10 // 4 = 2 -> indices 0,2,4,6,8 -> first 4 kept
    m = np.arange(10, dtype=np.float32)[:, None]
    f, mk = masking.pad_or_subsample(m, 4)
    np.testing.assert_array_equal(f[:, 0], [0, 2, 4, 6])
    assert mk.all()


# ---------------------------------------------------------------------------
# CMU-MOSEI
# ---------------------------------------------------------------------------

LABELS_TXT = """name,start_time,end_time,happy,sad,angry,disgust,surprise,fear,neutral
vidA[0],5.0,6.0,1,0,0,0,0,0,0
vidA[1],1.0,2.0,0,1,0,0,0,0,0
vidA[2],3.0,4.0,0,0,1,0,0,0,0
vidB[0],0.0,1.0,0,0,0,1,0,0,0
vidB[1],2.0,3.0,0,0,0,0,1,0,0
"""


def test_parse_labels_orders_and_pairs(tmp_path):
    p = tmp_path / "labels.txt"
    p.write_text(LABELS_TXT)
    train, test, labels = mosei.parse_labels(str(p), test_videos={"vidB"})
    # vidA ordered by start time: [1], [2], [0] -> pairs (no_name,1),(1,2),(2,0)
    assert train == [["no_name", "vidA[1]"], ["vidA[1]", "vidA[2]"],
                     ["vidA[2]", "vidA[0]"]]
    assert test == [["no_name", "vidB[0]"], ["vidB[0]", "vidB[1]"]]
    assert labels["vidA[0]"] == [1, 0, 0, 0, 0, 0, 0]
    assert labels["vidB[1]"] == [0, 0, 0, 0, 1, 0, 0]


def test_paragraph_windows():
    present = {f"v[{i}]" for i in range(7)}
    wins = mosei.paragraph_windows(["v"], present, p_len=6, max_clips=11)
    # 12 slots -> windows [0..5] (valid) and [6..11] (first clip v[6] exists)
    assert len(wins) == 2
    assert wins[0] == [f"v[{i}]" for i in range(6)]
    assert wins[1][0] == "v[6]" and wins[1][2] == "no_name"


def test_pair_assembler_two_crop_and_no_name():
    import dataclasses
    m = dataclasses.replace(configs.get("mosei_trans").model,
                            l_len=6, v_len=8, a_len=8, l_dim=4, v_dim=3, a_dim=5)
    names = ["x[0]", "x[1]"]
    # long text (>= l_len-3) triggers two-crop for both sentences
    l_src = DictSource({n: np.random.default_rng(1).standard_normal((10, 4)).astype(np.float32)
                        for n in names})
    v_src = DictSource({n: np.ones((3, 3), np.float32) for n in names})
    a_src = DictSource({n: np.ones((4, 5), np.float32) for n in names})
    labels = {n: [1, 0, 0, 0, 0, 0, 0] for n in names}
    asm = mosei.PairSampleAssembler(m, l_src, v_src, a_src, labels)

    out = asm.samples_for_pair(["no_name", "x[1]"])
    assert len(out) == 2  # extra tail-crop sample first, then main
    for s in out:
        assert s["l"].shape == (2, 6, 4)
        np.testing.assert_array_equal(s["l"][0], 0)       # no_name prev zeros
        np.testing.assert_array_equal(s["l_mask"][0], 0)
        assert s["v"].shape == (2, 8, 3)

    out2 = asm.samples_for_pair(["x[0]", "x[1]"])
    assert len(out2) == 2
    assert not np.allclose(out2[0]["l"][1], out2[1]["l"][1])  # tail vs head crop
    # short modalities have only one crop; extra sample reuses it ([-1] == [0])
    np.testing.assert_array_equal(out2[0]["v"][1], out2[1]["v"][1])


# ---------------------------------------------------------------------------
# Ren-CECps
# ---------------------------------------------------------------------------

CET_TXT = (
    "title line\n"
    "s1:0.1,0.0,0.0,0.0,0.0,0.0,0.0,0.0:中文/w  句子/n\n"
    "s2:0.0,0.0,0.0,0.0,0.0,0.0,0.0,0.0:另一/w  句/n\n"
    "s3:0.0,0.3,0.0,0.0,0.0,0.0,0.0,0.2:/n\n"
    "s4:0.0,0.0,0.5,0.0,0.0,0.0,0.0,0.0:第三/w  句/n\n"
)
CET_XML = (
    "<doc>\n"
    "<S_no>第1段第1句</S_no>\n"
    "<S_no>第1段第2句</S_no>\n"
    "<S_no>第2段第1句</S_no>\n"
    "<S_no>第2段第2句</S_no>\n"
    "</doc>\n"
)


def _write_ren_doc(tmp_path, num):
    (tmp_path / "txt").mkdir(exist_ok=True)
    (tmp_path / "xml").mkdir(exist_ok=True)
    (tmp_path / "txt" / f"cet_{num}.txt").write_text(CET_TXT)
    (tmp_path / "xml" / f"cet_{num}.xml").write_text(CET_XML)


def test_rencecps_parsing(tmp_path):
    _write_ren_doc(tmp_path, 1)
    labels, skipped = rencecps.parse_label_file(str(tmp_path / "txt" / "cet_1.txt"))
    assert skipped == [3]  # '/n' text line skipped
    assert labels[0] == [1, 0, 0, 0, 0, 0, 0, 0, 0]
    assert labels[1] == [0, 0, 0, 0, 0, 0, 0, 0, 1]  # all-zero -> neutral
    assert labels[2] == [0, 0, 1, 0, 0, 0, 0, 0, 0]
    paras, sents = rencecps.parse_xml_ids(str(tmp_path / "xml" / "cet_1.xml"), skipped)
    assert list(zip(paras, sents)) == [("1", "1"), ("1", "2"), ("2", "2")]


def test_rencecps_pairs_reset_at_doc_start():
    entries = [{"name": "5_1_1", "label": [1] + [0]*8},
               {"name": "5_1_2", "label": [0, 1] + [0]*7},
               {"name": "5_2_1", "label": [0, 0, 1] + [0]*6},
               {"name": "6_1_1", "label": [0]*8 + [1]}]
    pairs = rencecps.pair_list(entries)
    assert pairs[0][0]["name"] == "no_name"
    assert pairs[1][0]["name"] == "5_1_1"
    assert pairs[2][0]["name"] == "5_1_2"      # crosses paragraph boundary
    assert pairs[3][0]["name"] == "no_name"    # doc start resets


def test_flatten_bert():
    t = np.arange(12, dtype=np.float32).reshape(4, 3)
    f = rencecps.flatten_bert(t)
    assert f.shape == (9,)
    np.testing.assert_array_equal(f[:3], t[0])
    np.testing.assert_array_equal(f[3:6], t[1:].max(0))
    np.testing.assert_array_equal(f[6:], t[1:].mean(0))


# ---------------------------------------------------------------------------
# Ren-MME
# ---------------------------------------------------------------------------

def test_ren_mme_label_table(tmp_path):
    csv_path = tmp_path / "labels.csv"
    header = "Episode,Dialogue,Sentence," + ",".join(ren_mme.EMOTIONS)
    rows = ["1,1,1,1,0,0,0,0,0,0,0,0", "9,2,1,0,1,0,0,0,0,0,0,0"]
    csv_path.write_text(header + "\n" + "\n".join(rows) + "\n")
    train, test = ren_mme.load_label_table(str(csv_path))
    assert train == [("1_1_1", [1, 0, 0, 0, 0, 0, 0, 0, 0])]
    assert test == [("9_2_1", [0, 1, 0, 0, 0, 0, 0, 0, 0])]


def test_ren_mme_video_fallback_and_transpose(tmp_path):
    import dataclasses
    m = dataclasses.replace(configs.get("ren_mme").model,
                            l_len=4, v_len=5, a_len=6, l_dim=3, v_dim=2, a_dim=4)
    for d in ("text", "video", "audio"):
        (tmp_path / d).mkdir()
    rng = np.random.default_rng(0)
    for name in ("2_3_1", "2_3_2"):
        np.save(tmp_path / "text" / f"{name}.npy",
                rng.standard_normal((3, 3)).astype(np.float32))
        np.save(tmp_path / "audio" / f"{name}.npy",
                rng.standard_normal((4, 8)).astype(np.float32))  # stored (dim, T)
    # only 2_3_1 has video; 2_3_2 must fall back to 2_3_1
    np.save(tmp_path / "video" / "2_3_1.npy",
            rng.standard_normal((2, 2)).astype(np.float32))

    asm = ren_mme.RenMmeAssembler(
        m,
        NpyDirSource(str(tmp_path / "text")),
        NpyDirSource(str(tmp_path / "video")),
        NpyDirSource(str(tmp_path / "audio"), transpose=True),
    )
    s = asm.sample_for("2_3_2", [0] * 9)
    assert s["l"].shape == (2, 4, 3)
    assert s["a"].shape == (2, 6, 4)  # transposed: (8,4) -> padded to 6? truncated
    # pre of 2_3_2 is 2_3_1 (sentence - 1)
    v1 = asm._video("2_3_1")[0]
    np.testing.assert_array_equal(s["v"][1], v1)  # fallback hit the same file

    # missing everywhere -> zeros with ALL-ONES mask (reference quirk)
    f, mk = asm._video("2_9_9")
    np.testing.assert_array_equal(f, 0)
    assert mk.all()


def test_previous_name():
    assert ren_mme.previous_name("3_4_1") == "3_4_1"
    assert ren_mme.previous_name("3_4_7") == "3_4_6"


# ---------------------------------------------------------------------------
# robot demo
# ---------------------------------------------------------------------------

def test_video_multires_majority(tmp_path):
    rng = np.random.default_rng(0)
    frames = ([rng.standard_normal(512).astype(np.float32) for _ in range(5)]
              + [rng.standard_normal(1024).astype(np.float32) for _ in range(3)])
    p = tmp_path / "v.pk"
    with open(p, "wb") as f:
        pickle.dump(frames, f)
    f256, f512, f1024, mask = robot.load_video_multires(str(p), v_len=4)
    assert (f256 == 0).all() and (f1024 == 0).all()
    assert not (f512 == 0).all()
    # 5 frames >= 4 -> gap=1 subsample, first 4 kept
    np.testing.assert_array_equal(f512, np.stack(frames[:4]))
    assert mask.all()


def test_ren_to_mosei_label_mapping(tmp_path):
    txt = (
        "x\n"
        "s1:0.0,0.0,0.7,0.0,0.0,0.0,0.0,0.0:中文/w\n"     # Sorrow -> sad
        "s2:0.5,0.0,0.0,0.0,0.0,0.0,0.6,0.0:中文/w\n"     # Love+Anger -> happ+ange
        "s3:0.0,0.0,0.0,0.0,0.0,0.0,0.0,0.0:中文/w\n"     # none -> neutral
        "s4:0.9,0.0,0.0,0.0,0.0,0.0,0.0,0.0:english/w\n"  # non-Chinese skipped
    )
    p = tmp_path / "cet_1.txt"
    p.write_text(txt)
    labels, skipped = robot.ren_to_mosei_labels(str(p))
    assert labels == ["0100000", "1010000", "0000001"]
    assert skipped == [4]


def test_substitution_rotation():
    sub = robot.SubstitutionSampler({"1000000": ["a", "b"], "0000001": ["n"]})
    assert sub.pick("1000000") == "a"
    assert sub.pick("1000000") == "b"
    assert sub.pick("1000000") == "a"      # rotated back
    assert sub.pick("1111111") == "n"      # unknown label -> neutral fallback


# ---------------------------------------------------------------------------
# batcher
# ---------------------------------------------------------------------------

def test_batcher_pads_final_and_weights():
    samples = [{"x": np.full((2,), i, np.float32), "label": np.zeros(3, np.int32)}
               for i in range(5)]
    b = Batcher(samples, batch_size=2, shuffle=False)
    batches = list(b())
    assert len(batches) == 3 == b.steps_per_epoch()
    last = batches[-1]
    assert last["x"].shape == (2, 2)
    np.testing.assert_array_equal(last["sample_weight"], [1, 0])
    np.testing.assert_array_equal(last["x"][1], 0)


def test_batcher_rdrop_duplicate_adjacent():
    samples = [{"x": np.full((1,), i, np.float32)} for i in range(3)]
    b = Batcher(samples, batch_size=2, shuffle=False, duplicate=True)
    batches = list(b())
    first = batches[0]["x"][:, 0]
    np.testing.assert_array_equal(first[0], first[1])  # duplicates adjacent


def test_stack_batches_groups_and_tail():
    from multimodal_emotion_processing_tpu.data.loader import stack_batches

    batches = [{"x": np.full((4, 2), i, np.float32)} for i in range(5)]
    stacks = list(stack_batches(iter(batches), 2))
    assert [s["x"].shape for s in stacks] == [(2, 4, 2), (2, 4, 2), (1, 4, 2)]
    np.testing.assert_array_equal(stacks[0]["x"][1], batches[1]["x"])
    np.testing.assert_array_equal(stacks[2]["x"][0], batches[4]["x"])
    with pytest.raises(ValueError):
        next(stack_batches(iter(batches), 0))


def test_batcher_soa_equals_rowwise():
    """The struct-of-arrays fast path must produce byte-identical batches to
    the per-row fallback (same seed -> same shuffle), incl. the padded final
    batch and R-Drop duplication."""
    rng = np.random.default_rng(0)
    samples = [{"x": rng.standard_normal((3, 4)).astype(np.float32),
                "label": rng.integers(0, 2, 5).astype(np.int32)}
               for _ in range(7)]
    for dup in (False, True):
        fast = Batcher(samples, 2, shuffle=True, seed=3, duplicate=dup)
        slow = Batcher(samples, 2, shuffle=True, seed=3, duplicate=dup)
        slow._stack = lambda: False  # force the rowwise fallback
        for bf, bs in zip(fast(), slow()):
            assert set(bf) == set(bs)
            for k in bf:
                np.testing.assert_array_equal(bf[k], bs[k])


def test_batcher_heterogeneous_samples_fall_back():
    """Ragged sample shapes can't stack — rowwise path must kick in (only
    reachable with pad_final=False since padding needs uniform shapes)."""
    samples = [{"x": np.zeros((2, 3), np.float32)},
               {"x": np.zeros((4, 3), np.float32)}]
    b = Batcher(samples, 1, shuffle=False, pad_final=False)
    got = [batch["x"].shape for batch in b()]
    assert got == [(1, 2, 3), (1, 4, 3)]


def test_contains_chinese_word_semantics():
    # reference compares whole words lexicographically (first-char check)
    assert robot.contains_chinese(["中文", "abc"])
    assert not robot.contains_chinese(["abc", "xyz"])
    assert not robot.contains_chinese(["a中文"])  # non-Chinese first char


def test_summary_masking_bert_branch():
    m = np.arange(24, dtype=np.float32).reshape(12, 2)  # CLS + 10 tokens + SEP
    feats, masks = masking.summary_masking_bert(m, m_len=10)  # 12 > 10-5
    assert len(feats) == 2
    head, tail = feats
    assert head.shape == (10, 2)
    np.testing.assert_array_equal(head[0], m[1:-1].max(0))
    np.testing.assert_array_equal(head[3], m[0])     # CLS after summaries
    np.testing.assert_array_equal(head[-1], m[-1])   # SEP last
    np.testing.assert_array_equal(head[4:9], m[1:6])
    np.testing.assert_array_equal(tail[4:9], m[12 - 10 + 4:-1])
    short, smask = masking.summary_masking_bert(m[:4], m_len=12)
    assert len(short) == 1 and short[0].shape == (12, 2)
    np.testing.assert_array_equal(smask[0], [1]*7 + [0]*5)


def test_batcher_resample_hook():
    calls = []

    def resample(epoch):
        calls.append(epoch)
        return [{"x": np.full((2,), epoch * 10 + i, np.float32)}
                for i in range(4)]

    b = Batcher([{"x": np.zeros(2, np.float32)}], 2, shuffle=False,
                resample=resample)
    first = np.concatenate([bt["x"][:, 0] for bt in b()])
    second = np.concatenate([bt["x"][:, 0] for bt in b()])
    assert calls == [0, 1]
    np.testing.assert_array_equal(sorted(first), [0, 1, 2, 3])
    np.testing.assert_array_equal(sorted(second), [10, 11, 12, 13])


def test_robot_epoch_materialize_rotates_substitution(tmp_path):
    import dataclasses
    m = dataclasses.replace(configs.get("robot_demo").model,
                            l_len=3, v_len=4, a_len=5, l_dim=6, a_dim=2,
                            v_dims_multires=(4, 6, 8))
    rng = np.random.default_rng(0)
    # two video clips with the same label; three candidate Ren texts
    for n in ("clipA", "clipB"):
        with open(tmp_path / f"{n}.pk", "wb") as f:
            pickle.dump([rng.standard_normal(4).astype(np.float32)
                         for _ in range(3)], f)
        np.save(tmp_path / f"{n}_audio.npy",
                rng.standard_normal((4, 2)).astype(np.float32))

    class AudioSrc:
        def get(self, name):
            return np.load(tmp_path / f"{name}_audio.npy")

    class TextSrc:
        def get(self, name):
            r = np.random.default_rng(abs(hash(name)) % 2**32)
            return r.standard_normal((3, 6)).astype(np.float32)

    table = {"1000000": ["t1", "t2", "t3"], "0000001": ["tn"]}
    labels = {"clipA": ["1", "0", "0", "0", "0", "0", "0"],
              "clipB": ["1", "0", "0", "0", "0", "0", "0"]}
    asm = robot.RobotAssembler(m, str(tmp_path), AudioSrc(), TextSrc(), labels,
                               robot.SubstitutionSampler(table))
    names = ["clipA", "clipB"]
    e0 = asm.epoch_materialize(names, table, epoch=0)
    e1 = asm.epoch_materialize(names, table, epoch=1)
    # different epochs draw different same-label texts for at least one clip
    diff = any(not np.allclose(a["l"], b["l"]) for a, b in zip(e0, e1))
    assert diff


def test_robot_assembler_feature_cache(tmp_path):
    """Cached video/audio features equal a fresh read exactly, and epochs
    after the first never touch the .pk/.npy files again (only the text
    substitution changes per epoch)."""
    import dataclasses
    m = dataclasses.replace(configs.get("robot_demo").model,
                            l_len=3, v_len=4, a_len=5, l_dim=6, a_dim=2,
                            v_dims_multires=(4, 6, 8))
    rng = np.random.default_rng(1)
    for n in ("clipA", "clipB"):
        with open(tmp_path / f"{n}.pk", "wb") as f:
            pickle.dump([rng.standard_normal(6).astype(np.float32)
                         for _ in range(3)], f)
        np.save(tmp_path / f"{n}_audio.npy",
                rng.standard_normal((4, 2)).astype(np.float32))

    class AudioSrc:
        def get(self, name):
            return np.load(tmp_path / f"{name}_audio.npy")

    class TextSrc:
        def get(self, name):
            r = np.random.default_rng(abs(hash(name)) % 2**32)
            return r.standard_normal((3, 6)).astype(np.float32)

    table = {"1000000": ["t1"], "0000001": ["tn"]}
    labels = {"clipA": ["1", "0", "0", "0", "0", "0", "0"],
              "clipB": ["1", "0", "0", "0", "0", "0", "0"]}

    def build(cache):
        return robot.RobotAssembler(
            m, str(tmp_path), AudioSrc(), TextSrc(), labels,
            robot.SubstitutionSampler(table), cache_features=cache)

    names = ["clipA", "clipB"]
    fresh = build(False).materialize(names)
    cached_asm = build(True)
    first = cached_asm.materialize(names)
    for a, b in zip(fresh, first):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    # remove the backing files: the cached assembler must not need them
    for n in names:
        (tmp_path / f"{n}.pk").unlink()
        (tmp_path / f"{n}_audio.npy").unlink()
    second = cached_asm.materialize(names)
    for a, b in zip(first, second):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    with pytest.raises(FileNotFoundError):
        build(False).materialize(names)


def test_video_multires_no_matching_resolution(tmp_path):
    """Frames whose dims match NO resolution slot (foreign extractor /
    corrupt pickle) take the same zeros+zero-mask fallback as an empty file
    instead of crashing on np.stack([])."""
    rng = np.random.default_rng(1)
    frames = [rng.standard_normal(2048).astype(np.float32) for _ in range(3)]
    p = tmp_path / "bad.pk"
    with open(p, "wb") as f:
        pickle.dump(frames, f)
    f256, f512, f1024, mask = robot.load_video_multires(str(p), v_len=4)
    assert (f256 == 0).all() and (f512 == 0).all() and (f1024 == 0).all()
    assert (mask == 0).all()
