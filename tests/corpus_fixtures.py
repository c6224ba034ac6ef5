"""On-disk miniature corpus trees, layout-faithful to the reference's data
roots (docs/REAL_DATA.md), for exercising `pipelines.load_real_data` without
the real (non-distributable) corpora.

Each builder writes a tmp tree matching the reference's hard-coded paths:
  * CMU-MOSEI: labels.txt rows + .csd HDF5 computational sequences
    (cmu-mosei/run.py:21-25,45-61) + standard_test_fold.txt;
  * Ren-CECps: the full cet_1..cet_1487 txt/xml doc range the loaders iterate
    (rencecps/run.py:30-76), with empty-text skips, all-zero→neutral rows and
    multi-sentence docs; per-sentence BERT-token .npy features;
  * Ren-MME: zero_one_adjust.csv + npy trees with a deliberately MISSING video
    file to exercise the name→prev→next→prev-prev→zeros chain
    (Ren-MME/run.py:79-91) and transposed audio (:110);
  * robot: mixed-resolution pickled per-frame video vectors
    (robot_demo.py:63-112), WAV npy, MOSEI-format labels.txt, and the shared
    Ren tree for label-matched text substitution.

Feature dims are parameterized so tests can shrink models via config
overrides; shapes and naming stay corpus-faithful.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

MOSEI_HEADER = ("name, start_time, end_time, happy, sad, angry, disgust, "
                "surprise, fear, neutral \n")


def _rng(seed):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------- CMU-MOSEI

def build_mosei_tree(root, m, *, n_train_videos=4, n_test_videos=2, seed=0):
    """labels.txt + glove/FACET/COVAREP/All-Labels .csd + fold file.
    Returns (train_videos, test_videos)."""
    import h5py

    rng = _rng(seed)
    os.makedirs(root, exist_ok=True)
    train_videos = [f"tr{i}" for i in range(n_train_videos)]
    test_videos = [f"te{i}" for i in range(n_test_videos)]

    sentences = []
    for v in train_videos + test_videos:
        n_sent = int(rng.integers(1, 5))
        for i in range(n_sent):
            sentences.append(f"{v}[{i}]")

    with open(os.path.join(root, "labels.txt"), "w") as f:
        f.write(MOSEI_HEADER)
        for name in sentences:
            # out-of-order start times exercise the sort-by-time path
            start = float(rng.random() * 100)
            labels = (rng.random(7) > 0.6).astype(int)
            f.write(f"{name},{start:.3f},{start + 5:.3f},"
                    + ",".join(str(x) for x in labels) + "\n")

    with open(os.path.join(root, "standard_test_fold.txt"), "w") as f:
        f.write("# fixture fold\n")
        for v in test_videos:
            f.write(v + "\n")

    def write_csd(fname, seqname, dim, max_len, *, pollute=False, names=None,
                  fixed=None):
        with h5py.File(os.path.join(root, fname), "w") as h:
            grp = h.create_group(f"{seqname}/data")
            for name in (names or sentences):
                if fixed is not None:
                    feats = fixed(name)
                else:
                    n = int(rng.integers(1, max_len + 1))
                    feats = rng.standard_normal((n, dim)).astype(np.float32)
                    if pollute and rng.random() < 0.5 and n > 0:
                        feats[int(rng.integers(0, n)),
                              int(rng.integers(0, dim))] = np.inf
                g = grp.create_group(name)
                g.create_dataset("features", data=feats)

    # text long enough to trigger the two-crop path on some sentences
    write_csd("glove_vectors.csd", "glove_vectors", m.l_dim, m.l_len + 6)
    write_csd("FACET 4.2.csd", "FACET 4.2", m.v_dim, m.v_len + 4)
    write_csd("COAVAREP.csd", "COAVAREP", m.a_dim, m.a_len + 4, pollute=True)
    write_csd("All Labels.csd", "All Labels", 7, 1,
              fixed=lambda name: rng.standard_normal((1, 7)).astype(np.float32))
    return train_videos, test_videos


# ---------------------------------------------------------------- Ren-CECps

def build_rencecps_tree(root, *, tok_dim=16, n_tokens=3, seed=0,
                        docs=range(1, 1488)):
    """Full cet_1..cet_1487 doc range (the loaders iterate it verbatim,
    skipping 490/761 themselves).  Most docs have ONE sentence; every 50th doc
    gets three sentences including an empty-text skip line; every 7th sentence
    is all-zero intensity (neutral fallback).  Chinese segmented text so the
    robot's contains_chinese filter passes (robot_demo.py:157-162)."""
    rng = _rng(seed)
    txt_dir = os.path.join(root, "1487_txt_hier_sents_202002")
    xml_dir = os.path.join(root, "1487_xml_doc_segmented_utf8")
    feat_dir = os.path.join(root, "ren_text_feat")
    for d in (txt_dir, xml_dir, feat_dir):
        os.makedirs(d, exist_ok=True)

    count = 0
    for doc in docs:
        txt_lines, xml_lines = [], []
        # (para, sent, label-or-None); None = empty-text skip line
        if doc % 50 == 0:
            plan = [("1", "1", True), ("1", "2", None), ("2", "1", True)]
        else:
            plan = [("1", "1", True)]
        for para, sent, keep in plan:
            count += 1
            if keep is None:
                txt_lines.append("s:0.0,0.0,0.0,0.0,0.0,0.0,0.0,0.0:/n\n")
            else:
                if count % 7 == 0:
                    intens = ["0.0"] * 8  # all-zero -> neutral label
                else:
                    intens = ["0.0"] * 8
                    intens[int(rng.integers(0, 8))] = "0.6"
                txt_lines.append("s:" + ",".join(intens) + ":今天/t  天气/n  很好/a\n")
                np.save(os.path.join(feat_dir, f"{doc}_{para}_{sent}.npy"),
                        rng.standard_normal((n_tokens, tok_dim)).astype(np.float32))
            xml_lines.append(f"<S_no>第{para}段第{sent}句</S_no>\n")
        with open(os.path.join(txt_dir, f"cet_{doc}.txt"), "w") as f:
            f.writelines(txt_lines)
        with open(os.path.join(xml_dir, f"cet_{doc}.xml"), "w") as f:
            f.writelines(xml_lines)
    return txt_dir, xml_dir, feat_dir


# ------------------------------------------------------------------ Ren-MME

def build_ren_mme_tree(root, m, *, seed=0, missing_video="1_1_3"):
    """zero_one_adjust.csv + text/video/audio npy trees; `missing_video` has
    no video file (fallback chain), audio stored transposed (dim, T)."""
    rng = _rng(seed)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    for d in ("text_feat", "video_feat", "audio_feat"):
        os.makedirs(os.path.join(root, d), exist_ok=True)

    emotions = ("Love", "Anxiety", "Sorrow", "Joy", "Expect", "Hate", "Anger",
                "Surprise", "Neutral")
    names = []
    rows = []
    for ep in (1, 2, 9, 10):
        for dlg in (1, 2):
            for sent in range(1, 5):
                name = f"{ep}_{dlg}_{sent}"
                names.append(name)
                lab = (rng.random(9) > 0.7).astype(int)
                rows.append([str(ep), str(dlg), str(sent)] + [str(x) for x in lab])
    with open(os.path.join(root, "data", "zero_one_adjust.csv"), "w") as f:
        f.write("Episode,Dialogue,Sentence," + ",".join(emotions) + "\n")
        for r in rows:
            f.write(",".join(r) + "\n")

    for name in names:
        t = int(rng.integers(2, m.l_len + 3))
        np.save(os.path.join(root, "text_feat", name + ".npy"),
                rng.standard_normal((t, m.l_dim)).astype(np.float32))
        if name != missing_video:
            t = int(rng.integers(2, m.v_len + 3))
            np.save(os.path.join(root, "video_feat", name + ".npy"),
                    rng.standard_normal((t, m.v_dim)).astype(np.float32))
        t = int(rng.integers(2, m.a_len + 3))
        np.save(os.path.join(root, "audio_feat", name + ".npy"),
                rng.standard_normal((m.a_dim, t)).astype(np.float32))  # transposed
    return names


# -------------------------------------------------------------------- robot

def build_robot_tree(root, m, *, n_clips=8, seed=0, ren_docs=range(1, 1488)):
    """Feature(0)-360 .pk multires pickles + WAV npy + MOSEI labels.txt +
    the shared Ren tree (built here unless already present)."""
    rng = _rng(seed)
    video_dir = os.path.join(root, "Feature(0)-360")
    wav_dir = os.path.join(root, "WAV_feature")
    os.makedirs(video_dir, exist_ok=True)
    os.makedirs(wav_dir, exist_ok=True)
    if not os.path.isdir(os.path.join(root, "1487_txt_hier_sents_202002")):
        build_rencecps_tree(root, tok_dim=m.l_dim, seed=seed + 1, docs=ren_docs)

    dims = m.v_dims_multires
    clips = [f"clip{i}[0]" for i in range(n_clips)]
    with open(os.path.join(root, "labels.txt"), "w") as f:
        f.write(MOSEI_HEADER)
        for i, name in enumerate(clips):
            lab = (rng.random(7) > 0.6).astype(int)
            f.write(f"{name},{i}.0,{i + 5}.0," + ",".join(str(x) for x in lab) + "\n")
            # mixed-resolution per-frame vectors; majority resolution rotates
            major = dims[i % 3]
            frames = [rng.standard_normal(major).astype(np.float32)
                      for _ in range(int(rng.integers(3, 2 * m.v_len)))]
            if i % 2 == 0:  # minority frames in another resolution
                other = dims[(i + 1) % 3]
                frames += [rng.standard_normal(other).astype(np.float32)]
            if i == n_clips - 1:
                frames = []  # empty pickle -> zero features (robot_demo.py:66-70)
            with open(os.path.join(video_dir, name + ".pk"), "wb") as pf:
                pickle.dump(frames, pf)
            t = int(rng.integers(2, m.a_len + 3))
            np.save(os.path.join(wav_dir, name + ".npy"),
                    rng.standard_normal((t, m.a_dim)).astype(np.float32))
    return clips
