"""Shape/dtype-faithful synthetic data for tests and benchmarks.

The real corpora (CMU-MOSEI .csd, Ren-CECps txt/xml, Ren-MME npy trees) are not
shipped with the reference (only cmu-mosei/labels.txt is).  These generators
fabricate samples with the exact shapes, dtypes and quirk patterns the real
loaders produce — including variable raw lengths (exercising two-crop and
subsample paths), inf/nan pollution in audio, and `no_name` sentinel pairs.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from . import masking


def raw_modality(rng, max_len: int, dim: int, *, pollute: bool = False) -> np.ndarray:
    """A raw variable-length feature sequence (1..max_len frames)."""
    n = int(rng.integers(1, max_len + 1))
    x = rng.standard_normal((n, dim)).astype(np.float32)
    if pollute and rng.random() < 0.3:
        i = rng.integers(0, n)
        j = rng.integers(0, dim)
        x[i, j] = np.inf if rng.random() < 0.5 else np.nan
    return x


def mosei_pair_sample(rng, m, *, no_name_prob: float = 0.15) -> Dict[str, np.ndarray]:
    """One (previous, current) sentence-pair sample with the reference's
    summary-token masking; raw lengths drawn long enough to hit both the pad
    and two-crop paths (cmu-mosei/run.py:154-198)."""

    def one(kind: str):
        if kind == "l":
            raw = raw_modality(rng, m.l_len * 2, m.l_dim)
            feats, masks_ = masking.summary_masking(raw, m.l_len)
        elif kind == "v":
            raw = raw_modality(rng, m.v_len * 2, m.v_dim)
            feats, masks_ = masking.summary_masking(raw, m.v_len)
        else:
            raw = raw_modality(rng, m.a_len * 2, m.a_dim, pollute=True)
            feats, masks_ = masking.summary_masking(raw, m.a_len, is_audio=True)
        return feats[0], masks_[0]

    no_name = rng.random() < no_name_prob
    sample = {}
    for kind, length, dim in (("l", m.l_len, m.l_dim), ("v", m.v_len, m.v_dim),
                              ("a", m.a_len, m.a_dim)):
        if no_name:
            prev_f = np.zeros((length, dim), np.float32)
            prev_m = np.zeros(length, np.float32)
        else:
            prev_f, prev_m = one(kind)
        cur_f, cur_m = one(kind)
        sample[kind] = np.stack([prev_f, cur_f])
        sample[kind + "_mask"] = np.stack([prev_m, cur_m])
    sample["label"] = (rng.random(7) > 0.75).astype(np.int32)
    return sample


def realformer_paragraph_sample(rng, m) -> Dict[str, np.ndarray]:
    """One P_LEN-clip paragraph window with per-clip validity mask
    (others/realformer.py:94-125)."""
    p = m.p_len
    n_valid = int(rng.integers(1, p + 1))
    ls, vs, as_, lm, vm, am, labels, cm = [], [], [], [], [], [], [], []
    for t in range(p):
        if t < n_valid:
            l, lmask = masking.simple_masking(raw_modality(rng, m.l_len * 2, m.l_dim), m.l_len)
            v, vmask = masking.simple_masking(raw_modality(rng, m.v_len * 2, m.v_dim), m.v_len)
            a, amask = masking.simple_masking(
                raw_modality(rng, m.a_len * 2, m.a_dim, pollute=True), m.a_len)
            lab = (rng.random(6) > 0.75).astype(np.int32)
            valid = 1.0
        else:
            l = np.zeros((m.l_len, m.l_dim), np.float32); lmask = np.zeros(m.l_len, np.float32)
            v = np.zeros((m.v_len, m.v_dim), np.float32); vmask = np.zeros(m.v_len, np.float32)
            a = np.zeros((m.a_len, m.a_dim), np.float32); amask = np.zeros(m.a_len, np.float32)
            lab = np.zeros(6, np.int32)
            valid = 0.0
        ls.append(l); vs.append(v); as_.append(a)
        lm.append(lmask); vm.append(vmask); am.append(amask)
        labels.append(lab); cm.append(valid)
    return {
        "l": np.stack(ls), "v": np.stack(vs), "a": np.stack(as_),
        "l_mask": np.stack(lm), "v_mask": np.stack(vm), "a_mask": np.stack(am),
        "label": np.stack(labels), "clip_mask": np.asarray(cm, np.float32),
    }


def ren_mme_sample(rng, m) -> Dict[str, np.ndarray]:
    """One (pre, pro) utterance pair (Ren-MME/run.py:123-148); the loader-level
    R-Drop duplication is the batcher's job, not the sample's."""
    sample = {}
    for kind, length, dim in (("l", m.l_len, m.l_dim), ("v", m.v_len, m.v_dim),
                              ("a", m.a_len, m.a_dim)):
        pre, pre_m = masking.pad_or_truncate(raw_modality(rng, length * 2, dim), length)
        pro, pro_m = masking.pad_or_truncate(raw_modality(rng, length * 2, dim), length)
        sample[kind] = np.stack([pre, pro])
        sample[kind + "_mask"] = np.stack([pre_m, pro_m])
    sample["label"] = (rng.random(9) > 0.7).astype(np.int32)
    return sample


def rencecps_sample(rng, m, *, no_name_prob: float = 0.1) -> Dict[str, np.ndarray]:
    """(previous, current) flattened 2304-d BERT features (rencecps/run.py:111-127)."""
    prev = (np.zeros(m.dim, np.float32) if rng.random() < no_name_prob
            else rng.standard_normal(m.dim).astype(np.float32))
    cur = rng.standard_normal(m.dim).astype(np.float32)
    label = (rng.random(9) > 0.7).astype(np.int32)
    if label.sum() == 0:
        label[8] = 1  # neutral fallback (rencecps/run.py:48-49)
    return {"feat": np.stack([prev, cur]), "label": label}


def robot_sample(rng, m) -> Dict[str, np.ndarray]:
    """Robot-demo sample: one active visual resolution slot, others zero
    (robot_demo.py:63-112)."""
    d256, d512, d1024 = m.v_dims_multires
    slot = int(rng.integers(0, 3))
    dims = [d256, d512, d1024]
    raw = raw_modality(rng, m.v_len * 3, dims[slot])
    feat, v_mask = masking.pad_or_subsample(raw, m.v_len)
    vs = [np.zeros((m.v_len, d), np.float32) for d in dims]
    vs[slot] = feat
    l, l_mask = masking.pad_or_subsample(raw_modality(rng, m.l_len * 3, m.l_dim), m.l_len)
    a, a_mask = masking.pad_or_subsample(raw_modality(rng, m.a_len * 3, m.a_dim), m.a_len)
    return {
        "l": l, "v256": vs[0], "v512": vs[1], "v1024": vs[2], "a": a,
        "l_mask": l_mask, "v_mask": v_mask, "a_mask": a_mask,
        "label": (rng.random(7) > 0.75).astype(np.int32),
    }


SAMPLERS = {
    "mosei_trans": mosei_pair_sample,
    "mosei_realformer": realformer_paragraph_sample,
    "ren_mme": ren_mme_sample,
    "rencecps": rencecps_sample,
    "robot_demo": robot_sample,
}


def synthetic_dataset(config_name: str, m, n: int, seed: int = 0) -> List[Dict]:
    rng = np.random.default_rng(seed)
    sampler = SAMPLERS.get(config_name)
    if sampler is None:  # scaled presets ride their family's sampler
        from ..configs import family

        sampler = SAMPLERS[family(config_name)]
    return [sampler(rng, m) for _ in range(n)]
