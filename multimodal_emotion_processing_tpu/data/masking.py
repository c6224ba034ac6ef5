"""Sample assembly: pad/crop/mask semantics reproduced from the reference.

These host-side numpy routines decide metric parity more than the model does
(SURVEY §7.3.2). Reproduced behaviors:

  * `summary_masking` (cmu-mosei/run.py:104-151): sanitize audio inf/nan→-71;
    prepend 3 synthetic frames (per-feature max, min, mean); when the sequence
    is long (len >= m_len-3) emit TWO crops — head-anchored and tail-anchored —
    both carrying the summary tokens; otherwise right-pad with zeros and a 1/0
    mask covering len+3 positions.
  * `simple_masking` (others/realformer.py:72-82): right-pad/truncate to fixed
    length, 1/0 mask, inf/nan→-71 on ALL modalities (applied AFTER padding, as
    the reference does).
  * `pad_or_subsample` (robot_demo.py:86-99,121-131,139-152): right-pad short
    sequences; long sequences are stride-subsampled with gap = len // target
    then truncated to target (the reference's exact off-by-one behavior:
    `range(0, len, gap)` may produce > target items, sliced by `[:target]`).
  * `pad_or_truncate` (Ren-MME/run.py:54-120): plain right-pad / head-truncate.

These numpy implementations are the reference semantics and the production
path (measured at parity with the C++ runtime kernels on this host — see
runtime/__init__.py).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

SANITIZE_VALUE = -71.0


def sanitize(m: np.ndarray) -> np.ndarray:
    """inf/nan → -71.0 (cmu-mosei/run.py:107-110, others/realformer.py:78-81)."""
    m = np.asarray(m, dtype=np.float32)
    bad = ~np.isfinite(m)
    if bad.any():
        m = m.copy()
        m[bad] = SANITIZE_VALUE
    return m


def summary_masking(
    m: np.ndarray, m_len: int, *, is_audio: bool = False
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Reference `masking(m, m_len, is_bert=False, is_audio)` — returns lists of
    (feat, mask): one entry for short inputs, two crops (head, tail) for long.

    Quirk detail: the three summary frames are computed over the RAW (possibly
    longer-than-m_len) sequence; for long inputs the head crop keeps the first
    m_len-3 frames and the tail crop the last m_len-3.
    """
    m = np.asarray(m, dtype=np.float32)
    if is_audio:
        m = sanitize(m)
    m_max = m.max(axis=0)
    m_min = m.min(axis=0)
    m_mean = m.mean(axis=0)
    summary = np.stack([m_max, m_min, m_mean], axis=0)
    feats, masks = [], []
    if len(m) >= m_len - 3:
        full_mask = np.ones(m_len, dtype=np.float32)
        head = np.concatenate([summary, m[: m_len - 3]], axis=0)
        tail = np.concatenate([summary, m[len(m) - m_len + 3:]], axis=0)
        feats.extend([head, tail])
        masks.extend([full_mask, full_mask])
    else:
        mask = np.concatenate(
            [np.ones(len(m) + 3, np.float32), np.zeros(m_len - len(m) - 3, np.float32)]
        )
        x = np.concatenate([summary, m], axis=0)
        x = np.concatenate([x, np.zeros((m_len,) + m.shape[1:], np.float32)], axis=0)[:m_len]
        feats.append(x)
        masks.append(mask)
    return feats, masks


def summary_masking_bert(
    m: np.ndarray, m_len: int
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """The reference's `is_bert=True` branch (cmu-mosei/run.py:111-130):
    summary rows computed over tokens[1:-1] (excluding CLS/SEP); long inputs
    emit head/tail crops that keep CLS first-after-summaries and SEP last.
    Unused by every reference config (all call sites pass is_bert=False) but
    part of the API surface."""
    m = np.asarray(m, dtype=np.float32)
    inner = m[1:-1]
    summary = np.stack([inner.max(axis=0), inner.min(axis=0), inner.mean(axis=0)])
    feats, masks = [], []
    if len(m) > m_len - 5:
        full_mask = np.ones(m_len, dtype=np.float32)
        head = np.concatenate([summary, m[0:1], m[1:m_len - 4], m[-1:]], axis=0)
        tail = np.concatenate([summary, m[0:1], m[len(m) - m_len + 4:-1], m[-1:]],
                              axis=0)
        feats.extend([head, tail])
        masks.extend([full_mask, full_mask])
    else:
        mask = np.concatenate(
            [np.ones(len(m) + 3, np.float32), np.zeros(m_len - len(m) - 3, np.float32)])
        x = np.concatenate([summary, m], axis=0)
        x = np.concatenate([x, np.zeros((m_len,) + m.shape[1:], np.float32)], axis=0)[:m_len]
        feats.append(x)
        masks.append(mask)
    return feats, masks


def simple_masking(m: np.ndarray, m_len: int) -> Tuple[np.ndarray, np.ndarray]:
    """Reference realformer `masking`: pad/truncate + sanitize-after-pad."""
    m = np.asarray(m, dtype=np.float32)
    if len(m) >= m_len:
        mask = np.ones(m_len, dtype=np.float32)
    else:
        mask = np.concatenate(
            [np.ones(len(m), np.float32), np.zeros(m_len - len(m), np.float32)]
        )
    m = np.concatenate([m, np.zeros((m_len,) + m.shape[1:], np.float32)], axis=0)[:m_len]
    return sanitize(m), mask


def pad_or_truncate(m: np.ndarray, m_len: int) -> Tuple[np.ndarray, np.ndarray]:
    """Ren-MME fixed-length pad (zero-fill) / head-truncate."""
    m = np.asarray(m, dtype=np.float32)
    if len(m) < m_len:
        pad = m_len - len(m)
        feat = np.concatenate([m, np.zeros((pad,) + m.shape[1:], np.float32)], axis=0)
        mask = np.concatenate([np.ones(len(m), np.float32), np.zeros(pad, np.float32)])
    else:
        feat = m[:m_len]
        mask = np.ones(m_len, dtype=np.float32)
    return feat, mask


def pad_or_subsample(m: np.ndarray, m_len: int) -> Tuple[np.ndarray, np.ndarray]:
    """Robot-demo fixed length: pad short; stride-subsample long with
    gap = len // m_len over range(0, len, gap), then truncate to m_len."""
    m = np.asarray(m, dtype=np.float32)
    if len(m) == 0:
        return np.zeros((m_len,) + m.shape[1:], np.float32), np.zeros(m_len, np.float32)
    if len(m) < m_len:
        return pad_or_truncate(m, m_len)
    gap = len(m) // m_len
    idx = np.arange(0, len(m), gap)[:m_len]
    return m[idx], np.ones(m_len, dtype=np.float32)
