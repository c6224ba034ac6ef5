"""CMU-MOSEI standard fold resolution.

The reference takes the standard test-fold video list straight from the CMU
MultimodalSDK (`mmsdk.mmdatasdk.cmu_mosei.standard_folds.standard_test_fold`,
cmu-mosei/run.py:47-54) — one heavyweight import for one constant.  Here the
fold list is resolved without a hard mmsdk dependency, in priority order:

  1. an explicit iterable passed by the caller;
  2. a plain-text file `standard_test_fold.txt` in the corpus root (one video
     id per line, '#' comments allowed) — the recommended layout, see
     docs/REAL_DATA.md;
  3. the mmsdk constant, if mmsdk happens to be installed;
  4. a clear error explaining how to provide it.

The video-id list itself is CMU-distributed corpus metadata and is NOT
vendored verbatim: this build environment has no network access and no mmsdk,
so any embedded list would be unverifiable.  The file-based path is exact and
testable; `extract_fold_file()` writes the file from mmsdk once, after which
mmsdk is never needed again.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional, Set

FOLD_FILENAME = "standard_test_fold.txt"


def _read_fold_file(path: str) -> Set[str]:
    out = set()
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                out.add(line)
    return out


def _mmsdk_fold() -> Optional[Set[str]]:
    try:
        from mmsdk import mmdatasdk  # optional, never required
    except ImportError:
        return None
    return set(mmdatasdk.cmu_mosei.standard_folds.standard_test_fold)


def standard_test_fold(
    data_root: Optional[str] = None,
    *,
    explicit: Optional[Iterable[str]] = None,
    filename: str = FOLD_FILENAME,
) -> Set[str]:
    """Resolve the CMU-MOSEI standard test-fold video-id set."""
    if explicit is not None:
        return set(explicit)
    if data_root is not None:
        path = os.path.join(data_root, filename)
        if os.path.exists(path):
            return _read_fold_file(path)
    fold = _mmsdk_fold()
    if fold is not None:
        return fold
    where = (f"{os.path.join(data_root, filename)!r}" if data_root
             else f"a {filename!r} file in the corpus root")
    raise FileNotFoundError(
        f"CMU-MOSEI standard test fold not found: provide {where} (one video "
        "id per line), or install mmsdk, or pass explicit=[...].  To create "
        "the file once from an mmsdk install: python -m "
        "multimodal_emotion_processing_tpu.data.mosei_folds <data_root>")


def extract_fold_file(data_root: str, *, filename: str = FOLD_FILENAME) -> str:
    """Write `standard_test_fold.txt` into `data_root` from mmsdk (one-time
    extraction, removes the runtime dependency)."""
    fold = _mmsdk_fold()
    if fold is None:
        raise ImportError("mmsdk is required (once) to extract the fold file")
    path = os.path.join(data_root, filename)
    with open(path, "w") as f:
        f.write("# CMU-MOSEI standard test fold (mmsdk.mmdatasdk.cmu_mosei."
                "standard_folds.standard_test_fold)\n")
        for name in sorted(fold):
            f.write(name + "\n")
    return path


if __name__ == "__main__":
    import sys

    print(extract_fold_file(sys.argv[1]))
