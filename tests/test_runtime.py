"""Native C++ runtime kernels vs numpy reference semantics."""

import numpy as np
import pytest

from multimodal_emotion_processing_tpu import runtime
from multimodal_emotion_processing_tpu.data import masking


def test_native_builds():
    assert runtime.available(), "g++ build of the native batcher failed"


def test_gather_rows():
    rng = np.random.default_rng(0)
    arrays = [rng.standard_normal((5, 7)).astype(np.float32) for _ in range(9)]
    out = runtime.gather_rows(arrays)
    np.testing.assert_array_equal(out, np.stack(arrays))


def test_sanitize_inplace():
    a = np.ones((100,), np.float32)
    a[3] = np.inf
    a[50] = np.nan
    a[99] = -np.inf
    n = runtime.sanitize_(a)
    assert n == 3
    assert np.isfinite(a).all()
    assert a[3] == a[50] == a[99] == -71.0


def test_pad_or_truncate_matches_numpy():
    rng = np.random.default_rng(1)
    for length, target in [(3, 8), (8, 8), (12, 8)]:
        src = rng.standard_normal((length, 5)).astype(np.float32)
        f1, m1 = runtime.pad_or_truncate(src, target)
        f2, m2 = masking.pad_or_truncate(src, target)
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(m1, m2)


def test_stride_subsample_matches_numpy():
    rng = np.random.default_rng(2)
    for length, target in [(10, 4), (9, 4), (4, 4), (23, 5)]:
        src = rng.standard_normal((length, 3)).astype(np.float32)
        got = runtime.stride_subsample(src, target)
        gap = length // target
        want = src[np.arange(0, length, gap)[:target]]
        np.testing.assert_array_equal(got, want)


def test_summary_rows_matches_numpy():
    rng = np.random.default_rng(3)
    src = rng.standard_normal((17, 6)).astype(np.float32)
    mx, mn, mean = runtime.summary_rows(src)
    np.testing.assert_array_equal(mx, src.max(0))
    np.testing.assert_array_equal(mn, src.min(0))
    np.testing.assert_allclose(mean, src.mean(0), rtol=1e-6)


def test_batcher_uses_native_and_matches():
    from multimodal_emotion_processing_tpu.data.loader import Batcher

    rng = np.random.default_rng(4)
    samples = [{"x": rng.standard_normal((3, 4)).astype(np.float32),
                "label": (rng.random(5) > 0.5).astype(np.int32)}
               for _ in range(10)]
    batches = list(Batcher(samples, 4, shuffle=False)())
    assert batches[0]["x"].shape == (4, 3, 4)
    np.testing.assert_array_equal(batches[0]["x"][2], samples[2]["x"])
    np.testing.assert_array_equal(batches[2]["x"][1], samples[9]["x"])
    np.testing.assert_array_equal(batches[2]["sample_weight"], [1, 1, 0, 0])
    np.testing.assert_array_equal(batches[2]["x"][2], 0)


def test_gather_rows_out_validation():
    """A hostile `out` buffer must never reach the native memcpy: wrong
    dtype/shape takes the (safe) numpy path; empty input raises."""
    import pytest

    from multimodal_emotion_processing_tpu import runtime

    rows = [np.arange(4, dtype=np.float32) for _ in range(3)]
    out64 = np.zeros((3, 4), np.float64)
    got = runtime.gather_rows(rows, out=out64)   # numpy path, value-correct
    np.testing.assert_array_equal(got, np.stack(rows))
    short = np.zeros((2, 4), np.float32)
    with pytest.raises(Exception):  # numpy assignment raises, no corruption
        runtime.gather_rows(rows, out=short)
    with pytest.raises(ValueError, match="at least one"):
        runtime.gather_rows([])
