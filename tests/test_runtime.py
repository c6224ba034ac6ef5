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


def _numpy_quantize(v):
    n = v.shape[0]
    flat = np.abs(v).reshape(n, -1) if v.ndim > 1 else np.abs(v)[:, None]
    scales = np.maximum(flat.max(axis=1) / 127.0, 1e-12).astype(np.float32)
    bshape = (-1,) + (1,) * (v.ndim - 1)
    q = np.clip(np.round(v / scales.reshape(bshape)), -127, 127)
    return q.astype(np.int8), scales


def test_quantize_rows_native_bit_equals_numpy():
    """The fused C++ row quantizer must be BIT-equal to the numpy form the
    int8 wire documented (same f32 division, round-half-to-even), including
    tie values and all-zero rows (the 1e-12 scale floor)."""
    assert runtime.available()
    rng = np.random.default_rng(5)
    for shape in [(6, 50, 74), (8, 300), (7,)]:
        v = (rng.standard_normal(shape) * 30).astype(np.float32)
        q_native, s_native = runtime.quantize_rows(v)
        q_np, s_np = _numpy_quantize(v)
        assert q_native.dtype == np.int8 and s_native.dtype == np.float32
        np.testing.assert_array_equal(s_native, s_np)
        np.testing.assert_array_equal(q_native, q_np)
    # ties: rows whose absmax makes v/s land exactly on k + 0.5
    v = np.array([[127.0, 63.5, -63.5, 31.75, 0.5]], np.float32) * 2
    q_native, s_native = runtime.quantize_rows(v)
    q_np, s_np = _numpy_quantize(v)
    np.testing.assert_array_equal(q_native, q_np)
    np.testing.assert_array_equal(s_native, s_np)
    # all-zero row: scale floors at 1e-12, q all zero
    z = np.zeros((2, 9), np.float32)
    qz, sz = runtime.quantize_rows(z)
    assert (qz == 0).all() and (sz == np.float32(1e-12)).all()
    # non-contiguous input falls back to numpy, still value-correct
    nc = np.asfortranarray((rng.standard_normal((4, 6)) * 9)
                           .astype(np.float32))
    qn, sn = runtime.quantize_rows(nc)
    qw, sw = _numpy_quantize(np.ascontiguousarray(nc))
    np.testing.assert_array_equal(qn, qw)
    np.testing.assert_array_equal(sn, sw)


def test_cast_for_transfer_int8_uses_quantize_rows():
    """cast_for_transfer's int8 feature branch routes through
    runtime.quantize_rows (native when built) and matches the numpy form."""
    from multimodal_emotion_processing_tpu.data.loader import (
        WIRE_SCALE_SUFFIX, cast_for_transfer, resolve_transfer_dtype)

    rng = np.random.default_rng(6)
    batch = {"text": (rng.standard_normal((4, 11, 8)) * 5).astype(np.float32),
             "text_mask": np.ones((4, 11), np.float32)}
    out = cast_for_transfer(batch, resolve_transfer_dtype("int8"))
    q, s = _numpy_quantize(batch["text"])
    np.testing.assert_array_equal(out["text"], q)
    np.testing.assert_array_equal(out["text" + WIRE_SCALE_SUFFIX], s)
    assert out["text_mask"].dtype == np.float16


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
