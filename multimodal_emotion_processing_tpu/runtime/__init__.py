"""Native runtime bridge: builds the C++ data-pipeline kernels with g++ on
first use (cached .so beside the source) and exposes them via ctypes.  Every
entry point has a numpy fallback, so the framework works without a compiler;
`available()` reports which path is active.

Measured on this image (1 host core): the native kernels run at parity with
numpy's vectorized equivalents (sanitize 1.06x, gather 0.85x, pad 0.64x —
all memcpy/scan-bound; ctypes call overhead eats the margin on small arrays),
and BOTH are ~500x faster than the reference's per-element Python loops
(cmu-mosei/run.py:107-110: 5.3 ms vs 0.01 ms per 200x74 sanitize).  The data
pipeline therefore defaults to the numpy implementations; the native layer is
kept for hosts where numpy's scan is not SIMD-optimal and as the C++ runtime
surface for future pipeline work (multi-buffer assembly, mmap'd feature
stores).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "batcher.cpp")
_SO = os.path.join(_HERE, "native", "libmepbatcher.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_c_float_p = ctypes.POINTER(ctypes.c_float)


def _build() -> Optional[ctypes.CDLL]:
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", _SO, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.mep_gather_rows.argtypes = [
            _c_float_p, ctypes.POINTER(_c_float_p), ctypes.c_int64,
            ctypes.c_int64]
        lib.mep_sanitize.argtypes = [_c_float_p, ctypes.c_int64, ctypes.c_float]
        lib.mep_sanitize.restype = ctypes.c_int64
        lib.mep_pad_or_truncate.argtypes = [
            _c_float_p, ctypes.c_int64, ctypes.c_int64, _c_float_p,
            _c_float_p, ctypes.c_int64]
        lib.mep_stride_subsample.argtypes = [
            _c_float_p, ctypes.c_int64, ctypes.c_int64, _c_float_p,
            ctypes.c_int64]
        lib.mep_summary_rows.argtypes = [
            _c_float_p, ctypes.c_int64, ctypes.c_int64, _c_float_p,
            _c_float_p, _c_float_p]
        lib.mep_quantize_rows.argtypes = [
            _c_float_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int8), _c_float_p]
        return lib
    except Exception as e:  # compiler missing, load failure, ...
        print(f"[mep-runtime] native build unavailable ({e}); numpy fallback",
              file=sys.stderr)
        return None


def _get() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if not _tried:
        with _lock:
            if not _tried:
                _lib = _build()
                _tried = True
    return _lib


def available() -> bool:
    return _get() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(_c_float_p)


def gather_rows(arrays, out: Optional[np.ndarray] = None) -> np.ndarray:
    """Stack n same-shape arrays into out[0:n] with one native call.

    Fast path requires C-contiguous float32 inputs (what the sample
    assemblers produce); anything else falls back to numpy row-assign.
    """
    n = len(arrays)
    if n == 0:
        raise ValueError("gather_rows needs at least one array")
    first = arrays[0]
    shape = first.shape
    if out is None:
        out = np.empty((n,) + shape, np.float32)
    lib = _get()
    # the native memcpy writes through out's raw pointer — a wrong-dtype/
    # short/non-contiguous out would silently corrupt memory, so gate it to
    # the numpy path (which raises or broadcasts safely) like the inputs
    out_ok = (out.dtype == np.float32 and out.flags["C_CONTIGUOUS"]
              and out.shape == (n,) + shape)
    if lib is None or not out_ok or not all(
            isinstance(a, np.ndarray) and a.dtype == np.float32
            and a.flags["C_CONTIGUOUS"] and a.shape == shape for a in arrays):
        for i, a in enumerate(arrays):
            out[i] = a
        return out
    row_elems = int(np.prod(shape)) if shape else 1
    # raw-address array beats per-array ctypes wrapping by ~5us/row
    addrs = np.fromiter(
        (a.__array_interface__["data"][0] for a in arrays),
        dtype=np.uintp, count=n)
    lib.mep_gather_rows(_fp(out), addrs.ctypes.data_as(
        ctypes.POINTER(_c_float_p)), n, row_elems)
    return out


def sanitize_(a: np.ndarray, value: float = -71.0) -> int:
    """In-place inf/nan replacement; returns replacement count.  The native
    path requires C-contiguous float32 (copying would break in-place
    semantics for the caller); anything else uses the numpy path, which
    writes through views correctly."""
    lib = _get()
    if lib is None or a.dtype != np.float32 or not a.flags["C_CONTIGUOUS"]:
        bad = ~np.isfinite(a)
        a[bad] = value
        return int(bad.sum())
    return int(lib.mep_sanitize(_fp(a), a.size, value))


def pad_or_truncate(src: np.ndarray, target: int):
    lib = _get()
    src = np.ascontiguousarray(src, np.float32)
    if lib is None or src.ndim != 2:
        from ..data import masking

        return masking.pad_or_truncate(src, target)
    out = np.empty((target, src.shape[1]), np.float32)
    mask = np.empty(target, np.float32)
    lib.mep_pad_or_truncate(_fp(src), src.shape[0], src.shape[1],
                            _fp(out), _fp(mask), target)
    return out, mask


def stride_subsample(src: np.ndarray, target: int) -> np.ndarray:
    lib = _get()
    src = np.ascontiguousarray(src, np.float32)
    if lib is None or src.ndim != 2 or len(src) < target:
        gap = max(len(src) // target, 1)
        return src[np.arange(0, len(src), gap)[:target]]
    out = np.empty((target, src.shape[1]), np.float32)
    lib.mep_stride_subsample(_fp(src), src.shape[0], src.shape[1], _fp(out),
                             target)
    return out


def quantize_rows(v: np.ndarray):
    """Per-leading-axis-row symmetric int8 quantization for the compressed
    H2D wire: returns (q int8 like v, scales float32 (n,)) with
    q = clip(round(v / s), ±127), s = max(row absmax / 127, 1e-12).

    The native path fuses numpy's ~6 full-array passes (abs copy, max,
    divide, round, clip, astype — each with a temporary) into one
    absmax+quantize pair per row and is bit-equal to the numpy form
    (same f32 division, same round-half-to-even).  Measured on this
    1-core host: 1.28-1.33x numpy on a flagship-sized batch (9.1 ms vs
    11.6 ms for 64x200x(300+74+35) f32) — a modest cut to the prefetch
    worker's per-batch host cost under the int8 wire; see
    ENGINEERING_NOTES."""
    lib = _get()
    n = v.shape[0] if v.ndim else 1
    if (lib is not None and isinstance(v, np.ndarray) and v.ndim >= 1
            and v.dtype == np.float32 and v.flags["C_CONTIGUOUS"]
            and v.size > 0):
        q = np.empty(v.shape, np.int8)
        scales = np.empty(n, np.float32)
        lib.mep_quantize_rows(
            _fp(v), n, v.size // n,
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), _fp(scales))
        return q, scales
    flat = np.abs(v).reshape(n, -1) if v.ndim > 1 else np.abs(v)[:, None]
    scales = np.maximum(flat.max(axis=1) / 127.0, 1e-12).astype(np.float32)
    bshape = (-1,) + (1,) * (v.ndim - 1)
    q = np.clip(np.round(v / scales.reshape(bshape)),
                -127, 127).astype(np.int8)
    return q, scales


def summary_rows(src: np.ndarray):
    """(max, min, mean) feature rows over the sequence."""
    lib = _get()
    src = np.ascontiguousarray(src, np.float32)
    if lib is None or src.ndim != 2 or len(src) == 0:
        return src.max(0), src.min(0), src.mean(0)
    d = src.shape[1]
    mx, mn, mean = (np.empty(d, np.float32) for _ in range(3))
    lib.mep_summary_rows(_fp(src), src.shape[0], d, _fp(mx), _fp(mn), _fp(mean))
    return mx, mn, mean
