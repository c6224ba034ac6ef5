"""Host-side batching and device prefetch.

The reference's per-batch Python assembly (zip/stack inside the train loop,
e.g. cmu-mosei/run.py:361-363) is the throughput bottleneck at these model
sizes (SURVEY §7.3.5).  Here:

  * batches are assembled into preallocated, STATIC-shape numpy buffers —
    the final partial batch is zero-padded to full size and carries a
    `sample_weight` vector so the jitted step never recompiles and the loss
    matches the reference's unpadded mean exactly;
  * `prefetch_to_device` runs assembly in a background thread and keeps N
    batches in flight on-device, overlapping host work with TPU compute;
  * the Ren-MME R-Drop duplication (each sample twice in a row,
    Ren-MME/run.py:143-146) is a batcher flag.

Stacking uses numpy row-assign (measured fastest on this host; the C++
runtime kernels exist for hosts where numpy's scan isn't SIMD-optimal — see
runtime/__init__.py for the measurements).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime import quantize_rows as _quantize_rows

#: wire formats for `cast_for_transfer` — "float16" (exact for the 0/1
#: mask/label/weight vectors, ~1e-3 relative rounding on features, saturates
#: at ±65504), "bfloat16" (full f32 range, coarser mantissa), and "int8"
#: (per-row symmetric quantization of FEATURE keys, ~4x fewer bytes;
#: mask/weight/label keys ride exact float16 — see cast_for_transfer).
WIRE_DTYPES = {"float16": np.float16, "bfloat16": jnp.bfloat16,
               "int8": "int8"}

#: f32 keys whose name contains one of these stay on the EXACT f16 path
#: under the "int8" wire (their values are 0/1 flags whose semantics — e.g.
#: the -1e8 additive attention mask — must not pick up quantization noise).
EXACT_KEY_SUBSTRINGS = ("mask", "weight", "label")

#: reserved suffix for the int8 wire's per-row dequantization scales
#: (consumed and dropped by train/engine.upcast_wire).
WIRE_SCALE_SUFFIX = "__wire_scale"


def resolve_transfer_dtype(dtype):
    """None | "float16" | "bfloat16" | "int8" | numpy dtype ->
    numpy dtype, the "int8" sentinel, or None."""
    if dtype is None:
        return None
    if isinstance(dtype, str):
        if dtype not in WIRE_DTYPES:
            raise ValueError(f"transfer_dtype must be one of "
                             f"{sorted(WIRE_DTYPES)}, got {dtype!r}")
        return WIRE_DTYPES[dtype]
    return np.dtype(dtype)


def cast_for_transfer(batch: Dict[str, np.ndarray], dtype) -> Dict:
    """Shrink the host->device wire bytes; the jitted steps restore float32
    in-graph (train/engine.upcast_wire) before any math, so these are
    TRANSFER formats, never compute dtypes.  On this image's network-relayed
    chip the put cost is byte-proportional (f32 543 ms -> f16 221 ms for a
    flagship-sized payload, 2026-08-18), and the data-fed path is
    transfer-bound (SURVEY §7.3.5).

      * float16/bfloat16 (2x fewer bytes): every float32 leaf is cast;
        lossy ~1e-3 relative on features (f16 saturates at ±65504; bf16 is
        range-safe), exact on 0/1 masks/labels/weights.
      * "int8" (4x fewer feature bytes): float32 FEATURE keys are
        symmetrically quantized per leading-axis row (q = round(v/s),
        s = rowwise max|v|/127, shipped as a small '<key>__wire_scale' f32
        vector; worst-case error s/2 per element); keys whose name contains
        mask/weight/label take the exact float16 path.  Quantization
        granularity follows the array's leading axis, so casting a
        scan-stacked (k, B, ...) group uses per-group scales — int8 is
        explicitly lossy and shape-dependent, unlike the half-float wires.

    Default OFF everywhere so torch-parity numerics stay bit-exact."""
    if dtype is None:
        return batch
    if not isinstance(dtype, str):  # numpy half-float wire
        return {k: (v.astype(dtype) if v.dtype == np.float32 else v)
                for k, v in batch.items()}
    assert dtype == "int8", dtype
    out = {}
    for k, v in batch.items():
        if k.endswith(WIRE_SCALE_SUFFIX):
            out[k] = v  # already-cast dict: scales pass through untouched
        elif v.dtype != np.float32:
            out[k] = v
        elif any(t in k for t in EXACT_KEY_SUBSTRINGS):
            out[k] = v.astype(np.float16)  # 0/1 values: exact
        else:
            # native single-pass row quantizer when built; bit-equal numpy
            # fallback otherwise (runtime.quantize_rows documents both).
            out[k], out[k + WIRE_SCALE_SUFFIX] = _quantize_rows(v)
    return out


class Batcher:
    def __init__(
        self,
        samples: Sequence[Dict[str, np.ndarray]],
        batch_size: int,
        *,
        shuffle: bool = True,
        duplicate: bool = False,
        pad_final: bool = True,
        seed: int = 0,
        drop_remainder: bool = False,
        resample=None,
    ):
        """`resample(epoch) -> samples` regenerates the sample list at the
        start of each epoch — e.g. the robot demo's per-epoch label-matched
        text substitution (the reference rebuilds its replace_dict inside
        every data_loader call, robot_demo.py:256-258)."""
        self.samples = list(samples)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.duplicate = duplicate
        self.pad_final = pad_final
        self.drop_remainder = drop_remainder
        self.resample = resample
        self._epoch = 0
        self._rng = np.random.default_rng(seed)
        if not self.samples:
            raise ValueError("empty sample list")
        self._keys = list(self.samples[0].keys())
        self._stacked = None  # struct-of-arrays cache (built lazily)
        self._ragged = False  # _stack() failed; don't retry every epoch

    def _stack(self):
        """Struct-of-arrays: one contiguous (N, ...) array per key, built once
        (per resample), so each batch is ONE vectorized gather per key instead
        of batch_size row copies — measured 13k -> 33k samples/s assembly on
        this host (now memory-bandwidth-bound at ~6.6 GB/s).  Falls back to
        per-row assembly for heterogeneous samples."""
        try:
            stacked = {k: np.stack([s[k] for s in self.samples])
                       for k in self._keys}
        except ValueError:  # ragged shapes / mismatched keys
            return False
        self._stacked = stacked
        return True

    def __call__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.resample is not None:
            self.samples = list(self.resample(self._epoch))
            self._epoch += 1
            self._stacked = None  # fresh samples -> fresh SoA cache
            self._ragged = False
        if self._stacked is None and not self._ragged and not self._stack():
            self._ragged = True  # remember: O(dataset) attempt, once not per epoch

        def gather(idx, k):
            if self._stacked is not None:
                return self._stacked[k][idx]
            # per-row fallback for heterogeneous sample lists
            first = np.asarray(self.samples[idx[0]][k])
            buf = np.zeros((len(idx),) + first.shape, dtype=first.dtype)
            for row, i in enumerate(idx):
                buf[row] = self.samples[i][k]
            return buf

        order = np.arange(len(self.samples))
        if self.shuffle:
            self._rng.shuffle(order)
        if self.duplicate:
            order = np.repeat(order, 2)  # sample appears twice, adjacent rows
        bs = self.batch_size * (2 if self.duplicate else 1)
        for start in range(0, len(order), bs):
            idx = order[start:start + bs]
            if len(idx) < bs and self.drop_remainder:
                return
            actual = len(idx)
            batch = {}
            for k in self._keys:
                g = gather(idx, k)
                if actual < bs and self.pad_final:
                    buf = np.zeros((bs,) + g.shape[1:], dtype=g.dtype)
                    buf[:actual] = g
                    g = buf
                batch[k] = g
            if self.pad_final:
                w = np.zeros(bs, np.float32)
                w[:actual] = 1.0
                batch["sample_weight"] = w
            yield batch

    def steps_per_epoch(self) -> int:
        n = len(self.samples) * (2 if self.duplicate else 1)
        bs = self.batch_size * (2 if self.duplicate else 1)
        if self.drop_remainder:
            return n // bs
        return -(-n // bs)


def stack_batches(
    iterator: Iterator[Dict[str, np.ndarray]], k: int,
) -> Iterator[Dict[str, np.ndarray]]:
    """Group k consecutive batches into ONE stacked pytree with a leading
    (k, ...) axis — the input format of engine.make_scan_train_step /
    make_scan_predict_step, which run k steps per dispatch — amortizing the
    per-dispatch overhead for an honest 1.1-3.8x by config
    (bench/all_configs.py; the round-2 "12-49x" reading was a sync
    artifact).  Batches must be shape-uniform (Batcher's pad_final
    default); the epoch tail is emitted as a smaller stack (its own compiled
    program — the tail size is constant across epochs, so exactly one extra
    compile)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    group = []
    for batch in iterator:
        group.append(batch)
        if len(group) == k:
            yield {key: np.stack([b[key] for b in group]) for key in group[0]}
            group = []
    if group:
        yield {key: np.stack([b[key] for b in group]) for key in group[0]}


def prefetch_to_device(
    iterator: Iterator[Dict[str, np.ndarray]],
    *,
    size: int = 2,
    sharding=None,
    data_axis: int = 0,
    transfer_dtype=None,
) -> Iterator[Dict]:
    """Background-thread prefetch: host assembly and H2D copies overlap with
    device compute.  With `sharding` (a NamedSharding), batches are placed
    sharded across the mesh; under multi-process (pod) execution each process
    transfers only its own slice of `data_axis` and the global array is
    assembled from per-process shards (parallel/mesh.put_global_batch —
    tested with a real 2-process gloo run).  `transfer_dtype`
    ("float16"/"bfloat16"): cast float32 leaves to a half-width wire format
    in the worker thread (see cast_for_transfer; the jitted steps upcast
    in-graph)."""

    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()
    wire = resolve_transfer_dtype(transfer_dtype)
    stop = threading.Event()  # consumer abandoned the generator early

    def put(batch):
        batch = cast_for_transfer(batch, wire)
        if sharding is not None:
            from ..parallel.mesh import put_global_batch

            out = put_global_batch(batch, sharding, data_axis=data_axis)
        else:
            out = jax.device_put(batch)
        # materialize the transfer HERE, in the worker thread: dispatching
        # compute on a still-in-flight put measured ~300 ms/batch stalls on
        # the relay-attached chip (~60x), and blocking in the worker is what
        # makes the copy actually overlap the consumer's compute
        jax.block_until_ready(out)
        return out

    def _offer(item) -> bool:
        """q.put that gives up when the consumer is gone — a plain put would
        park this thread forever on a full queue, pinning its device buffers
        for the life of the process."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for batch in iterator:
                if stop.is_set() or not _offer(put(batch)):
                    return
            _offer(_END)
        except BaseException as e:  # propagate assembly/transfer failures
            _offer(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()  # early close (break / exception / GC): release the worker
