"""Dynamic micro-batching ensemble server — production serving on TPU.

The reference's serving story is a synchronous batch-1 loop: one sample in,
four sequential model forwards, one print (robot_demo.py:594-640).  That
shape is the worst case for a TPU: every request pays a full dispatch
round-trip and runs matmuls at batch 1.

TPU-native design: concurrent requests land in a queue; a collector thread
drains up to `max_batch` of them (waiting at most `max_delay_ms` for
followers after the first), pads the group up to a fixed BUCKET batch size,
and runs ONE jitted vmapped-ensemble forward for the whole group.  Bucketed
static shapes mean the programs are compiled once per bucket and never
again (XLA retraces on any new shape; a "just batch what arrived" server
would recompile constantly).  Padding rows repeat the last real sample and
their outputs are dropped.

Why it wins even where compute is tiny: serving cost per request =
dispatch round-trip + compute.  Batch-1 pays the round-trip per request;
this server pays it per *bucket* — on this image's relay (~30 ms RTT,
bench/latency.py) a full bucket of 8 is ~8x the sequential throughput at
one extra `max_delay_ms` of p50 latency, and on a directly-attached host
the same structure is what keeps the MXU fed.

Single-sample results are bitwise identical to `StreamingPredictor` for
the same member params: the batched program vmaps the same
`model.apply(train=False)` the batch-1 program runs, and no cross-sample
op (no batch norm anywhere in the model family) mixes rows.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def batched_ensemble_fn(model, offsets: Sequence[float], *, impl: str = "xla",
                        stacked=None, dtype: str = "float32"):
    """(member_params, batch(B, ...)) -> (logits (B, E), probs (B, E')):
    k-member vmapped forward, logit mean over members, calibrated sigmoid —
    the serve/stream.py computation generalized from batch 1 to batch B."""
    off = jnp.asarray(offsets, jnp.float32)
    if off.shape[0] == 0:
        raise ValueError(
            "serving needs calibrated per-emotion offsets; this config has "
            "none — serve a config with fixed thresholds")

    def run(member_params, batch):
        from ..train.engine import infer_cast, infer_upcast

        member_params, batch = infer_cast(member_params, batch, dtype)
        logits = jax.vmap(
            lambda p: infer_upcast(model.apply(p, batch, train=False,
                                               impl=impl, stacked=stacked))
        )(member_params)                            # (k, B, E)
        if logits.ndim != 3:
            raise ValueError(
                f"serving expects per-sample logits (k, B, E); got "
                f"{logits.shape} — the paragraph model is not a serving head")
        pred = jnp.mean(logits, axis=0)             # (B, E)
        probs = jax.nn.sigmoid(pred[:, : off.shape[0]] - off)
        return pred, probs

    return run


class BatchingServer:
    """Thread-safe dynamic batcher over a k-member ensemble.

    submit(sample) -> concurrent.futures.Future resolving to
    (logits (E,), calibrated probs (E',)) numpy arrays; predict(sample)
    is the blocking convenience.  Use as a context manager or call
    close() — the collector is a daemon thread either way.
    """

    def __init__(self, model, params_list: Sequence, offsets: Sequence[float],
                 *, impl: str = "xla", stacked_grid: bool = False,
                 max_delay_ms: float = 2.0, buckets: Sequence[int] = (1, 2, 4, 8),
                 dtype: str = "float32"):
        if not buckets or sorted(buckets) != list(buckets):
            raise ValueError("buckets must be a sorted, non-empty sequence")
        self.buckets = tuple(int(b) for b in buckets)
        self.max_batch = self.buckets[-1]
        self.max_delay = float(max_delay_ms) / 1e3
        self.members = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
        self._fn = jax.jit(batched_ensemble_fn(
            model, offsets, impl=impl,
            stacked=True if stacked_grid else None, dtype=dtype))
        self._q: "queue.Queue" = queue.Queue()
        self._stats = {"requests": 0, "batches": 0, "padded_rows": 0,
                       "by_bucket": {b: 0 for b in self.buckets}}
        self._closed = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="mep-batching-server")
        self._thread.start()

    # -- client side ------------------------------------------------------
    def submit(self, sample: Dict[str, np.ndarray]) -> Future:
        if self._closed.is_set():
            raise RuntimeError("server is closed")
        fut: Future = Future()
        self._q.put((sample, fut))
        if self._closed.is_set():
            # lost the race with close(): its drain may already have run, so
            # nothing would ever resolve this future — fail leftovers here
            self._fail_pending()
        return fut

    def predict(self, sample: Dict[str, np.ndarray]):
        pred, probs = self.submit(sample).result()
        return pred, probs

    def warmup(self, sample: Dict[str, np.ndarray]) -> None:
        """Compile every bucket program up front (otherwise the first
        request at each fill level pays its compile)."""
        for b in self.buckets:
            batch = self._stack([sample] * b)
            jax.block_until_ready(self._fn(self.members, batch))

    def stats(self) -> Dict:
        by = dict(self._stats["by_bucket"])
        return {**{k: v for k, v in self._stats.items() if k != "by_bucket"},
                "by_bucket": by}

    def _fail_pending(self) -> None:
        """Fail every still-enqueued request (post-close) instead of letting
        its caller hang; tolerant of futures the collector already resolved
        in the shutdown race."""
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                return
            if item is not None:
                try:
                    item[1].set_exception(RuntimeError("server closed"))
                except Exception:   # already resolved: nothing to do
                    pass

    def close(self) -> None:
        self._closed.set()
        self._q.put(None)                   # wake the collector
        self._thread.join(timeout=10)
        # a submit that raced close may have left requests enqueued after
        # the collector exited — fail their futures rather than hang callers
        self._fail_pending()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- collector side ---------------------------------------------------
    @staticmethod
    def _stack(samples) -> Dict[str, np.ndarray]:
        keys = [k for k in samples[0] if k != "label"]
        return {k: np.stack([np.asarray(s[k]) for s in samples]) for k in keys}

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.max_batch

    def _drain_group(self):
        """Block for the first request, then wait up to max_delay (total)
        for followers, capped at max_batch.  Returns [] on shutdown."""
        first = self._q.get()
        if first is None:
            return []
        group = [first]
        deadline = time.perf_counter() + self.max_delay
        while len(group) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                item = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if item is None:
                break
            group.append(item)
        return group

    def _loop(self):
        while not self._closed.is_set():
            group = self._drain_group()
            if not group:
                continue
            samples, futs = zip(*group)
            bucket = self._bucket_for(len(samples))
            padded = list(samples) + [samples[-1]] * (bucket - len(samples))
            try:
                pred, probs = self._fn(self.members, self._stack(padded))
                pred = np.asarray(pred)
                probs = np.asarray(probs)
            except Exception as e:  # deliver, don't kill the collector
                for f in futs:
                    f.set_exception(e)
                continue
            self._stats["requests"] += len(futs)
            self._stats["batches"] += 1
            self._stats["padded_rows"] += bucket - len(futs)
            self._stats["by_bucket"][bucket] += 1
            for i, f in enumerate(futs):
                f.set_result((pred[i], probs[i]))
