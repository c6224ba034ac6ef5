"""Concurrent serving THROUGHPUT — the micro-batching server vs the
reference's sequential batch-1 loop.

bench/latency.py measures the single-request p50 (where this image's
relay round-trip floors every design at ~30+ ms).  This module measures
what production load actually sees: N in-flight requests through
`serve.BatchingServer` (grouped into bucketed static-shape ensemble
forwards — one dispatch per bucket) against the same N requests through
the sequential batch-1 `StreamingPredictor` loop (one dispatch each, the
reference's serving structure, robot_demo.py:594-640).

    python -m multimodal_emotion_processing_tpu.bench.serving [config] [N]

Prints ONE JSON line.  Honesty note: every request's result is fully
fetched through its future before the clock stops — there is no
block_until_ready anywhere in the path (utils/sync.py caveat).

Measured 2026-08-17 (robot_demo, 4 members, N=64, buckets<=16, real chip):
sequential 13.8 req/s (72.5 ms/req) -> server 42.7 req/s (23.4 ms/req),
3.10x — the dispatch round-trip amortized over each 16-request bucket.
"""

from __future__ import annotations

import json
import sys
import time


def measure(config_name: str = "robot_demo", n_requests: int = 64, *,
            members: int = 4, reps: int = 3,
            buckets=(1, 2, 4, 8, 16), max_delay_ms: float = 3.0):
    import jax

    from multimodal_emotion_processing_tpu import configs
    from multimodal_emotion_processing_tpu.data.synthetic import synthetic_dataset
    from multimodal_emotion_processing_tpu.models import build_model
    from multimodal_emotion_processing_tpu.serve import (BatchingServer,
                                                         StreamingPredictor)

    exp = configs.get(config_name)
    model = build_model(exp)
    params = [model.init(jax.random.PRNGKey(i)) for i in range(members)]
    samples = synthetic_dataset(config_name, exp.model, n_requests, seed=0)

    sp = StreamingPredictor(model, params, offsets=exp.thresholds)
    sp.warmup(samples[0])
    seq_best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for s in samples:
            sp.predict(s)                      # fetches the full result
        seq_best = min(seq_best, time.perf_counter() - t0)

    srv = BatchingServer(model, params, offsets=exp.thresholds,
                         buckets=buckets, max_delay_ms=max_delay_ms)
    try:
        srv.warmup(samples[0])
        srv_best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            futs = [srv.submit(s) for s in samples]
            for f in futs:
                f.result(timeout=600)          # fetches the full result
            srv_best = min(srv_best, time.perf_counter() - t0)
        stats = srv.stats()
    finally:
        srv.close()

    return {
        "config": config_name,
        "n_requests": n_requests,
        "members": members,
        "sequential_rps": round(n_requests / seq_best, 1),
        "server_rps": round(n_requests / srv_best, 1),
        "speedup": round(seq_best / srv_best, 2),
        "ms_per_req": {"sequential": round(seq_best * 1e3 / n_requests, 2),
                       "server": round(srv_best * 1e3 / n_requests, 2)},
        "server_batches": stats["batches"],
        "by_bucket": {str(k): v for k, v in stats["by_bucket"].items() if v},
    }


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    config = argv[0] if argv else "robot_demo"
    n = int(argv[1]) if len(argv) > 1 else 64
    print(json.dumps(measure(config, n)))


if __name__ == "__main__":
    main()
