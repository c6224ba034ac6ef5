"""Batch-1 ensemble inference LATENCY — the reference's p50 path.

The reference's test protocol runs batch_size=1 through FOUR sequential model
forwards per sample (cmu-mosei/run.py:456-476), and the robot demo does the
same for live streaming (robot_demo.py:611-614).  SURVEY §3.2 calls this "the
inference latency path the TPU build must beat" — throughput benches
(bench.py, bench/all_configs.py) never measure it, so this module records it.

    python -m multimodal_emotion_processing_tpu.bench.latency [config]

Prints ONE JSON line: per-call latency percentiles for
  * jax compute-only  — device-resident batch-1 sample, vmapped 4-member
    ensemble in one jitted program (serve/stream.py design);
  * jax end-to-end    — fresh numpy sample each call (includes the H2D copy;
    on this image that copy crosses a network relay and dominates — see
    serve/stream.py's measured note);
  * torch-cpu         — the reference protocol: 4 sequential model.forward
    calls on the same batch-1 tensors.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _percentiles(times_s):
    t = np.asarray(times_s) * 1e3
    return {"p50_ms": round(float(np.percentile(t, 50)), 3),
            "p90_ms": round(float(np.percentile(t, 90)), 3),
            "best_ms": round(float(t.min()), 3)}


def measure_jax(config_name: str, *, members: int = 4, reps: int = 200):
    import jax

    from multimodal_emotion_processing_tpu import configs
    from multimodal_emotion_processing_tpu.data.synthetic import synthetic_dataset
    from multimodal_emotion_processing_tpu.models import build_model
    from multimodal_emotion_processing_tpu.serve import StreamingPredictor

    exp = configs.get(config_name)
    model = build_model(exp)
    params = [model.init(jax.random.PRNGKey(i)) for i in range(members)]
    sp = StreamingPredictor(model, params, offsets=exp.thresholds)
    sample = synthetic_dataset(config_name, exp.model, 1, seed=7)[0]
    sp.warmup(sample)

    # compute-only: the batch-1 sample already on device
    dev_batch = jax.device_put(sp._batch1(sample))
    np.asarray(sp._run(sp.stacked, dev_batch)[1])  # fetch: the
    # relay's block_until_ready can ack early; the probs bytes cannot lie
    compute = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(sp._run(sp.stacked, dev_batch)[1])
        compute.append(time.perf_counter() - t0)

    # end-to-end: fresh host sample each call (H2D included)
    e2e = []
    for _ in range(max(reps // 4, 10)):
        t0 = time.perf_counter()
        sp.predict(sample)
        e2e.append(time.perf_counter() - t0)
    return _percentiles(compute), _percentiles(e2e)


def measure_torch(config_name: str, *, members: int = 4, reps: int = 30):
    """The reference's sequential 4-forward batch-1 loop, torch-CPU.  Only the
    flagship family has a torch replica here (bench/torch_baseline.py)."""
    import torch

    from multimodal_emotion_processing_tpu import configs
    from multimodal_emotion_processing_tpu.bench.torch_baseline import (
        build_torch_model)

    if config_name != "mosei_trans":
        return None
    exp = configs.get(config_name)
    m = exp.model
    torch.manual_seed(0)
    models = [build_torch_model(m).eval() for _ in range(members)]
    r = np.random.default_rng(7)
    t = {
        "l": torch.tensor(r.standard_normal((1, 2, m.l_len, m.l_dim)),
                          dtype=torch.float32),
        "v": torch.tensor(r.standard_normal((1, 2, m.v_len, m.v_dim)),
                          dtype=torch.float32),
        "a": torch.tensor(r.standard_normal((1, 2, m.a_len, m.a_dim)),
                          dtype=torch.float32),
        "lm": torch.ones((1, 2, m.l_len)), "vm": torch.ones((1, 2, m.v_len)),
        "am": torch.ones((1, 2, m.a_len)),
    }
    args = (t["l"], t["v"], t["a"], t["lm"], t["vm"], t["am"])
    with torch.no_grad():
        for mod in models:
            mod(*args)  # warmup
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            preds = [mod(*args) for mod in models]
            _ = torch.stack(preds).mean(0).numpy()
            times.append(time.perf_counter() - t0)
    return _percentiles(times)


def main(config_name: str = "mosei_trans"):
    compute, e2e = measure_jax(config_name)
    torch_lat = measure_torch(config_name)
    out = {"metric": f"{config_name} batch-1 4-member ensemble latency",
           "jax_compute": compute, "jax_end_to_end": e2e}
    if torch_lat is not None:
        out["torch_cpu"] = torch_lat
        out["compute_speedup_p50"] = round(
            torch_lat["p50_ms"] / compute["p50_ms"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "mosei_trans")
