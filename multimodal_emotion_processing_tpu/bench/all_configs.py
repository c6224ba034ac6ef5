"""Per-config throughput sweep: one JSON line per config family on stderr-free
stdout — evidence that every model family's hot path is measured, not just
the flagship (`bench.py` stays the single-line driver artifact).

    python -m multimodal_emotion_processing_tpu.bench.all_configs [impl]
"""

from __future__ import annotations

import json
import sys
import time


def _sync(x) -> float:
    """Fetch a scalar derived from the result: the relay's block_until_ready
    acks large programs early (utils/sync.py); a device_get cannot."""
    from multimodal_emotion_processing_tpu.utils.sync import fetch_scalar

    return fetch_scalar(x)


def synth_batch(name, m, b):
    from multimodal_emotion_processing_tpu.data.loader import Batcher
    from multimodal_emotion_processing_tpu.data.synthetic import synthetic_dataset

    samples = synthetic_dataset(name, m, b, seed=0)
    return next(iter(Batcher(samples, b, shuffle=False, pad_final=False)()))


def measure(name, *, impl="xla", steps=20, reps=4, scan_k=32):
    import jax
    import numpy as np

    from multimodal_emotion_processing_tpu import configs
    from multimodal_emotion_processing_tpu.models import build_model
    from multimodal_emotion_processing_tpu.train import engine as eng

    exp = configs.get(name)
    model = build_model(exp)
    b = exp.train.batch_size
    batch = jax.device_put(synth_batch(name, exp.model, b))
    tx, step = eng.make_train_step(model, exp.train, impl=impl)
    state = eng.init_state(model, tx, seed=0)
    state, loss = step(state, batch)
    _sync(loss)
    train_sps = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, loss = step(state, batch)
        _sync(loss)
        train_sps = max(train_sps, b * steps / (time.perf_counter() - t0))

    predict = eng.make_predict_step(model, impl=impl)
    out = predict(state.params, batch)
    _sync(out)
    infer_sps = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = predict(state.params, batch)
        _sync(out)
        infer_sps = max(infer_sps, b * steps / (time.perf_counter() - t0))

    # scan-chained path: scan_k distinct batches, scan_k steps per dispatch
    host = synth_batch(name, exp.model, b)
    stacked = jax.device_put({
        k: np.ascontiguousarray(np.broadcast_to(a[None], (scan_k,) + a.shape))
        for k, a in host.items()})
    scan_tx, scan_step = eng.make_scan_train_step(model, exp.train, impl=impl)
    sstate = eng.init_state(model, scan_tx, seed=0)
    sstate, losses = scan_step(sstate, stacked)
    _sync(losses)
    scan_train = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(2):
            sstate, losses = scan_step(sstate, stacked)
        _sync(losses)
        scan_train = max(scan_train, b * scan_k * 2 / (time.perf_counter() - t0))

    scan_predict = eng.make_scan_predict_step(model, impl=impl)
    outs = scan_predict(sstate.params, stacked)
    _sync(outs)
    scan_infer = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(2):
            outs = scan_predict(sstate.params, stacked)
        _sync(outs)
        scan_infer = max(scan_infer, b * scan_k * 2 / (time.perf_counter() - t0))

    return {"config": name, "impl": impl, "batch": b,
            "train_sps": round(train_sps, 1), "infer_sps": round(infer_sps, 1),
            "scan_k": scan_k, "scan_train_sps": round(scan_train, 1),
            "scan_infer_sps": round(scan_infer, 1)}


def main():
    impl = sys.argv[1] if len(sys.argv) > 1 else "xla"
    from multimodal_emotion_processing_tpu import configs

    for name in sorted(configs.REGISTRY):
        print(json.dumps(measure(name, impl=impl)), flush=True)


if __name__ == "__main__":
    main()
