"""Scan k=8 at s1024-bf16 B=64 flash: does dispatch amortization recover the
~6 ms/step host-dispatch gap (110.7 timed vs 104.2 device)?"""
import dataclasses, time, sys
import jax
from multimodal_emotion_processing_tpu import configs
from multimodal_emotion_processing_tpu.models import build_model
from multimodal_emotion_processing_tpu.train import engine as eng
from multimodal_emotion_processing_tpu.utils.sync import fetch_scalar
import bench

exp = configs.get("mosei_trans_s1024")
exp = dataclasses.replace(exp, train=dataclasses.replace(exp.train, batch_size=64))
m = exp.model
model = build_model(exp)
k = 8
host = bench.make_batch(m, 64)
import numpy as np
group = {key: np.stack([host[key]] * k) for key in host}
dev = jax.device_put(group)
tx, scan_step = eng.make_scan_train_step(model, exp.train, impl=m.attn_impl,
                                         donate=False)
state = eng.init_state(model, tx, seed=0)
state, losses = scan_step(state, dev)
print("losses[0]:", fetch_scalar(losses[0]), file=sys.stderr)
times = []
for _ in range(4):
    t0 = time.perf_counter()
    for _ in range(2):
        state, losses = scan_step(state, dev)
    fetch_scalar(losses)
    times.append((time.perf_counter() - t0) / (2 * k) * 1000)
s = sorted(times)
print(f"scan k={k} per-step: best {s[0]:.1f} median {s[len(s)//2]:.1f} all {[round(t,1) for t in times]}")
