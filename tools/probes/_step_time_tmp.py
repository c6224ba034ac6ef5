"""Time the s1024-bf16 B=64 flash train step (engine.make_train_step),
honest scalar-fetch sync; prints best/median of 5x5-step windows."""
import dataclasses, time, sys
import numpy as np
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
batch = jax.device_put(bench.make_batch(m, 64))
tx, step = eng.make_train_step(model, exp.train, impl=m.attn_impl, donate=False)
state = eng.init_state(model, tx, seed=0)
state, loss = step(state, batch)
print("loss after 1 step:", fetch_scalar(loss), file=sys.stderr)
times = []
for rnd in range(5):
    t0 = time.perf_counter()
    for _ in range(5):
        state, loss = step(state, batch)
    fetch_scalar(loss)
    times.append((time.perf_counter() - t0) / 5 * 1000)
s = sorted(times)
print(f"step: best {s[0]:.1f} median {s[2]:.1f} all {[round(t,1) for t in times]}")
