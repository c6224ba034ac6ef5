"""Probe the dh=128 ceiling: s1024 with heads=8 (dh 64->128 — full lanes in
every flash kernel operand).  Attention FLOPs are head-count-independent;
if this is much faster, a head-paired kernel layout has proven headroom."""
import dataclasses, time, sys
import jax
from multimodal_emotion_processing_tpu import configs
from multimodal_emotion_processing_tpu.models import build_model
from multimodal_emotion_processing_tpu.train import engine as eng
from multimodal_emotion_processing_tpu.utils.sync import fetch_scalar
import bench

exp = configs.get("mosei_trans_s1024")
exp = dataclasses.replace(
    exp,
    model=dataclasses.replace(exp.model, n_heads=8),
    train=dataclasses.replace(exp.train, batch_size=64))
m = exp.model
model = build_model(exp)
batch = jax.device_put(bench.make_batch(m, 64))
tx, step = eng.make_train_step(model, exp.train, impl=m.attn_impl, donate=False)
state = eng.init_state(model, tx, seed=0)
state, loss = step(state, batch)
print("h8 loss:", fetch_scalar(loss), file=sys.stderr)
times = []
for _ in range(5):
    t0 = time.perf_counter()
    for _ in range(5):
        state, loss = step(state, batch)
    fetch_scalar(loss)
    times.append((time.perf_counter() - t0) / 5 * 1000)
s = sorted(times)
print(f"heads=8 step: best {s[0]:.1f} median {s[2]:.1f} all {[round(t,1) for t in times]}")
