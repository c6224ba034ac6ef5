"""Capture an xplane trace of the s1024-bf16 B=64 flash train step and rank
HLO ops by self-time (tensorboard_plugin_profile converter) — the measured
answer to 'where do the non-attention milliseconds go' (VERDICT r3 weak #2).
Temp tool, not part of the package."""
import dataclasses, glob, gzip, json, sys

import numpy as np
import jax

from multimodal_emotion_processing_tpu import configs
from multimodal_emotion_processing_tpu.models import build_model
from multimodal_emotion_processing_tpu.train import engine as eng
from multimodal_emotion_processing_tpu.utils.sync import fetch_scalar
import bench

exp = configs.get("mosei_trans_s1024")
exp = dataclasses.replace(exp, train=dataclasses.replace(exp.train,
                                                         batch_size=64))
m = exp.model
model = build_model(exp)
batch = jax.device_put(bench.make_batch(m, 64))
tx, step = eng.make_train_step(model, exp.train, impl=m.attn_impl)
state = eng.init_state(model, tx, seed=0)
state, loss = step(state, batch)
fetch_scalar(loss)
print("compiled; tracing", file=sys.stderr)

with jax.profiler.trace("/tmp/prof_s1024"):
    for _ in range(3):
        state, loss = step(state, batch)
    fetch_scalar(loss)

paths = sorted(glob.glob("/tmp/prof_s1024/**/*.xplane.pb", recursive=True))
print("xplanes:", paths, file=sys.stderr)
from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

data, _ = rtd.xspace_to_tool_data(paths, "framework_op_stats", {"tqx": "out:csv"})
if isinstance(data, bytes):
    data = data.decode()
open("/tmp/prof_s1024_opstats.csv", "w").write(data)
rows = data.splitlines()
print(rows[0])
for r in rows[1:26]:
    print(r)
