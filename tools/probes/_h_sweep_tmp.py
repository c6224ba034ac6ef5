"""dh=128 head-count probe for s512 (8->4 heads) and s256 (8->2)."""
import dataclasses, time, sys
import jax
from multimodal_emotion_processing_tpu import configs
from multimodal_emotion_processing_tpu.models import build_model
from multimodal_emotion_processing_tpu.train import engine as eng
from multimodal_emotion_processing_tpu.utils.sync import fetch_scalar
import bench

for preset, B, heads_list in (("mosei_trans_s512", 32, (8, 4)),
                              ("mosei_trans_s256", 64, (8, 2))):
    for h in heads_list:
        exp = configs.get(preset)
        exp = dataclasses.replace(
            exp, model=dataclasses.replace(exp.model, n_heads=h),
            train=dataclasses.replace(exp.train, batch_size=B))
        m = exp.model
        model = build_model(exp)
        batch = jax.device_put(bench.make_batch(m, B))
        tx, step = eng.make_train_step(model, exp.train, impl=m.attn_impl,
                                       donate=False)
        state = eng.init_state(model, tx, seed=0)
        state, loss = step(state, batch)
        fetch_scalar(loss)
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(8):
                state, loss = step(state, batch)
            fetch_scalar(loss)
            times.append((time.perf_counter() - t0) / 8 * 1000)
        s = sorted(times)
        print(f"{preset} heads={h}: best {s[0]:.2f} median "
              f"{s[len(s)//2]:.2f} all {[round(t,1) for t in times]}")
