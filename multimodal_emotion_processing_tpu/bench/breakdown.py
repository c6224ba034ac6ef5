"""Flagship train-step cost breakdown: where do the milliseconds go?

The honest flagship step is ~10 ms at B=64 (~2% MFU).  This script times a
nested sequence of sub-programs on the real chip (honest scalar-fetch sync,
utils/sync.py) and differences them into a cost ledger:

    forward            = predict program (inference forward)
    +loss              = train-mode batch_loss, no grad (includes dropout
                         masks and the R-Drop KL term where the config has
                         them, so it nests inside the train step's forward)
    +backward          = value_and_grad (no update)
    +clip+optimizer    = the full train step

plus a per-stream attention microbench (the 9 grid streams' exact shapes,
run standalone) so "attention vs everything else" is measured rather than
inferred from FLOP counts.

    python -m multimodal_emotion_processing_tpu.bench.breakdown [config] [impl]

One JSON dict on stdout; progress on stderr.  Differences between phases
carry the shared ~1 ms relay dispatch overhead in EVERY term, so the ledger
reports both raw ms and the overhead-free delta vs the next-smaller program
(each program is timed the same way; the dispatch cost cancels in deltas).
"""

from __future__ import annotations

import json
import sys


def _measure(fn, sync_of, *args, steps=20, reps=4):
    """Best-of-reps ms per call (the shared utils/timing.py window)."""
    from multimodal_emotion_processing_tpu.utils.timing import best_window_ms

    return best_window_ms(fn, *args, steps=steps, reps=reps,
                          sync_pick=sync_of)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_emotion_processing_tpu import configs
    from multimodal_emotion_processing_tpu.data.loader import Batcher
    from multimodal_emotion_processing_tpu.data.synthetic import synthetic_dataset
    from multimodal_emotion_processing_tpu.models import build_model
    from multimodal_emotion_processing_tpu.ops.attention import scored_attention
    from multimodal_emotion_processing_tpu.train import engine as eng

    name = sys.argv[1] if len(sys.argv) > 1 else "mosei_trans"
    impl = sys.argv[2] if len(sys.argv) > 2 else "xla"
    exp = configs.get(name)
    m = exp.model
    b = exp.train.batch_size
    model = build_model(exp)
    samples = synthetic_dataset(name, m, b, seed=0)
    batch = jax.device_put(
        next(iter(Batcher(samples, b, shuffle=False, pad_final=False)())))

    tx, step = eng.make_train_step(model, exp.train, impl=impl)
    state = eng.init_state(model, tx, seed=0)

    predict = eng.make_predict_step(model, impl=impl)

    def value_fn(params, batch):
        # train=True + fixed rng: the value/grad programs must nest inside
        # the TRAIN step's forward (same dropout masks and R-Drop KL term
        # where the config has them) or those costs would land in the wrong
        # delta; a fixed key is fine — cost, not trajectory, is measured
        return eng.batch_loss(model, exp.train, params, batch,
                              jax.random.PRNGKey(0), True, impl)

    value = jax.jit(value_fn)
    grad = jax.jit(jax.value_and_grad(value_fn))

    rows = {"impl": impl}
    rows["forward_ms"] = _measure(predict, lambda o: o, state.params, batch)
    print(f"forward {rows['forward_ms']:.2f} ms", file=sys.stderr, flush=True)
    rows["forward_loss_ms"] = _measure(value, lambda o: o, state.params, batch)
    print(f"+loss {rows['forward_loss_ms']:.2f} ms", file=sys.stderr, flush=True)
    rows["forward_backward_ms"] = _measure(
        grad, lambda o: o[0], state.params, batch)
    print(f"+backward {rows['forward_backward_ms']:.2f} ms", file=sys.stderr,
          flush=True)

    # full step mutates state; time it with a rebound local to keep the
    # parameters (and thus program) constant across windows
    st = state

    def full(batch):
        nonlocal st
        st, loss = step(st, batch)
        return loss

    rows["train_step_ms"] = _measure(full, lambda o: o, batch)
    print(f"train step {rows['train_step_ms']:.2f} ms", file=sys.stderr,
          flush=True)

    # per-stream attention microbench: the 9 (query_len, kv_len) pairs the
    # grid actually runs, each as its own jitted program at full batch
    lens = {"l": m.l_len, "v": m.v_len, "a": m.a_len}
    att0 = jax.jit(lambda q, k, v, mask, c: scored_attention(
        q, k, v, mask, None, c, n_heads=m.n_heads, impl=impl,
        emit_scores=m.n_layers > 1)[0])
    # layers >= 1 additionally read a (B,H,Lq,Lkv) residual-score input —
    # time that variant separately so multi-layer configs are not understated
    att1 = jax.jit(lambda q, k, v, mask, sp, c: scored_attention(
        q, k, v, mask, sp, c, n_heads=m.n_heads)[0])
    rng = np.random.default_rng(0)
    total_att = 0.0
    per_stream = {}
    # concat_trans runs TWO grids per forward (intensity + stimulation)
    grids = 2 if m.head == "concat_trans" else 1
    eff_b = b * (m.p_len if m.head == "state_transfer" else 1)
    for qm in ("l", "v", "a"):
        for kvm in ("l", "v", "a"):
            lq, lkv = lens[qm], lens[kvm]
            q = jnp.asarray(rng.standard_normal((eff_b, lq, m.dim)),
                            jnp.float32)
            k = jnp.asarray(rng.standard_normal((eff_b, lkv, m.dim)),
                            jnp.float32)
            v = jnp.asarray(rng.standard_normal((eff_b, lkv, m.dim)),
                            jnp.float32)
            mask = jnp.ones((eff_b, lkv), jnp.float32)
            c = jnp.asarray([0.3], jnp.float32)
            ms = _measure(att0, lambda o: o, q, k, v, mask, c)
            per_stream[f"{qm}<-{kvm}"] = round(ms, 3)
            total_att += ms * grids
            if m.n_layers > 1:
                sp = jnp.asarray(
                    rng.standard_normal((eff_b, m.n_heads, lq, lkv)),
                    jnp.float32)
                ms1 = _measure(att1, lambda o: o, q, k, v, mask, sp, c)
                per_stream[f"{qm}<-{kvm}+sprev"] = round(ms1, 3)
                total_att += ms1 * (m.n_layers - 1) * grids
    rows["attention_only_sum_ms"] = round(total_att, 2)
    rows["attention_streams_ms"] = per_stream

    d = rows
    ledger = {
        "config": name, "batch": b,
        "forward_ms": round(d["forward_ms"], 2),
        "loss_delta_ms": round(d["forward_loss_ms"] - d["forward_ms"], 2),
        "backward_delta_ms": round(
            d["forward_backward_ms"] - d["forward_loss_ms"], 2),
        "optimizer_delta_ms": round(
            d["train_step_ms"] - d["forward_backward_ms"], 2),
        "train_step_ms": round(d["train_step_ms"], 2),
        "attention_only_sum_ms": d["attention_only_sum_ms"],
        "attention_streams_ms": d["attention_streams_ms"],
        "note": ("each phase timed identically, so the shared relay dispatch "
                 "overhead cancels in the *_delta_ms terms; loss_delta_ms "
                 "also carries dropout-mask and R-Drop-KL cost for configs "
                 "that have them (the train-mode forward vs the inference "
                 "forward); attention_only_sum_ms sums standalone dispatches "
                 "(sprev-free for layer 0, +sprev variants for deeper "
                 "layers) x grids and carries per-dispatch overhead many "
                 "times — an upper bound"),
    }
    print(json.dumps(ledger), flush=True)


if __name__ == "__main__":
    main()
