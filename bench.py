"""Benchmark: CMU-MOSEI flagship train+infer samples/sec/chip vs torch-CPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N}

value        = samples/sec through one train step + one inference pass
               (harmonic combination: B / (t_train + t_infer)) on this chip.
vs_baseline  = value / (same quantity for the torch-CPU reference replica).
Diagnostics go to stderr; the JSON line is the only stdout output.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


_T0 = time.perf_counter()


def log(*a):
    print(f"[{time.perf_counter() - _T0:6.1f}s]", *a, file=sys.stderr,
          flush=True)


def make_batch(m, b, seed=0):
    r = np.random.default_rng(seed)
    return {
        "l": r.standard_normal((b, 2, m.l_len, m.l_dim)).astype(np.float32),
        "v": r.standard_normal((b, 2, m.v_len, m.v_dim)).astype(np.float32),
        "a": r.standard_normal((b, 2, m.a_len, m.a_dim)).astype(np.float32),
        "l_mask": np.ones((b, 2, m.l_len), np.float32),
        "v_mask": np.ones((b, 2, m.v_len), np.float32),
        "a_mask": np.ones((b, 2, m.a_len), np.float32),
        "label": (r.random((b, m.n_emotions)) > 0.7).astype(np.int32),
    }


def _sync(x) -> float:
    """HONEST device synchronization — the shared helper; see
    multimodal_emotion_processing_tpu/utils/sync.py for why
    block_until_ready cannot be trusted on this image."""
    from multimodal_emotion_processing_tpu.utils.sync import fetch_scalar

    return fetch_scalar(x)


def measure_jax(exp, batch, *, steps=30, warmup=3, reps=7, impl="xla"):
    """Best-of-`reps` measurement windows (the chip is shared through a
    network relay on this image; contention makes single windows noisy).
    Windows end with a scalar fetch (_sync) — the only sync the relay
    honors; its RTT is amortized over `steps` dispatches."""
    import jax

    from multimodal_emotion_processing_tpu.models import build_model
    from multimodal_emotion_processing_tpu.train import engine as eng

    model = build_model(exp)
    tx, train_step = eng.make_train_step(model, exp.train, impl=impl)
    state = eng.init_state(model, tx, seed=0)
    dev_batch = jax.device_put(batch)
    bsz = batch["label"].shape[0]

    for _ in range(warmup):
        state, loss = train_step(state, dev_batch)
    _sync(loss)
    train_sps = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, loss = train_step(state, dev_batch)
        _sync(loss)
        train_sps = max(train_sps, bsz * steps / (time.perf_counter() - t0))

    predict = eng.make_predict_step(model, impl=impl)
    out = predict(state.params, dev_batch)
    _sync(out)
    infer_sps = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = predict(state.params, dev_batch)
        _sync(out)
        infer_sps = max(infer_sps, bsz * steps / (time.perf_counter() - t0))
    return train_sps, infer_sps


def measure_jax_scan(exp, *, k=64, steps=4, reps=7, impl="xla"):
    """Scan-chained throughput: k train (resp. predict) steps per dispatch
    via lax.scan over k DISTINCT device-staged batches — identical math and
    RNG chain to the per-dispatch path (tests/test_train_eval.py), just
    1/k-th the dispatches.  Honest value: the relay's ~1.2 ms/dispatch
    overhead is amortized away (~1.1-1.2x at flagship shapes whose step is
    ~9 ms of real device work; up to ~3.8x for the tiny rencecps step —
    bench/all_configs.py).  The round-2 "12-49x" readings were
    block_until_ready early-ack artifacts (ENGINEERING_NOTES)."""
    import jax

    from multimodal_emotion_processing_tpu.models import build_model
    from multimodal_emotion_processing_tpu.train import engine as eng

    m, b = exp.model, exp.train.batch_size

    # stage the (k, b, ...) batch stack ON DEVICE via jax.random — at k=512
    # that's ~6.4 GB which host numpy + the relay would take minutes to
    # generate and ship; device-side generation is sub-second and the data
    # is synthetic either way
    def _stage(key):
        ks = jax.random.split(key, 7)
        import jax.numpy as jnp
        return {
            "l": jax.random.normal(ks[0], (k, b, 2, m.l_len, m.l_dim), jnp.float32),
            "v": jax.random.normal(ks[1], (k, b, 2, m.v_len, m.v_dim), jnp.float32),
            "a": jax.random.normal(ks[2], (k, b, 2, m.a_len, m.a_dim), jnp.float32),
            "l_mask": jnp.ones((k, b, 2, m.l_len), jnp.float32),
            "v_mask": jnp.ones((k, b, 2, m.v_len), jnp.float32),
            "a_mask": jnp.ones((k, b, 2, m.a_len), jnp.float32),
            "label": (jax.random.uniform(ks[3], (k, b, m.n_emotions))
                      > 0.7).astype(jnp.int32),
        }

    model = build_model(exp)
    tx, scan_train = eng.make_scan_train_step(model, exp.train, impl=impl)
    state = eng.init_state(model, tx, seed=0)
    dev = jax.jit(_stage)(jax.random.PRNGKey(1))
    jax.block_until_ready(dev)

    state, losses = scan_train(state, dev)
    _sync(losses)
    train_sps = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, losses = scan_train(state, dev)
        _sync(losses)
        train_sps = max(train_sps, b * k * steps / (time.perf_counter() - t0))

    scan_predict = eng.make_scan_predict_step(model, impl=impl)
    out = scan_predict(state.params, dev)
    _sync(out)
    infer_sps = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = scan_predict(state.params, dev)
        _sync(out)
        infer_sps = max(infer_sps, b * k * steps / (time.perf_counter() - t0))
    return train_sps, infer_sps


def measure_jax_datafed(exp, *, n_samples=512, epochs=8, impl="xla",
                        transfer_dtype=None):
    """END-TO-END data-fed throughput: host batch assembly (Batcher) →
    background-thread H2D prefetch → jitted train step.  This is the number
    real-corpus training sees (SURVEY §7.3.5: the benchmark is won or lost in
    host assembly, not the MXU).  Best of `epochs` SHORT windows — the
    relay's H2D throughput wanders ~4x on multi-second timescales, so many
    short windows beat few long ones at catching an uncontended slot.
    `transfer_dtype="float16"`: half-width wire format (the put cost is
    byte-proportional on this relay — data/loader.cast_for_transfer)."""
    import jax

    from multimodal_emotion_processing_tpu.data.loader import (
        Batcher, prefetch_to_device)
    from multimodal_emotion_processing_tpu.data.synthetic import synthetic_dataset
    from multimodal_emotion_processing_tpu.models import build_model
    from multimodal_emotion_processing_tpu.train import engine as eng

    samples = synthetic_dataset(exp.name, exp.model, n_samples, 0)
    batcher = Batcher(samples, exp.train.batch_size, shuffle=True, seed=0)
    model = build_model(exp)
    tx, train_step = eng.make_train_step(model, exp.train, impl=impl)
    state = eng.init_state(model, tx, seed=0)

    # one warmup epoch compiles both the padded-final and full-batch shapes
    for batch in prefetch_to_device(iter(batcher()),
                                    transfer_dtype=transfer_dtype):
        state, loss = train_step(state, batch)
    _sync(loss)

    window_sps = []
    for _ in range(epochs):
        t0 = time.perf_counter()
        for batch in prefetch_to_device(iter(batcher()),
                                        transfer_dtype=transfer_dtype):
            state, loss = train_step(state, batch)
        _sync(loss)
        window_sps.append(len(samples) / (time.perf_counter() - t0))
    # best AND median: the relay wanders ~4x, and a single best-of scalar
    # made "weather vs regression" undecidable across rounds (VERDICT r2) —
    # the artifact now records both
    return float(max(window_sps)), float(np.median(window_sps))


def measure_jax_datafed_scan(exp, *, n_samples=512, epochs=8, k=8,
                             impl="xla", transfer_dtype=None):
    """Data-fed throughput with BOTH amortizations the framework offers
    stacked: `stack_batches` groups k host batches into one (k, B, ...)
    pytree (ONE device_put per group — amortizing the relay's per-put
    latency floor k x) and `make_scan_train_step` runs the k optimizer
    steps in ONE dispatch.  Same host assembly + prefetch worker as
    measure_jax_datafed; identical math/RNG to k per-dispatch steps
    (engine guarantees, tested in test_train_eval).

    MEASURED LOSER on this image (interleaved A/B, 3 rounds, 2026-08-18):
    0.55x / 0.61x / 0.95x the per-dispatch data-fed path.  Grouping k
    batches into one put removes the prefetch worker's put/compute
    overlap (one epoch-sized put has nothing to pipeline against), and
    the relay's effective H2D bandwidth does not improve with buffer
    size, so the k-fold fewer round-trips never pay back.  Kept as a
    recorded knob (ENGINEERING_NOTES row); the phase runs last in main()
    so budget pressure drops it first."""
    import jax

    from multimodal_emotion_processing_tpu.data.loader import (
        Batcher, prefetch_to_device, stack_batches)
    from multimodal_emotion_processing_tpu.data.synthetic import synthetic_dataset
    from multimodal_emotion_processing_tpu.models import build_model
    from multimodal_emotion_processing_tpu.train import engine as eng

    samples = synthetic_dataset(exp.name, exp.model, n_samples, 0)
    batcher = Batcher(samples, exp.train.batch_size, shuffle=True, seed=0)
    model = build_model(exp)
    tx, scan_step = eng.make_scan_train_step(model, exp.train, impl=impl)
    state = eng.init_state(model, tx, seed=0)

    def stream():
        return prefetch_to_device(stack_batches(iter(batcher()), k),
                                  transfer_dtype=transfer_dtype)

    for group in stream():  # warmup epoch compiles full + tail stack shapes
        state, losses = scan_step(state, group)
    _sync(losses)

    window_sps = []
    for _ in range(epochs):
        t0 = time.perf_counter()
        for group in stream():
            state, losses = scan_step(state, group)
        _sync(losses)
        window_sps.append(len(samples) / (time.perf_counter() - t0))
    return float(max(window_sps)), float(np.median(window_sps))


def pallas_parity(exp, batch):
    """Forward parity of the fused Pallas kernel vs the XLA einsum path on
    THIS device — on TPU this is the compiled-kernel correctness check the
    test suite (CPU interpret mode) cannot record."""
    import jax
    import numpy as np

    from multimodal_emotion_processing_tpu.models import build_model
    from multimodal_emotion_processing_tpu.train import engine as eng

    model = build_model(exp)
    params = model.init(jax.random.PRNGKey(0))
    dev_batch = jax.device_put(batch)
    out_xla = np.asarray(eng.make_predict_step(model, impl="xla")(params, dev_batch))
    out_pal = np.asarray(eng.make_predict_step(model, impl="pallas")(params, dev_batch))
    maxdiff = float(np.max(np.abs(out_xla - out_pal)))
    return maxdiff, maxdiff / (float(np.max(np.abs(out_xla))) + 1e-9)


def combined(train_sps, infer_sps, bsz):
    return bsz / (bsz / train_sps + bsz / infer_sps)


def _pallas_phase(config_name: str):
    """Pallas measurement body, exposed for the subprocess runner: prints one
    JSON dict {train_sps, infer_sps, parity, parity_rel} on stdout."""
    from multimodal_emotion_processing_tpu import configs

    exp = configs.get(config_name)
    batch = make_batch(exp.model, exp.train.batch_size)
    tr, inf = measure_jax(exp, batch, impl="pallas", reps=4)
    parity, parity_rel = pallas_parity(exp, batch)
    print(json.dumps({"train_sps": tr, "infer_sps": inf,
                      "parity": parity, "parity_rel": parity_rel}))


def _run_pallas_subprocess(config_name: str, timeout_s: float):
    """Run the pallas phase in a CHILD process with a hard timeout: pallas
    compiles on the relay-tunneled chip have been observed to hang for many
    minutes (a pre-phase budget check cannot stop an in-phase hang), and a
    killed child also cannot poison this process with the pallas→fresh-H2D
    degradation quirk (module docstring)."""
    import os
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             f"import bench; bench._pallas_phase({config_name!r})"],
            cwd=here, capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None, f"timed out after {timeout_s:.0f}s"
    if proc.returncode != 0:
        return None, f"rc={proc.returncode}: {proc.stderr[-300:]}"
    try:
        return json.loads(proc.stdout.strip().splitlines()[-1]), None
    except Exception as e:
        return None, f"unparseable output ({e!r})"


def main():
    import os

    from multimodal_emotion_processing_tpu import configs
    from multimodal_emotion_processing_tpu.bench.torch_baseline import measure_torch_cpu

    exp = configs.get("mosei_trans")
    m = exp.model
    b = exp.train.batch_size
    batch = make_batch(m, b)

    import jax
    log(f"devices: {jax.devices()}")

    # The shared relay-tunneled chip occasionally stalls for minutes at a
    # time (observed: a 256x256 matmul taking 73 s).  The driver records this
    # script's ONE stdout JSON line — so optional phases are skipped once the
    # soft budget is spent, and every phase failure degrades to a logged
    # fallback instead of losing the artifact.
    budget_s = float(os.environ.get("MEP_BENCH_BUDGET_S", "420"))
    elapsed = lambda: time.perf_counter() - _T0

    jax_train, jax_infer = measure_jax(exp, batch)
    log(f"jax[xla]: train {jax_train:.1f} samples/s, infer {jax_infer:.1f} samples/s")

    # Scan-chaining amortizes the ~1.2 ms/dispatch relay overhead over k
    # steps — honestly a ~1.1-1.2x win at flagship shapes (the step itself is
    # ~9 ms of real device work; the pre-round-3 "26-59M samples/s" K-sweep
    # readings were early-ack artifacts).  Measure a mid and a high k;
    # staging happens on device via jax.random, outside the timed windows,
    # and fits HBM with room to spare.
    scan_k = 128
    scan_train, scan_infer = measure_jax_scan(exp, k=scan_k)
    log(f"jax[xla,scan k={scan_k}]: train {scan_train:.1f} samples/s, "
        f"infer {scan_infer:.1f} samples/s")
    datafed = datafed_med = None
    if elapsed() < budget_s * 0.55:
        try:
            datafed, datafed_med = measure_jax_datafed(exp)
            log(f"jax[xla] data-fed (host assembly + prefetch + step): "
                f"best {datafed:.1f} / median {datafed_med:.1f} samples/s")
        except Exception as e:
            log(f"data-fed phase failed: {e!r}")
    else:
        log("data-fed phase skipped: budget")

    # compressed wire formats: same data-fed loop with float16 (2x fewer
    # bytes) and int8 (4x fewer feature bytes) H2D payloads, upcast/
    # dequantized in-graph.  The put cost is byte-proportional on this relay
    # (543 -> 221 ms f32 -> f16 for a flagship batch); NOTE the phases run
    # sequentially, so x-vs-x ratios here carry the relay's ~4x weather —
    # the interleaved A/B/C (ENGINEERING_NOTES 2026-08-18) is the honest
    # comparison: int8 ~2x f32 every round, f16 in between
    # int8 runs BEFORE f16: it is the stronger wire format (interleaved A/B:
    # ~2x f32 every round) and should survive budget pressure first
    datafed_i8 = datafed_i8_med = None
    if datafed is not None and elapsed() < budget_s * 0.62:
        try:
            datafed_i8, datafed_i8_med = measure_jax_datafed(
                exp, transfer_dtype="int8")
            log(f"jax[xla] data-fed int8-wire: best {datafed_i8:.1f} / "
                f"median {datafed_i8_med:.1f} samples/s "
                f"({datafed_i8 / max(datafed, 1e-9):.2f}x best-vs-best)")
        except Exception as e:
            log(f"data-fed int8-wire phase failed: {e!r}")
    else:
        log("data-fed int8-wire phase skipped: budget or no f32 reference")
    datafed_f16 = datafed_f16_med = None
    if datafed is not None and elapsed() < budget_s * 0.68:
        try:
            datafed_f16, datafed_f16_med = measure_jax_datafed(
                exp, transfer_dtype="float16")
            log(f"jax[xla] data-fed f16-wire: best {datafed_f16:.1f} / "
                f"median {datafed_f16_med:.1f} samples/s "
                f"({datafed_f16 / max(datafed, 1e-9):.2f}x best-vs-best)")
        except Exception as e:
            log(f"data-fed f16-wire phase failed: {e!r}")
    else:
        log("data-fed f16-wire phase skipped: budget or no f32 reference")

    # scan-chained data-fed (one put + one dispatch per k=8 batches — the
    # --scan-steps composition): a MEASURED LOSER (see the function
    # docstring) recorded for the knob ledger when budget allows; last of
    # the data-fed phases so budget pressure drops it first.
    datafed_scan = datafed_scan_med = None
    if datafed is not None and elapsed() < budget_s * 0.72:
        try:
            datafed_scan, datafed_scan_med = measure_jax_datafed_scan(exp)
            log(f"jax[xla] data-fed scan k=8: best {datafed_scan:.1f} / "
                f"median {datafed_scan_med:.1f} samples/s "
                f"({datafed_scan / max(datafed, 1e-9):.2f}x best-vs-best)")
        except Exception as e:
            log(f"data-fed scan phase failed: {e!r}")
    else:
        log("data-fed scan phase skipped: budget or no f32 reference")

    # scan k=512 is a pure diagnostics row (the headline candidate is k=128);
    # it runs AFTER the data-fed family so a slow-relay day drops it, not
    # the end-to-end number the round artifact is judged on
    scan_k_hi = 512
    scan_train_hi = scan_infer_hi = None
    if elapsed() < budget_s * 0.78:
        try:
            scan_train_hi, scan_infer_hi = measure_jax_scan(
                exp, k=scan_k_hi, steps=2, reps=5)
            log(f"jax[xla,scan k={scan_k_hi}]: train {scan_train_hi:.1f} "
                f"samples/s, infer {scan_infer_hi:.1f} samples/s")
        except Exception as e:  # e.g. HBM pressure on a busy shared chip
            log(f"jax[xla,scan k={scan_k_hi}] failed: {e!r}")
    else:
        log(f"jax[xla,scan k={scan_k_hi}] skipped: budget")

    # bf16 compute (f32 master weights): diagnostics-only — the headline
    # stays on the f32 torch-parity path, but the knob's honest value on
    # this chip is worth recording every run (scaling sweep: +7% at these
    # dims, +9-19% at production dims)
    bf16_train = bf16_infer = None
    if elapsed() < budget_s * 0.8:
        try:
            import dataclasses

            exp16 = dataclasses.replace(exp, train=dataclasses.replace(
                exp.train, compute_dtype="bfloat16"))
            bf16_train, bf16_infer = measure_jax(exp16, batch, reps=4)
            log(f"jax[xla,bf16]: train {bf16_train:.1f} samples/s, "
                f"infer {bf16_infer:.1f} samples/s")
        except Exception as e:
            log(f"bf16 phase failed: {e!r}")
    else:
        log("bf16 phase skipped: budget")

    # pallas runs LAST: on this image's relay-tunneled chip, executing a
    # pallas program degrades subsequent fresh-H2D step throughput ~10x
    # (measured 4324 -> 352 samples/s data-fed; device-resident loops are
    # unaffected) — an axon/PJRT quirk, so order the benchmark around it.
    # It never wins the headline (scan chains do), so it is the phase to
    # drop when the chip is having a slow day.
    pal_train = pal_infer = None
    parity = parity_rel = None
    if elapsed() < budget_s:
        # raising MEP_BENCH_BUDGET_S extends this too (slow-compile days);
        # the default budget still caps the child at ~4 min
        res, err = _run_pallas_subprocess(
            exp.name, min(max(240.0, budget_s * 0.6),
                          budget_s - elapsed() + 60.0))
        if res is not None:
            pal_train, pal_infer = res["train_sps"], res["infer_sps"]
            parity, parity_rel = res["parity"], res["parity_rel"]
            log(f"jax[pallas]: train {pal_train:.1f} samples/s, infer "
                f"{pal_infer:.1f} samples/s, forward parity max|xla-pallas| "
                f"= {parity:.2e} (relative {parity_rel:.2e})")
        else:
            log(f"pallas phase failed: {err}")
    else:
        log(f"pallas phase skipped: {elapsed():.0f}s elapsed > {budget_s:.0f}s budget")

    torch_fallback = False
    try:
        torch_train, torch_infer = measure_torch_cpu(m, batch)
        log(f"torch-cpu: train {torch_train:.1f} samples/s, "
            f"infer {torch_infer:.1f} samples/s")
    except Exception as e:  # host-only; failure here would be a torch bug
        # conservative end of the measured windows (BASELINE.md: train
        # 3.4-44, infer 88-138) -> vs_baseline UNDERestimates; flagged below
        torch_fallback = True
        torch_train, torch_infer = 44.0, 138.0
        log(f"torch baseline failed ({e!r}); using the FASTEST recorded "
            "window 44/138 samples/s (vs_baseline is a lower bound); "
            "torch_fallback flagged in the JSON")

    # --- MFU: analytic matmul FLOPs (bench/flops.py, validated against
    # XLA's cost analysis to within 15%) over the chip's bf16 peak.  At these
    # model sizes utilization is dispatch/HBM-bound, not MXU-bound — the
    # number exists to SAY that with a measurement, not to flatter.
    from multimodal_emotion_processing_tpu.bench import flops as _fl

    peak = float(os.environ.get("MEP_PEAK_TFLOPS", _fl.V5E_PEAK_TFLOPS))
    f_tr = _fl.train_flops_per_sample(m)
    f_inf = _fl.forward_flops_per_sample(m)

    def mfu_of(train_sps, infer_sps):
        if train_sps is None:
            return None
        return {
            "train_tflops": round(train_sps * f_tr / 1e12, 3),
            "train_mfu": round(_fl.mfu(train_sps, f_tr, peak), 5),
            "infer_tflops": (None if infer_sps is None else
                             round(infer_sps * f_inf / 1e12, 3)),
            "infer_mfu": (None if infer_sps is None else
                          round(_fl.mfu(infer_sps, f_inf, peak), 5)),
        }

    r1 = lambda x: None if x is None else round(x, 1)
    ours_xla = combined(jax_train, jax_infer, b)
    ours_scan = combined(scan_train, scan_infer, b)
    # parity gate is relative to logit scale (both paths round differently
    # through the MXU's bf16 passes; ~1e-3 absolute on O(10) logits is noise)
    candidates = {"xla": ours_xla, f"xla,scan k={scan_k}": ours_scan}
    cand_train = {"xla": jax_train, f"xla,scan k={scan_k}": scan_train}
    if scan_train_hi is not None:
        candidates[f"xla,scan k={scan_k_hi}"] = combined(
            scan_train_hi, scan_infer_hi, b)
        cand_train[f"xla,scan k={scan_k_hi}"] = scan_train_hi
    if pal_train is not None and parity_rel is not None and parity_rel < 1e-2:
        candidates["pallas"] = combined(pal_train, pal_infer, b)
        cand_train["pallas"] = pal_train
    # physical-plausibility gate: a candidate whose implied train FLOP/s
    # exceeds the chip's peak CANNOT be a real execution rate (the analytic
    # count is validated <= XLA's own) — on this relay-tunneled image,
    # block_until_ready on very large scan programs has been observed to
    # return before the device work completes, inflating the window.  Such
    # candidates are excluded from the headline and flagged.
    implausible = [name for name, tr in cand_train.items()
                   if tr is not None and _fl.mfu(tr, f_tr, peak) > 1.0]
    all_candidates = dict(candidates)
    for name in implausible:
        log(f"headline candidate {name!r} implies "
            f"{_fl.mfu(cand_train[name], f_tr, peak):.1f}x chip peak FLOP/s "
            "— measurement artifact, excluded from headline")
        candidates.pop(name, None)
    if not candidates:
        # every path read implausible (relay-wide sync failure): the one-line
        # artifact contract still holds — emit the least-implausible candidate,
        # flagged, rather than crashing with no stdout JSON at all
        least = min((n for n in cand_train if cand_train[n] is not None),
                    key=lambda n: _fl.mfu(cand_train[n], f_tr, peak))
        log(f"ALL headline candidates implausible — emitting {least!r} "
            "flagged; treat this run's value as untrusted")
        candidates[least] = all_candidates[least]
    impl = max(candidates, key=candidates.get)
    ours = candidates[impl]
    base = combined(torch_train, torch_infer, b)
    out = {
        "metric": "cmu-mosei flagship train+infer samples/sec/chip",
        "value": round(ours, 2),
        "unit": "samples/sec/chip",
        # null when the torch baseline was NOT measured this run (fallback
        # constants would make the ratio synthetic — a consumer reading only
        # value/vs_baseline must be able to tell)
        "vs_baseline": None if torch_fallback else round(ours / base, 2),
        "diagnostics": {  # null = phase skipped/failed (stderr says which)
            "impl": impl,
            "xla": {"train_sps": r1(jax_train), "infer_sps": r1(jax_infer),
                    "mfu": mfu_of(jax_train, jax_infer)},
            "scan": {"k": scan_k, "train_sps": r1(scan_train),
                     "infer_sps": r1(scan_infer),
                     "mfu": mfu_of(scan_train, scan_infer)},
            "scan_hi": {"k": scan_k_hi, "train_sps": r1(scan_train_hi),
                        "infer_sps": r1(scan_infer_hi),
                        "mfu": mfu_of(scan_train_hi, scan_infer_hi)},
            "pallas": {"train_sps": r1(pal_train),
                       "infer_sps": r1(pal_infer),
                       "mfu": mfu_of(pal_train, pal_infer),
                       "forward_parity_maxdiff": parity,
                       "forward_parity_relative": parity_rel},
            "datafed_train_sps": {"best": r1(datafed),
                                  "median": r1(datafed_med)},
            "datafed_train_sps_scan_k8": {"best": r1(datafed_scan),
                                          "median": r1(datafed_scan_med)},
            "datafed_train_sps_f16_wire": {"best": r1(datafed_f16),
                                           "median": r1(datafed_f16_med)},
            "datafed_train_sps_int8_wire": {"best": r1(datafed_i8),
                                            "median": r1(datafed_i8_med)},
            "bf16": {"train_sps": r1(bf16_train),
                     "infer_sps": r1(bf16_infer),
                     "mfu": mfu_of(bf16_train, bf16_infer)},
            "flops": {"per_sample_forward": f_inf,
                      "per_sample_train": f_tr,
                      "peak_tflops": peak},
            "mfu_implausible_excluded": implausible,
            "torch_cpu": {"train_sps": round(torch_train, 1),
                          "infer_sps": round(torch_infer, 1)},
        },
    }
    if torch_fallback:
        out["diagnostics"]["torch_fallback"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
