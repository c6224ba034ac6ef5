"""Autotune front door: measure THIS host/chip's winners for the selectable
perf knobs of one config and persist them as a `tuned.json` the CLI applies.

House rule (docs/ENGINEERING_NOTES.md): losing perf paths stay selectable
knobs, not deleted — scan-chaining wins 1.1-3.8x depending on the family,
pallas vs XLA flips with shape, the stacked realformer grid lost on the
relay-attached chip but may win elsewhere.  Those verdicts were measured on
ONE machine on one day; this module re-runs the same honest measurements
(scalar-fetch sync, best-of-windows — utils/sync.py, utils/timing.py) on the
machine at hand and writes the winners down, so `train --tuned tuned.json`
gets that machine's fast path without anyone re-reading the notes.

The reference has no counterpart: its knobs are hand-edited module constants
(cmu-mosei/run.py:27-42) and its only "tuning" is the author's GPU.

Arm order matters on this image: executing a pallas program degrades later
fresh-H2D throughput process-wide (CLAUDE.md), so the transfer-dtype arm
(fresh H2D per batch) runs BEFORE any pallas arm, and pallas runs LAST.

    python -m multimodal_emotion_processing_tpu tune <config> [-o tuned.json]
"""

from __future__ import annotations

import json
import time
from typing import Dict, List, Optional

# knobs whose winners change numerics (int8/f16 wire quantizes features);
# only measured/applied under --allow-lossy
LOSSY_KNOBS = ("transfer_dtype",)

# relative margin a challenger must clear to dethrone the default — the
# shared chip wanders ~4x between windows (CLAUDE.md); best-of-reps absorbs
# most of it but close calls should keep the bit-default
MARGIN = 1.05


def _sync(x) -> float:
    from ..utils.sync import fetch_scalar

    return fetch_scalar(x)


def _synth_batch(name: str, m, b: int):
    from ..data.loader import Batcher
    from ..data.synthetic import synthetic_dataset

    samples = synthetic_dataset(name, m, b, seed=0)
    return next(iter(Batcher(samples, b, shuffle=False, pad_final=False)()))


def _best_sps(fn, sync_of, n: int, *, steps: int, reps: int) -> float:
    """Best samples/s over `reps` windows of `steps` calls, each window
    closed by a scalar fetch of the last result."""
    out = fn()
    _sync(sync_of(out))
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn()
        _sync(sync_of(out))
        best = max(best, n * steps / (time.perf_counter() - t0))
    return best


def _measure_step(exp, name: str, *, impl: str, steps: int, reps: int):
    """Per-dispatch train + infer samples/s for one impl."""
    import jax

    from ..models import build_model
    from ..train import engine as eng

    model = build_model(exp)
    b = exp.train.batch_size
    batch = jax.device_put(_synth_batch(name, exp.model, b))
    tx, step = eng.make_train_step(model, exp.train, impl=impl)
    state = eng.init_state(model, tx, seed=0)

    box = {"s": state}

    def one_train():
        box["s"], loss = step(box["s"], batch)
        return loss

    train_sps = _best_sps(one_train, lambda x: x, b, steps=steps, reps=reps)
    predict = eng.make_predict_step(model, impl=impl)
    infer_sps = _best_sps(lambda: predict(box["s"].params, batch),
                          lambda x: x, b, steps=steps, reps=reps)
    return train_sps, infer_sps


def _measure_scan(exp, name: str, *, k: int, impl: str, reps: int):
    """Scan-chained train samples/s at chain length k (k steps/dispatch)."""
    import jax
    import numpy as np

    from ..models import build_model
    from ..train import engine as eng

    model = build_model(exp)
    b = exp.train.batch_size
    host = _synth_batch(name, exp.model, b)
    stacked = jax.device_put({
        key: np.ascontiguousarray(np.broadcast_to(a[None], (k,) + a.shape))
        for key, a in host.items()})
    tx, scan_step = eng.make_scan_train_step(model, exp.train, impl=impl)
    state = eng.init_state(model, tx, seed=0)
    box = {"s": state}

    def one():
        box["s"], losses = scan_step(box["s"], stacked)
        return losses

    return _best_sps(one, lambda x: x, b * k, steps=2, reps=reps)


def _measure_stacked(exp, *, stacked: bool, steps: int, reps: int):
    """Inference forward with the realformer stream-stacking on/off."""
    import jax

    from ..models import build_model

    model = build_model(exp)
    b = exp.train.batch_size
    batch = jax.device_put(_synth_batch(exp.name, exp.model, b))
    params = model.init(jax.random.PRNGKey(0))
    fwd = jax.jit(lambda p, x: model.apply(p, x, train=False, stacked=stacked))
    return _best_sps(lambda: fwd(params, batch), lambda x: x, b,
                     steps=steps, reps=reps)


def _measure_datafed(exp, name: str, *, transfer_dtype: Optional[str],
                     n_samples: int, reps: int):
    """Host-fed train samples/s: fresh device_put per batch (the wire the
    transfer-dtype knob compresses), best of `reps` single-epoch windows."""
    import jax

    from ..data.loader import (Batcher, cast_for_transfer,
                               resolve_transfer_dtype)
    from ..data.synthetic import synthetic_dataset
    from ..models import build_model
    from ..train import engine as eng

    model = build_model(exp)
    b = exp.train.batch_size
    samples = synthetic_dataset(name, exp.model, n_samples, seed=0)
    batches = list(Batcher(samples, b, shuffle=False, pad_final=False)())
    if transfer_dtype:
        wire = resolve_transfer_dtype(transfer_dtype)
        batches = [cast_for_transfer(x, wire) for x in batches]
    tx, step = eng.make_train_step(model, exp.train)
    state = eng.init_state(model, tx, seed=0)
    # compile + one warm epoch
    for hb in batches:
        state, loss = step(state, jax.device_put(hb))
    _sync(loss)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for hb in batches:
            state, loss = step(state, jax.device_put(hb))
        _sync(loss)
        best = max(best, len(batches) * b / (time.perf_counter() - t0))
    return best


def tune(config_name: str, *, arms: Optional[List[str]] = None,
         allow_lossy: bool = False, steps: int = 20, reps: int = 4,
         scan_ks=(8, 32), quiet: bool = True) -> Dict:
    """Measure the requested arms and return the tuned record.

    Arms (default: every applicable one):
      scan      — train scan_steps in {1} + scan_ks (dispatch amortization)
      stacked   — realformer-family inference stream stacking on/off
      transfer  — host-fed wire dtype f32 vs int8 vs f16 (lossy; needs
                  allow_lossy)
      remat     — per-block jax.checkpoint on/off (a memory-for-FLOPs trade:
                  measured ~0.8x where HBM fits, but the enabler where it
                  doesn't — worth re-deciding per machine/preset)
      impl      — xla vs flash vs pallas train/infer (kernel arms run LAST:
                  degrades later fresh-H2D throughput on relay images)
    Scaled presets ('mosei_trans_s1024' etc.) tune like any config — their
    arms run at the preset's dims/batch/compute-dtype, so the winners are
    per-preset.  Winners must beat the default by MARGIN; ties keep the
    default."""
    import jax

    from .. import configs

    exp = configs.get(config_name)
    all_arms = ["scan", "stacked", "transfer", "remat", "impl"]
    arms = [a for a in (arms or all_arms) if a in all_arms]
    if "transfer" in arms and not allow_lossy:
        arms.remove("transfer")
    if "stacked" in arms and exp.model.block != "realformer":
        arms.remove("stacked")

    def log(msg):
        if not quiet:
            import sys

            print(msg, file=sys.stderr, flush=True)

    measured: Dict = {}
    winners: Dict = {}

    # ordered so fresh-H2D arms precede any pallas execution
    if "scan" in arms:
        base_train, base_infer = _measure_step(
            exp, config_name, impl="xla", steps=steps, reps=reps)
        measured["per_dispatch"] = {"train_sps": round(base_train, 1),
                                    "infer_sps": round(base_infer, 1)}
        rows = {1: base_train}
        for k in scan_ks:
            rows[k] = _measure_scan(exp, config_name, k=k, impl="xla",
                                    reps=reps)
            log(f"scan k={k}: {rows[k]:.0f} sps (k=1 {base_train:.0f})")
        measured["scan_train_sps"] = {str(k): round(v, 1)
                                      for k, v in rows.items()}
        best_k = max(rows, key=rows.get)
        winners["scan_steps"] = int(best_k) if (
            best_k != 1 and rows[best_k] >= MARGIN * rows[1]) else 1

    if "stacked" in arms:
        off = _measure_stacked(exp, stacked=False, steps=steps, reps=reps)
        on = _measure_stacked(exp, stacked=True, steps=steps, reps=reps)
        measured["stacked_infer_sps"] = {"off": round(off, 1),
                                         "on": round(on, 1)}
        winners["stacked"] = bool(on >= MARGIN * off)
        log(f"stacked off {off:.0f} / on {on:.0f} sps")

    if "transfer" in arms:
        f32 = _measure_datafed(exp, config_name, transfer_dtype=None,
                               n_samples=4 * exp.train.batch_size, reps=reps)
        i8 = _measure_datafed(exp, config_name, transfer_dtype="int8",
                              n_samples=4 * exp.train.batch_size, reps=reps)
        f16 = _measure_datafed(exp, config_name, transfer_dtype="float16",
                               n_samples=4 * exp.train.batch_size, reps=reps)
        measured["datafed_train_sps"] = {"float32": round(f32, 1),
                                         "int8": round(i8, 1),
                                         "float16": round(f16, 1)}
        rows = {"int8": i8, "float16": f16}
        best = max(rows, key=rows.get)
        winners["transfer_dtype"] = best if rows[best] >= MARGIN * f32 else None
        log(f"wire f32 {f32:.0f} / int8 {i8:.0f} / f16 {f16:.0f} sps")

    if "remat" in arms:
        import dataclasses

        base_state = exp.model.remat
        on = dataclasses.replace(exp, model=dataclasses.replace(
            exp.model, remat=True))
        off = dataclasses.replace(exp, model=dataclasses.replace(
            exp.model, remat=False))
        try:
            t_off, _ = _measure_step(off, config_name, impl="xla",
                                     steps=steps, reps=reps)
        except Exception as e:  # OOM without remat: remat is the enabler
            t_off, e_off = None, repr(e)
        t_on, _ = _measure_step(on, config_name, impl="xla",
                                steps=steps, reps=reps)
        measured["remat_train_sps"] = {
            "off": None if t_off is None else round(t_off, 1),
            "on": round(t_on, 1)}
        if t_off is None:
            measured["remat_train_sps"]["off_error"] = e_off
            winners["remat"] = True  # only remat trains at these shapes
        else:
            winners["remat"] = bool(t_on >= MARGIN * t_off) \
                if not base_state else not bool(t_off >= MARGIN * t_on)
        log(f"remat off {t_off if t_off is None else round(t_off)} / "
            f"on {t_on:.0f} sps")

    if "impl" in arms:
        if "per_dispatch" not in measured:
            t, i = _measure_step(exp, config_name, impl="xla",
                                 steps=steps, reps=reps)
            measured["per_dispatch"] = {"train_sps": round(t, 1),
                                        "infer_sps": round(i, 1)}
        xla_t = measured["per_dispatch"]["train_sps"]
        # both kernel arms are pallas programs (the H2D-degradation gotcha),
        # so they run after every fresh-H2D arm; flash before the
        # materializing kernel
        scores = {"xla": xla_t}
        for impl in ("flash", "pallas"):
            try:
                t, i = _measure_step(exp, config_name, impl=impl,
                                     steps=steps, reps=reps)
                measured[impl] = {"train_sps": round(t, 1),
                                  "infer_sps": round(i, 1)}
                scores[impl] = t
            except Exception as e:  # no TPU / kernel doesn't fit: keep xla
                measured[impl] = {"error": repr(e)}
        best = max(scores, key=scores.get)
        winners["impl"] = best if (
            best != "xla" and scores[best] >= MARGIN * xla_t) else "xla"
        log(f"impl xla {xla_t:.0f} / flash "
            f"{measured['flash'].get('train_sps', 'n/a')} / pallas "
            f"{measured['pallas'].get('train_sps', 'n/a')} sps")

    return {
        "config": config_name,
        "platform": jax.devices()[0].device_kind,
        "n_devices": jax.device_count(),
        "jax_version": jax.__version__,
        "tuned_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        "allow_lossy": allow_lossy,
        "margin": MARGIN,
        "measured": measured,
        "winners": winners,
    }


# knob -> (CLI arg name, parser default): a tuned winner fills the arg only
# while it still holds the parser default, so an explicit flag wins.  An
# explicitly-passed default value is indistinguishable from the default and
# gets overridden — documented CLI behavior.
_ARG_OF = {
    "scan_steps": ("scan_steps", 1),
    "impl": ("impl", None),
    "transfer_dtype": ("transfer_dtype", None),
    "stacked": ("stacked_grid", False),
}


def apply_tuned(args, path: str) -> Dict:
    """Merge a tuned.json's winners into parsed CLI args (in place).

    Returns {knob: value} actually applied.  Winners for knobs the current
    subcommand doesn't expose are skipped; a tuned file for a different
    config than the one being run is an error (the winners are per-config)."""
    with open(path) as f:
        rec = json.load(f)
    cfg = getattr(args, "config", None)
    if cfg is not None and rec.get("config") not in (None, cfg):
        raise SystemExit(
            f"--tuned {path}: tuned for config {rec.get('config')!r}, "
            f"running {cfg!r} — re-run `tune {cfg}`")
    applied = {}
    for knob, value in (rec.get("winners") or {}).items():
        if knob == "remat":
            # remat is a model-config override, not a driver flag: ride the
            # generic --set mechanism (an explicit --set model.remat=... wins).
            # Both verdicts apply symmetrically — a tuned remat=false matters
            # when the config's default is remat-on (the scale presets).
            sets = getattr(args, "set", None)
            if (isinstance(value, bool) and sets is not None
                    and not any(s.startswith("model.remat=") for s in sets)):
                sets.append(f"model.remat={'true' if value else 'false'}")
                applied["remat"] = value
            continue
        if knob not in _ARG_OF:
            continue
        arg, default = _ARG_OF[knob]
        if not hasattr(args, arg):
            continue  # subcommand doesn't expose this knob
        if getattr(args, arg) != default:
            continue  # explicit flag wins
        if value == default or value is None or value is False:
            continue
        setattr(args, arg, value)
        applied[knob] = value
    return applied


def main():
    import argparse

    ap = argparse.ArgumentParser(
        prog="multimodal_emotion_processing_tpu tune")
    ap.add_argument("config")
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument("--allow-lossy", action="store_true")
    ap.add_argument("--arms", default=None,
                    help="comma list of scan,stacked,transfer,impl")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()
    rec = tune(args.config,
               arms=args.arms.split(",") if args.arms else None,
               allow_lossy=args.allow_lossy,
               steps=args.steps, reps=args.reps, quiet=False)
    line = json.dumps(rec)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    print(line, flush=True)


if __name__ == "__main__":
    main()
