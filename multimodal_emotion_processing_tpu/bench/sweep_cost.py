"""Cost of the vmapped hyperparameter sweep vs sequential per-LR runs.

`python -m multimodal_emotion_processing_tpu.bench.sweep_cost [--config C]
[--lrs ...] [--epochs E] [--n N]`

A/B on the same split, same epochs, interleaved once:
  A = run_lr_sweep(lrs)            — ALL candidates in one compiled program
  B = sum of fit_fully_compiled    — one whole-run dispatch per candidate
      (the strongest sequential baseline: each run is already a single
      dispatch; per-epoch host drivers would only look worse)

Both sides include their compile time (the honest user-facing cost of
"try these k learning rates").  Timing windows end with a scalar fetch of a
result (utils/sync.py) — block_until_ready alone acks early on this image's
relay (docs/ENGINEERING_NOTES.md).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="mosei_trans")
    ap.add_argument("--lrs", default="1e-3,5e-4,2e-4,1e-4")
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--n", type=int, default=512,
                    help="total synthetic samples (1/8 become validation)")
    args = ap.parse_args(argv)

    from .. import configs
    from ..data.synthetic import synthetic_dataset
    from ..models import build_model
    from ..train.device_epochs import fit_fully_compiled
    from ..train.sweep import run_lr_sweep

    lrs = [float(x) for x in args.lrs.split(",")]
    exp = configs.get(args.config)
    model = build_model(exp)
    samples = synthetic_dataset(args.config, exp.model, n=args.n, seed=0)
    flat = [s for u in samples for s in (u if isinstance(u, list) else [u])]
    n_va = max(len(flat) // 8, exp.train.batch_size)
    valid, train = flat[:n_va], flat[n_va:]
    dup = exp.train.rdrop_kl
    log = lambda m: print(m, file=sys.stderr, flush=True)
    log(f"[{args.config}] {len(train)} train / {len(valid)} valid, "
        f"{len(lrs)} lrs x {args.epochs} epochs")

    t0 = time.perf_counter()
    res = run_lr_sweep(train, valid, model, exp.train, lrs=lrs,
                       epochs=args.epochs, duplicate=dup)
    t_sweep = time.perf_counter() - t0  # run_lr_sweep syncs via scalar fetch
    log(f"sweep (one dispatch, incl. compile): {t_sweep:.1f}s; winner "
        f"lr={res.members[res.winner].lr:g}")

    t_seq = 0.0
    seq_best = []
    for lr in lrs:
        tcfg_lr = dataclasses.replace(exp.train, lr=lr)
        t0 = time.perf_counter()
        _, _, _, _, best_loss = fit_fully_compiled(
            model, tcfg_lr, train, valid, epochs=args.epochs, duplicate=dup)
        t_seq += time.perf_counter() - t0  # fit_fully_compiled scalar-syncs
        seq_best.append(best_loss)
        log(f"sequential lr={lr:g}: cumulative {t_seq:.1f}s "
            f"(best {best_loss:.4f})")

    out = {
        "config": args.config, "lrs": lrs, "epochs": args.epochs,
        "train": len(train), "valid": len(valid),
        "sweep_s": round(t_sweep, 2), "sequential_s": round(t_seq, 2),
        "speedup": round(t_seq / t_sweep, 2),
        "sweep_best": [round(m.best_valid_loss, 4) for m in res.members],
        "sequential_best": [round(x, 4) for x in seq_best],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
