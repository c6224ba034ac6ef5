"""Hyperparameter sweep: every (lr x seed) candidate trains in ONE compiled
program.

The reference's learning rate is a hand-edited module constant
(cmu-mosei/run.py:33) — trying another value means editing the script and
re-running everything.  Here the candidate axis is a vmap axis over a chip
these dim-96 models underfill, so the whole grid (per-candidate plateau LR
+ early stopping included) is a single dispatch.  LR candidates share init
seeds AND per-epoch batch orders, so two members differing only in LR see
bit-identical data from bit-identical inits: clean ablations.

    python examples/lr_sweep.py [config_name]
"""

import sys

import jax

from multimodal_emotion_processing_tpu import configs
from multimodal_emotion_processing_tpu.data.synthetic import synthetic_dataset
from multimodal_emotion_processing_tpu.models import build_model
from multimodal_emotion_processing_tpu.train.sweep import run_lr_sweep


def main(config_name: str = "rencecps"):
    exp = configs.get(config_name)
    print(f"{config_name} on {jax.devices()[0].platform}")

    samples = synthetic_dataset(config_name, exp.model, 192, seed=0)
    flat = [s for u in samples for s in (u if isinstance(u, list) else [u])]
    valid, train = flat[:32], flat[32:]

    result = run_lr_sweep(
        train, valid, build_model(exp), exp.train,
        lrs=[1e-3, 3e-4, 1e-4], seeds_per_lr=2, epochs=4,
        duplicate=exp.train.rdrop_kl)

    print(f"{len(result.members)} candidates in one dispatch, "
          f"{result.seconds:.1f}s")
    for row in result.table():
        print(f"  #{row['rank']}: lr={row['lr']:g} seed={row['seed']} "
              f"best_valid={row['best_valid_loss']:.4f} "
              f"(epoch {row['best_epoch']})")
    win = result.members[result.winner]
    print(f"winner: lr={win.lr:g} — its best_params are ready to use "
          f"(or persist via pipelines.run_lr_sweep_experiment)")


if __name__ == "__main__":
    main(*sys.argv[1:2])
