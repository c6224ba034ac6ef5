"""One-command real-corpus acceptance flow (SURVEY §7.4).

A reference user holding the real corpora and the reference's trained `.pt`
checkpoints runs ONE command to produce the parity evidence this image cannot
(the corpora/checkpoints are not distributable — VERDICT r3 "What's missing"):

    python -m multimodal_emotion_processing_tpu acceptance mosei_trans \
        --data-root /data/mosei --checkpoint-dir ./ck \
        --torch-ckpts model_1_2.18.pt model_2_2.20.pt model_3_2.22.pt \
                      model_4_2.17.pt -o acceptance.json

Steps (each one an already-tested front door, chained):
  1. validate the corpus tree (data/validate.py — the `check-data` CLI);
  2. import the reference `.pt` files as checkpoint-store members
     (interop/torch_compat.py — the `import-torch` CLI; forward parity of
     the conversion is ≤2e-4, tests/test_interop.py) — or reuse an existing
     trained store;
  3. ensemble-evaluate on the real test split with the reference's decision
     protocol (pipelines.run_experiment(epochs=0): logit-average ensemble +
     per-emotion thresholds + sklearn-parity metrics — the numbers
     cmu-mosei/run.py:456-513 prints);
  4. robot_demo only: the golden-demo calibrated probabilities
     (sigmoid(logit − offset), robot_demo.py:609) for the requested clips,
     reported next to the expected block the reference records in comments
     (robot_demo.py:643-649) so the user can compare directly.

The flow itself is tested end-to-end on miniature layout-faithful fixture
corpora with torch-oracle checkpoints (tests/test_acceptance.py); the claim
stays exactly that — the REAL numbers require the real artifacts.
"""

from __future__ import annotations

import json
import re
from typing import Dict, List, Optional, Sequence

# robot_demo.py:643-649 — the reference's recorded demo output for its
# trained 4-model ensemble on its demo files (happy .74 / sad .85 / ...).
GOLDEN_DEMO_EXPECTED = {"happ": 0.74, "sadn": 0.85, "ange": 0.02,
                        "disg": 0.02, "surp": 0.02, "fear": 0.43}

# The reference's recorded per-fold best valid losses — the ONLY trained-run
# numbers it persists (embedded in the checkpoint filenames its eval blocks
# hard-code; the per-emotion acc/F1 are printed, never stored).  A
# --train-from-scratch acceptance run reports its own fold losses next to
# these so a corpus-holder gets the side-by-side without reading the
# reference source.
REFERENCE_FOLD_LOSSES = {
    "mosei_trans": {"losses": [2.18, 2.20, 2.22, 2.17],
                    "source": "cmu-mosei/run.py:447-453 (model_{1..4}_*.pt)"},
    "rencecps": {"losses": [2.11, 2.12, 2.09, 2.09],
                 "source": "rencecps/run.py:245-251 (model_d{1..4}_*.pt)"},
    "ren_mme": {"losses": [2.47, 2.55, 2.52, 2.54],
                "source": "Ren-MME/run.py:455-535 (base_{1..4}_*.pt)"},
    "mosei_realformer": {"losses": [1.33, 1.37],
                         "source": "others/realformer.py:483-485 "
                                   "(model_{1,2}_*.pt)"},
    "robot_demo": {"losses": [1.31, 1.37, 1.39, 1.32],
                   "source": "robot_demo.py:584-590 (model_{1..4}_*.pt)"},
}


def import_torch_members(config_name: str, pt_paths: Sequence[str],
                         checkpoint_dir: str, *, overrides=None,
                         force: bool = False) -> List[str]:
    """`import-torch` as a library call: reference .pt state dicts become
    store members named {config}_{i} with the filename-embedded valid loss
    (cmu-mosei/run.py:446-453's convention) in the manifest."""
    from .. import configs
    from ..interop.torch_compat import load_reference_checkpoint
    from ..train.checkpoint import CheckpointStore

    exp = configs.with_overrides(configs.get(config_name), overrides)
    store = CheckpointStore(checkpoint_dir)
    names = [f"{config_name}_{i + 1}" for i in range(len(pt_paths))]
    clobbered = [n for n in names if n in store.manifest]
    if clobbered and not force:
        raise ValueError(
            f"members already exist in {checkpoint_dir}: "
            f"{', '.join(clobbered)} — pass force=True/--force to overwrite")
    for name, path in zip(names, pt_paths):
        params = load_reference_checkpoint(path, exp.model)
        m = re.search(r"_(\d+\.\d+)\.pt$", path)
        store.save_params(name, params, valid_loss=float(m.group(1)) if m
                          else 0.0)
    return names


def _golden_demo(exp, data_root: str, checkpoint_dir: str,
                 demo_clips: Optional[Sequence[str]], n_demo: int) -> Dict:
    """robot_demo: calibrated serving probabilities for real clips — the
    exact numbers robot_demo.py:616-622 prints."""
    import jax

    from ..models import build_model
    from ..pipelines import load_real_data
    from ..serve import StreamingPredictor
    from ..train.checkpoint import CheckpointStore

    model = build_model(exp)
    store = CheckpointStore(checkpoint_dir)
    names = store.best_members(exp.name)
    if not names:
        raise ValueError(f"no '{exp.name}*' members in {checkpoint_dir}")
    params_like = model.init(jax.random.PRNGKey(0))
    members = [store.restore_params(n, params_like) for n in names]
    samples, _, ctx = load_real_data(exp, data_root)
    by_name = {ctx["names"][int(s["name_idx"])]: s for s in samples}
    clips = list(demo_clips) if demo_clips else sorted(by_name)[:n_demo]
    missing = [c for c in clips if c not in by_name]
    if missing:
        raise ValueError(f"demo clips not in the corpus: {missing} "
                         f"(have e.g. {sorted(by_name)[:5]})")
    sp = StreamingPredictor(model, members, offsets=exp.thresholds,
                            dtype=exp.train.compute_dtype)
    return {
        "members": names,
        "clips": {c: sp.emotions(by_name[c], exp.emotion_names)
                  for c in clips},
        "reference_expected": GOLDEN_DEMO_EXPECTED,
        "note": ("reference_expected is robot_demo.py:643-649's recorded "
                 "output for ITS demo files under ITS trained ensemble — "
                 "comparable only when running those exact clips with the "
                 "imported reference checkpoints"),
    }


def run_acceptance(
    config_name: str,
    data_root: str,
    *,
    checkpoint_dir: str,
    torch_ckpts: Optional[Sequence[str]] = None,
    demo_clips: Optional[Sequence[str]] = None,
    n_demo: int = 2,
    overrides: Optional[Dict] = None,
    sweep_thresholds: bool = False,
    force: bool = False,
    quiet: bool = True,
    train_from_scratch: bool = False,
    epochs: Optional[int] = None,
) -> Dict:
    """The full acceptance flow; returns the report dict (see module
    docstring).  `overrides` exists for the fixture-scale tests — real runs
    use the reference dimensions unmodified.

    `train_from_scratch` (VERDICT r4 item 5): instead of importing trained
    checkpoints, run the reference's OWN protocol end-to-end — k-fold train
    on the real tree (the reference's fold carving, plateau LR, >0.009 save
    guard), then the reference-protocol ensemble eval — and report the
    per-fold best valid losses next to the reference's recorded ones
    (REFERENCE_FOLD_LOSSES), so a corpus-holder reproduces the reference's
    headline numbers with zero CLI knowledge.  `epochs` caps training for
    smoke runs; None = the config's reference epoch budget."""
    from .. import configs
    from ..data.validate import validate_tree

    if train_from_scratch and torch_ckpts:
        raise ValueError(
            "--train-from-scratch trains the ensemble itself; it cannot be "
            "combined with --torch-ckpts (pick one evidence path)")

    exp = configs.with_overrides(configs.get(config_name), overrides)
    report: Dict = {"config": config_name, "data_root": data_root,
                    "checkpoint_dir": checkpoint_dir}

    report["data_check"] = validate_tree(config_name, data_root)
    if not report["data_check"]["ok"]:
        report["ok"] = False
        return report

    if torch_ckpts:
        report["imported_members"] = import_torch_members(
            config_name, torch_ckpts, checkpoint_dir, overrides=overrides,
            force=force)

    if train_from_scratch:
        from ..pipelines import run_experiment

        res = run_experiment(
            config_name, synthetic_data=False, data_root=data_root,
            checkpoint_dir=checkpoint_dir, epochs=epochs, quiet=quiet,
            overrides=overrides, sweep_thresholds=sweep_thresholds)
        fam = configs.family(config_name)
        ref = REFERENCE_FOLD_LOSSES.get(fam)
        report["trained"] = {
            "fold_best_valid_losses": [
                round(min(s.valid_loss for s in h), 4) if h else None
                for h in res.fold_histories],
            "epochs_ran": [len(h) for h in res.fold_histories],
            "reference_expected": ref,
            "note": ("reference_expected are the reference's RECORDED best "
                     "valid losses (its checkpoint filenames) for its run "
                     "on the full corpus — comparable only at the reference "
                     "dims/epochs on the real tree"),
        }
        if res.report is not None:
            report["metrics"] = res.report
        if res.sweep is not None:
            report["sweep"] = {k: v for k, v in res.sweep.items()
                               if k != "joint"}
        if configs.family(config_name) == "robot_demo":
            # trained members are now in the store — the acceptance artifact
            # for the robot family is the golden-demo block on top of them
            report["golden_demo"] = _golden_demo(
                exp, data_root, checkpoint_dir, demo_clips, n_demo)
        report["ok"] = True
        return report

    if configs.family(config_name) == "robot_demo":
        # the robot corpus has no held-out test split (the reference trains
        # on all clips and demos on files, robot_demo.py:594-640) — the
        # acceptance artifact is the golden demo block
        report["golden_demo"] = _golden_demo(exp, data_root, checkpoint_dir,
                                             demo_clips, n_demo)
    else:
        from ..pipelines import run_experiment

        res = run_experiment(
            config_name, synthetic_data=False, data_root=data_root,
            checkpoint_dir=checkpoint_dir, epochs=0, quiet=quiet,
            overrides=overrides, sweep_thresholds=sweep_thresholds)
        report["metrics"] = res.report
        if res.sweep is not None:
            report["sweep"] = {k: v for k, v in res.sweep.items()
                               if k != "joint"}
    report["ok"] = True
    return report


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        prog="multimodal_emotion_processing_tpu acceptance",
        description="real-corpus acceptance flow (docs/REAL_DATA.md)")
    ap.add_argument("config")
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--checkpoint-dir", required=True,
                    help="store with trained members, or the import "
                         "destination when --torch-ckpts is given")
    ap.add_argument("--torch-ckpts", nargs="+", default=None,
                    help="reference .pt files to import as the ensemble")
    ap.add_argument("--train-from-scratch", action="store_true",
                    help="k-fold train on the real tree (reference protocol) "
                         "instead of importing checkpoints; reports fold "
                         "best-valid losses next to the reference's recorded "
                         "ones")
    ap.add_argument("--epochs", type=int, default=None,
                    help="cap training epochs (smoke runs); default = the "
                         "config's reference epoch budget")
    ap.add_argument("--demo-clips", nargs="+", default=None,
                    help="robot_demo: clip names for the golden-demo block")
    ap.add_argument("--sweep-thresholds", action="store_true")
    ap.add_argument("--force", action="store_true",
                    help="overwrite existing imported members")
    ap.add_argument("--set", dest="set", action="append", default=[],
                    metavar="model.X=V|train.X=V",
                    help="config overrides (fixture-scale smoke runs; real "
                         "acceptance uses the reference dims unmodified)")
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args(argv)
    from ..cli import parse_overrides

    report = run_acceptance(
        args.config, args.data_root, checkpoint_dir=args.checkpoint_dir,
        torch_ckpts=args.torch_ckpts, demo_clips=args.demo_clips,
        overrides=parse_overrides(args.set) if args.set else None,
        sweep_thresholds=args.sweep_thresholds, force=args.force,
        quiet=False, train_from_scratch=args.train_from_scratch,
        epochs=args.epochs)
    line = json.dumps(report)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    print(line, flush=True)
    return 0 if report.get("ok") else 1


if __name__ == "__main__":
    raise SystemExit(main())
