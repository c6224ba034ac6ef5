"""Command-line interface — the reference's five `python run.py` scripts
become `python -m multimodal_emotion_processing_tpu <cmd> <config>`.

Commands:
  train        — k-fold bagged training + ensemble evaluation (one reference script)
  eval         — ensemble evaluation from saved checkpoints
  predict      — offline batch inference to .npz/.csv/.jsonl (per-sample
                 logits / calibrated probs / decisions; --calibration ECE)
  sweep        — vmapped hyperparameter sweep (every candidate in ONE program)
  serve        — streaming single-sample demo (robot_demo.py path), dynamic
                 micro-batching under --concurrent, HTTP via --http-port
  export       — AOT-export the serving predictor to a StableHLO blob
                 (--batch N exports the micro-batching bucket program)
  import-torch — reference .pt checkpoints -> checkpoint-store members
  export-torch — members -> reference-loadable .pt state dicts
  check-data   — validate a real corpus tree (all problems in one report)
  acceptance   — one-command real-corpus acceptance flow: check-data +
                 import-torch + reference-protocol eval / golden demo
                 (docs/REAL_DATA.md)
  checkpoints  — inspect a checkpoint store (members, losses, disk usage)
  doctor       — measure the host/device properties perf numbers depend on
  summary      — per-module parameter counts + analytic per-sample FLOPs
  bench        — train+infer throughput on this chip
  configs      — list available configs with their hyperparameters
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser():
    p = argparse.ArgumentParser(prog="multimodal_emotion_processing_tpu")
    p.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="persistent XLA compilation-cache directory (also "
                        "via MEP_COMPILE_CACHE): later launches reuse "
                        "compiled train/eval programs instead of paying the "
                        "20-40s first-compile again")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("config", help="config name (see `configs`) or a .json config "
                        "file ({'config': name, 'model'/'train': overrides} "
                        "— or a run's run_meta.json to reproduce it)")
        sp.add_argument("--data-root", default=None,
                        help="real corpus root; omit for synthetic data")
        sp.add_argument("--epochs", type=int, default=None)
        sp.add_argument("--n-train", type=int, default=256)
        sp.add_argument("--n-test", type=int, default=64)
        sp.add_argument("--log-dir", default=None)
        sp.add_argument("--checkpoint-dir", default=None)
        sp.add_argument("--profile-dir", default=None, metavar="DIR",
                        help="capture a jax.profiler trace (Perfetto/"
                             "TensorBoard viewable) of the first post-"
                             "compile epoch (one-dispatch runs trace their "
                             "single dispatch) into DIR")
        sp.add_argument("--impl", choices=["xla", "pallas", "flash", "cp"], default=None)
        sp.add_argument("--tuned", default=None, metavar="TUNED_JSON",
                        help="apply the measured knob winners from a `tune` "
                             "run (bench/autotune.py); explicit flags win "
                             "over the file")
        sp.add_argument("--sweep-thresholds", action="store_true")
        sp.add_argument("--quiet", action="store_true")
        sp.add_argument("--set", action="append", default=[], metavar="K=V",
                        help="config override, e.g. --set train.batch_size=32 "
                             "--set model.n_layers=2 (values parsed as JSON)")
        sp.add_argument("--debug-nans", action="store_true",
                        help="fail fast on the first NaN-producing op "
                             "(jax_debug_nans)")
        sp.add_argument("--scan-steps", type=int, default=1,
                        help="chain N train/eval steps into one dispatch "
                             "(lax.scan; identical math, amortizes the per-"
                             "dispatch overhead — honest win 1.1-3.8x by "
                             "config; the old 12-49x was a sync artifact)")
        sp.add_argument("--device-resident", action="store_true",
                        help="stage the dataset in HBM once and run each "
                             "k-fold epoch as one dispatch (honest A/B: 2.3x "
                             "the host-fed experiment; needs the corpus to "
                             "fit HBM)")
        sp.add_argument("--one-dispatch", action="store_true",
                        help="the ENTIRE k-fold experiment (all folds x all "
                             "epochs, plateau LR + early stop in-graph) as a "
                             "single dispatch (honest A/B: 4.5x the host-fed "
                             "experiment; same HBM requirements)")
        sp.add_argument("--resume", action="store_true",
                        help="resume an interrupted k-fold run from its "
                             "per-epoch checkpoints (requires --checkpoint-dir)")
        sp.add_argument("--seeds-per-fold", type=int, default=1,
                        help="train N independently-initialized models per "
                             "fold and ensemble all k*N members (beyond the "
                             "reference's one-seed-per-fold bagging; the "
                             "vmapped drivers widen their model axis, so "
                             "extra seeds share each training dispatch)")
        sp.add_argument("--accum-steps", type=int, default=1,
                        help="gradient accumulation: split each batch into "
                             "this many sequential micro-batches (exact "
                             "full-batch gradient; ~N-fold lower activation "
                             "memory; sequential k-fold driver only)")
        sp.add_argument("--transfer-dtype",
                        choices=["float16", "bfloat16", "int8"],
                        default=None,
                        help="compressed host->device wire format: float32 "
                             "batch leaves are cast before the transfer and "
                             "restored to f32 in-graph — float16/bfloat16 "
                             "halve the data-fed path's H2D bytes (~1e-3 "
                             "feature rounding), int8 quantizes features 4x "
                             "(sequential, --device-resident, and "
                             "--one-dispatch drivers; masks/labels stay "
                             "exact); default keeps bit-exact numerics)")
        sp.add_argument("--async-checkpoint", action="store_true",
                        help="save checkpoints through an async Orbax "
                             "checkpointer: the device->host copy is inline "
                             "but serialization/fsync overlaps the next "
                             "epoch's compute (the standard TPU-pod "
                             "practice); restores join any in-flight save")
        sp.add_argument("--dp", type=int, default=None,
                        help="data-parallel over N mesh devices: batches "
                             "sharded on the 'data' axis, gradients "
                             "all-reduced by XLA over ICI (identical math "
                             "to single-device)")
        sp.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel width on the 'model' mesh axis "
                             "(head-sharded attention; demonstrative at "
                             "these model sizes)")

    common(sub.add_parser("train", help="k-fold training + ensemble eval"))

    sw = sub.add_parser(
        "sweep", help="vmapped hyperparameter sweep: every (lr x seed) "
                      "candidate trains in ONE compiled program on the "
                      "fold-0 split and is ranked by best valid loss")
    sw.add_argument("config", help="config name (see `configs`) or a .json config "
                        "file ({'config': name, 'model'/'train': overrides} "
                        "— or a run's run_meta.json to reproduce it)")
    sw.add_argument("--lrs", required=True,
                    help="comma-separated learning-rate candidates, e.g. "
                         "1e-3,3e-4,1e-4")
    sw.add_argument("--wds", default=None,
                    help="optional comma-separated AdamW weight-decay "
                         "candidates — the grid becomes lr x wd x seed, "
                         "still one compiled program")
    sw.add_argument("--seeds-per-lr", type=int, default=1,
                    help="independent init seeds per LR candidate; LR "
                         "candidates share seeds + batch orders, so "
                         "trajectory deltas isolate the LR's effect")
    sw.add_argument("--data-root", default=None,
                    help="real corpus root (default: synthetic data)")
    sw.add_argument("--epochs", type=int, default=None)
    sw.add_argument("--n-train", type=int, default=256)
    sw.add_argument("--n-test", type=int, default=64)
    sw.add_argument("--impl", choices=["xla", "pallas", "flash", "cp"], default=None)
    sw.add_argument("--checkpoint-dir", default=None,
                    help="persist the winner's best params as "
                         "'<config>_sweep_winner'")
    sw.add_argument("--transfer-dtype", choices=["float16", "bfloat16"],
                    default=None,
                    help="stage the sweep datasets half-width in HBM "
                         "(upcast in-graph; see train --transfer-dtype)")
    sw.add_argument("--quiet", action="store_true")
    sw.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="config override, e.g. train.batch_size=32")

    ev = sub.add_parser("eval", help="ensemble eval from checkpoints")
    common(ev)

    pd = sub.add_parser(
        "predict", help="offline batch inference: per-sample ensemble "
                        "logits, calibrated probs, and threshold decisions "
                        "to .npz/.csv/.jsonl (the artifact between `eval`'s "
                        "metrics and `serve`'s one-sample loop)")
    pd.add_argument("config")
    pd.add_argument("--output", "-o", required=True,
                    help="output path; format by extension: .npz/.csv/.jsonl")
    pd.add_argument("--checkpoint-dir", default=None)
    pd.add_argument("--init-random", action="store_true",
                    help="smoke mode: one fresh-init member instead of "
                         "trained checkpoints")
    pd.add_argument("--data-root", default=None,
                    help="real corpus root (default: synthetic test split)")
    pd.add_argument("--n-test", type=int, default=64,
                    help="synthetic test-split size")
    pd.add_argument("--n-train", type=int, default=None,
                    help="synthetic train-split size for --split train/all "
                         "(default: --n-test); match the size the model "
                         "actually trained on for error analysis")
    pd.add_argument("--split", choices=["test", "train", "all"],
                    default="test",
                    help="which samples to score (train-split prediction is "
                         "the standard error-analysis workflow; 'all' "
                         "covers corpora without a held-out split)")
    pd.add_argument("--impl", choices=["xla", "pallas", "flash", "cp"], default=None)
    pd.add_argument("--set", action="append", default=[], metavar="K=V")
    pd.add_argument("--thresholds", default=None, metavar="T1,T2,...",
                    help="comma-separated per-emotion decision thresholds "
                         "(default: the config's tuned ones); use the "
                         "--thresholds=-0.3,-0.5,... form for negative "
                         "values")
    pd.add_argument("--transfer-dtype",
                    choices=["float16", "bfloat16", "int8"],
                    default=None)
    pd.add_argument("--stacked-grid", action="store_true")
    pd.add_argument("--device-resident", action="store_true",
                    help="stage the dataset in HBM once and score every "
                         "batch in ONE dispatch (bulk offline scoring; "
                         "identical logits to the per-batch path)")
    pd.add_argument("--dp", type=int, default=None, metavar="N",
                    help="shard batch inference over N devices on a mesh "
                         "'data' axis (members replicate; logits identical "
                         "to single-device)")
    pd.add_argument("--tuned", default=None, metavar="TUNED_JSON",
                    help="apply measured knob winners from a `tune` run")
    pd.add_argument("--calibration", action="store_true",
                    help="append a calibration report (per-emotion ECE + "
                         "reliability bins of the serving probabilities "
                         "against the labels) to the printed summary")
    pd.add_argument("--quiet", action="store_true")

    sv = sub.add_parser("serve", help="streaming single-sample inference demo")
    sv.add_argument("config", nargs="?", default="robot_demo")
    sv.add_argument("--checkpoint-dir", default=None)
    sv.add_argument("--impl", choices=["xla", "pallas", "flash", "cp"], default=None)
    sv.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="config override (must match the checkpoints' "
                         "architecture when restoring members)")
    sv.add_argument("--concurrent", type=int, default=0, metavar="N",
                    help="drive N concurrent requests through the dynamic "
                         "micro-batching server (serve/server.py) instead "
                         "of one batch-1 sample; prints per-request "
                         "emotions for the first request plus server "
                         "batching stats and req/s")
    sv.add_argument("--max-delay-ms", type=float, default=3.0,
                    help="micro-batching window: how long the server waits "
                         "for followers after the first queued request")
    sv.add_argument("--thresholds", default=None, metavar="T1,T2,...",
                    help="explicit per-emotion calibration offsets "
                         "(win over store-persisted tuned thresholds and "
                         "the config table; required for sweep-only "
                         "configs like mosei_realformer without a store); "
                         "use --thresholds=-0.3,... for negative values")
    sv.add_argument("--http-port", type=int, default=None, metavar="PORT",
                    help="serve the ensemble over HTTP (stdlib, no extra "
                         "deps): GET /healthz, GET /spec (feature shapes + "
                         "emotion names), POST /predict (one JSON sample); "
                         "concurrent requests micro-batch into bucketed "
                         "TPU dispatches; blocks until Ctrl-C")
    sv.add_argument("--http-host", default="127.0.0.1")
    sv.add_argument("--stacked-grid", action="store_true",
                    help="stacked realformer grid for the inference program "
                         "(measured SLOWER at reference shapes under honest "
                         "sync — robot -26%%, realformer -4%%; selectable for "
                         "shapes where 3 fat chains beat 9 thin ones; "
                         "unequal lengths pad to max; no-op for minus blocks)")
    sv.add_argument("--tuned", default=None, metavar="TUNED_JSON",
                    help="apply measured knob winners from a `tune` run")

    ex = sub.add_parser("export", help="AOT-export the serving predictor "
                        "(ensemble + calibrated sigmoid) to a StableHLO blob")
    ex.add_argument("config", nargs="?", default="robot_demo")
    ex.add_argument("--checkpoint-dir", default=None)
    ex.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="config override (must match the checkpoints' "
                         "architecture when restoring members)")
    ex.add_argument("--out", default="predictor.shlo")
    ex.add_argument("--platforms", default="tpu,cpu",
                    help="comma-separated export platforms")
    ex.add_argument("--batch", type=int, default=1,
                    help="static batch size of the exported program: 1 = "
                         "the live batch-1 predictor; >1 = the micro-"
                         "batching server's bucket program (export one "
                         "blob per bucket size for a model-code-free "
                         "serving host)")

    it = sub.add_parser(
        "import-torch",
        help="convert reference .pt checkpoints (torch state dicts, the "
             "files cmu-mosei/run.py:446-453 reloads by name) into this "
             "framework's checkpoint store — then `eval`/`serve`/`export` "
             "use them directly")
    it.add_argument("config")
    it.add_argument("pt", nargs="+", help=".pt files, one ensemble member "
                    "each (fold order = argument order)")
    it.add_argument("--checkpoint-dir", required=True)
    it.add_argument("--force", action="store_true",
                    help="overwrite members that already exist in the store")

    et = sub.add_parser(
        "export-torch",
        help="write each best member back out as a reference-format torch "
             "state dict (.pt) loadable by the original scripts")
    et.add_argument("config")
    et.add_argument("--checkpoint-dir", required=True)
    et.add_argument("--out", default=".", help="output directory")

    cd = sub.add_parser(
        "check-data",
        help="validate a real corpus tree for a config BEFORE training: "
             "reports every required file/dir, corpus counts, and feature "
             "coverage as one JSON document (exit 1 on problems)")
    cd.add_argument("config")
    cd.add_argument("--data-root", required=True)

    sub.add_parser("bench", help="train+infer throughput benchmark")
    dr = sub.add_parser(
        "doctor", help="environment diagnostics: dispatch floor, H2D "
                       "bandwidth, matmul GFLOP/s, block_until_ready "
                       "honesty — the properties every perf number depends "
                       "on (one JSON line to stdout)")
    dr.add_argument("--json-only", action="store_true")
    dr.add_argument("--scan-k", type=int, default=64)
    sm = sub.add_parser(
        "summary", help="model summary for a config: per-module parameter "
                        "counts, total (== the torch replica's), and "
                        "analytic per-sample FLOPs")
    sm.add_argument("config")
    sm.add_argument("--set", action="append", default=[], metavar="K=V")
    sm.add_argument("--depth", type=int, default=2,
                    help="pytree path depth to group parameters by")

    cp = sub.add_parser(
        "checkpoints", help="inspect a checkpoint store: members, valid "
                            "losses, best epochs, resume points, artifact "
                            "kinds, disk usage (reads manifest.json — the "
                            "replacement for the reference's loss-tagged "
                            ".pt filenames)")
    cp.add_argument("checkpoint_dir")
    cp.add_argument("--prefix", default="",
                    help="only members whose name starts with this "
                         "(e.g. a config name)")

    ac = sub.add_parser(
        "acceptance",
        help="real-corpus acceptance flow: validate tree -> (optionally) "
             "import reference .pt checkpoints -> reference-protocol "
             "metrics / golden-demo probabilities (docs/REAL_DATA.md)",
        add_help=False)
    ac.add_argument("rest", nargs=argparse.REMAINDER)

    tn = sub.add_parser(
        "tune", help="measure THIS machine's winners for the selectable "
                     "perf knobs (scan chaining, stream stacking, wire "
                     "dtype, pallas vs xla) and write a tuned.json that "
                     "train/predict/serve apply via --tuned")
    tn.add_argument("config")
    tn.add_argument("-o", "--out", default=None,
                    help="write the tuned record here (also printed)")
    tn.add_argument("--allow-lossy", action="store_true",
                    help="also tune knobs that change numerics (int8 wire "
                         "quantization); without it only bit-exact knobs "
                         "are measured")
    tn.add_argument("--arms", default=None, metavar="A,B,...",
                    help="subset of scan,stacked,transfer,impl")
    tn.add_argument("--steps", type=int, default=20)
    tn.add_argument("--reps", type=int, default=4)

    sub.add_parser("configs", help="list configs")
    return p


def cmd_configs():
    from . import configs

    for name in sorted(configs.REGISTRY):
        exp = configs.get(name)
        m, t = exp.model, exp.train
        print(f"{name}: dim={m.dim} heads={m.n_heads} layers={m.n_layers} "
              f"block={m.block} head={m.head} "
              f"lens=({m.l_len},{m.v_len},{m.a_len}) batch={t.batch_size} "
              f"lr={t.lr} folds={t.n_folds} E={m.n_emotions}")


def apply_config_file(args):
    """If the positional `config` is a path to a .json file, resolve it via
    configs.load_config_file: the registry name replaces args.config and
    the file's model/train overrides are prepended to args.set (so explicit
    --set K=V pairs still win — parse_overrides applies them last).  This
    makes `train run_meta.json` reproduce a recorded run's config and
    `train my_experiment.json` a file-driven front door (SURVEY §5)."""
    import os

    name = getattr(args, "config", None)
    if not (isinstance(name, str) and name.endswith(".json")):
        return
    if not os.path.exists(name):
        raise SystemExit(f"config file {name!r} does not exist")
    from . import configs

    try:
        cfg_name, overrides = configs.load_config_file(name)
    except ValueError as e:
        raise SystemExit(str(e))
    if cfg_name is None:
        raise SystemExit(
            f"{name} names no base config — add a top-level "
            "\"config\": \"<registry name>\" key")
    pairs = [f"{sec}.{k}={json.dumps(v)}"
             for sec in ("model", "train")
             for k, v in overrides.get(sec, {}).items()]
    if pairs and not hasattr(args, "set"):
        raise SystemExit(
            f"`{args.cmd}` takes no config overrides; {name} carries "
            f"{len(pairs)} — pass the bare config name instead")
    args.config = cfg_name
    if hasattr(args, "set"):
        args.set = pairs + list(args.set)


def parse_overrides(pairs):
    out = {"model": {}, "train": {}}
    for kv in pairs:
        key, _, raw = kv.partition("=")
        section, _, field = key.partition(".")
        if section not in out or not field:
            raise SystemExit(f"--set expects model.X=V or train.X=V, got {kv!r}")
        try:
            out[section][field] = json.loads(raw)
        except json.JSONDecodeError:
            out[section][field] = raw
    return out


def cmd_train(args, eval_only=False):
    from .pipelines import run_experiment

    if getattr(args, "debug_nans", False):
        from .utils.logging import enable_nan_debugging

        enable_nan_debugging(True)
    if eval_only and not args.checkpoint_dir:
        raise SystemExit(
            "eval requires --checkpoint-dir (otherwise there are no trained "
            "members to ensemble — run `train` first)")
    result = run_experiment(
        args.config,
        synthetic_data=args.data_root is None,
        data_root=args.data_root,
        n_train=args.n_train, n_test=args.n_test,
        epochs=0 if eval_only else args.epochs,
        log_dir=args.log_dir, checkpoint_dir=args.checkpoint_dir,
        impl=args.impl, sweep_thresholds=args.sweep_thresholds,
        quiet=args.quiet, overrides=parse_overrides(args.set),
        resume=getattr(args, "resume", False),
        scan_steps=getattr(args, "scan_steps", 1),
        device_resident=getattr(args, "device_resident", False),
        one_dispatch=getattr(args, "one_dispatch", False),
        dp=getattr(args, "dp", None), tp=getattr(args, "tp", 1),
        seeds_per_fold=getattr(args, "seeds_per_fold", 1),
        accum_steps=getattr(args, "accum_steps", 1),
        transfer_dtype=getattr(args, "transfer_dtype", None),
        profile_dir=getattr(args, "profile_dir", None),
        async_checkpoint=getattr(args, "async_checkpoint", False))
    if result.report is not None:
        print(json.dumps(result.report, indent=2))
    if result.sweep is not None:
        print(json.dumps({"best_thresholds": result.sweep}, indent=2))


def cmd_sweep(args):
    from .pipelines import run_lr_sweep_experiment

    def _floats(flag, raw):
        try:
            vals = [float(x) for x in raw.split(",") if x.strip()]
        except ValueError:
            raise SystemExit(f"{flag} expects comma-separated floats, got "
                             f"{raw!r}")
        return vals

    lrs = _floats("--lrs", args.lrs)
    if not lrs:
        raise SystemExit("--lrs expects at least one learning rate")
    wds = _floats("--wds", args.wds) if args.wds else None
    out = run_lr_sweep_experiment(
        args.config, lrs=lrs, wds=wds, seeds_per_lr=args.seeds_per_lr,
        synthetic_data=args.data_root is None, data_root=args.data_root,
        n_train=args.n_train, n_test=args.n_test, epochs=args.epochs,
        impl=args.impl, quiet=args.quiet,
        overrides=parse_overrides(args.set),
        checkpoint_dir=args.checkpoint_dir,
        transfer_dtype=getattr(args, "transfer_dtype", None))
    print(json.dumps(out, indent=2))


def _load_members(args, model, verb: str):
    """Ensemble member params for serve/export: the checkpoint store's best
    members, or a 4-member random-init fallback (with a stderr note)."""
    import jax

    from .train.checkpoint import CheckpointStore

    if args.checkpoint_dir:
        store = CheckpointStore(args.checkpoint_dir)
        params_like = model.init(jax.random.PRNGKey(0))
        names = store.best_members(args.config)
        if not names and f"{args.config}_sweep_winner" in store.manifest:
            names = [f"{args.config}_sweep_winner"]  # sweep-only store
        if not names:
            raise SystemExit(
                f"no '{args.config}*' members with best checkpoints in "
                f"{args.checkpoint_dir} — train with --checkpoint-dir first")
        return [store.restore_params(n, params_like) for n in names]
    print(f"(no --checkpoint-dir: {verb} randomly initialized ensemble)",
          file=sys.stderr)
    return [model.init(jax.random.PRNGKey(i)) for i in range(4)]


def _resolve_offsets(args, exp):
    """Serving/export calibration offsets: tuned thresholds persisted by a
    swept eval in the checkpoint store (pipelines.save_tuned_thresholds)
    win over the config's built-in table — the reference's equivalent step
    is hand-editing the swept values back into the script.  An explicit
    `--thresholds` flag wins over both."""
    raw = getattr(args, "thresholds", None)
    if raw:
        return tuple(float(t) for t in raw.split(","))
    if getattr(args, "checkpoint_dir", None):
        from .pipelines import load_tuned_thresholds

        t = load_tuned_thresholds(args.checkpoint_dir, args.config, exp)
        if t is not None:
            print(f"(using tuned thresholds from "
                  f"{args.checkpoint_dir}/thresholds.json)", file=sys.stderr)
            return tuple(t)
    return exp.thresholds


def cmd_serve(args):
    from . import configs
    from .data.synthetic import synthetic_dataset
    from .models import build_model
    from .serve import StreamingPredictor

    exp = configs.with_overrides(configs.get(args.config),
                                 parse_overrides(getattr(args, "set", [])))
    model = build_model(exp)
    args.impl = args.impl or exp.model.attn_impl
    members = _load_members(args, model, "serving")
    offsets = _resolve_offsets(args, exp)
    from .ops.context_parallel import ensure_cp

    import time

    if exp.model.head == "state_transfer":
        # the paragraph model serves CLIP-BY-CLIP with on-device recurrence
        # state (the reference can only score complete P_LEN windows,
        # others/realformer.py:272-286); the per-sample batching fronts
        # don't apply to a stateful stream
        if getattr(args, "http_port", None) is not None or \
                getattr(args, "concurrent", 0) > 0:
            raise SystemExit(
                "state_transfer configs stream clip-by-clip with carried "
                "recurrence state; --http-port/--concurrent serve stateless "
                "per-sample heads")
        from .serve import ParagraphStreamingPredictor

        sp = ParagraphStreamingPredictor(
            model, members, offsets=offsets, impl=args.impl,
            stacked_grid=getattr(args, "stacked_grid", False),
            dtype=exp.train.compute_dtype)
        sample = synthetic_dataset(args.config, exp.model, 1, seed=7)[0]
        plen = sample["l"].shape[0]
        clips = [{k: sample[k][t] for k in sp._CLIP_KEYS}
                 for t in range(plen)]
        with ensure_cp(args.impl):
            sp.warmup(clips[0])
            sp.reset()
            t0 = time.perf_counter()
            per_clip = [sp.emotions(c, exp.emotion_names) for c in clips]
            latency_ms = (time.perf_counter() - t0) * 1e3 / plen
        print(f"Streaming paragraph ({plen} clips, state carried on device)")
        for t, emos in enumerate(per_clip):
            print(f"clip {t}: " + "  ".join(f"{n} {p}"
                                            for n, p in emos.items()))
        print(f"(p50-path latency: {latency_ms:.2f} ms/clip, "
              f"{len(members)}-model ensemble)", file=sys.stderr)
        return

    http_port = getattr(args, "http_port", None)
    if http_port is not None:
        from .serve import BatchingServer, HttpFrontend

        sample = synthetic_dataset(args.config, exp.model, 1, seed=7)[0]
        spec = {k: v.shape for k, v in sample.items() if k != "label"}
        with ensure_cp(args.impl), BatchingServer(
                model, members, offsets=offsets, impl=args.impl,
                stacked_grid=getattr(args, "stacked_grid", False),
                max_delay_ms=getattr(args, "max_delay_ms", 3.0),
                dtype=exp.train.compute_dtype) as srv:
            srv.warmup(sample)
            off = len(offsets)
            fe = HttpFrontend(srv, spec, exp.emotion_names[:off],
                              host=getattr(args, "http_host", "127.0.0.1"),
                              port=http_port)
            print(f"serving {args.config} ({len(members)}-member "
                  f"ensemble) on http://{fe.host}:{fe.port} — "
                  f"GET /spec for the feature contract; Ctrl-C stops",
                  file=sys.stderr)
            try:
                fe.serve_forever()  # blocking; Ctrl-C returns
            finally:
                fe.close()
        return

    n_conc = getattr(args, "concurrent", 0)
    if n_conc > 0:
        from .serve import BatchingServer

        samples = synthetic_dataset(args.config, exp.model, n_conc, seed=7)
        with ensure_cp(args.impl), BatchingServer(
                model, members, offsets=offsets, impl=args.impl,
                stacked_grid=getattr(args, "stacked_grid", False),
                max_delay_ms=getattr(args, "max_delay_ms", 3.0),
                dtype=exp.train.compute_dtype) as srv:
            srv.warmup(samples[0])
            t0 = time.perf_counter()
            futs = [srv.submit(s) for s in samples]
            results = [f.result(timeout=600) for f in futs]
            elapsed = time.perf_counter() - t0
            stats = srv.stats()
        off = len(offsets)
        probs = results[0][1]
        print("The emotion(s) is(are)  [request 1 of "
              f"{len(results)} concurrent]")
        for name, prob in zip(exp.emotion_names[:off], probs):
            print(name, round(float(prob), 2))
        print(f"({n_conc} requests in {elapsed * 1e3:.1f} ms = "
              f"{n_conc / elapsed:.1f} req/s; batches={stats['batches']} "
              f"by_bucket={ {b: c for b, c in stats['by_bucket'].items() if c} })",
              file=sys.stderr)
        return

    sp = StreamingPredictor(model, members, offsets=offsets,
                            impl=args.impl,
                            stacked_grid=getattr(args, "stacked_grid", False),
                            dtype=exp.train.compute_dtype)
    sample = synthetic_dataset(args.config, exp.model, 1, seed=7)[0]

    with ensure_cp(args.impl):  # --impl cp: bind a default mesh at trace time
        sp.warmup(sample)
        t0 = time.perf_counter()
        emotions = sp.emotions(sample, exp.emotion_names)
        latency_ms = (time.perf_counter() - t0) * 1e3
    print("The emotion(s) is(are)")
    for name, prob in emotions.items():
        print(name, prob)
    print(f"(p50-path latency: {latency_ms:.2f} ms batch-1, "
          f"{len(members)}-model ensemble)", file=sys.stderr)


def cmd_export(args):
    from . import configs
    from .data.synthetic import synthetic_dataset
    from .models import build_model
    from .serve import export_predictor

    exp = configs.with_overrides(configs.get(args.config),
                                 parse_overrides(getattr(args, "set", [])))
    model = build_model(exp)
    members = _load_members(args, model, "exporting")
    sample = synthetic_dataset(args.config, exp.model, 1, seed=0)[0]
    blob = export_predictor(model, members, _resolve_offsets(args, exp),
                            sample,
                            platforms=tuple(args.platforms.split(",")),
                            batch_size=args.batch,
                            dtype=exp.train.compute_dtype)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob) / 1e6:.1f} MB, "
          f"platforms={args.platforms}, batch={args.batch}, "
          f"{len(members)}-member ensemble)")


def cmd_import_torch(args):
    """Reference-user migration path: their loss-tagged .pt files
    (cmu-mosei/run.py:446-453) become checkpoint-store members usable by
    eval/serve/export — no retraining."""
    import re

    from . import configs
    from .interop.torch_compat import load_reference_checkpoint
    from .train.checkpoint import CheckpointStore

    exp = configs.get(args.config)
    store = CheckpointStore(args.checkpoint_dir)
    names = [f"{args.config}_{i + 1}" for i in range(len(args.pt))]
    clobbered = [n for n in names if n in store.manifest]
    if clobbered and not args.force:
        raise SystemExit(
            f"members already exist in {args.checkpoint_dir}: "
            f"{', '.join(clobbered)} — pass --force to overwrite them")
    for i, path in enumerate(args.pt):
        params = load_reference_checkpoint(path, exp.model)
        # the reference embeds the valid loss in the filename
        # ('{name}_{loss:.4chars}.pt'); carry it into the manifest when present
        m = re.search(r"_(\d+\.\d+)\.pt$", path)
        loss = float(m.group(1)) if m else 0.0
        name = names[i]
        store.save_params(name, params, valid_loss=loss)
        print(f"imported {path} -> {name} (valid_loss={loss})")
    print(f"{len(args.pt)} member(s) in {args.checkpoint_dir}; use them via "
          f"`eval|serve|export {args.config} --checkpoint-dir "
          f"{args.checkpoint_dir}`")


def cmd_export_torch(args):
    import os

    import jax
    import torch

    from . import configs
    from .interop.torch_compat import to_reference_state_dict
    from .models import build_model
    from .train.checkpoint import CheckpointStore

    exp = configs.get(args.config)
    model = build_model(exp)
    params_like = model.init(jax.random.PRNGKey(0))
    store = CheckpointStore(args.checkpoint_dir)
    names = store.best_members(args.config)
    if not names:
        raise SystemExit(f"no '{args.config}*' members in {args.checkpoint_dir}")
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        params = store.restore_params(name, params_like)
        sd = {k: torch.tensor(v)
              for k, v in to_reference_state_dict(params, exp.model).items()}
        loss = store.manifest[name].get("valid_loss", 0.0)
        # reference filename convention: '{name}_{str(valid_loss)[:4]}.pt'
        out_path = os.path.join(args.out, f"{name}_{str(loss)[:4]}.pt")
        torch.save(sd, out_path)
        print(f"wrote {out_path} ({len(sd)} tensors)")


def main(argv=None):
    args = build_parser().parse_args(argv)
    apply_config_file(args)
    from .utils.compile_cache import cache_dir_from_env, enable_compilation_cache

    cache_dir = args.compile_cache or cache_dir_from_env()
    if cache_dir:
        resolved = enable_compilation_cache(cache_dir)
        print(f"(persistent compilation cache: {resolved})", file=sys.stderr)
    if getattr(args, "tuned", None):
        from .bench.autotune import apply_tuned

        applied = apply_tuned(args, args.tuned)
        if applied and not getattr(args, "quiet", False):
            print(f"(tuned knobs applied: {applied})", file=sys.stderr)
    if args.cmd == "configs":
        cmd_configs()
    elif args.cmd == "train":
        cmd_train(args)
    elif args.cmd == "eval":
        cmd_train(args, eval_only=True)
    elif args.cmd == "predict":
        from .pipelines import run_predict

        if not args.checkpoint_dir and not args.init_random:
            raise SystemExit(
                "predict requires --checkpoint-dir (trained members) or "
                "--init-random (untrained smoke run)")
        table = run_predict(
            args.config,
            checkpoint_dir=args.checkpoint_dir,
            init_random=args.init_random,
            synthetic_data=args.data_root is None,
            data_root=args.data_root, n_test=args.n_test,
            n_train=args.n_train,
            impl=args.impl, overrides=parse_overrides(args.set),
            thresholds=([float(t) for t in args.thresholds.split(",")]
                        if args.thresholds else None),
            transfer_dtype=args.transfer_dtype,
            stacked=args.stacked_grid, dp=args.dp,
            device_resident=args.device_resident, split=args.split,
            output=args.output, quiet=args.quiet)
        summary = {
            "config": args.config, "output": args.output,
            "rows": table["rows"], "members": table["members"],
            "emotions": table["emotions"],
            "positives": {n: int(table["pred"][:, j].sum())
                          for j, n in enumerate(table["emotions"])},
        }
        if args.calibration:
            from .eval.predictions import calibration_report

            summary["calibration"] = calibration_report(table)
        print(json.dumps(summary, indent=2))
    elif args.cmd == "sweep":
        cmd_sweep(args)
    elif args.cmd == "doctor":
        from .bench.doctor import main as doctor_main

        argv = ["--scan-k", str(args.scan_k)]
        if args.json_only:
            argv.append("--json-only")
        doctor_main(argv)
    elif args.cmd == "summary":
        import jax

        from . import configs as _cfg
        from .bench import flops as _fl
        from .models import build_model
        from .utils import parameter_breakdown, parameter_count

        exp = _cfg.with_overrides(_cfg.get(args.config),
                                  parse_overrides(args.set))
        params = build_model(exp).init(jax.random.PRNGKey(0))
        print(json.dumps({
            "config": args.config,
            "parameters": parameter_breakdown(params, depth=args.depth),
            "total": parameter_count(params)["Total"],
            "flops_per_sample": {
                "forward": _fl.forward_flops_per_sample(exp.model),
                "train_step": _fl.train_flops_per_sample(exp.model),
            },
        }, indent=2))
    elif args.cmd == "checkpoints":
        import os

        from .train.checkpoint import CheckpointStore

        def _dir_bytes(path):
            total = 0
            for root, _, files in os.walk(path):
                total += sum(os.path.getsize(os.path.join(root, f))
                             for f in files)
            return total

        store = CheckpointStore(args.checkpoint_dir)
        members = {}
        for name, e in sorted(store.manifest.items()):
            if not name.startswith(args.prefix):
                continue
            kinds = [k for k in ("params", "full") if k in e]
            resume = e.get("last") or e.get("last_prev")
            size = sum(_dir_bytes(e[k]) for k in kinds
                       if isinstance(e.get(k), str) and os.path.isdir(e[k]))
            for slot in ("last", "last_prev"):
                s = e.get(slot)
                if s and os.path.isdir(s.get("path", "")):
                    size += _dir_bytes(s["path"])
            members[name] = {
                "valid_loss": e.get("valid_loss"),
                "best_epoch": e.get("epoch"),
                "kinds": kinds + (["resume"] if resume else []),
                "resume_epoch": resume["epoch"] if resume else None,
                "done": bool(e.get("done", False)),
                "imported": bool(e.get("imported", False)),
                "bytes": size,
            }
        ranked = sorted((n for n in members
                         if members[n]["valid_loss"] is not None),
                        key=lambda n: members[n]["valid_loss"])
        meta_path = os.path.join(args.checkpoint_dir, "run_meta.json")
        print(json.dumps({
            "checkpoint_dir": args.checkpoint_dir,
            "members": members,
            "ranked_by_valid_loss": ranked,
            "total_bytes": sum(m["bytes"] for m in members.values()),
            "run_meta": meta_path if os.path.isfile(meta_path) else None,
        }, indent=2))
    elif args.cmd == "check-data":
        from .data.validate import validate_tree

        report = validate_tree(args.config, args.data_root)
        print(json.dumps(report, indent=2))
        if not report["ok"]:
            raise SystemExit(1)
    elif args.cmd == "serve":
        cmd_serve(args)
    elif args.cmd == "export":
        cmd_export(args)
    elif args.cmd == "import-torch":
        cmd_import_torch(args)
    elif args.cmd == "export-torch":
        cmd_export_torch(args)
    elif args.cmd == "acceptance":
        from .eval.acceptance import main as acceptance_main

        raise SystemExit(acceptance_main(args.rest))
    elif args.cmd == "tune":
        from .bench.autotune import tune

        rec = tune(args.config,
                   arms=args.arms.split(",") if args.arms else None,
                   allow_lossy=args.allow_lossy,
                   steps=args.steps, reps=args.reps, quiet=False)
        line = json.dumps(rec)
        if args.out:
            with open(args.out, "w") as f:
                f.write(line + "\n")
        print(line, flush=True)
    elif args.cmd == "bench":
        import os
        import runpy

        # bench.py lives at the repo root next to the package — resolve it
        # relative to this file so `bench` works from any cwd
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py")
        if not os.path.exists(path):
            raise SystemExit(f"bench script not found at {path}")
        runpy.run_path(path, run_name="__main__")


if __name__ == "__main__":
    main()
