"""Typed configurations — one per reference entry point.

The reference keeps hyperparameters as module-level constants at the top of each
script (cmu-mosei/run.py:27-42, rencecps/run.py:18-27, Ren-MME/run.py:25-39,
others/realformer.py:19-38, robot_demo.py:31-43).  Here each script becomes a
frozen dataclass over one engine; values below are the acceptance checklist.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of one cross-modal grid encoder + head."""

    # modality feature dims / fixed sequence lengths
    l_dim: int = 300
    v_dim: int = 35
    a_dim: int = 74
    l_len: int = 20
    v_len: int = 100
    a_len: int = 200
    # encoder
    dim: int = 96
    n_heads: int = 6
    n_layers: int = 1
    ffn: int = 1
    dropout: float = 0.0
    # block variant: 'minus' (cmu-mosei/run.py:217-262, Ren-MME/run.py:169-214)
    # or 'realformer' (others/realformer.py:154-209, robot_demo.py:324-374)
    block: str = "minus"
    # learned position embeddings (realformer/robot only)
    use_position_embedding: bool = False
    # unify projection: 'linear' (bias-free Linear), 'linear_ln' (Ren-MME shared
    # LayerNorm), 'conv' (realformer 1x1 conv), 'conv_multires' (robot 3-slot video)
    unify: str = "linear"
    # number of emotion logits out of the grid classifier
    n_emotions: int = 7
    # head on top of the grid(s): 'concat_trans' (rank-3 transition),
    # 'state_transfer' (recurrent), 'grid_only' (robot: classifier direct)
    head: str = "concat_trans"
    # paragraph window length (realformer State_Transfer only)
    p_len: int = 6
    # default attention implementation when the caller/CLI passes none:
    # 'xla' (einsum), 'pallas' (materializing fused kernel), 'flash'
    # (online-softmax kernel — terminal blocks only, auto-falls-back where
    # the score chain needs materializing; non-128-multiple kv lens are
    # zero-padded, exactly).  Scale presets set 'flash' per the measured
    # train-step win (ENGINEERING_NOTES: s1024 1.22x / s512 1.26x, s256
    # wash); reference shapes keep 'xla' per the same measurement table.
    attn_impl: str = "xla"
    # robot multi-resolution video input dims
    v_dims_multires: Tuple[int, int, int] = (256, 512, 1024)
    # rematerialize each attention block in the backward pass
    # (jax.checkpoint): XLA stores only block boundaries and recomputes the
    # block internals — softmax probabilities (B,H,Lq,Lkv), projected Q/K/V,
    # FFN intermediates — during the backward sweep, trading one extra
    # forward's FLOPs for the activation memory that dominates HBM at the
    # scaled presets.  Off by default: reference shapes are nowhere near
    # memory-bound and the recompute is pure cost there.  The merged/stacked
    # grid fast paths ignore this knob (they are off by default; the scaled
    # presets run the unrolled grid this applies to).
    remat: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization & schedule — reference defaults per script."""

    batch_size: int = 64
    lr: float = 1e-3
    epochs: int = 999
    grad_clip: float = 1.0
    optimizer: str = "adamw"  # realformer uses plain adam (others/realformer.py:342)
    # torch AdamW default (the reference never sets it, cmu-mosei/run.py:398);
    # ignored by the adam configs.  Rides optax.inject_hyperparams like the
    # LR, so the sweep driver can vary it without recompiling.
    weight_decay: float = 0.01
    plateau_factor: float = 0.1
    plateau_patience: int = 4
    early_stop: int = 9
    # only save checkpoints with valid_loss > this (cmu-mosei/run.py:413 etc.);
    # None = always save best (realformer, robot)
    save_guard: Optional[float] = 0.009
    n_folds: int = 4
    # reference per-config validation-fold sizes (cmu-mosei 4096, rencecps
    # 6720, Ren-MME 744); None = n // n_folds (realformer's 20%).  Falls back
    # to n // n_folds when the dataset is smaller than fold_size * n_folds.
    fold_size: Optional[int] = None
    # Ren-MME R-Drop: duplicate each sample and add symmetric KL (Ren-MME/run.py:143-146,332-334)
    rdrop_kl: bool = False
    # realformer: multiply per-clip loss by clip-validity mask (others/realformer.py:312)
    clip_mask_loss: bool = False
    seed: int = 0
    # 'float32' or 'bfloat16': mixed precision — fp32 master weights and
    # optimizer state, forward/backward in bf16.  HONEST round-3 measure
    # (scalar-fetch sync): bf16 is ~7% FASTER on the flagship train step
    # (10.4 vs 11.1 ms); float32 stays the default for exact torch-parity
    # semantics, and the knob matters more for scaled-up
    # dims where HBM bandwidth dominates.
    compute_dtype: str = "float32"
    # True: the train step runs the optimizer over ONE flattened param
    # vector (~100 per-leaf AdamW kernels collapse into a handful; a wash
    # at reference dims but fewer dispatch buffers).  False: per-leaf optax
    # updates — measured +2.3% at s1024-bf16 B=64 (the ravel/unravel copies
    # of a 57.6M-param vector cost more than the kernel fusion saves; the
    # scale presets default False).  Identical math either way: global-norm
    # clip is global in both forms, AdamW is elementwise
    # (tests/test_vmap_kfold.py::test_fold_fns_per_leaf_optimizer_matches_fused).
    fused_optimizer: bool = True


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str
    model: ModelConfig
    train: TrainConfig
    # per-emotion decision thresholds at test time (reference-tuned)
    thresholds: Tuple[float, ...] = ()
    # evaluated emotion names, index into the logit vector
    emotion_names: Tuple[str, ...] = ()
    emotion_index: Tuple[int, ...] = ()


def mosei_trans() -> ExperimentConfig:
    """CMU-MOSEI sentence-pair emotion-transition model (cmu-mosei/run.py)."""
    return ExperimentConfig(
        name="mosei_trans",
        model=ModelConfig(
            l_dim=300, v_dim=35, a_dim=74,
            l_len=20, v_len=100, a_len=200,
            dim=96, n_heads=6, n_layers=1, ffn=1, dropout=0.0,
            block="minus", use_position_embedding=False, unify="linear",
            n_emotions=7, head="concat_trans",
        ),
        train=TrainConfig(
            batch_size=64, lr=1e-3, epochs=999, grad_clip=1.0,
            optimizer="adamw", plateau_patience=4, early_stop=9,
            save_guard=0.009, n_folds=4, fold_size=4096,
        ),
        # cmu-mosei/run.py:481-486 — fixed per-emotion thresholds
        thresholds=(0.1, -0.3, -0.5, -0.3, -0.6, -0.5),
        emotion_names=("happ", "sadn", "ange", "disg", "surp", "fear"),
        emotion_index=(0, 1, 2, 3, 4, 5),
    )


def mosei_realformer() -> ExperimentConfig:
    """CMU-MOSEI RealFormer paragraph model (others/realformer.py)."""
    return ExperimentConfig(
        name="mosei_realformer",
        model=ModelConfig(
            l_dim=300, v_dim=35, a_dim=74,
            l_len=50, v_len=50, a_len=50,
            dim=96, n_heads=6, n_layers=2, ffn=2, dropout=0.0,
            block="realformer", use_position_embedding=True, unify="conv",
            n_emotions=6, head="state_transfer", p_len=6,
        ),
        train=TrainConfig(
            batch_size=64, lr=1e-3, epochs=99, grad_clip=1.0,
            optimizer="adam", plateau_patience=2, early_stop=4,
            save_guard=None, n_folds=5, clip_mask_loss=True,
        ),
        emotion_names=("happ", "sadn", "ange", "surp", "disg", "fear"),
        emotion_index=(0, 1, 2, 3, 4, 5),
    )


def rencecps() -> ExperimentConfig:
    """Ren-CECps Chinese-text 8-emotion classifier (rencecps/run.py)."""
    return ExperimentConfig(
        name="rencecps",
        model=ModelConfig(
            l_dim=768 * 3, v_dim=0, a_dim=0, l_len=2, v_len=0, a_len=0,
            dim=768 * 3, dropout=0.1,
            block="minus", unify="linear", n_emotions=9, head="concat_linear",
        ),
        train=TrainConfig(
            batch_size=64, lr=1e-3, epochs=99, grad_clip=1.0,
            optimizer="adamw", plateau_patience=6, early_stop=15,
            save_guard=0.009, n_folds=4, fold_size=6720,
        ),
        # rencecps/run.py:288-295
        thresholds=(-0.7, -0.8, -0.3, -0.2, -0.2, -0.8, -0.8, -0.9),
        emotion_names=("love", "anxi", "sorr", "joyy", "expe", "hate", "ange", "surp"),
        emotion_index=(0, 1, 2, 3, 4, 5, 6, 7),
    )


def ren_mme() -> ExperimentConfig:
    """Ren-MME TV-drama multimodal 9-emotion trainer (Ren-MME/run.py)."""
    return ExperimentConfig(
        name="ren_mme",
        model=ModelConfig(
            l_dim=768, v_dim=640, a_dim=205,
            l_len=40, v_len=76, a_len=275,
            dim=128, n_heads=8, n_layers=1, ffn=1, dropout=0.1,
            block="minus", use_position_embedding=False, unify="linear_ln",
            n_emotions=9, head="concat_trans",
        ),
        train=TrainConfig(
            batch_size=16, lr=1e-3, epochs=999, grad_clip=1.0,
            optimizer="adamw", plateau_patience=1, early_stop=3,
            save_guard=0.009, n_folds=4, fold_size=744, rdrop_kl=True,
        ),
        # Ren-MME/run.py:735-742
        thresholds=(-3.6, -1.2, -1.4, -3.4, -2.0, -1.4, -2.6, -3.8),
        emotion_names=("love", "anxi", "sorr", "joyy", "expe", "hate", "ange", "surp"),
        emotion_index=(0, 1, 2, 3, 4, 5, 6, 7),
    )


def robot_demo() -> ExperimentConfig:
    """Streaming single-sample inference demo (robot_demo.py)."""
    return ExperimentConfig(
        name="robot_demo",
        model=ModelConfig(
            l_dim=768, v_dim=0, a_dim=40,
            l_len=25, v_len=100, a_len=100,
            dim=192, n_heads=6, n_layers=2, ffn=2, dropout=0.1,
            block="realformer", use_position_embedding=True, unify="conv_multires",
            n_emotions=7, head="grid_only",
            v_dims_multires=(256, 512, 1024),
        ),
        train=TrainConfig(
            batch_size=64, lr=1e-3, epochs=99, grad_clip=1.0,
            optimizer="adamw", plateau_patience=3, early_stop=7,
            save_guard=None, n_folds=4,
        ),
        # robot_demo.py:609 — calibrated-sigmoid offsets (serving path)
        thresholds=(0.1, 0.1, -0.1, 0.0, 0.1, 0.0),
        emotion_names=("happ", "sadn", "ange", "disg", "surp", "fear"),
        emotion_index=(0, 1, 2, 3, 4, 5),
    )


# Scaled production presets — the flagship architecture grown to dims that
# actually feed the v5e's 128x128 MXU.  The reference operates at ONE size
# (dim 96, cmu-mosei/run.py:37-42) where ANY framework is small-matmul-bound
# (~2% MFU measured); these points are the measured scaling ladder from
# bench/scaling.py (docs/ENGINEERING_NOTES.md "MFU scaling sweep": 20.8% of
# bf16 peak at s1024 with zero code changes).  Feature dims stay at the raw
# modality sizes — the realistic axis is a bigger encoder over the same
# features.  Beyond-reference: these presets default to bfloat16 compute
# (measured +9-19% at these dims; fp32 master weights either way) — pass
# --set train.compute_dtype=float32 for exact-f32 semantics.
# Every preset keeps head width dh = dim/n_heads = 128 — the v5e lane
# width, the same choice every production TPU transformer makes.  The
# round-3 definitions (8/8/16 heads -> dh 32/64/64) left 4x/2x/2x of every
# flash-kernel operand's lanes as padding for IDENTICAL FLOPs; measured
# 2026-08-19 (B per preset, bf16-flash): s256 17.9 -> 11.1 ms/step (+61%),
# s512 24.7 -> 23.2 best-of (+6%; attention is a smaller share at dim 512),
# s1024 110.7 -> 91.1 (+21%).  Old definitions stay on record in
# docs/ENGINEERING_NOTES.md.
# batch_size per point = the measured MFU-saturation batch on one v5e
# (round-5 sweep, ENGINEERING_NOTES "MFU scaling sweep"): s256 keeps gaining
# to B=256 (14.7% -> 18.2% train MFU; B=512 regresses), s512 to B=64
# (30.8% -> 32.9%; B=128 flat), s1024's B=64 headline (43.8%) becomes the
# preset default instead of a --batch override.  Round-4 precedent: dh is
# pinned at dim/heads = 128 (the v5e lane width).
SCALE_POINTS = {
    "s256": dict(dim=256, n_heads=2, l_len=64, v_len=128, a_len=256,
                 batch_size=256),
    "s512": dict(dim=512, n_heads=4, l_len=128, v_len=256, a_len=512,
                 batch_size=64),
    "s1024": dict(dim=1024, n_heads=8, l_len=128, v_len=256, a_len=512,
                  batch_size=64),
}


def family(name: str) -> str:
    """Resolve a config name to its data/model family: scaled presets
    ('mosei_trans_s256') share the base config's samplers, corpus adapters,
    and eval semantics."""
    import re

    return re.sub(r"_s\d+$", "", name)


def _mosei_trans_scaled(point: str) -> ExperimentConfig:
    spec = SCALE_POINTS[point]
    base = mosei_trans()
    return dataclasses.replace(
        base,
        name=f"mosei_trans_{point}",
        model=dataclasses.replace(
            base.model, dim=spec["dim"], n_heads=spec["n_heads"],
            l_len=spec["l_len"], v_len=spec["v_len"], a_len=spec["a_len"],
            attn_impl="flash"),
        train=dataclasses.replace(
            base.train, batch_size=spec["batch_size"],
            compute_dtype="bfloat16", fused_optimizer=False))


REGISTRY = {
    "mosei_trans": mosei_trans,
    "mosei_realformer": mosei_realformer,
    "rencecps": rencecps,
    "ren_mme": ren_mme,
    "robot_demo": robot_demo,
    **{f"mosei_trans_{p}": (lambda p=p: _mosei_trans_scaled(p))
       for p in SCALE_POINTS},
}


def get(name: str) -> ExperimentConfig:
    if name not in REGISTRY:
        raise KeyError(f"unknown config {name!r}; choose from {sorted(REGISTRY)}")
    return REGISTRY[name]()


def with_overrides(exp: ExperimentConfig, overrides) -> ExperimentConfig:
    """Apply a {'model': {...}, 'train': {...}} override dict (the CLI's
    --set K=V pairs, cli.parse_overrides, or a JSON config file via
    load_config_file) to a config.  Unknown top-level keys (e.g. a flat
    'train.batch_size' instead of the nested form) raise instead of being
    silently ignored.  List values coerce to tuple where the config field
    is a tuple (JSON has no tuples, so file/--set round-trips of e.g.
    model.v_dims_multires arrive as lists)."""
    if not overrides:
        return exp
    unknown = set(overrides) - {"model", "train"}
    if unknown:
        raise KeyError(
            f"unknown override section(s) {sorted(unknown)}; expected "
            "{'model': {...}, 'train': {...}} (the CLI's --set "
            "model.K=V / train.K=V form)")
    import dataclasses

    def coerce(current, fields):
        return {k: tuple(v) if isinstance(getattr(current, k, None), tuple)
                and isinstance(v, list) else v
                for k, v in fields.items()}

    return dataclasses.replace(
        exp,
        model=dataclasses.replace(
            exp.model, **coerce(exp.model, overrides.get("model", {}))),
        train=dataclasses.replace(
            exp.train, **coerce(exp.train, overrides.get("train", {}))))


def load_config_file(path):
    """Resolve a JSON config file to `(config_name_or_None, overrides)`.

    Two accepted shapes (SURVEY §5: configs "resolvable from CLI/JSON"):

    1. A plain override document — optional `"config"` naming the registry
       base, plus `"model"` / `"train"` sections of field overrides:
       `{"config": "mosei_trans", "train": {"batch_size": 32}}`.
    2. A `run_meta.json` written by pipelines into any run's artifact
       directories: the full post-override `resolved_config` is replayed
       field-for-field, so `train <dir>/run_meta.json` reproduces that
       run's exact hyperparameters even if registry defaults moved since.

    Returns overrides in the with_overrides shape; thresholds/emotion
    tables always come from the named registry config (override decision
    thresholds at the tool level, e.g. `predict --thresholds`)."""
    import json

    with open(path) as f:
        doc = json.load(f)
    if not isinstance(doc, dict):
        raise ValueError(f"{path}: expected a JSON object")
    if "resolved_config" in doc:  # run_meta.json reproduction
        resolved = doc["resolved_config"]
        return doc.get("config") or resolved.get("name"), {
            "model": dict(resolved.get("model", {})),
            "train": dict(resolved.get("train", {})),
        }
    unknown = set(doc) - {"config", "model", "train"}
    if unknown:
        raise ValueError(
            f"{path}: unknown top-level key(s) {sorted(unknown)}; expected "
            "{'config': name?, 'model': {...}?, 'train': {...}?} or a "
            "run_meta.json")
    return doc.get("config"), {k: dict(doc[k])
                               for k in ("model", "train") if k in doc}
