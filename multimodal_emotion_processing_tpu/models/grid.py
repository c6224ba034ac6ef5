"""The 9-stream cross-modal attention grid.

For modalities L, V, A the reference runs nine directed attention streams
(ll, lv, la, vv, vl, va, aa, al, av), each a chain of `n_layers` blocks that
thread one residual-score lineage (`scores = None` reset before each stream),
then concatenates per target modality on the feature axis, concatenates the
three targets on the sequence axis **in the order [l, a, v]**, and pools with
mean+max over the combined sequence (cmu-mosei/run.py:265-319,
Ren-MME/run.py:217-271, others/realformer.py:211-264, robot_demo.py:377-441).

Stream weights are distinct and the (q_len, kv_len) combinations are
heterogeneous, so streams are unrolled; XLA overlaps/fuses the nine small
chains far better than a hand-rolled batcher would at these sizes
(q,kv ≤ 275 — see SURVEY §7.3.4).

Output heads differ per reference model:
  * collect="per_layer", out="classifier"     — Multi_ATTN: every layer output
    of every stream is kept, classifier Linear(dim*6*n_layers → E, no bias)
    (cmu-mosei/run.py:271, Ren-MME/run.py:223)
  * collect="per_layer", out="classifier_bias"— robot Multi_class
    (robot_demo.py:389, FC path commented out at :440)
  * collect="final",     out="feature"        — realformer Multi_class: only
    stream finals, FC+LN+ReLU to (B, dim) (others/realformer.py:258-264)
"""

from __future__ import annotations

import contextlib as _contextlib

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pooling import grid_mean_max_pool, mean_max_pool
from ..utils import initializers as init
from . import layers

# (stream key, query modality, key/value modality) — reference order.
STREAMS = (
    ("ll", "l", "l"), ("lv", "l", "v"), ("la", "l", "a"),
    ("vv", "v", "v"), ("vl", "v", "l"), ("va", "v", "a"),
    ("aa", "a", "a"), ("al", "a", "l"), ("av", "a", "v"),
)
# which list each stream's outputs land in (l_list / v_list / a_list)
TARGET = {"ll": "l", "lv": "l", "la": "l",
          "vv": "v", "vl": "v", "va": "v",
          "aa": "a", "al": "a", "av": "a"}


def init_grid(key, cfg):
    """cfg is a ModelConfig. Returns grid params (projection + 9*n_layers blocks
    + head)."""
    keys = jax.random.split(key, 16)
    p = {}
    if cfg.unify == "linear":
        p["unify"] = layers.init_unify_linear(keys[0], cfg.l_dim, cfg.v_dim,
                                              cfg.a_dim, cfg.dim)
    elif cfg.unify == "linear_ln":
        p["unify"] = layers.init_unify_linear(keys[0], cfg.l_dim, cfg.v_dim,
                                              cfg.a_dim, cfg.dim, shared_ln=True)
    elif cfg.unify == "conv":
        p["unify"] = layers.init_unify_conv(keys[0], cfg.l_dim, cfg.v_dim,
                                            cfg.a_dim, cfg.dim)
    elif cfg.unify == "conv_multires":
        p["unify"] = layers.init_unify_conv_multires(
            keys[0], cfg.l_dim, cfg.v_dims_multires, cfg.a_dim, cfg.dim)
    else:
        raise ValueError(cfg.unify)

    if cfg.use_position_embedding:
        p["pos_l"] = layers.init_position_embedding(keys[1], cfg.l_len, cfg.dim)
        p["pos_v"] = layers.init_position_embedding(keys[2], cfg.v_len, cfg.dim)
        p["pos_a"] = layers.init_position_embedding(keys[3], cfg.a_len, cfg.dim)

    bkeys = jax.random.split(keys[4], 9 * cfg.n_layers)
    blocks = {}
    for s, (name, _, _) in enumerate(STREAMS):
        blocks[name] = [
            layers.init_block(bkeys[cfg.n_layers * s + i], cfg.block, cfg.dim, cfg.ffn)
            for i in range(cfg.n_layers)
        ]
    p["blocks"] = blocks
    return p


def init_grid_head(key, cfg, collect: str, out: str):
    """Head params on top of the pooled grid feature."""
    if out == "classifier":
        return {"classifier": init.linear(key, cfg.dim * 6 * cfg.n_layers,
                                          cfg.n_emotions)}
    if out == "classifier_bias":
        return {"classifier": init.linear(key, cfg.dim * 6 * cfg.n_layers,
                                          cfg.n_emotions, bias=True)}
    if out == "feature":
        return {"fc": init.linear(key, cfg.dim * 6, cfg.dim, bias=True),
                "ln": init.layer_norm(cfg.dim)}
    raise ValueError(out)


# Toggles for the merged/stacked stream fast paths (tests compare paths).
# NOTE: read at TRACE time — flipping them does not invalidate already-jitted
# callers (jax caches compiled programs); toggle before the first call, or
# call model.apply unjitted, when cross-checking paths.
#
# MERGED default flipped to False in round 3: the "+25%" win recorded for
# the merged-minus path was a relay sync artifact (block_until_ready acks
# early — ENGINEERING_NOTES "measurement-integrity finding"); honestly
# synced, interleaved A/B measurement shows merged is 0.82x of unrolled on
# the flagship train step (14.9 vs 12.3 ms/step median).  The path remains
# correct (parity-tested) and selectable.
MERGED_FAST_PATH = False
# realformer stream stacking DEFAULT (used when apply_grid's `stacked` arg is
# None): honest round-3 re-measure (scalar-fetch sync) shows stacked is
# slower BOTH ways at these shapes — train −11%, batch-infer robot −26% /
# realformer −4% (the round-2 "+60% infer" ranking was submission-side).
# Off by default everywhere; `stacked=True` stays selectable per call
# (thread-safe static arg) for shapes where 3 fat chains beat 9 thin ones.
REALFORMER_STACKED = False
# Pool the grid tail WITHOUT materializing its sequence/feature concats
# (ops/pooling.grid_mean_max_pool — algebraically identical; forward
# bit-identical on the chip).  Measured LOSS, default off: interleaved A/B
# (scalar-fetch sync, 4 rounds) has split at 0.955-0.978x on the flagship
# train step and noisy-worse on infer — XLA already fuses the concats, and
# 2n narrow reductions + the maximum chain cost more than the concat saves
# (unlike the minus-combine split, which won).  ENGINEERING_NOTES row.
SPLIT_POOL = False


@_contextlib.contextmanager
def stacked_realformer(enabled: bool = True):
    """Back-compat context manager flipping the module-global DEFAULT for
    programs traced inside it.  Prefer the per-call `stacked=` argument of
    apply_grid / model.apply — it is threaded through the trace (a static
    Python bool) and has no cross-thread exposure; this manager remains for
    scripts that cannot reach the call site."""
    global REALFORMER_STACKED
    old = REALFORMER_STACKED
    REALFORMER_STACKED = enabled
    try:
        yield
    finally:
        REALFORMER_STACKED = old


def _apply_grid_minus_merged(p, cfg, src, masks, *, rng, train):
    """Fast path for block='minus', n_layers=1 (the flagship and Ren-MME
    shapes): the minus variant has NO q/k/v projections, so for each target
    modality the three directed streams share the same raw Q against raw
    {l, v, a} keys — ONE merged QKᵀ against concat[l; v; a] replaces three
    matmuls, softmax/AV stay per segment (each stream normalizes over its own
    keys), and the per-stream epilogues (proj, minus, LayerNorm) run as
    stacked batched matmuls.  Exact same math as the unrolled path; the
    round-2 "~25% faster" reading was a submission-side artifact — honest
    round-3 A/B has merged at 0.82x of unrolled (off by default, selectable
    via MERGED_FAST_PATH).
    """
    from ..ops.attention import MASK_PENALTY, merge_heads, split_heads

    h = cfg.n_heads
    kv_cat = jnp.concatenate([src["l"], src["v"], src["a"]], axis=1)
    kv_heads = split_heads(kv_cat, h)                       # (B,H,Lsum,dh)
    lens = [src[m].shape[1] for m in ("l", "v", "a")]
    bounds = np.cumsum([0] + lens)
    neg = [MASK_PENALTY * (1.0 - masks[m])[:, None, None, :]
           for m in ("l", "v", "a")]
    acc = jnp.promote_types(kv_cat.dtype, jnp.float32)
    dh = kv_cat.shape[-1] // h
    inv_sqrt = 1.0 / np.sqrt(dh)

    rngs = (list(jax.random.split(rng, 6)) if rng is not None else [None] * 6)
    collected = {"l": [], "v": [], "a": []}
    for ti, qm in enumerate(("l", "v", "a")):
        q = src[qm]
        qh = split_heads(q, h)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kv_heads,
                            preferred_element_type=acc) * inv_sqrt
        ctxs = []
        # stream order per target: (qm,l), (qm,v), (qm,a) is NOT the reference
        # order — reference is (qm,qm) first; map segments to stream slots
        for si, kvm in enumerate(("l", "v", "a")):
            s = scores[..., bounds[si]:bounds[si + 1]] - neg[si]
            att = jax.nn.softmax(s, axis=-1)
            ctx = jnp.einsum(
                "bhqk,bhkd->bhqd", att,
                kv_heads[:, :, bounds[si]:bounds[si + 1], :],
                preferred_element_type=acc)
            ctxs.append(merge_heads(ctx.astype(q.dtype)))
        # reference stream slots for target qm: [qm->qm, then the other two
        # in STREAMS order]; STREAMS target rows are (ll,lv,la), (vv,vl,va),
        # (aa,al,av) — i.e. self first, then l/v/a order skipping self
        stream_names = [n for (n, q_, _) in STREAMS if q_ == qm]
        kv_of = {n: kv for (n, q_, kv) in STREAMS if q_ == qm}
        seg_of = {"l": 0, "v": 1, "a": 2}
        ctx_stack = jnp.stack(
            [ctxs[seg_of[kv_of[n]]] for n in stream_names])   # (3,B,Lq,D)
        blocks = [p["blocks"][n][0] for n in stream_names]
        proj_w = jnp.stack([b["proj"]["w"] for b in blocks])   # (3,D,D)
        minus_w = jnp.stack([b["minus"]["w"] for b in blocks])  # (3,2D,D)
        ln_scale = jnp.stack([b["norm"]["scale"] for b in blocks])
        ln_bias = jnp.stack([b["norm"]["bias"] for b in blocks])

        x = jnp.einsum("sbqd,sde->sbqe", ctx_stack, proj_w,
                       preferred_element_type=acc).astype(q.dtype)
        x = layers.dropout(rngs[2 * ti], x, cfg.dropout, train)
        cat = jnp.concatenate(
            [jnp.broadcast_to(q, (3,) + q.shape), x], axis=-1)
        y = jnp.einsum("sbqd,sde->sbqe", cat, minus_w,
                       preferred_element_type=acc).astype(q.dtype)
        y = init.apply_layer_norm(
            {"scale": ln_scale[:, None, None, :],
             "bias": ln_bias[:, None, None, :]}, y)
        y = layers.dropout(rngs[2 * ti + 1], y, cfg.dropout, train)
        for si in range(3):
            collected[qm].append(y[si])
    return collected


def _apply_grid_realformer_stacked(p, cfg, src, masks, *, rng, train, collect):
    """Fast path for block='realformer' when all three sequence lengths are
    EQUAL (the mosei_realformer config: 50/50/50): for each target modality
    the three directed streams stack on a leading axis — per-stream Q/K/V
    projections, attention, gates, LayerNorms and FFNs all run as batched
    einsums, turning 9 unrolled chains into 3 stacked ones.  Exact same math
    as the unrolled path (tested); score chaining (c·S_prev across n_layers)
    is carried with the stream axis."""
    from ..ops.attention import MASK_PENALTY

    h = cfg.n_heads
    d = cfg.dim
    dh = d // h
    inv_sqrt = 1.0 / np.sqrt(dh)
    acc = jnp.promote_types(src["l"].dtype, jnp.float32)
    kv_all = jnp.stack([src["l"], src["v"], src["a"]])       # (3,B,L,D)
    mask_all = jnp.stack([masks[m] for m in ("l", "v", "a")])
    seg_of = {"l": 0, "v": 1, "a": 2}

    n_rngs = 3 * cfg.n_layers * 2
    rngs = (list(jax.random.split(rng, n_rngs)) if rng is not None
            else [None] * n_rngs)
    ridx = 0
    collected = {"l": [], "v": [], "a": []}

    def heads(x):  # (3,B,L,D) -> (3,B,H,L,dh)
        s, b, L, _ = x.shape
        return x.reshape(s, b, L, h, dh).transpose(0, 1, 3, 2, 4)

    def ln(p_scale, p_bias, x):
        return init.apply_layer_norm(
            {"scale": p_scale[:, None, None, :],
             "bias": p_bias[:, None, None, :]}, x)

    for qm in ("l", "v", "a"):
        stream_names = [n for (n, q_, _) in STREAMS if q_ == qm]
        kv_of = {n: kv for (n, q_, kv) in STREAMS if q_ == qm}
        seg = np.asarray([seg_of[kv_of[n]] for n in stream_names])
        K_src = kv_all[seg]                                   # (3,B,L,D)
        M = mask_all[seg]                                     # (3,B,L)
        qcur = jnp.broadcast_to(src[qm], (3,) + src[qm].shape)
        scores = None
        per_stream = [[] for _ in range(3)]  # reference order: stream-major
        for i in range(cfg.n_layers):
            blocks = [p["blocks"][n][i] for n in stream_names]

            def stk(*path):
                def get(b):
                    x = b
                    for k in path:
                        x = x[k]
                    return x
                return jnp.stack([get(b) for b in blocks])

            qp = jnp.einsum("sbqd,sde->sbqe", qcur, stk("wq", "w"),
                            preferred_element_type=acc).astype(qcur.dtype)
            kp = jnp.einsum("sbkd,sde->sbke", K_src, stk("wk", "w"),
                            preferred_element_type=acc).astype(qcur.dtype)
            vp = jnp.einsum("sbkd,sde->sbke", K_src, stk("wv", "w"),
                            preferred_element_type=acc).astype(qcur.dtype)
            s = jnp.einsum("sbhqd,sbhkd->sbhqk", heads(qp), heads(kp),
                           preferred_element_type=acc) * inv_sqrt
            c = stk("c").reshape(3, 1, 1, 1, 1)
            if scores is not None:
                s = s + c * scores
            s = s - MASK_PENALTY * (1.0 - M[:, :, None, None, :])
            scores = s
            att = jax.nn.softmax(s, axis=-1)
            ctx = jnp.einsum("sbhqk,sbhkd->sbhqd", att, heads(vp),
                             preferred_element_type=acc)
            sb, b_, _, L, _ = ctx.shape
            ctx = ctx.transpose(0, 1, 3, 2, 4).reshape(sb, b_, L, d)
            x = jnp.einsum("sbqd,sde->sbqe", ctx.astype(qcur.dtype),
                           stk("proj", "w"),
                           preferred_element_type=acc).astype(qcur.dtype)
            x = layers.dropout(rngs[ridx], x, cfg.dropout, train)
            a_g = stk("a").reshape(3, 1, 1, 1)
            qcur = ln(stk("norm1", "scale"), stk("norm1", "bias"),
                      qcur + a_g * x)
            hmid = jax.nn.relu(
                jnp.einsum("sbqd,sde->sbqe", qcur, stk("ffn1", "w"),
                           preferred_element_type=acc).astype(qcur.dtype)
                + stk("ffn1", "b")[:, None, None, :])
            ffn = (jnp.einsum("sbqd,sde->sbqe", hmid, stk("ffn2", "w"),
                              preferred_element_type=acc).astype(qcur.dtype)
                   + stk("ffn2", "b")[:, None, None, :])
            ffn = layers.dropout(rngs[ridx + 1], ffn, cfg.dropout, train)
            ridx += 2
            b_g = stk("b").reshape(3, 1, 1, 1)
            qcur = ln(stk("norm2", "scale"), stk("norm2", "bias"),
                      qcur + b_g * ffn)
            if collect == "per_layer":
                for si in range(3):
                    per_stream[si].append(qcur[si])
        if collect == "final":
            for si in range(3):
                collected[qm].append(qcur[si])
        else:
            # reference appends ALL of a stream's layers before the next
            # stream (l_list = [ll_1..ll_n, lv_1..lv_n, la_1..la_n])
            for si in range(3):
                collected[qm].extend(per_stream[si])
    return collected


def _pad_seq(x, mask, target_len: int):
    """Right-pad (B, L, D) + its (B, L) mask to target_len with zeros.  The
    attention mask penalty (-1e8) makes padded KEYS underflow to exactly 0
    softmax weight in f32, and padded QUERY rows are sliced away before
    pooling — the padded stacked path is the unrolled math exactly."""
    pad = target_len - x.shape[1]
    if pad == 0:
        return x, mask
    x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    mask = jnp.pad(mask, ((0, 0), (0, pad)))
    return x, mask


def apply_grid(
    p, cfg, l, v, a, l_mask, v_mask, a_mask, *,
    rng=None, train: bool = False, impl: str = "xla",
    collect: str = "per_layer", stacked=None,
):
    """Run projection (+pos) and the nine streams; returns pooled (B, dim*6*k)
    where k = n_layers for collect='per_layer', 1 for 'final'.

    `stacked`: None = module default (REALFORMER_STACKED); True/False force
    the stacked realformer fast path on/off for THIS trace (thread-safe —
    it's a static Python argument, no global state).  Unequal sequence
    lengths (robot_demo 25/100/100) are padded to the max length and query
    rows sliced back, preserving exact unrolled semantics."""
    rate = cfg.dropout
    n_rngs = 2 + 9 * cfg.n_layers
    rngs = list(jax.random.split(rng, n_rngs)) if rng is not None else [None] * n_rngs

    if cfg.unify in ("linear", "linear_ln"):
        l, v, a = layers.apply_unify_linear(p["unify"], l, v, a)
    elif cfg.unify == "conv":
        l, v, a = layers.apply_unify_conv(p["unify"], l, v, a,
                                          rate=rate, rng=rngs[0], train=train)
    else:  # conv_multires: `v` is a tuple (v256, v512, v1024)
        l, v, a = layers.apply_unify_conv_multires(
            p["unify"], l, v[0], v[1], v[2], a, rate=rate, rng=rngs[0], train=train)

    if cfg.use_position_embedding:
        l = layers.apply_position_embedding(p["pos_l"], l)
        v = layers.apply_position_embedding(p["pos_v"], v)
        a = layers.apply_position_embedding(p["pos_a"], a)

    src = {"l": l, "v": v, "a": a}
    masks = {"l": l_mask, "v": v_mask, "a": a_mask}
    use_stacked = REALFORMER_STACKED if stacked is None else stacked
    fast = None
    if impl == "xla":
        # NOTE: the two fast paths are gated INDEPENDENTLY — the merged minus
        # grid by the MERGED_FAST_PATH module default, the stacked realformer
        # by its own per-call `stacked` argument.  (A round-3 regression
        # nested the stacked branch under `if MERGED_FAST_PATH and ...`, so
        # flipping the merged default off silently dead-coded every stacked
        # entry point; kept separate + invocation-probed by
        # tests/test_models.py::test_stacked_path_actually_invoked.)
        if MERGED_FAST_PATH and cfg.block == "minus" and cfg.n_layers == 1:
            # per-layer vs final collect coincide at one layer
            fast = _apply_grid_minus_merged(p, cfg, src, masks,
                                            rng=rngs[1], train=train)
        elif use_stacked and cfg.block == "realformer":
            true_lens = {m: src[m].shape[1] for m in ("l", "v", "a")}
            max_len = max(true_lens.values())
            padded = {m: _pad_seq(src[m], masks[m], max_len)
                      for m in ("l", "v", "a")}
            fast = _apply_grid_realformer_stacked(
                p, cfg, {m: padded[m][0] for m in padded},
                {m: padded[m][1] for m in padded},
                rng=rngs[1], train=train, collect=collect)
            # drop the padded QUERY rows before pooling (padded keys already
            # contribute exactly-zero attention weight)
            fast = {m: [y[:, :true_lens[m]] for y in fast[m]] for m in fast}
    if fast is not None:
        if SPLIT_POOL:
            return grid_mean_max_pool(fast["l"], fast["a"], fast["v"])
        lc = jnp.concatenate(fast["l"], axis=2)
        vc = jnp.concatenate(fast["v"], axis=2)
        ac = jnp.concatenate(fast["a"], axis=2)
        return mean_max_pool(jnp.concatenate([lc, ac, vc], axis=1))
    collected = {"l": [], "v": [], "a": []}
    ridx = 2
    use_remat = getattr(cfg, "remat", False)
    for name, qm, kvm in STREAMS:
        q = src[qm]
        scores = None
        finals = None
        for i in range(cfg.n_layers):
            # the stream's last block has no consumer for its scores —
            # lean pallas kernel skips the dead (B,H,Lq,Lkv) HBM write
            emit = i < cfg.n_layers - 1

            def block_call(p_i, q_in, kv_in, mask_in, scores_in, rng_in,
                           _emit=emit):
                return layers.apply_block(
                    p_i, cfg.block, q_in, kv_in, kv_in, mask_in, scores_in,
                    n_heads=cfg.n_heads, rate=rate, rng=rng_in, train=train,
                    impl=impl, emit_scores=_emit)

            if use_remat:
                # cfg.remat: store only block boundaries (q, scores) for the
                # backward pass; probs/QKV/FFN internals are recomputed.
                block_call = jax.checkpoint(block_call)
            q, scores = block_call(
                p["blocks"][name][i], q, src[kvm], masks[kvm], scores,
                rngs[ridx])
            ridx += 1
            if collect == "per_layer":
                collected[TARGET[name]].append(q)
            finals = q
        if collect == "final":
            collected[TARGET[name]].append(finals)

    if SPLIT_POOL:
        return grid_mean_max_pool(collected["l"], collected["a"],
                                  collected["v"])
    lc = jnp.concatenate(collected["l"], axis=2)
    vc = jnp.concatenate(collected["v"], axis=2)
    ac = jnp.concatenate(collected["a"], axis=2)
    # reference sequence-concat order is [l, a, v] (cmu-mosei/run.py:317);
    # mean+max pooling with a sharding-deterministic max gradient (ops/pooling)
    x = jnp.concatenate([lc, ac, vc], axis=1)
    return mean_max_pool(x)


def apply_grid_head(hp, cfg, pooled, *, out: str, rng=None, train: bool = False):
    if out in ("classifier", "classifier_bias"):
        return init.apply_linear(hp["classifier"], pooled)
    # realformer feature head: Drop(ReLU(LN(FC(x)))) (others/realformer.py:263)
    x = jax.nn.relu(init.apply_layer_norm(hp["ln"], init.apply_linear(hp["fc"], pooled)))
    return layers.dropout(rng, x, cfg.dropout, train)
