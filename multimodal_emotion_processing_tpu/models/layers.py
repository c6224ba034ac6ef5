"""Encoder building blocks: modality projections, position embeddings, and the
two residual-score attention block variants.

Parameters are plain nested dicts of jnp arrays (functional JAX style); every
`init_*` takes a PRNGKey, every `apply_*` is pure.  Dropout sites take an
explicit rng and a `train` flag.

Block variants (see SURVEY §2.2):
  * "minus"      — no Q/K/V projections; post-attention combine
                   q = Drop(LN(Linear_{2d→d}([q ; attn]))); no FFN
                   (cmu-mosei/run.py:217-262, Ren-MME/run.py:169-214)
  * "realformer" — per-input W_qkv; q = LN(q + a·attn); q = LN(q + b·FFN(q))
                   with ReLU FFN and gates a,b init 0
                   (others/realformer.py:154-209, robot_demo.py:324-374)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import scored_attention
from ..utils import initializers as init


def dropout(rng, x, rate: float, train: bool):
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# Modality projections ("unify dimension")
# ---------------------------------------------------------------------------

def init_unify_linear(key, l_dim, v_dim, a_dim, dim, *, shared_ln: bool = False):
    """Bias-free per-modality Linear (cmu-mosei/run.py:207-214); the Ren-MME
    variant adds a single LayerNorm shared by all three outputs
    (Ren-MME/run.py:158-166)."""
    kl, kv, ka = jax.random.split(key, 3)
    p = {
        "l": init.linear(kl, l_dim, dim),
        "v": init.linear(kv, v_dim, dim),
        "a": init.linear(ka, a_dim, dim),
    }
    if shared_ln:
        p["ln"] = init.layer_norm(dim)
    return p


def apply_unify_linear(p, l, v, a):
    outs = (init.apply_linear(p["l"], l), init.apply_linear(p["v"], v),
            init.apply_linear(p["a"], a))
    if "ln" in p:
        outs = tuple(init.apply_layer_norm(p["ln"], x) for x in outs)
    return outs


def init_unify_conv(key, l_dim, v_dim, a_dim, dim, *, bias: bool = False):
    """Kernel-1 Conv1d per modality == position-wise Linear on TPU
    (others/realformer.py:133-143; fold the transpose-conv-transpose into one
    Dense — same math, MXU-friendly layout)."""
    kl, kv, ka = jax.random.split(key, 3)
    return {
        "l": init.linear(kl, l_dim, dim, bias=bias),
        "v": init.linear(kv, v_dim, dim, bias=bias),
        "a": init.linear(ka, a_dim, dim, bias=bias),
    }


def apply_unify_conv(p, l, v, a, *, rate: float, rng, train: bool):
    rngs = jax.random.split(rng, 3) if rng is not None else (None,) * 3
    l = dropout(rngs[0], init.apply_linear(p["l"], l), rate, train)
    v = dropout(rngs[1], init.apply_linear(p["v"], v), rate, train)
    a = dropout(rngs[2], init.apply_linear(p["a"], a), rate, train)
    return l, v, a


def init_unify_conv_multires(key, l_dim, v_dims, a_dim, dim):
    """Robot-demo variant: three visual resolution slots each map to dim//3 and
    concatenate (robot_demo.py:293-311); conv biases are torch-default (True)."""
    kl, k256, k512, k1024, ka = jax.random.split(key, 5)
    d3 = dim // 3
    return {
        "l": init.linear(kl, l_dim, dim, bias=True),
        "v256": init.linear(k256, v_dims[0], d3, bias=True),
        "v512": init.linear(k512, v_dims[1], d3, bias=True),
        "v1024": init.linear(k1024, v_dims[2], d3, bias=True),
        "a": init.linear(ka, a_dim, dim, bias=True),
    }


def apply_unify_conv_multires(p, l, v256, v512, v1024, a, *, rate, rng, train):
    rngs = jax.random.split(rng, 5) if rng is not None else (None,) * 5
    l = dropout(rngs[0], init.apply_linear(p["l"], l), rate, train)
    o256 = dropout(rngs[1], init.apply_linear(p["v256"], v256), rate, train)
    o512 = dropout(rngs[2], init.apply_linear(p["v512"], v512), rate, train)
    o1024 = dropout(rngs[3], init.apply_linear(p["v1024"], v1024), rate, train)
    a = dropout(rngs[4], init.apply_linear(p["a"], a), rate, train)
    # reference concatenation order: 256, 512, 1024 (robot_demo.py:310)
    v = jnp.concatenate([o256, o512, o1024], axis=-1)
    return l, v, a


def init_position_embedding(key, max_len: int, dim: int):
    """Learned position table, torch nn.Embedding init N(0,1)
    (others/realformer.py:145-152)."""
    return init.embedding(key, max_len, dim)


def apply_position_embedding(p, x):
    return x + p["table"][None, : x.shape[1], :]


# ---------------------------------------------------------------------------
# Attention blocks
# ---------------------------------------------------------------------------

def init_block_minus(key, dim: int):
    kp, km = jax.random.split(key)
    return {
        "proj": init.linear(kp, dim, dim),
        "minus": init.linear(km, 2 * dim, dim),
        "norm": init.layer_norm(dim),
        "c": init.scalar_zero(),
    }


def apply_block_minus(
    p, q, k, v, mask, scores, *, n_heads: int, rate: float, rng, train: bool,
    impl: str = "xla", emit_scores: bool = True,
):
    """q,k,v (B,L,dim) — k,v used raw (no projections); returns (q', scores')."""
    if impl == "pallas_fused":
        if not (train and rate > 0.0) and (mask is None or mask.ndim == 2):
            from ..ops.fused_block import fused_minus_block

            return fused_minus_block(q, k, v, mask, scores, p["c"],
                                     p["proj"]["w"], p["minus"]["w"],
                                     p["norm"]["scale"], p["norm"]["bias"],
                                     n_heads=n_heads)
        impl = "pallas"  # active dropout: fused attention + einsum epilogue
    r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
    ctx, scores = scored_attention(
        q, k, v, mask, scores, p["c"], n_heads=n_heads, impl=impl,
        emit_scores=emit_scores,
    )
    x = dropout(r1, init.apply_linear(p["proj"], ctx), rate, train)
    # Linear(concat[q, x]) computed as q @ W[:d] + x @ W[d:] — algebraically
    # identical to the reference's concat form (cmu-mosei/run.py:258-262;
    # the (2d, d) torch-interop weight layout is unchanged) but skips
    # materializing the (B, L, 2d) concat and its slice cotangent in the
    # backward.  Measured on the chip: bit-identical forward, train step
    # +2-4% every interleaved round (ENGINEERING_NOTES).
    d = q.shape[-1]
    w = p["minus"]["w"]
    pre = q @ w[:d] + x @ w[d:]
    q = dropout(r2, init.apply_layer_norm(p["norm"], pre), rate, train)
    return q, scores


def init_block_realformer(key, dim: int, ffn_mult: int):
    kq, kk, kv, kp, k1, k2 = jax.random.split(key, 6)
    return {
        "wq": init.linear(kq, dim, dim),
        "wk": init.linear(kk, dim, dim),
        "wv": init.linear(kv, dim, dim),
        "proj": init.linear(kp, dim, dim),
        "norm1": init.layer_norm(dim),
        "norm2": init.layer_norm(dim),
        "ffn1": init.linear(k1, dim, ffn_mult * dim, bias=True),
        "ffn2": init.linear(k2, ffn_mult * dim, dim, bias=True),
        "a": init.scalar_zero(),
        "b": init.scalar_zero(),
        "c": init.scalar_zero(),
    }


def apply_block_realformer(
    p, q, k, v, mask, scores, *, n_heads: int, rate: float, rng, train: bool,
    impl: str = "xla", emit_scores: bool = True,
):
    if impl == "pallas_fused":
        impl = "pallas"  # realformer keeps the fused-attention kernel with an
        # einsum epilogue (LN+FFN fusion — see docs/ENGINEERING_NOTES.md)
    r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
    qp = init.apply_linear(p["wq"], q)
    kp_ = init.apply_linear(p["wk"], k)
    vp = init.apply_linear(p["wv"], v)
    ctx, scores = scored_attention(
        qp, kp_, vp, mask, scores, p["c"], n_heads=n_heads, impl=impl,
        emit_scores=emit_scores,
    )
    x = dropout(r1, init.apply_linear(p["proj"], ctx), rate, train)
    q = init.apply_layer_norm(p["norm1"], q + p["a"] * x)
    h = init.apply_linear(p["ffn2"], jax.nn.relu(init.apply_linear(p["ffn1"], q)))
    h = dropout(r2, h, rate, train)
    q = init.apply_layer_norm(p["norm2"], q + p["b"] * h)
    return q, scores


BLOCK_INIT = {"minus": init_block_minus, "realformer": init_block_realformer}
BLOCK_APPLY = {"minus": apply_block_minus, "realformer": apply_block_realformer}


def init_block(key, variant: str, dim: int, ffn_mult: int):
    if variant == "minus":
        return init_block_minus(key, dim)
    return init_block_realformer(key, dim, ffn_mult)


def apply_block(p, variant: str, *args, **kwargs):
    return BLOCK_APPLY[variant](p, *args, **kwargs)
