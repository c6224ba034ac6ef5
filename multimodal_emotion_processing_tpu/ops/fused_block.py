"""Fully-fused Pallas TPU kernel for the `minus` attention block.

One kernel computes the ENTIRE block the reference runs as ~9 torch ops
(cmu-mosei/run.py:236-262): residual-score attention (QKᵀ/√d + c·S_prev,
additive mask, softmax, ·V) *plus the epilogue* — output projection, the
"minus" combine Linear over concat[q, proj(ctx)], and LayerNorm — with the
score tensor S and every intermediate resident in VMEM.  The concat is
algebraic, not materialized: concat([q, x]) @ W_minus == q @ W_minus[:D] +
x @ W_minus[D:], two MXU matmuls instead of a (B, L, 2D) buffer.

Output contract matches models/layers.apply_block_minus exactly:
    (q', scores) with q' = LN(q @ Wm_q + (ctx @ W_proj) @ Wm_x),
    scores = post-mask logits emitted for the next block in the stream.

Dropout sits between proj and the combine in the reference; the fused kernel
is used when dropout is inactive (eval, or rate 0.0 — the flagship config
trains at DROP=0.0, cmu-mosei/run.py:36); training with active dropout falls
back to the attention-only fused kernel + einsum epilogue.

Backward is a custom VJP that recomputes softmax/ctx/proj from the emitted
scores (no extra residuals stored) and differentiates the epilogue in plain
einsums — measured faster than a hand-written backward kernel attempt at
these shapes (see docs/ENGINEERING_NOTES.md).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import MASK_PENALTY, merge_heads, split_heads
from .pallas_attention import _attn_bwd, _interpret, _VMEM_BUDGET

LN_EPS = 1e-5


def _pick_block_b_fused(b, lq, lkv, d, h):
    """Like pallas_attention._pick_block_b but budgeting the batched epilogue
    intermediates (ctx/q_all/x/y/out, each (bb*lq, d)) and the weights."""
    pad = lambda n: -(-n // 128) * 128
    per_sample = 4 * (lq * pad(d) * 2 + 2 * lkv * pad(d)       # q,ctx,k,v
                      + 2 * h * lq * pad(lkv)                  # sprev, scores
                      + 6 * lq * pad(d))                       # epilogue temps
    fixed = 4 * (3 * d * pad(d) + 2 * pad(d))                  # weights, ln
    cap = max(1, (_VMEM_BUDGET - fixed) // max(per_sample, 1))
    best = 1
    for cand in range(1, min(b, cap) + 1):
        if b % cand == 0:
            best = cand
    return best


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, sprev_ref, c_ref,
                projw_ref, mwq_ref, mwx_ref, lns_ref, lnb_ref,
                out_ref, scores_ref, *, n_heads: int, block_b: int):
    d = q_ref.shape[-1]
    dh = d // n_heads
    lq = q_ref.shape[1]
    inv_sqrt = 1.0 / math.sqrt(dh)
    c = c_ref[0, 0]
    ctx_rows = []
    for bb in range(block_b):
        neg = MASK_PENALTY * (1.0 - mask_ref[bb, 0, :])[None, :]
        q = q_ref[bb]
        # attention per head; ctx assembled in registers/VMEM
        ctx_parts = []
        for h in range(n_heads):
            sl = slice(h * dh, (h + 1) * dh)
            s = jax.lax.dot_general(
                q[:, sl], k_ref[bb, :, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * inv_sqrt
            s = s + c * sprev_ref[bb, h]
            s = s - neg
            scores_ref[bb, h] = s
            p = jax.nn.softmax(s, axis=-1)
            ctx_parts.append(jnp.dot(p, v_ref[bb, :, sl],
                                     preferred_element_type=jnp.float32))
        ctx_rows.append(jnp.concatenate(ctx_parts, axis=-1))
    # epilogue BATCHED over the whole block: one (block_b*Lq, D) MXU matmul
    # per weight instead of block_b small ones
    ctx = jnp.concatenate(ctx_rows, axis=0)                     # (bb*Lq, D)
    q_all = q_ref[...].reshape(block_b * lq, d)
    x = jnp.dot(ctx, projw_ref[...], preferred_element_type=jnp.float32)
    y = (jnp.dot(q_all, mwq_ref[...], preferred_element_type=jnp.float32)
         + jnp.dot(x, mwx_ref[...], preferred_element_type=jnp.float32))
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mean) * (y - mean), axis=-1, keepdims=True)
    out = ((y - mean) * jax.lax.rsqrt(var + LN_EPS)
           * lns_ref[...] + lnb_ref[...])
    out_ref[...] = out.reshape(block_b, lq, d).astype(out_ref.dtype)


def _forward(q, k, v, mask, sprev, c, projw, mwq, mwx, lns, lnb, n_heads):
    b, lq, d = q.shape
    lkv = k.shape[1]
    h = n_heads
    bb = _pick_block_b_fused(b, lq, lkv, d, h)
    kernel = functools.partial(_fwd_kernel, n_heads=h, block_b=bb)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    out, scores = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, lq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, lkv, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, lkv, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1, lkv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, h, lq, lkv), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            full((d, d)), full((d, d)), full((d, d)), full((d,)), full((d,)),
        ],
        out_specs=[
            pl.BlockSpec((bb, lq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, h, lq, lkv), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, lq, lkv), jnp.float32),
        ],
        interpret=_interpret(),
    )(q, k, v, mask.reshape(b, 1, lkv), sprev, c.reshape(1, 1),
      projw, mwq, mwx, lns, lnb)
    return out, scores


@functools.lru_cache(maxsize=None)
def _make(n_heads: int):
    @jax.custom_vjp
    def block(q, k, v, mask, sprev, c, projw, mwq, mwx, lns, lnb):
        return _forward(q, k, v, mask, sprev, c, projw, mwq, mwx, lns, lnb,
                        n_heads)

    def fwd(q, k, v, mask, sprev, c, projw, mwq, mwx, lns, lnb):
        out, scores = _forward(q, k, v, mask, sprev, c, projw, mwq, mwx,
                               lns, lnb, n_heads)
        return (out, scores), (q, k, v, sprev, c, projw, mwq, mwx, lns, lnb,
                               scores)

    def bwd(res, grads):
        q, k, v, sprev, c, projw, mwq, mwx, lns, lnb, scores = res
        dout, dscores_in = grads
        acc = jnp.float32

        # recompute forward intermediates from the emitted scores
        p = jax.nn.softmax(scores, axis=-1)                     # (B,H,Lq,Lkv)
        vh = split_heads(v, n_heads)
        ctx = merge_heads(
            jnp.einsum("bhqk,bhkd->bhqd", p, vh,
                       preferred_element_type=acc)).astype(q.dtype)
        x = jnp.einsum("bqd,de->bqe", ctx, projw, preferred_element_type=acc)
        y = (jnp.einsum("bqd,de->bqe", q.astype(acc), mwq.astype(acc),
                        preferred_element_type=acc) + jnp.einsum(
             "bqd,de->bqe", x, mwx.astype(acc), preferred_element_type=acc))
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean((y - mean) ** 2, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + LN_EPS)
        xhat = (y - mean) * rstd

        # LayerNorm backward (torch semantics: biased variance)
        g = dout.astype(acc) * lns.astype(acc)
        dy = rstd * (g - jnp.mean(g, axis=-1, keepdims=True)
                     - xhat * jnp.mean(g * xhat, axis=-1, keepdims=True))
        dlns = jnp.sum(dout.astype(acc) * xhat, axis=(0, 1)).astype(lns.dtype)
        dlnb = jnp.sum(dout.astype(acc), axis=(0, 1)).astype(lnb.dtype)

        # minus combine backward (split-concat algebra)
        dq_direct = jnp.einsum("bqe,de->bqd", dy, mwq.astype(acc))
        dx = jnp.einsum("bqe,de->bqd", dy, mwx.astype(acc))
        dmwq = jnp.einsum("bqd,bqe->de", q.astype(acc), dy).astype(mwq.dtype)
        dmwx = jnp.einsum("bqd,bqe->de", x, dy).astype(mwx.dtype)

        # proj backward
        dctx = jnp.einsum("bqe,de->bqd", dx, projw.astype(acc))
        dprojw = jnp.einsum("bqd,bqe->de", ctx.astype(acc), dx).astype(projw.dtype)

        # attention backward — the one shared implementation
        # (pallas_attention._attn_bwd; keeping a copy here drifted once)
        ds, dq_attn, dk, dv = _attn_bwd(q, k, v, scores, dscores_in,
                                        dctx.astype(q.dtype), n_heads)
        dc = jnp.sum(ds * sprev).reshape(1).astype(c.dtype)
        dsprev = c * ds
        dmask = MASK_PENALTY * jnp.sum(ds, axis=(1, 2))
        dq = (dq_direct + dq_attn).astype(q.dtype)
        return (dq, dk.astype(k.dtype), dv.astype(v.dtype),
                dmask.astype(q.dtype), dsprev.astype(sprev.dtype), dc,
                dprojw, dmwq, dmwx, dlns, dlnb)

    block.defvjp(fwd, bwd)
    return block


def fused_minus_block(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scores_prev: Optional[jnp.ndarray],
    c: jnp.ndarray,
    proj_w: jnp.ndarray,
    minus_w: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    *,
    n_heads: int,
):
    """Whole minus block in one kernel: returns (q', scores).
    Drop-in for models/layers.apply_block_minus with inactive dropout."""
    if mask is not None and mask.ndim != 2:
        raise NotImplementedError("fused minus block supports 2-D key masks")
    b, lq, d = q.shape
    lkv = k.shape[1]
    if mask is None:
        mask = jnp.ones((b, lkv), q.dtype)
    if scores_prev is None:
        scores_prev = jnp.zeros((b, n_heads, lq, lkv), jnp.float32)
    mwq, mwx = minus_w[:d], minus_w[d:]
    return _make(n_heads)(q, k, v, mask.astype(q.dtype), scores_prev, c,
                          proj_w, mwq, mwx, ln_scale, ln_bias)
