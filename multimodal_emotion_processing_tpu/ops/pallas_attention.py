"""Fused Pallas TPU kernel for residual-score attention.

One kernel per sample fuses the whole chain the reference runs as five torch
ops (QKᵀ, +c·S_prev, additive mask, softmax, ·V — cmu-mosei/run.py:236-257):
the score tensor S stays VMEM-resident and is emitted as an output because the
next block in the stream CONSUMES it (the RealFormer residual-score design
makes flash-style no-materialize kernels impossible — SURVEY §5 long-context).
Sequence lengths are bounded by construction (≤275), so S fits VMEM easily
(heads × 275 × 275 × 4B ≈ 2.4 MB at the largest config).

The backward pass is a custom VJP: softmax probabilities are recomputed from
the emitted (masked) scores — no extra residuals beyond the forward's own
inputs/outputs are stored — and the incoming gradient w.r.t. the emitted
scores (from the next block's c·S term) is folded in exactly.

Measured on TPU v5e (B=64, H=6, D=96, flagship config): with the adaptive
multi-sample grid blocks (_pick_block_b) the fused kernel runs the full
18-block train step at parity-to-slightly-faster vs the XLA-fused path
(1.20-1.44 ms vs 1.31-1.55 ms/step across runs, within shared-chip noise) and
~2x faster on the largest isolated stream when scores ride along
(Lq=Lkv=200 with S_prev: 26-27 us vs 51 us/call).  A naive one-sample-per-grid-
step version was 6x SLOWER than XLA — kernel-launch amortization is the whole
game at these shapes.  impl='xla' stays the default (robust under XLA's own
fusion); select impl='pallas' per call/model where shapes warrant it.

`mask=None` and `scores_prev=None` are canonicalized to all-ones / zeros: the
math is bit-identical (penalty −1e8·(1−1)=0; c·0=0) and one specialization
serves every block position.
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


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, sprev_ref, c_ref,
                ctx_ref, scores_ref, *, n_heads: int, block_b: int):
    d = q_ref.shape[-1]
    dh = d // n_heads
    inv_sqrt = 1.0 / math.sqrt(dh)
    c = c_ref[0, 0]
    for bb in range(block_b):
        neg = MASK_PENALTY * (1.0 - mask_ref[bb, 0, :])[None, :]
        for h in range(n_heads):
            sl = slice(h * dh, (h + 1) * dh)
            qh = q_ref[bb, :, sl]
            kh = k_ref[bb, :, sl]
            s = jax.lax.dot_general(
                qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * inv_sqrt
            s = s + c * sprev_ref[bb, h]
            s = s - neg
            scores_ref[bb, h] = s
            p = jax.nn.softmax(s, axis=-1)
            ctx_ref[bb, :, sl] = jnp.dot(p, v_ref[bb, :, sl],
                                         preferred_element_type=jnp.float32)


_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom under ~16 MB/core


def _pick_block_b(b, lq, lkv, d, h):
    """Largest divisor of b whose working set fits the VMEM budget."""
    pad = lambda n: -(-n // 128) * 128
    per_sample = 4 * (lq * pad(d) * 2 + 2 * lkv * pad(d)      # q,ctx,k,v
                      + 2 * h * lq * pad(lkv))                # sprev, scores
    cap = max(1, _VMEM_BUDGET // max(per_sample, 1))
    best = 1
    for cand in range(1, min(b, cap) + 1):
        if b % cand == 0:
            best = cand
    return best


def _forward(q, k, v, mask, sprev, c, n_heads: int):
    b, lq, d = q.shape
    lkv = k.shape[1]
    h = n_heads
    bb = _pick_block_b(b, lq, lkv, d, h)
    kernel = functools.partial(_fwd_kernel, n_heads=n_heads, block_b=bb)
    ctx, scores = pl.pallas_call(
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
    )(q, k, v, mask.reshape(b, 1, lkv), sprev, c.reshape(1, 1))
    return ctx, scores


@functools.lru_cache(maxsize=None)
def _make(n_heads: int):
    @jax.custom_vjp
    def attn(q, k, v, mask, sprev, c):
        return _forward(q, k, v, mask, sprev, c, n_heads)

    def fwd(q, k, v, mask, sprev, c):
        ctx, scores = _forward(q, k, v, mask, sprev, c, n_heads)
        return (ctx, scores), (q, k, v, sprev, c, scores)

    def bwd(res, grads):
        q, k, v, sprev, c, scores = res
        dctx, dscores = grads
        qh = split_heads(q, n_heads)
        kh = split_heads(k, n_heads)
        vh = split_heads(v, n_heads)
        dh = qh.shape[-1]
        inv_sqrt = 1.0 / math.sqrt(dh)

        p = jax.nn.softmax(scores, axis=-1)                      # (B,H,Lq,Lkv)
        dctx_h = split_heads(dctx, n_heads)                      # (B,H,Lq,dh)
        dv = jnp.einsum("bhqk,bhqd->bhkd", p, dctx_h,
                        preferred_element_type=jnp.float32)
        dp = jnp.einsum("bhqd,bhkd->bhqk", dctx_h, vh,
                        preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = ds + dscores                                        # next block's c·S use
        dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kh,
                        preferred_element_type=jnp.float32) * inv_sqrt
        dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qh,
                        preferred_element_type=jnp.float32) * inv_sqrt
        dc = jnp.sum(ds * sprev).reshape(1).astype(c.dtype)
        dsprev = c * ds
        # mask enters as -1e8*(1-mask): d/dmask = +1e8, summed over heads & queries
        dmask = MASK_PENALTY * jnp.sum(ds, axis=(1, 2))
        return (merge_heads(dq).astype(q.dtype), merge_heads(dk).astype(k.dtype),
                merge_heads(dv).astype(v.dtype), dmask.astype(q.dtype),
                dsprev.astype(sprev.dtype), dc)

    attn.defvjp(fwd, bwd)
    return attn


def scored_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scores_prev: Optional[jnp.ndarray],
    c: jnp.ndarray,
    *,
    n_heads: int,
):
    """Drop-in for ops.attention.scored_attention (impl='pallas').

    Only 2-D key masks are fused (the only kind the reference configs use);
    3-D masks fall back to the einsum path.
    """
    if mask is not None and mask.ndim != 2:
        from .attention import scored_attention

        return scored_attention(q, k, v, mask, scores_prev, c,
                                n_heads=n_heads, impl="xla")
    b, lq, _ = q.shape
    lkv = k.shape[1]
    if mask is None:
        mask = jnp.ones((b, lkv), q.dtype)
    if scores_prev is None:
        scores_prev = jnp.zeros((b, n_heads, lq, lkv), jnp.float32)
    return _make(n_heads)(q, k, v, mask.astype(q.dtype), scores_prev, c)
