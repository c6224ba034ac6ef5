"""Residual-score ("RealFormer") multi-head attention — the framework's hot op.

Semantics reproduced exactly from the reference's `multi_head_attention`
(identical math in cmu-mosei/run.py:236-257, Ren-MME/run.py:188-209,
others/realformer.py:182-204, robot_demo.py:347-369):

    scores = Q·Kᵀ / sqrt(d_head)            (+ c * scores_prev when chained)
    scores -= 1e8 * (1 - mask)               (additive key mask)
    out     = softmax(scores) · V
    return out, scores                       (the *masked* scores are emitted)

Two deliberate reference quirks are preserved, not "fixed":

* the emitted scores are post-mask, so along a stream the -1e8 mask penalty is
  applied cumulatively (scaled by the learned gate c each hop) — the next block
  re-masks on top (cmu-mosei/run.py:247-257);
* the scale uses the per-head dim of K after head-splitting.

Where a downstream block *consumes the full score tensor* (n_layers > 1), a
flash-style streaming kernel that never materializes S cannot implement this;
sequence lengths are bounded by construction (≤275 at reference shapes), so S
fits VMEM comfortably and the fused Pallas path (ops/pallas_attention.py)
keeps S resident and emits it.  Terminal blocks (every block of the
n_layers=1 families — flagship and all scaled presets) have NO score
consumer, and there `impl="flash"` (ops/flash_attention.py) runs the
online-softmax kernel that never materializes S at all.

This module is the einsum reference implementation (the correctness oracle and
the default XLA path); `impl="pallas"` dispatches to the fused TPU kernel.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

MASK_PENALTY = 1.0e8


def split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """(B, L, D) -> (B, H, L, D/H)."""
    b, l, d = x.shape
    return x.reshape(b, l, n_heads, d // n_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, L, Dh) -> (B, L, H*Dh)."""
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)


def _broadcast_mask(mask: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """Reference mask broadcast: (B,Lkv)->(B,1,1,Lkv); (B,Lq,Lkv)->(B,H,Lq,Lkv)."""
    if mask.ndim == 2:
        return mask[:, None, None, :]
    if mask.ndim == 3:
        return jnp.repeat(mask[:, None, :, :], n_heads, axis=1)
    raise ValueError(f"mask must be 2-D or 3-D, got shape {mask.shape}")


def scored_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scores_prev: Optional[jnp.ndarray],
    c: jnp.ndarray,
    *,
    n_heads: int,
    impl: str = "xla",
    emit_scores: bool = True,
):
    """Residual-score attention.

    Args:
      q: (B, Lq, D); k, v: (B, Lkv, D); mask: None | (B, Lkv) | (B, Lq, Lkv);
      scores_prev: None | (B, H, Lq, Lkv) masked scores from the previous block
        in this stream; c: (1,) learned residual gate.
      impl: 'xla' (einsum oracle/default) | 'pallas' (fused TPU kernel,
        S VMEM-resident) | 'flash' (online-softmax kernel, S never
        materialized — terminal blocks only, falls back to 'xla' where the
        scores have a consumer) | 'cp' (kv-sharded over the ambient
        `cp_context` mesh axis).
      emit_scores: False for terminal blocks whose scores have no consumer —
        the pallas path then skips the scores HBM write, and ring-mode 'cp'
        never builds its per-device score accumulation (XLA's own DCE covers
        the einsum path, so 'xla'/psum-'cp' ignore the flag and still
        return them).

    Returns:
      (context (B, Lq, D), scores (B, H, Lq, Lkv)) — scores are post-mask
      (sharded over the kv axis under 'cp'; None for pallas/ring-cp with
      emit_scores=False).
    """
    if impl == "pallas":
        from .pallas_attention import scored_attention_pallas

        return scored_attention_pallas(q, k, v, mask, scores_prev, c,
                                       n_heads=n_heads, emit_scores=emit_scores)
    if impl == "flash":
        from .flash_attention import flash_scored_attention, flash_supported

        if flash_supported(q.shape[1], k.shape[1], mask, scores_prev,
                           emit_scores, q.shape[-1] // n_heads):
            return flash_scored_attention(q, k, v, mask, c, n_heads=n_heads)
        # scores have a consumer (scores_prev / emit_scores) or 3-D mask:
        # the online-softmax kernel cannot reproduce those semantics —
        # take the einsum path
        return _scored_attention_xla(q, k, v, mask, scores_prev, c,
                                     n_heads=n_heads)
    if impl == "cp":
        from .context_parallel import (current_cp, ring_scored_attention,
                                       scored_attention_cp)

        mesh, axis, mode = current_cp()
        if mode == "ring":
            # terminal blocks compose the flash semantics with the ring:
            # emit_scores=False skips building the per-device (B,H,Lq/N,Lkv)
            # f32 score accumulation entirely (context_parallel.py)
            return ring_scored_attention(q, k, v, mask, scores_prev, c,
                                         n_heads=n_heads, mesh=mesh,
                                         axis=axis, emit_scores=emit_scores)
        return scored_attention_cp(q, k, v, mask, scores_prev, c,
                                   n_heads=n_heads, mesh=mesh, axis=axis)
    return _scored_attention_xla(q, k, v, mask, scores_prev, c, n_heads=n_heads)


@partial(jax.jit, static_argnames=("n_heads",))
def _scored_attention_xla(q, k, v, mask, scores_prev, c, *, n_heads: int):
    qh = split_heads(q, n_heads)
    kh = split_heads(k, n_heads)
    vh = split_heads(v, n_heads)
    d_head = kh.shape[-1]
    # accumulate in >= f32 (TPU matmuls default to bf16 accumulation otherwise)
    acc = jnp.promote_types(q.dtype, jnp.float32)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=acc
    ) / jnp.sqrt(jnp.asarray(d_head, dtype=acc))
    if scores_prev is not None:
        scores = scores + c * scores_prev
    if mask is not None:
        scores = scores - MASK_PENALTY * (1.0 - _broadcast_mask(mask, n_heads))
    att = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", att, vh, preferred_element_type=acc)
    return merge_heads(ctx.astype(q.dtype)), scores
