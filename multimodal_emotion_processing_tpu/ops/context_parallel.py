"""Context-parallel (sequence-sharded) residual-score attention.

The reference bounds sequence length by construction (≤275 tokens — SURVEY §5
long-context), so CP is OFF by default; this module is the scaling path for
artificially long sequences.  Key design point: the residual-score chain
requires every block to EMIT its masked score tensor — so a CP block keeps S
*sharded over the kv axis* (each device owns its kv-block of S, which is also
how the next block consumes S_prev), and computes the global softmax with
collectives:

    local:   S_i = Q·K_iᵀ/√d + c·S_prev,i − 1e8(1−mask_i)
    global:  m = pmax_i(rowmax S_i);  Z = psum_i(Σ exp(S_i − m))
    output:  ctx = psum_i(exp(S_i − m)·V_i) / Z         (replicated)

Collectives ride the mesh's `context` axis (ICI on real slices); XLA emits
them from the shard_map specs.  Q is replicated across the axis (q_len stays
modest in this family); sharding q instead would be the Ring/Ulysses
alternative and is unnecessary at these shapes.
"""

from __future__ import annotations

import contextlib
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .attention import MASK_PENALTY, merge_heads, split_heads

# Ambient CP binding for `impl="cp"` model paths: (mesh, axis name).  Set with
# `cp_context`; read at TRACE time by ops.attention.scored_attention, so enter
# the context before jit-compiling the model call (re-tracing picks up a new
# mesh; an already-compiled program keeps the mesh it was traced with).
_ACTIVE: list = []


@contextlib.contextmanager
def cp_context(mesh: Mesh, axis: str = "context"):
    """Bind the mesh/axis that `impl='cp'` attention runs over.

        mesh = Mesh(np.asarray(jax.devices()), ("context",))
        with cp_context(mesh):
            logits = model.apply(params, batch, impl="cp")
    """
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no axis {axis!r}: {mesh.axis_names}")
    _ACTIVE.append((mesh, axis))
    try:
        yield
    finally:
        _ACTIVE.pop()


def current_cp() -> Tuple[Mesh, str]:
    if not _ACTIVE:
        raise RuntimeError(
            "impl='cp' requires an active cp_context(mesh) — wrap the model "
            "call: `with cp_context(mesh): model.apply(..., impl='cp')`")
    return _ACTIVE[-1]


def scored_attention_cp(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scores_prev: Optional[jnp.ndarray],
    c: jnp.ndarray,
    *,
    n_heads: int,
    mesh: Mesh,
    axis: str = "context",
):
    """Inputs are logically global; k/v/mask/scores_prev may already be sharded
    on their kv axis over `axis` (jit will reshard as needed).  Returns
    (ctx replicated, scores sharded on kv over `axis`)."""
    b, lq, d = q.shape
    lkv = k.shape[1]
    if mask is None:
        mask = jnp.ones((b, lkv), q.dtype)
    if mask.ndim != 2:
        raise NotImplementedError("CP attention supports 2-D key masks")
    if scores_prev is None:
        scores_prev = jnp.zeros((b, n_heads, lq, lkv), jnp.float32)

    def local(qg, kl, vl, ml, sl, cg):
        qh = split_heads(qg, n_heads)
        kh = split_heads(kl, n_heads)
        vh = split_heads(vl, n_heads)
        dh = qh.shape[-1]
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                       preferred_element_type=jnp.float32) / math.sqrt(dh)
        s = s + cg * sl
        s = s - MASK_PENALTY * (1.0 - ml[:, None, None, :])
        m = jax.lax.pmax(jnp.max(s, axis=-1, keepdims=True), axis)
        e = jnp.exp(s - m)
        z = jax.lax.psum(jnp.sum(e, axis=-1, keepdims=True), axis)
        ctx = jax.lax.psum(
            jnp.einsum("bhqk,bhkd->bhqd", e, vh,
                       preferred_element_type=jnp.float32), axis) / z
        return merge_heads(ctx.astype(qg.dtype)), s

    shard = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis, None), P(None, axis),
                  P(None, None, None, axis), P()),
        out_specs=(P(), P(None, None, None, axis)),
    )
    return shard(q, k, v, mask, scores_prev, c)
