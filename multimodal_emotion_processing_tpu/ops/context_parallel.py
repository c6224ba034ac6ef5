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
def cp_context(mesh: Mesh, axis: str = "context", mode: str = "psum"):
    """Bind the mesh/axis that `impl='cp'` attention runs over.

        mesh = Mesh(np.asarray(jax.devices()), ("context",))
        with cp_context(mesh):                # or mode="ring"
            logits = model.apply(params, batch, impl="cp")

    mode='psum': Q replicated, kv sharded, psum/pmax global softmax (any
    sequence length).  mode='ring': Q-sharded classic ring attention —
    kv blocks hop neighbor-to-neighbor on ICI (`ring_scored_attention`);
    needs Lq and Lkv divisible by the axis size.
    """
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no axis {axis!r}: {mesh.axis_names}")
    if mode not in ("psum", "ring"):
        raise ValueError(f"unknown cp mode {mode!r}")
    _ACTIVE.append((mesh, axis, mode))
    try:
        yield
    finally:
        _ACTIVE.pop()


def ensure_cp(impl: str):
    """Context manager for entry points (pipelines, CLI serve): a no-op
    unless `impl == "cp"` with no cp_context already active, in which case a
    psum-mode binding over ALL local devices is entered — so
    `--impl cp` works out of the box (one device = degenerate 1-way CP;
    callers wanting ring mode or a sub-mesh enter cp_context themselves)."""
    if impl != "cp" or _ACTIVE:
        return contextlib.nullcontext()
    import numpy as np

    mesh = Mesh(np.asarray(jax.devices()), ("context",))
    return cp_context(mesh)


def current_cp() -> Tuple[Mesh, str, str]:
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
    # shard_map needs the kv axis divisible by the mesh axis; pad k/v with
    # zero rows carrying mask=0 (the −1e8 penalty zeroes them in the softmax,
    # exactly like real masked keys) and slice the emitted scores back.  This
    # keeps the "any sequence length" contract on any device count.
    n = mesh.shape[axis]
    pad = (-lkv) % n
    if pad:
        zrow = lambda x: jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        k, v = zrow(k), zrow(v)
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        scores_prev = jnp.pad(scores_prev,
                              ((0, 0), (0, 0), (0, 0), (0, pad)))

    def local(qg, kl, vl, ml, sl, cg):
        qh = split_heads(qg, n_heads)
        kh = split_heads(kl, n_heads)
        vh = split_heads(vl, n_heads)
        dh = qh.shape[-1]
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                       preferred_element_type=jnp.float32) / math.sqrt(dh)
        s = s + cg * sl
        s = s - MASK_PENALTY * (1.0 - ml[:, None, None, :])
        # stabilizer only — softmax is shift-invariant, so detaching is
        # exact AND required: pmax has no differentiation rule (training
        # through impl='cp' would otherwise fail at trace time)
        m = jax.lax.pmax(
            jnp.max(jax.lax.stop_gradient(s), axis=-1, keepdims=True), axis)
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
    ctx, scores = shard(q, k, v, mask, scores_prev, c)
    if pad:
        scores = scores[..., :lkv]  # drop the padded key columns
    return ctx, scores


def ring_scored_attention(
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
    emit_scores: bool = True,
):
    """Classic RING attention adapted to residual-score chaining.

    Layout (vs `scored_attention_cp`, which replicates Q and psums the
    softmax): Q is sharded over `axis` on its sequence rows, each device
    starts with its own K/V block, and the (K, V, mask) blocks rotate around
    the ring via `ppermute` — N-1 neighbor hops on ICI, no all-to-all.  Each
    device runs an online (flash-style) softmax over the arriving blocks, so
    only its own Lq/N query rows ever materialize.  The residual-score chain
    survives because each device also OWNS the full score rows for its query
    shard: S is emitted sharded on the q axis — exactly the layout the next
    block consumes its `scores_prev` in, so chaining costs no resharding.

    `emit_scores=False` (terminal blocks — the flash kernel's semantics
    composed with the ring, VERDICT r4 item 8): the (B, H, Lq/N, Lkv) f32
    `s_full` accumulation is never BUILT — each hop's score block lives only
    as the online-softmax temporary, exactly like a flash tile — and the
    function returns (ctx, None).  The chain into the terminal block is
    unaffected (scores_prev is still consumed per hop); only the outgoing
    emission is elided.  The reference's chain semantics
    (cmu-mosei/run.py:257) are preserved: terminal scores have no consumer.

    Requires Lq and Lkv divisible by the axis size.  Returns
    (ctx q-sharded, scores q-sharded (B, H, Lq, Lkv) — or None when
    emit_scores=False).
    """
    b, lq, d = q.shape
    lkv = k.shape[1]
    n = mesh.shape[axis]
    if lq % n or lkv % n:
        raise ValueError(f"ring CP needs Lq ({lq}) and Lkv ({lkv}) divisible "
                         f"by the '{axis}' axis size ({n})")
    if mask is None:
        mask = jnp.ones((b, lkv), q.dtype)
    if mask.ndim != 2:
        raise NotImplementedError("ring CP attention supports 2-D key masks")
    if scores_prev is None:
        scores_prev = jnp.zeros((b, n_heads, lq, lkv), jnp.float32)
    blk = lkv // n
    fwd_perm = [(i, (i + 1) % n) for i in range(n)]

    def local(ql, kl, vl, ml, sl, cg):
        # ql (B, Lq/N, D); kl/vl (B, blk, D); ml (B, blk);
        # sl (B, H, Lq/N, Lkv) — full kv columns for OUR query rows
        me = jax.lax.axis_index(axis)
        qh = split_heads(ql, n_heads)                     # (B,H,lq/N,dh)
        dh = qh.shape[-1]
        inv_sqrt = 1.0 / math.sqrt(dh)
        lq_l = qh.shape[2]

        m_run = jnp.full((b, n_heads, lq_l, 1), -jnp.inf, jnp.float32)
        z_run = jnp.zeros((b, n_heads, lq_l, 1), jnp.float32)
        acc = jnp.zeros((b, n_heads, lq_l, dh), jnp.float32)
        s_full = (jnp.zeros((b, n_heads, lq_l, lkv), jnp.float32)
                  if emit_scores else None)

        for t in range(n):
            # after t hops of send-to-(i+1), device i holds block (i - t) % N
            j = (me - t) % n
            kh = split_heads(kl, n_heads)
            vh = split_heads(vl, n_heads)
            s_blk = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                               preferred_element_type=jnp.float32) * inv_sqrt
            col0 = j * blk
            sprev_blk = jax.lax.dynamic_slice_in_dim(sl, col0, blk, axis=3)
            s_blk = s_blk + cg * sprev_blk
            s_blk = s_blk - MASK_PENALTY * (1.0 - ml[:, None, None, :])
            if emit_scores:
                s_full = jax.lax.dynamic_update_slice_in_dim(
                    s_full, s_blk, col0, axis=3)
            # online softmax update
            m_new = jnp.maximum(m_run, jnp.max(s_blk, axis=-1, keepdims=True))
            scale = jnp.exp(m_run - m_new)
            e = jnp.exp(s_blk - m_new)
            z_run = z_run * scale + jnp.sum(e, axis=-1, keepdims=True)
            acc = acc * scale + jnp.einsum("bhqk,bhkd->bhqd", e, vh,
                                           preferred_element_type=jnp.float32)
            m_run = m_new
            if t < n - 1:  # rotate K/V/mask to the next neighbor (ICI hop)
                kl = jax.lax.ppermute(kl, axis, fwd_perm)
                vl = jax.lax.ppermute(vl, axis, fwd_perm)
                ml = jax.lax.ppermute(ml, axis, fwd_perm)
        ctx = merge_heads((acc / z_run).astype(ql.dtype))
        return (ctx, s_full) if emit_scores else ctx

    in_specs = (P(None, axis, None), P(None, axis, None), P(None, axis, None),
                P(None, axis), P(None, None, axis, None), P())
    if emit_scores:
        shard = jax.shard_map(
            local, mesh=mesh, in_specs=in_specs,
            out_specs=(P(None, axis, None), P(None, None, axis, None)))
        return shard(q, k, v, mask, scores_prev, c)
    shard = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                          out_specs=P(None, axis, None))
    return shard(q, k, v, mask, scores_prev, c), None
