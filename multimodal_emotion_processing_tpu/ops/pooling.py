"""Sequence pooling with a deterministic max gradient.

XLA differentiates `jnp.max` by comparing x against a (re)computed broadcast
maximum.  Under GSPMD partitioning the backward pass may REMATERIALIZE that
maximum with a different reduction association; a 1-ulp difference then breaks
the equality and silently misroutes the whole column's gradient (observed on
jax 0.9.0: dp+tp-sharded grads diverged O(1) from replicated grads while
forwards matched to 2e-15 — see tests/test_parallel.py).

`seq_max` instead records the argmax ONCE in the forward pass and scatters the
cotangent to exactly that row — deterministic under any sharding, and it
reproduces torch's single-winner tie behavior (torch.max routes ties to one
index; XLA's equality VJP splits among them), which matters for bit-faithful
parity with the reference's `torch.max(x, 1)[0]` pooling
(cmu-mosei/run.py:318).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def seq_max(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, D) -> (B, D) max over the sequence axis."""
    return jnp.max(x, axis=1)


def _fwd(x):
    idx = jnp.argmax(x, axis=1)  # (B, D) — backward-routing residual ONLY
    # the VALUE comes from the plain max reduce, not a gather at idx: the
    # (B,D)-index take_along_axis compiled to a per-element gather costing
    # ~1.3 ms/step at s512 (xplane 2026-08-20) for bytes a reduce covers in
    # ~0.1; x[b, idx[b,d], d] IS max(x[b,:,d]), so the values are identical
    out = jnp.max(x, axis=1)
    return out, (idx, x.shape[1])


def _bwd(res, g):
    idx, t = res
    onehot = jax.nn.one_hot(idx, t, axis=1, dtype=g.dtype)  # (B, T, D)
    return (onehot * g[:, None, :],)


seq_max.defvjp(_fwd, _bwd)


def mean_max_pool(x: jnp.ndarray) -> jnp.ndarray:
    """concat[mean_seq, max_seq] — the grid's pooling (cmu-mosei/run.py:318)."""
    return jnp.concatenate([jnp.mean(x, axis=1), seq_max(x)], axis=1)


def grid_mean_max_pool(blocks_l, blocks_a, blocks_v) -> jnp.ndarray:
    """The grid tail's pooling WITHOUT materializing its two concats.

    Algebraically equals
      mean_max_pool(concat([concat(blocks_l, 2), concat(blocks_a, 2),
                            concat(blocks_v, 2)], 1))
    (the reference's [l, a, v] sequence concat + feature concat,
    cmu-mosei/run.py:314-318): mean over the sequence concat is the
    length-weighted combination of per-block means, and max is the
    elementwise maximum of per-block seq_max results — both act per feature
    column, and column block j of every modality part holds blocks_*[j].
    Skipping the (B, L_total, 3D) concat (and the feature concats feeding
    it) removes their forward materialization and the slice cotangents in
    the backward.

    Tie semantics: within a block, seq_max keeps torch's single-winner
    routing; ACROSS modality parts jnp.maximum splits an exact float tie's
    gradient instead of routing it to the earlier part like torch.max on
    the concat would — a measure-zero event on real features, and the
    elementwise maximum has no reduction-association hazard (the failure
    mode seq_max exists for)."""
    import functools

    ll, la, lv = (blocks_l[0].shape[1], blocks_a[0].shape[1],
                  blocks_v[0].shape[1])
    total = ll + la + lv
    means = [(ll * jnp.mean(l, axis=1) + la * jnp.mean(a, axis=1)
              + lv * jnp.mean(v, axis=1)) / total
             for l, a, v in zip(blocks_l, blocks_a, blocks_v)]
    maxes = [functools.reduce(jnp.maximum,
                              (seq_max(l), seq_max(a), seq_max(v)))
             for l, a, v in zip(blocks_l, blocks_a, blocks_v)]
    return jnp.concatenate(means + maxes, axis=1)
