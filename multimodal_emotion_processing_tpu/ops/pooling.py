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
    idx = jnp.argmax(x, axis=1)  # (B, D)
    out = jnp.take_along_axis(x, idx[:, None, :], axis=1)[:, 0, :]
    return out, (idx, x.shape[1])


def _bwd(res, g):
    idx, t = res
    onehot = jax.nn.one_hot(idx, t, axis=1, dtype=g.dtype)  # (B, T, D)
    return (onehot * g[:, None, :],)


seq_max.defvjp(_fwd, _bwd)


def mean_max_pool(x: jnp.ndarray) -> jnp.ndarray:
    """concat[mean_seq, max_seq] — the grid's pooling (cmu-mosei/run.py:318)."""
    return jnp.concatenate([jnp.mean(x, axis=1), seq_max(x)], axis=1)
