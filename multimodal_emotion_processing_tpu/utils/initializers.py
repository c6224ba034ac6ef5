"""Parameter initializers matching the reference's (PyTorch-default) distributions.

The reference relies on torch defaults everywhere: Linear/Conv1d use
kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weights and
the same bound for biases; LayerNorm is ones/zeros; nn.Embedding is N(0,1);
the transition tensors use torch.rand == U[0,1) (cmu-mosei/run.py:326); the
residual-attention gates a/b/c start at 0 (others/realformer.py:169-171).

Weights are stored transposed relative to torch: Linear kernels are (in, out)
so application is `x @ W` (the natural MXU layout).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def linear(key, fan_in: int, fan_out: int, *, bias: bool = False, dtype=jnp.float32):
    """torch.nn.Linear default init; kernel shape (fan_in, fan_out)."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    wkey, bkey = jax.random.split(key)
    p = {"w": jax.random.uniform(wkey, (fan_in, fan_out), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(bkey, (fan_out,), dtype, -bound, bound)
    return p


def layer_norm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def embedding(key, n: int, dim: int, dtype=jnp.float32):
    """torch.nn.Embedding default init: N(0, 1)."""
    return {"table": jax.random.normal(key, (n, dim), dtype)}


def uniform01(key, shape, dtype=jnp.float32):
    """torch.rand: U[0, 1)."""
    return jax.random.uniform(key, shape, dtype, 0.0, 1.0)


def scalar_zero(dtype=jnp.float32):
    """Learned scalar gate initialized to 0 (shape (1,) like torch.FloatTensor([0]))."""
    return jnp.zeros((1,), dtype)


def apply_linear(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def apply_layer_norm(p, x, eps: float = 1e-5):
    """LayerNorm over the last axis, torch semantics (biased variance, eps inside sqrt)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
