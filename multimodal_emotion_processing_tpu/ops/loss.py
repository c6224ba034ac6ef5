"""Losses: ZLPR multi-label "circle" loss and the Ren-MME R-Drop consistency KL.

ZLPR is byte-identical math across all five reference scripts
(cmu-mosei/run.py:342-351, rencecps/run.py:151-160, Ren-MME/run.py:295-304,
others/realformer.py:289-298, robot_demo.py:444-453): flip logits by label,
knock out the wrong side with -1e12, append a zero logit to each side, and sum
the two logsumexps.  It is threshold-free for multi-label training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_KNOCKOUT = 1e12


def zlpr_loss(y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
    """Per-sample ZLPR loss; y_pred (..., E) float logits, y_true (..., E) {0,1}.

    Returns (...,) — the reference leaves reduction to the caller
    (`.mean()` in the trainer, `(loss*mask).mean()` for realformer clips).
    """
    y_true = y_true.astype(y_pred.dtype)
    flipped = (1.0 - 2.0 * y_true) * y_pred
    neg = flipped - y_true * _KNOCKOUT
    pos = flipped - (1.0 - y_true) * _KNOCKOUT
    zeros = jnp.zeros_like(y_pred[..., :1])
    neg = jnp.concatenate([neg, zeros], axis=-1)
    pos = jnp.concatenate([pos, zeros], axis=-1)
    return jax.scipy.special.logsumexp(neg, axis=-1) + jax.scipy.special.logsumexp(
        pos, axis=-1
    )


def symmetric_sigmoid_kl(logits: jnp.ndarray, pair_weight=None) -> jnp.ndarray:
    """Ren-MME R-Drop consistency term (Ren-MME/run.py:332-334).

    The loader emits every sample twice (Ren-MME/run.py:143-146); dropout makes
    the two forwards stochastic.  The reference computes

        kl_0 = F.kl_div(logsigmoid(logits[::2]), sigmoid(logits[1::2]), 'batchmean')
        kl_1 = F.kl_div(logsigmoid(logits[1::2]), sigmoid(logits[::2]), 'batchmean')
        loss += (kl_0 + kl_1) / 2

    torch's kl_div(input=log q, target=p, 'batchmean') is
    sum(p * (log p - log q)) / first_dim — replicated exactly, including the
    element-wise (not distribution-normalized) sigmoid "probabilities".

    `pair_weight` (n_pairs,): 1 for real duplicate pairs, 0 for batch padding —
    the weighted form equals the reference on unpadded batches.
    """
    a = logits[::2]
    b = logits[1::2]

    def kl(log_q_logits, p_logits):
        log_q = jax.nn.log_sigmoid(log_q_logits)
        p = jax.nn.sigmoid(p_logits)
        # p*log(p) with p in (0,1); guard log(0) exactly like torch's xlogy
        plogp = jnp.where(p > 0, p * jnp.log(jnp.maximum(p, 1e-38)), 0.0)
        elem = plogp - p * log_q
        if pair_weight is None:
            return jnp.sum(elem) / log_q_logits.shape[0]
        return jnp.sum(elem * pair_weight[:, None]) / jnp.maximum(
            jnp.sum(pair_weight), 1.0)

    return (kl(a, b) + kl(b, a)) / 2.0
