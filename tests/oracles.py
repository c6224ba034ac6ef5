"""Numpy oracles for the reference math, written independently from first
principles (the reference's documented semantics), used to verify the JAX ops.
"""

import numpy as np


def softmax(x, axis=-1):
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / np.sum(e, axis=axis, keepdims=True)


def scored_attention(q, k, v, mask, scores_prev, c, n_heads):
    """Residual-score MHA oracle. q (B,Lq,D), k/v (B,Lkv,D), mask (B,Lkv) or
    (B,Lq,Lkv) or None; returns (ctx (B,Lq,D), masked scores (B,H,Lq,Lkv))."""
    b, lq, d = q.shape
    lkv = k.shape[1]
    dh = d // n_heads

    def split(x):
        return x.reshape(x.shape[0], x.shape[1], n_heads, dh).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    scores = np.matmul(qh, kh.transpose(0, 1, 3, 2)) / np.sqrt(dh)
    if scores_prev is not None:
        scores = scores + c * scores_prev
    if mask is not None:
        if mask.ndim == 2:
            mb = mask[:, None, None, :]
        else:
            mb = np.repeat(mask[:, None, :, :], n_heads, axis=1)
        scores = scores - 1e8 * (1.0 - mb)
    att = softmax(scores, axis=-1)
    ctx = np.matmul(att, vh).transpose(0, 2, 1, 3).reshape(b, lq, d)
    return ctx, scores


def zlpr_loss(y_pred, y_true):
    """Multi-label circle (ZLPR) loss oracle; returns per-sample loss."""
    y_true = y_true.astype(np.float64)
    y_pred = y_pred.astype(np.float64)
    flipped = (1 - 2 * y_true) * y_pred
    neg = flipped - y_true * 1e12
    pos = flipped - (1 - y_true) * 1e12
    zeros = np.zeros_like(y_pred[..., :1])
    neg = np.concatenate([neg, zeros], axis=-1)
    pos = np.concatenate([pos, zeros], axis=-1)

    def lse(x):
        m = np.max(x, axis=-1, keepdims=True)
        return (m + np.log(np.sum(np.exp(x - m), axis=-1, keepdims=True)))[..., 0]

    return lse(neg) + lse(pos)


def layer_norm(x, scale, bias, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def rank3_transition(trans, last, this):
    """Reference per-sample loop semantics: temp = last[i] @ trans (E,E);
    out = this[i] @ temp (E,)."""
    b, e = this.shape
    out = np.zeros((b, e), dtype=np.float64)
    for i in range(b):
        temp = np.einsum("e,geh->gh", last[i], trans)
        out[i] = np.einsum("g,gh->h", this[i], temp)
    return out
