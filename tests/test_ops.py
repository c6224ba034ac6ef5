"""Unit tests for core ops against numpy (and torch, where available) oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_emotion_processing_tpu.ops.attention import scored_attention
from multimodal_emotion_processing_tpu.ops.loss import zlpr_loss, symmetric_sigmoid_kl

import oracles


@pytest.mark.parametrize("mask_kind", ["none", "key", "full"])
@pytest.mark.parametrize("with_prev", [False, True])
def test_scored_attention_matches_oracle(mask_kind, with_prev):
    rng = np.random.default_rng(0)
    b, lq, lkv, h, d = 3, 5, 7, 2, 8
    q = rng.standard_normal((b, lq, d)).astype(np.float32)
    k = rng.standard_normal((b, lkv, d)).astype(np.float32)
    v = rng.standard_normal((b, lkv, d)).astype(np.float32)
    mask = None
    if mask_kind == "key":
        mask = (rng.random((b, lkv)) > 0.3).astype(np.float32)
        mask[:, 0] = 1.0  # at least one visible key
    elif mask_kind == "full":
        mask = (rng.random((b, lq, lkv)) > 0.3).astype(np.float32)
        mask[:, :, 0] = 1.0
    prev = rng.standard_normal((b, h, lq, lkv)).astype(np.float32) if with_prev else None
    c = np.array([0.37], dtype=np.float32)

    ctx, scores = scored_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        None if mask is None else jnp.asarray(mask),
        None if prev is None else jnp.asarray(prev),
        jnp.asarray(c), n_heads=h)
    ctx_o, scores_o = oracles.scored_attention(q, k, v, mask, prev, c, h)
    np.testing.assert_allclose(np.asarray(ctx), ctx_o, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(scores), scores_o, rtol=2e-4, atol=2e-1 if mask_kind != "none" else 2e-5)
    # masked positions carry the -1e8 penalty
    if mask_kind == "key":
        masked = np.asarray(scores)[:, 0][mask[:, None, :].repeat(lq, 1) == 0]
        assert (masked < -1e7).all()


def test_scored_attention_chain_double_masks():
    """Along a stream the emitted scores are post-mask; the next block re-masks,
    so padding positions accumulate penalties (reference quirk, SURVEY §7.3.1)."""
    rng = np.random.default_rng(1)
    b, l, h, d = 2, 4, 2, 8
    q = rng.standard_normal((b, l, d)).astype(np.float32)
    mask = np.ones((b, l), dtype=np.float32)
    mask[:, -1] = 0.0
    c = np.array([1.0], dtype=np.float32)
    _, s1 = scored_attention(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q),
                             jnp.asarray(mask), None, jnp.asarray(c), n_heads=h)
    _, s2 = scored_attention(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q),
                             jnp.asarray(mask), s1, jnp.asarray(c), n_heads=h)
    # with c=1: second-block padding score ≈ -2e8 (penalty applied twice)
    assert np.all(np.asarray(s2)[:, :, :, -1] < -1.9e8)


def test_zlpr_matches_oracle_and_torch():
    rng = np.random.default_rng(2)
    logits = (rng.standard_normal((16, 7)) * 3).astype(np.float32)
    labels = (rng.random((16, 7)) > 0.6).astype(np.int32)
    ours = np.asarray(zlpr_loss(jnp.asarray(logits), jnp.asarray(labels)))
    ref = oracles.zlpr_loss(logits, labels)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    torch = pytest.importorskip("torch")
    yp, yt = torch.tensor(logits), torch.tensor(labels.astype(np.float32))
    flipped = (1 - 2 * yt) * yp
    neg = torch.cat([flipped - yt * 1e12, torch.zeros_like(yp[..., :1])], dim=-1)
    pos = torch.cat([flipped - (1 - yt) * 1e12, torch.zeros_like(yp[..., :1])], dim=-1)
    t = (torch.logsumexp(neg, -1) + torch.logsumexp(pos, -1)).numpy()
    np.testing.assert_allclose(ours, t, rtol=1e-5, atol=1e-5)


def test_zlpr_all_negative_and_all_positive():
    logits = jnp.asarray(np.zeros((2, 4), np.float32))
    all_neg = np.asarray(zlpr_loss(logits, jnp.zeros((2, 4), jnp.int32)))
    all_pos = np.asarray(zlpr_loss(logits, jnp.ones((2, 4), jnp.int32)))
    # symmetric construction: logsumexp over 4 zeros + 1 zero each side
    expected = np.log(5.0) + np.log(1.0)
    np.testing.assert_allclose(all_neg, expected, rtol=1e-6)
    np.testing.assert_allclose(all_pos, expected, rtol=1e-6)


def test_symmetric_kl_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    logits = rng.standard_normal((8, 9)).astype(np.float32)
    ours = float(symmetric_sigmoid_kl(jnp.asarray(logits)))
    t = torch.tensor(logits)
    kl0 = F.kl_div(F.logsigmoid(t[::2]), torch.sigmoid(t[1::2]), reduction="batchmean")
    kl1 = F.kl_div(F.logsigmoid(t[1::2]), torch.sigmoid(t[::2]), reduction="batchmean")
    np.testing.assert_allclose(ours, float((kl0 + kl1) / 2), rtol=1e-5, atol=1e-6)


def test_scored_attention_grad_flows_through_score_chain():
    """The score residual must carry gradient back to earlier blocks."""
    rng = np.random.default_rng(4)
    b, l, h, d = 2, 4, 2, 8
    q = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
    c = jnp.asarray([0.5], dtype=jnp.float32)

    def f(x):
        _, s1 = scored_attention(x, x, x, None, None, c, n_heads=h)
        ctx, _ = scored_attention(x, x, x, None, s1, c, n_heads=h)
        return jnp.sum(ctx ** 2)

    g = jax.grad(f)(q)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_grid_mean_max_pool_matches_concat_form():
    """ops/pooling.grid_mean_max_pool (the selectable grid.SPLIT_POOL tail)
    equals mean_max_pool over the reference's [l, a, v] sequence concat of
    per-modality feature concats — values AND gradients."""
    from multimodal_emotion_processing_tpu.ops.pooling import (
        grid_mean_max_pool, mean_max_pool)

    rng = np.random.default_rng(7)
    b, d, n = 3, 5, 3
    ll, la, lv = 4, 7, 6
    bl = [jnp.asarray(rng.standard_normal((b, ll, d)).astype(np.float32))
          for _ in range(n)]
    ba = [jnp.asarray(rng.standard_normal((b, la, d)).astype(np.float32))
          for _ in range(n)]
    bv = [jnp.asarray(rng.standard_normal((b, lv, d)).astype(np.float32))
          for _ in range(n)]

    def concat_form(bl, ba, bv):
        lc = jnp.concatenate(bl, axis=2)
        ac = jnp.concatenate(ba, axis=2)
        vc = jnp.concatenate(bv, axis=2)
        return mean_max_pool(jnp.concatenate([lc, ac, vc], axis=1))

    want = concat_form(bl, ba, bv)
    got = grid_mean_max_pool(bl, ba, bv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

    w = jnp.asarray(rng.standard_normal(want.shape).astype(np.float32))
    g0 = jax.grad(lambda *xs: jnp.sum(concat_form(xs[:n], xs[n:2*n],
                                                  xs[2*n:]) * w))(*bl, *ba, *bv)
    g1 = jax.grad(lambda *xs: jnp.sum(grid_mean_max_pool(
        xs[:n], xs[n:2*n], xs[2*n:]) * w))(*bl, *ba, *bv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-5, atol=1e-6)


def test_grid_split_pool_flag_path_parity():
    """grid.SPLIT_POOL=True traces the split tail with identical model
    output (flagship-shaped tiny grid, unjitted apply per the flag's
    trace-time note)."""
    import dataclasses

    from multimodal_emotion_processing_tpu import configs
    from multimodal_emotion_processing_tpu.data.loader import Batcher
    from multimodal_emotion_processing_tpu.data.synthetic import (
        synthetic_dataset)
    from multimodal_emotion_processing_tpu.models import build_model, grid

    exp = configs.get("mosei_trans")
    exp = dataclasses.replace(exp, model=dataclasses.replace(
        exp.model, l_len=4, v_len=6, a_len=8, dim=12, n_heads=2,
        l_dim=5, v_dim=4, a_dim=3))
    model = build_model(exp)
    params = model.init(jax.random.PRNGKey(0))
    s = synthetic_dataset("mosei_trans", exp.model, 4, 0)
    batch = next(iter(Batcher(s, 4, shuffle=False, pad_final=False)()))
    assert grid.SPLIT_POOL is False  # measured default (ENGINEERING_NOTES)
    o0 = model.apply(params, batch)
    try:
        grid.SPLIT_POOL = True
        o1 = model.apply(params, batch)
    finally:
        grid.SPLIT_POOL = False
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               rtol=1e-5, atol=1e-6)
