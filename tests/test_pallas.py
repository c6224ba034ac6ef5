"""Pallas fused attention (interpret mode on CPU): forward/backward parity
against the einsum reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_emotion_processing_tpu.ops.attention import scored_attention


def _inputs(b=2, lq=5, lkv=7, h=2, d=8, seed=0, with_mask=True, with_prev=True):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, lq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, lkv, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, lkv, d)).astype(np.float32))
    mask = None
    if with_mask:
        m = (rng.random((b, lkv)) > 0.3).astype(np.float32)
        m[:, 0] = 1.0
        mask = jnp.asarray(m)
    prev = (jnp.asarray(rng.standard_normal((b, h, lq, lkv)).astype(np.float32))
            if with_prev else None)
    c = jnp.asarray([0.41], jnp.float32)
    return q, k, v, mask, prev, c, h


@pytest.mark.parametrize("with_mask", [False, True])
@pytest.mark.parametrize("with_prev", [False, True])
def test_pallas_forward_matches_einsum(with_mask, with_prev):
    q, k, v, mask, prev, c, h = _inputs(with_mask=with_mask, with_prev=with_prev)
    ctx_x, s_x = scored_attention(q, k, v, mask, prev, c, n_heads=h, impl="xla")
    ctx_p, s_p = scored_attention(q, k, v, mask, prev, c, n_heads=h, impl="pallas")
    np.testing.assert_allclose(np.asarray(ctx_p), np.asarray(ctx_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x),
                               rtol=1e-5, atol=1e-2 if with_mask else 1e-5)


def test_pallas_backward_matches_einsum():
    q, k, v, mask, prev, c, h = _inputs()

    def make_loss(impl):
        def loss(q, k, v, prev, c):
            ctx1, s1 = scored_attention(q, k, v, mask, prev, c,
                                        n_heads=h, impl=impl)
            # chain a second hop so the score-residual gradient path is live
            ctx2, _ = scored_attention(ctx1, k, v, mask, s1, c,
                                       n_heads=h, impl=impl)
            return jnp.sum(ctx2 ** 2) + 0.1 * jnp.sum(ctx1 ** 2)
        return loss

    gx = jax.grad(make_loss("xla"), argnums=(0, 1, 2, 3, 4))(q, k, v, prev, c)
    gp = jax.grad(make_loss("pallas"), argnums=(0, 1, 2, 3, 4))(q, k, v, prev, c)
    names = ["dq", "dk", "dv", "dprev", "dc"]
    for n, a, b in zip(names, gx, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=n)


def test_pallas_full_model_parity():
    """Whole flagship forward with impl='pallas' matches impl='xla'."""
    import dataclasses
    from multimodal_emotion_processing_tpu import configs
    from multimodal_emotion_processing_tpu.models import build_model

    exp = configs.get("mosei_trans")
    m = dataclasses.replace(exp.model, l_len=4, v_len=6, a_len=8, dim=12,
                            n_heads=2, l_dim=5, v_dim=4, a_dim=3, n_layers=2)
    model = build_model(dataclasses.replace(exp, model=m))
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    b = 3
    batch = {
        "l": jnp.asarray(rng.standard_normal((b, 2, m.l_len, m.l_dim)).astype(np.float32)),
        "v": jnp.asarray(rng.standard_normal((b, 2, m.v_len, m.v_dim)).astype(np.float32)),
        "a": jnp.asarray(rng.standard_normal((b, 2, m.a_len, m.a_dim)).astype(np.float32)),
        "l_mask": jnp.asarray((rng.random((b, 2, m.l_len)) > 0.2).astype(np.float32)),
        "v_mask": jnp.asarray((rng.random((b, 2, m.v_len)) > 0.2).astype(np.float32)),
        "a_mask": jnp.asarray((rng.random((b, 2, m.a_len)) > 0.2).astype(np.float32)),
    }
    out_x = model.apply(params, batch, impl="xla")
    out_p = model.apply(params, batch, impl="pallas")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-4, atol=1e-4)
