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


@pytest.mark.parametrize("with_prev", [False, True])
def test_emit_scores_false_matches_xla(with_prev):
    """The lean terminal-block variants (no scores output, and no S_prev input
    when None) must match the xla path in value AND gradients — their VJPs
    recompute scores instead of storing them."""
    q, k, v, mask, prev, c, h = _inputs(with_prev=with_prev)

    def loss(impl):
        def f(q, k, v, c):
            ctx, s = scored_attention(q, k, v, mask, prev, c, n_heads=h,
                                      impl=impl, emit_scores=(impl == "xla"))
            if impl == "pallas":
                assert s is None
            return jnp.sum(ctx ** 2)
        return f

    ctx_x, _ = scored_attention(q, k, v, mask, prev, c, n_heads=h, impl="xla")
    ctx_p, s_p = scored_attention(q, k, v, mask, prev, c, n_heads=h,
                                  impl="pallas", emit_scores=False)
    assert s_p is None
    np.testing.assert_allclose(np.asarray(ctx_p), np.asarray(ctx_x),
                               rtol=1e-5, atol=1e-5)
    gx = jax.grad(loss("xla"), argnums=(0, 1, 2, 3))(q, k, v, c)
    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2, 3))(q, k, v, c)
    for n, a, b in zip(("dq", "dk", "dv", "dc"), gx, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=n)


def _block_params(d=8, seed=5):
    from multimodal_emotion_processing_tpu.models import layers

    return layers.init_block_minus(jax.random.PRNGKey(seed), d)


@pytest.mark.parametrize("with_mask", [False, True])
@pytest.mark.parametrize("with_prev", [False, True])
def test_fused_minus_block_forward(with_mask, with_prev):
    """The whole-block fused kernel equals apply_block_minus (xla)."""
    from multimodal_emotion_processing_tpu.models import layers

    q, k, v, mask, prev, c, h = _inputs(with_mask=with_mask, with_prev=with_prev)
    p = _block_params(d=q.shape[-1])
    out_x, s_x = layers.apply_block_minus(p, q, k, v, mask, prev, n_heads=h,
                                          rate=0.0, rng=None, train=False,
                                          impl="xla")
    out_f, s_f = layers.apply_block_minus(p, q, k, v, mask, prev, n_heads=h,
                                          rate=0.0, rng=None, train=False,
                                          impl="pallas_fused")
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_x),
                               rtol=1e-5, atol=1e-2 if with_mask else 1e-5)


def test_fused_minus_block_backward():
    """Chained fused blocks (score handoff live) gradients vs the xla path,
    including the epilogue weight grads."""
    from multimodal_emotion_processing_tpu.models import layers

    q, k, v, mask, prev, c, h = _inputs()
    p = _block_params(d=q.shape[-1])

    def make_loss(impl):
        def loss(p, q, k, v, prev):
            o1, s1 = layers.apply_block_minus(p, q, k, v, mask, prev,
                                              n_heads=h, rate=0.0, rng=None,
                                              train=False, impl=impl)
            o2, _ = layers.apply_block_minus(p, o1, k, v, mask, s1,
                                             n_heads=h, rate=0.0, rng=None,
                                             train=False, impl=impl)
            return jnp.sum(o2 ** 2) + 0.1 * jnp.sum(o1 ** 2)
        return loss

    gx = jax.grad(make_loss("xla"), argnums=(0, 1, 2, 3, 4))(p, q, k, v, prev)
    gf = jax.grad(make_loss("pallas_fused"), argnums=(0, 1, 2, 3, 4))(p, q, k, v, prev)
    for a, b in zip(jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-4, atol=3e-4)


def test_fused_minus_block_dropout_fallback():
    """Active dropout must fall back (fused kernel has no RNG) yet stay
    deterministic per rng: fused-impl call equals the plain pallas path."""
    from multimodal_emotion_processing_tpu.models import layers

    q, k, v, mask, prev, c, h = _inputs(seed=9)
    p = _block_params(d=q.shape[-1])
    rng = jax.random.PRNGKey(11)
    out_f, _ = layers.apply_block_minus(p, q, k, v, mask, prev, n_heads=h,
                                        rate=0.3, rng=rng, train=True,
                                        impl="pallas_fused")
    out_p, _ = layers.apply_block_minus(p, q, k, v, mask, prev, n_heads=h,
                                        rate=0.3, rng=rng, train=True,
                                        impl="pallas")
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_fused_full_model_parity():
    """Whole flagship forward with impl='pallas_fused' matches impl='xla'."""
    import dataclasses
    from multimodal_emotion_processing_tpu import configs
    from multimodal_emotion_processing_tpu.models import build_model

    exp = configs.get("mosei_trans")
    m = dataclasses.replace(exp.model, l_len=4, v_len=6, a_len=8, dim=12,
                            n_heads=2, l_dim=5, v_dim=4, a_dim=3, n_layers=2)
    model = build_model(dataclasses.replace(exp, model=m))
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(4)
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
    out_f = model.apply(params, batch, impl="pallas_fused")
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
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


def test_pallas_bf16_inputs():
    """The compute_dtype='bfloat16' path feeds bf16 q/k/v into the kernel —
    the MXU's f32 accumulation must cast back at the ctx store (regression:
    crashed with 'Invalid dtype for swap')."""
    q, k, v, mask, prev, c, h = _inputs()
    bf = lambda x: x.astype(jnp.bfloat16)
    ctx_p, s_p = scored_attention(bf(q), bf(k), bf(v), bf(mask), prev, bf(c),
                                  n_heads=h, impl="pallas")
    assert ctx_p.dtype == jnp.bfloat16
    ctx_x, s_x = scored_attention(bf(q), bf(k), bf(v), bf(mask), prev, bf(c),
                                  n_heads=h, impl="xla")
    np.testing.assert_allclose(np.asarray(ctx_p, np.float32),
                               np.asarray(ctx_x, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_bf16_pallas_train_step():
    """compute_dtype='bfloat16' + impl='pallas' end to end: the combination
    the kernel's store-cast fix enables (a bf16 batch reaches the kernel
    through the whole jitted train step)."""
    import dataclasses

    from multimodal_emotion_processing_tpu import configs
    from multimodal_emotion_processing_tpu.data.loader import Batcher
    from multimodal_emotion_processing_tpu.data.synthetic import synthetic_dataset
    from multimodal_emotion_processing_tpu.models import build_model
    from multimodal_emotion_processing_tpu.train import engine as eng

    exp = configs.get("mosei_trans")
    exp = dataclasses.replace(
        exp,
        model=dataclasses.replace(exp.model, l_len=4, v_len=6, a_len=8,
                                  dim=16, n_heads=2, l_dim=5, v_dim=4,
                                  a_dim=3),
        train=dataclasses.replace(exp.train, batch_size=4,
                                  compute_dtype="bfloat16"))
    model = build_model(exp)
    tx, step = eng.make_train_step(model, exp.train, impl="pallas",
                                   donate=False)
    state = eng.init_state(model, tx, seed=0)
    batch = next(iter(Batcher(synthetic_dataset("mosei_trans", exp.model, 4),
                              4)()))
    losses = []
    for _ in range(6):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("with_prev", [False, True])
@pytest.mark.parametrize("emit", [False, True])
def test_fused_backward_kernel_matches_einsum(with_prev, emit):
    """bwd_impl='pallas' (the fused dS->dQ/dK/dV kernel, VERDICT r2 #7) must
    produce the same gradients as the einsum recompute path for all four
    forward variants, including dS_prev, dc, and the mask cotangent."""
    from multimodal_emotion_processing_tpu.ops.pallas_attention import (
        scored_attention_pallas)

    q, k, v, mask, prev, c, h = _inputs(with_prev=with_prev, seed=9)

    def make_loss(bwd):
        def loss(q, k, v, prev, c):
            out = scored_attention_pallas(
                q, k, v, mask, prev if with_prev else None, c, n_heads=h,
                emit_scores=emit, bwd_impl=bwd)
            ctx, s = out
            l = jnp.sum(jnp.sin(ctx))
            if emit and s is not None:
                l = l + jnp.sum(jnp.cos(0.01 * s))
            return l
        return loss

    args = (q, k, v, prev, c)
    g_e = jax.grad(make_loss("einsum"), argnums=(0, 1, 2, 3, 4)
                   if with_prev else (0, 1, 2, 4))(*args)
    g_p = jax.grad(make_loss("pallas"), argnums=(0, 1, 2, 3, 4)
                   if with_prev else (0, 1, 2, 4))(*args)
    for i, (a, b) in enumerate(zip(g_e, g_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5, err_msg=f"arg {i}")


def test_vmem_fit_predicate_calibration():
    """_one_sample_vmem_bytes must separate the observed compile-OOM point
    (f32 dim-1024 16-head 512x512 lean: scoped alloc 19.16 MB > 16 MB limit)
    from the largest shapes that are known to compile (s512 f32, s1024 bf16
    scaling points) — the calibration that backs the einsum fallback."""
    from multimodal_emotion_processing_tpu.ops.pallas_attention import (
        _SCOPED_VMEM_LIMIT, _one_sample_vmem_bytes)

    # the failing point: must be rejected
    assert _one_sample_vmem_bytes(512, 512, 1024, 16, False, False, 4) \
        > _SCOPED_VMEM_LIMIT
    # known-good points: must be accepted
    assert _one_sample_vmem_bytes(512, 512, 512, 8, False, False, 4) \
        <= _SCOPED_VMEM_LIMIT          # s512 f32
    assert _one_sample_vmem_bytes(512, 512, 1024, 16, False, False, 2) \
        <= _SCOPED_VMEM_LIMIT          # dim-1024 16-head bf16 (round-3 s1024)
    assert _one_sample_vmem_bytes(200, 200, 96, 6, True, True, 4) \
        <= _SCOPED_VMEM_LIMIT          # flagship largest stream, emit+sprev


def test_vmem_overflow_falls_back_to_einsum():
    """Shapes whose ONE-sample VMEM working set exceeds the scoped limit must
    run (via the XLA einsum fallback) instead of failing to compile, and
    match the xla path exactly."""
    rng = np.random.default_rng(23)
    b, lq, lkv, d, h = 1, 512, 512, 1024, 16  # the observed compile-OOM shape
    from multimodal_emotion_processing_tpu.ops import pallas_attention as pa

    assert pa._one_sample_vmem_bytes(lq, lkv, d, h, False, False, 4) \
        > pa._SCOPED_VMEM_LIMIT
    q = jnp.asarray(rng.standard_normal((b, lq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, lkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, lkv, d)), jnp.float32)
    mask = jnp.ones((b, lkv), jnp.float32)
    c = jnp.asarray([0.3], jnp.float32)
    ctx_p, _ = pa.scored_attention_pallas(q, k, v, mask, None, c, n_heads=h,
                                          emit_scores=False)
    ctx_x, _ = scored_attention(q, k, v, mask, None, c, n_heads=h, impl="xla")
    np.testing.assert_allclose(np.asarray(ctx_p), np.asarray(ctx_x),
                               rtol=1e-6, atol=1e-6)


def test_bwd_vmem_overflow_downgrades_to_einsum(monkeypatch):
    """A shape whose FORWARD fits scoped VMEM but whose fused BACKWARD would
    not (512x512 d=512 f32 lean) must silently downgrade bwd_impl='pallas'
    to the einsum VJP instead of failing the backward compile."""
    from multimodal_emotion_processing_tpu.ops import pallas_attention as pa

    lq = lkv = 512
    d, h = 512, 8
    assert pa._one_sample_vmem_bytes(lq, lkv, d, h, False, False, 4) \
        <= pa._SCOPED_VMEM_LIMIT
    assert pa._one_sample_vmem_bytes_bwd(lq, lkv, d, h, False, False, 4) \
        > pa._SCOPED_VMEM_LIMIT

    seen = {}
    real = pa._make

    def spy(n_heads, has_sprev, emit, bwd_impl="einsum"):
        seen["bwd"] = bwd_impl
        return real(n_heads, has_sprev, emit, bwd_impl)

    monkeypatch.setattr(pa, "_make", spy)
    rng = np.random.default_rng(31)
    q = jnp.asarray(rng.standard_normal((1, lq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, lkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, lkv, d)), jnp.float32)
    mask = jnp.ones((1, lkv), jnp.float32)
    c = jnp.asarray([0.3], jnp.float32)
    pa.scored_attention_pallas(q, k, v, mask, None, c, n_heads=h,
                               emit_scores=False, bwd_impl="pallas")
    assert seen["bwd"] == "einsum"
    # a small shape keeps the explicit request
    q2, k2, v2 = (x[:, :8, :96] for x in (q, k, v))
    pa.scored_attention_pallas(q2, k2, v2, mask[:, :8], None, c, n_heads=2,
                               emit_scores=False, bwd_impl="pallas")
    assert seen["bwd"] == "pallas"
