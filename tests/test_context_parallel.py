"""Context-parallel attention vs single-device reference on a CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from multimodal_emotion_processing_tpu.ops.attention import scored_attention
from multimodal_emotion_processing_tpu.ops.context_parallel import scored_attention_cp


def _mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]), ("context",))


def _inputs(b=2, lq=8, lkv=16, h=2, d=8, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, lq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, lkv, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, lkv, d)).astype(np.float32))
    m = (rng.random((b, lkv)) > 0.3).astype(np.float32)
    m[:, 0] = 1.0
    prev = jnp.asarray(rng.standard_normal((b, h, lq, lkv)).astype(np.float32))
    c = jnp.asarray([0.37], jnp.float32)
    return q, k, v, jnp.asarray(m), prev, c, h


def test_cp_matches_single_device():
    q, k, v, m, prev, c, h = _inputs()
    ctx_ref, s_ref = scored_attention(q, k, v, m, prev, c, n_heads=h)
    ctx_cp, s_cp = scored_attention_cp(q, k, v, m, prev, c, n_heads=h,
                                       mesh=_mesh())
    np.testing.assert_allclose(np.asarray(ctx_cp), np.asarray(ctx_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_cp), np.asarray(s_ref),
                               rtol=1e-5, atol=1e-1)  # masked entries ~ -1e8


def test_cp_chained_blocks_match():
    """Score chaining across two CP blocks (sharded S handoff) equals the
    single-device chain."""
    q, k, v, m, prev, c, h = _inputs(seed=1)
    mesh = _mesh()

    ctx1, s1 = scored_attention(q, k, v, m, None, c, n_heads=h)
    ctx2_ref, s2_ref = scored_attention(ctx1, k, v, m, s1, c, n_heads=h)

    ctx1_cp, s1_cp = scored_attention_cp(q, k, v, m, None, c, n_heads=h, mesh=mesh)
    ctx2_cp, s2_cp = scored_attention_cp(ctx1_cp, k, v, m, s1_cp, c, n_heads=h,
                                         mesh=mesh)
    np.testing.assert_allclose(np.asarray(ctx2_cp), np.asarray(ctx2_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s2_cp), np.asarray(s2_ref),
                               rtol=1e-5, atol=1e-1)


def test_cp_no_mask_no_prev():
    q, k, v, _, _, c, h = _inputs(seed=2)
    ctx_ref, _ = scored_attention(q, k, v, None, None, c, n_heads=h)
    ctx_cp, _ = scored_attention_cp(q, k, v, None, None, c, n_heads=h,
                                    mesh=_mesh())
    np.testing.assert_allclose(np.asarray(ctx_cp), np.asarray(ctx_ref),
                               rtol=1e-5, atol=1e-5)


import pytest


@pytest.mark.parametrize("mode", ["psum", "ring"])
def test_model_impl_cp_long_sequence_matches_xla(mode):
    """The long-context scaling demo (SURVEY §5): an artificially long
    sequence (audio 8x the flagship kv budget) through the FULL flagship model
    with `impl='cp'` on the 8-device mesh equals the single-device forward.
    CP is selected like any other impl, under an ambient `cp_context`;
    both collective patterns (psum softmax / ring) are demoed."""
    import dataclasses

    from multimodal_emotion_processing_tpu import configs
    from multimodal_emotion_processing_tpu.models import build_model
    from multimodal_emotion_processing_tpu.ops import cp_context

    exp = configs.get("mosei_trans")
    m = dataclasses.replace(exp.model, l_len=8, v_len=16, a_len=8 * 200,
                            dim=24, n_heads=2, l_dim=5, v_dim=4, a_dim=3)
    exp = dataclasses.replace(exp, model=m)
    model = build_model(exp)
    params = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    b = 2
    batch = {
        "l": rng.standard_normal((b, 2, m.l_len, m.l_dim)).astype(np.float32),
        "v": rng.standard_normal((b, 2, m.v_len, m.v_dim)).astype(np.float32),
        "a": rng.standard_normal((b, 2, m.a_len, m.a_dim)).astype(np.float32),
        "l_mask": np.ones((b, 2, m.l_len), np.float32),
        "v_mask": np.ones((b, 2, m.v_len), np.float32),
        "a_mask": (rng.random((b, 2, m.a_len)) > 0.2).astype(np.float32),
    }
    out_ref = model.apply(params, batch, impl="xla")
    mesh = Mesh(np.asarray(jax.devices()), ("context",))
    with cp_context(mesh, mode=mode):
        # jit the whole forward: eager shard_map dispatches every collective
        # op-by-op (minutes on CPU); compiled it's one program
        out_cp = jax.jit(lambda p, b: model.apply(p, b, impl="cp"))(params, batch)
    np.testing.assert_allclose(np.asarray(out_cp), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-4)


def test_ring_attention_matches_single_device():
    """Ring CP (q-sharded, kv rotating via ppermute, online softmax) equals
    the single-device reference, including the emitted scores."""
    from multimodal_emotion_processing_tpu.ops.context_parallel import (
        ring_scored_attention)

    q, k, v, m, prev, c, h = _inputs(b=2, lq=8, lkv=16, h=2, d=8, seed=4)
    ctx_ref, s_ref = scored_attention(q, k, v, m, prev, c, n_heads=h)
    ctx_r, s_r = ring_scored_attention(q, k, v, m, prev, c, n_heads=h,
                                       mesh=_mesh())
    np.testing.assert_allclose(np.asarray(ctx_r), np.asarray(ctx_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_r), np.asarray(s_ref),
                               rtol=1e-5, atol=1e-1)  # masked entries ~ -1e8


def test_ring_attention_emit_scores_false_parity():
    """Terminal-block ring CP (emit_scores=False — flash semantics composed
    with the ring, VERDICT r4 item 8): the context must equal the
    score-emitting path exactly (the online-softmax math is unchanged; only
    the s_full accumulation is elided), scores must come back None, and a
    chained CONSUMER (scores_prev) must still work in the same call."""
    from multimodal_emotion_processing_tpu.ops.context_parallel import (
        ring_scored_attention)

    q, k, v, m, prev, c, h = _inputs(b=2, lq=8, lkv=16, h=2, d=8, seed=11)
    mesh = _mesh()
    run = jax.jit(lambda *a: ring_scored_attention(
        *a, n_heads=h, mesh=mesh, emit_scores=True))
    run_noemit = jax.jit(lambda *a: ring_scored_attention(
        *a, n_heads=h, mesh=mesh, emit_scores=False)[0])
    # with a consumed chain (prev) — the terminal block's real shape
    ctx_ref, _ = run(q, k, v, m, prev, c)
    ctx_ne = run_noemit(q, k, v, m, prev, c)
    np.testing.assert_allclose(np.asarray(ctx_ne), np.asarray(ctx_ref),
                               rtol=1e-6, atol=1e-6)
    # eager return contract: (ctx, None)
    _, s_none = ring_scored_attention(q, k, v, m, prev, c, n_heads=h,
                                      mesh=mesh, emit_scores=False)
    assert s_none is None
    # grads still flow without the score output
    g = jax.grad(lambda q_: jnp.sum(run_noemit(q_, k, v, m, prev, c) ** 2))(q)
    g_ref = jax.grad(
        lambda q_: jnp.sum(run(q_, k, v, m, prev, c)[0] ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_ring_attention_chained_and_grads():
    """Two chained ring blocks (q-sharded score handoff) match the reference
    in value and gradients — shard_map/ppermute are differentiable."""
    import jax.numpy as jnp

    from multimodal_emotion_processing_tpu.ops.context_parallel import (
        ring_scored_attention)

    q, k, v, m, prev, c, h = _inputs(b=2, lq=8, lkv=16, h=2, d=8, seed=5)
    mesh = _mesh()

    def loss(fn, **kw):
        def f(q, k, v, prev, c):
            ctx1, s1 = fn(q, k, v, m, None, c, n_heads=h, **kw)
            ctx2, _ = fn(ctx1, k, v, m, s1, c, n_heads=h, **kw)
            return jnp.sum(ctx2 ** 2) + 0.1 * jnp.sum(ctx1 ** 2)
        return f

    ref = loss(scored_attention)
    ring = loss(ring_scored_attention, mesh=mesh)
    np.testing.assert_allclose(float(ring(q, k, v, prev, c)),
                               float(ref(q, k, v, prev, c)), rtol=1e-5)
    g_ref = jax.grad(ref, argnums=(0, 1, 2, 4))(q, k, v, prev, c)
    g_ring = jax.grad(ring, argnums=(0, 1, 2, 4))(q, k, v, prev, c)
    for n_, a, b in zip(("dq", "dk", "dv", "dc"), g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=n_)


def test_ring_attention_rejects_indivisible():
    from multimodal_emotion_processing_tpu.ops.context_parallel import (
        ring_scored_attention)

    q, k, v, m, prev, c, h = _inputs(b=1, lq=6, lkv=16, h=2, d=8)
    import pytest

    with pytest.raises(ValueError, match="divisible"):
        ring_scored_attention(q, k, v, m, prev, c, n_heads=h, mesh=_mesh())


def test_impl_cp_requires_context():
    import pytest

    q, k, v, m, prev, c, h = _inputs()
    with pytest.raises(RuntimeError, match="cp_context"):
        scored_attention(q, k, v, m, prev, c, n_heads=h, impl="cp")


def test_ensure_cp_binding():
    """Entry-point helper: null for xla, binds a default all-device psum mesh
    for impl='cp' when none is active, and defers to an existing binding
    (so `--impl cp` works from the CLI without crashing at trace time)."""
    import contextlib

    from multimodal_emotion_processing_tpu.ops.context_parallel import (
        cp_context, current_cp, ensure_cp)

    assert isinstance(ensure_cp("xla"), contextlib.nullcontext)
    with ensure_cp("cp"):
        mesh, axis, mode = current_cp()
        assert axis == "context" and mode == "psum"
        assert mesh.devices.size == len(jax.devices())
        # an active binding wins: ensure_cp must not stack a second one
        with ensure_cp("cp"):
            assert current_cp()[0] is mesh
    ring_mesh = _mesh(2)
    with cp_context(ring_mesh, mode="ring"):
        with ensure_cp("cp"):
            assert current_cp() == (ring_mesh, "context", "ring")


def test_psum_cp_grads_match_single_device():
    """psum-mode CP gradients equal the einsum oracle's (chained blocks).
    Regression: the softmax stabilizer pmax has no differentiation rule, so
    it must sit behind stop_gradient (exact — softmax is shift-invariant);
    before that fix, `train --impl cp` crashed at trace time."""
    import jax.numpy as jnp

    from multimodal_emotion_processing_tpu.ops.context_parallel import (
        scored_attention_cp)

    q, k, v, m, prev, c, h = _inputs(b=2, lq=8, lkv=16, h=2, d=8, seed=9)
    mesh = _mesh()

    def loss(fn, **kw):
        def f(q, k, v, prev, c):
            ctx1, s1 = fn(q, k, v, m, None, c, n_heads=h, **kw)
            ctx2, _ = fn(ctx1, k, v, m, s1, c, n_heads=h, **kw)
            return jnp.sum(ctx2 ** 2) + 0.1 * jnp.sum(ctx1 ** 2)
        return jax.jit(f)

    ref = loss(scored_attention)
    cp = loss(scored_attention_cp, mesh=mesh)
    g_ref = jax.grad(ref, argnums=(0, 1, 2, 4))(q, k, v, prev, c)
    g_cp = jax.grad(cp, argnums=(0, 1, 2, 4))(q, k, v, prev, c)
    for n_, a, b in zip(("dq", "dk", "dv", "dc"), g_ref, g_cp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=n_)


def test_psum_cp_pads_indivisible_kv():
    """psum mode keeps its any-sequence-length contract on any device count:
    Lkv not divisible by the mesh axis is zero-padded (mask-0 keys, exact
    under the -1e8 penalty) and the emitted scores are sliced back."""
    q, k, v, m, prev, c, h = _inputs(b=2, lq=8, lkv=10, h=2, d=8, seed=11)
    mesh = _mesh(4)  # 10 % 4 != 0
    ctx_ref, s_ref = scored_attention(q, k, v, m, prev, c, n_heads=h)
    ctx_cp, s_cp = jax.jit(lambda *a: scored_attention_cp(
        *a, n_heads=h, mesh=mesh))(q, k, v, m, prev, c)
    assert s_cp.shape == s_ref.shape
    np.testing.assert_allclose(np.asarray(ctx_cp), np.asarray(ctx_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_cp), np.asarray(s_ref),
                               rtol=2e-5, atol=2e-5)


def test_cp_through_vmapped_experiment_driver():
    """`run_experiment(impl='cp')` end-to-end on the default (vmapped)
    driver: the context-parallel attention traces inside the fold-vmap on
    the 8-device mesh and the experiment completes with a report."""
    from multimodal_emotion_processing_tpu.pipelines import run_experiment

    res = run_experiment(
        "mosei_trans", synthetic_data=True, n_train=24, n_test=8, epochs=1,
        quiet=True, impl="cp",
        overrides={"model": {"l_len": 4, "v_len": 6, "a_len": 8, "dim": 12,
                             "n_heads": 2, "l_dim": 5, "v_dim": 4,
                             "a_dim": 3},
                   "train": {"n_folds": 2, "batch_size": 8}})
    assert len(res.fold_histories) == 2
    assert res.report is not None and "macro_f1" in res.report
