"""Flash (online-softmax) attention kernel: parity against the einsum path
in interpret mode on CPU — forward, all input cotangents, whole-sequence vs
tiled variants, fallback routing, and the fully-masked-row regression that
motivated carrying m/l separately instead of a folded lse."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_emotion_processing_tpu.ops import flash_attention as fa
from multimodal_emotion_processing_tpu.ops.attention import scored_attention


def _inputs(b=2, lq=64, lkv=256, h=2, d=32, seed=0, dtype=jnp.float32,
            zero_row=False, no_mask=False):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, lq, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, lkv, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, lkv, d)), dtype)
    m = (rng.random((b, lkv)) > 0.3).astype(np.float32)
    if zero_row:
        m[0, :] = 0.0
    mask = None if no_mask else jnp.asarray(m, dtype)
    c = jnp.asarray([0.41], jnp.float32)
    w = jnp.asarray(rng.standard_normal((b, lq, d)), jnp.float32)
    return q, k, v, mask, c, w


def _grads(impl, q, k, v, mask, c, w, h, blocks=None):
    def loss(q, k, v, mask, c):
        if impl == "flash" and blocks:
            o, _ = fa.flash_scored_attention(q, k, v, mask, c, n_heads=h,
                                             block_q=blocks[0],
                                             block_kv=blocks[1])
        else:
            o, _ = scored_attention(q, k, v, mask, None, c, n_heads=h,
                                    impl=impl, emit_scores=False)
        return jnp.sum(o.astype(jnp.float32) * w)

    argnums = (0, 1, 2, 4) if mask is None else (0, 1, 2, 3, 4)
    val, grads = jax.value_and_grad(loss, argnums=argnums)(q, k, v, mask, c)
    return val, grads


def _assert_close(ref, got, rtol):
    for name, a, b in zip("q k v mask c".split(), ref, got):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(b / scale, a / scale, rtol=0, atol=rtol,
                                   err_msg=name)


@pytest.mark.parametrize("zero_row", [False, True])
@pytest.mark.parametrize("no_mask", [False, True])
def test_flash_whole_matches_einsum(zero_row, no_mask):
    q, k, v, mask, c, w = _inputs(zero_row=zero_row, no_mask=no_mask)
    vx, gx = _grads("xla", q, k, v, mask, c, w, 2)
    vf, gf = _grads("flash", q, k, v, mask, c, w, 2)
    assert abs(float(vx - vf)) / max(1.0, abs(float(vx))) < 1e-5
    _assert_close(gx, gf, 3e-6)


def test_flash_tiled_matches_einsum():
    # explicit blocks force the tiled (online-softmax) path with a
    # multi-block grid on BOTH axes
    q, k, v, mask, c, w = _inputs(lq=256, lkv=512)
    vx, gx = _grads("xla", q, k, v, mask, c, w, 2)
    vf, gf = _grads("flash", q, k, v, mask, c, w, 2, blocks=(64, 128))
    assert abs(float(vx - vf)) / max(1.0, abs(float(vx))) < 1e-5
    _assert_close(gx, gf, 3e-6)


def test_flash_tiled_zero_mask_row():
    # the lse = m + log(l) folding regression: with a fully-masked row,
    # m ≈ −1e8 (f32 ulp 8) rounds log(l) away — m and l must ride separately
    q, k, v, mask, c, w = _inputs(lq=128, lkv=256, zero_row=True)
    vx, gx = _grads("xla", q, k, v, mask, c, w, 2)
    vf, gf = _grads("flash", q, k, v, mask, c, w, 2, blocks=(64, 128))
    _assert_close(gx, gf, 3e-6)


def test_flash_bf16():
    q, k, v, mask, c, w = _inputs(lq=128, lkv=256, dtype=jnp.bfloat16)
    vx, gx = _grads("xla", q, k, v, mask, c, w, 2)
    vf, gf = _grads("flash", q, k, v, mask, c, w, 2)
    assert (jnp.result_type(q) == jnp.bfloat16)
    _assert_close(gx, gf, 5e-2)


def test_flash_lq_not_multiple_of_128():
    # Lq only needs a divisor block; Lkv carries the 128-multiple rule
    q, k, v, mask, c, w = _inputs(lq=100, lkv=256)
    vx, gx = _grads("xla", q, k, v, mask, c, w, 2)
    vf, gf = _grads("flash", q, k, v, mask, c, w, 2)
    _assert_close(gx, gf, 3e-6)


def test_flash_supported_predicate():
    m2 = jnp.ones((2, 256))
    m3 = jnp.ones((2, 64, 256))
    sprev = jnp.zeros((2, 2, 64, 256))
    assert fa.flash_supported(64, 256, m2, None, False)
    assert fa.flash_supported(64, 256, None, None, False)
    assert not fa.flash_supported(64, 256, m2, sprev, False)   # consumer
    assert not fa.flash_supported(64, 256, m2, None, True)     # emitted
    assert not fa.flash_supported(64, 256, m3, None, False)    # 3-D mask
    assert fa.flash_supported(64, 200, m2, None, False)  # kv padded exactly
    assert not fa.flash_supported(64, 256, m2, None, False, d_head=512)


def test_flash_impl_falls_back_where_unsupported():
    # impl='flash' must route unsupported calls (here: emitted scores) to
    # the einsum path and still return usable scores for the residual chain
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 200, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 200, 16)), jnp.float32)
    mask = jnp.ones((2, 200), jnp.float32)
    c = jnp.asarray([0.3], jnp.float32)
    ref = scored_attention(q, k, v, mask, None, c, n_heads=2, impl="xla",
                           emit_scores=True)
    got = scored_attention(q, k, v, mask, None, c, n_heads=2, impl="flash",
                           emit_scores=True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=1e-6, atol=1e-6)


def test_flash_full_model_parity():
    """A scale-preset-shaped tiny model (128-multiple lens so flash engages)
    end-to-end: logits + parameter grads match impl='xla'."""
    import dataclasses

    from multimodal_emotion_processing_tpu import configs
    from multimodal_emotion_processing_tpu.models import build_model

    exp = configs.get("mosei_trans")
    m = dataclasses.replace(exp.model, l_len=128, v_len=128, a_len=128,
                            dim=16, n_heads=2, l_dim=10, v_dim=7, a_dim=5)
    exp = dataclasses.replace(exp, model=m)
    model = build_model(exp)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b, p = 2, 2
    batch = {
        "l": jnp.asarray(rng.standard_normal((b, p, 128, 10)), jnp.float32),
        "v": jnp.asarray(rng.standard_normal((b, p, 128, 7)), jnp.float32),
        "a": jnp.asarray(rng.standard_normal((b, p, 128, 5)), jnp.float32),
        "l_mask": jnp.asarray((rng.random((b, p, 128)) > 0.2), jnp.float32),
        "v_mask": jnp.asarray((rng.random((b, p, 128)) > 0.2), jnp.float32),
        "a_mask": jnp.asarray((rng.random((b, p, 128)) > 0.2), jnp.float32),
    }

    def loss(params, impl):
        return jnp.sum(model.apply(params, batch, impl=impl) ** 2)

    lx, gx = jax.value_and_grad(loss)(params, "xla")
    lf, gf = jax.value_and_grad(loss)(params, "flash")
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    flat_x = jax.tree_util.tree_leaves(gx)
    flat_f = jax.tree_util.tree_leaves(gf)
    for a, b_ in zip(flat_x, flat_f):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(np.asarray(b_) / scale,
                                   np.asarray(a) / scale, rtol=0, atol=1e-5)


def test_scale_presets_default_flash():
    from multimodal_emotion_processing_tpu import configs

    for p in ("s256", "s512", "s1024"):
        assert configs.get(f"mosei_trans_{p}").model.attn_impl == "flash"
    # reference shapes keep xla (their kv lens are not 128-multiples)
    assert configs.get("mosei_trans").model.attn_impl == "xla"


def test_pipelines_resolve_config_attn_impl(monkeypatch, tmp_path):
    """run_experiment(impl=None) must resolve to the config's attn_impl —
    observed via a spy on the attention entry the blocks call."""
    from multimodal_emotion_processing_tpu import pipelines
    from multimodal_emotion_processing_tpu.models import layers
    from multimodal_emotion_processing_tpu.ops.attention import scored_attention

    seen = set()
    real = scored_attention

    def spy(*a, **kw):
        seen.add(kw.get("impl"))
        kw["impl"] = "xla"  # tiny lens aren't 128-multiples; run the oracle
        return real(*a, **kw)

    monkeypatch.setattr(layers, "scored_attention", spy)
    pipelines.run_experiment(
        "mosei_trans", synthetic_data=True, n_train=16, n_test=4,
        epochs=1, quiet=True, vmap_folds=False,
        overrides={"model": {"attn_impl": "flash", "l_len": 4, "v_len": 6,
                             "a_len": 8, "dim": 12, "n_heads": 2,
                             "l_dim": 10, "v_dim": 7, "a_dim": 5},
                   "train": {"batch_size": 4, "n_folds": 2}})
    assert seen == {"flash"}


def test_flash_padded_kv_matches_einsum():
    # reference-shape kv lens (not 128-multiples) ride zero-padding —
    # exact: padded keys underflow to 0.0 weight under the finite penalty
    q, k, v, mask, c, w = _inputs(lq=20, lkv=200, d=32)
    vx, gx = _grads("xla", q, k, v, mask, c, w, 2)
    vf, gf = _grads("flash", q, k, v, mask, c, w, 2)
    assert abs(float(vx - vf)) / max(1.0, abs(float(vx))) < 1e-5
    _assert_close(gx, gf, 3e-6)
