"""Multi-device sharding tests on the 8-device virtual CPU mesh: sharded step
equivalence vs single-device, TP spec compiles, graft entry dry-run."""

import pytest

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_emotion_processing_tpu import configs
from multimodal_emotion_processing_tpu.models import build_model
from multimodal_emotion_processing_tpu.parallel import (
    make_mesh, batch_sharding, make_sharded_train_step)
from multimodal_emotion_processing_tpu.train import engine as eng


def _tiny_exp():
    exp = configs.get("mosei_trans")
    m = dataclasses.replace(exp.model, l_len=4, v_len=6, a_len=8, dim=24,
                            n_heads=2, l_dim=10, v_dim=7, a_dim=5)
    return dataclasses.replace(exp, model=m)


def _batch(m, b, seed=0):
    r = np.random.default_rng(seed)
    return {
        "l": r.standard_normal((b, 2, m.l_len, m.l_dim)).astype(np.float32),
        "v": r.standard_normal((b, 2, m.v_len, m.v_dim)).astype(np.float32),
        "a": r.standard_normal((b, 2, m.a_len, m.a_dim)).astype(np.float32),
        "l_mask": np.ones((b, 2, m.l_len), np.float32),
        "v_mask": np.ones((b, 2, m.v_len), np.float32),
        "a_mask": np.ones((b, 2, m.a_len), np.float32),
        "label": (r.random((b, 7)) > 0.7).astype(np.int32),
    }


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dp_step_matches_single_device():
    """Sharded-vs-single-device equivalence in float64 (separates sharding
    bugs from float reassociation noise).  Historical note: before
    ops/pooling.seq_max, XLA's equality-based max VJP misrouted gradients
    under rematerialized reductions, showing up here as O(1e-2) 'noise'."""
    exp = _tiny_exp()
    model = build_model(exp)

    with jax.enable_x64():
        batch = jax.tree.map(
            lambda x: x.astype(np.float64) if x.dtype == np.float32 else x,
            _batch(exp.model, b=16))
        tx, _ = eng.make_train_step(model, exp.train, donate=False)
        s = eng.init_state(model, tx, seed=0)
        params = jax.tree.map(lambda x: np.asarray(x, np.float64), s.params)

        def loss_of(p, b):
            return eng.batch_loss(model, exp.train, p, b, None, False, "xla")

        def grads_of(p, b):
            return jax.grad(loss_of)(p, b)

        loss1 = jax.jit(loss_of)(params, batch)
        g1 = jax.jit(grads_of)(params, batch)

        mesh = make_mesh(n_data=8, n_model=1)
        sharded = jax.device_put(batch, batch_sharding(mesh, batch))
        loss8 = jax.jit(loss_of)(params, sharded)
        g8 = jax.jit(grads_of)(params, sharded)

        np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-12)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g8)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-8, atol=1e-10)


def test_tp_gradients_match_replicated():
    """4x2 dp+tp mesh gradients equal the single-device gradients (f64)."""
    exp = _tiny_exp()
    model = build_model(exp)
    with jax.enable_x64():
        batch = jax.tree.map(
            lambda x: x.astype(np.float64) if x.dtype == np.float32 else x,
            _batch(exp.model, b=8))
        tx, _ = eng.make_train_step(model, exp.train, donate=False)
        s = eng.init_state(model, tx, seed=0)
        params = jax.tree.map(lambda x: np.asarray(x, np.float64), s.params)

        def grads_of(p, b):
            return jax.grad(lambda q: eng.batch_loss(
                model, exp.train, q, b, None, False, "xla"))(p)

        g_ref = jax.jit(grads_of)(params, batch)

        from multimodal_emotion_processing_tpu.parallel import shard_params

        mesh = make_mesh(n_data=4, n_model=2)
        sharded_params = shard_params(mesh, params, tp=True)
        sharded_batch = jax.device_put(batch, batch_sharding(mesh, batch))
        g_tp = jax.jit(grads_of)(sharded_params, sharded_batch)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_tp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-8, atol=1e-10)


def test_process_batch_slice_partitions_global_batch():
    """Per-host batch slicing for multi-process pods: slices tile the global
    batch exactly once (single-process here, so the identity slice)."""
    from multimodal_emotion_processing_tpu.parallel.mesh import process_batch_slice

    sl = process_batch_slice(32)
    assert sl == slice(0, 32)  # 1 process owns the whole batch
    # the formula partitions for any process count
    per = 32 // 4
    slices = [slice(i * per, (i + 1) * per) for i in range(4)]
    covered = [j for s in slices for j in range(s.start, s.stop)]
    assert covered == list(range(32))


def test_tp_spec_shards_classifier_input_axis():
    """The classifier kernel must shard P('model', None) — its input axis —
    and the sharded classifier grads must still match (f64)."""
    from jax.sharding import PartitionSpec as P

    from multimodal_emotion_processing_tpu.parallel import tp_param_spec

    exp = _tiny_exp()
    model = build_model(exp)
    params = model.init(jax.random.PRNGKey(0))
    specs = tp_param_spec(params, enable=True)
    cls = specs["stimulation"]["classifier"]["w"]
    assert cls == P("model", None)
    # minus blocks (no QKV projections, replicated context): COLUMN-parallel
    # proj feeds the row-parallel minus with one psum
    assert specs["stimulation"]["blocks"]["ll"][0]["proj"]["w"] == P(None, "model")

    # realformer blocks project Q/K/V, so their context is head-sharded and
    # proj is ROW-parallel (local contraction + one psum, no context gather)
    rexp = configs.get("mosei_realformer")
    rm = dataclasses.replace(rexp.model, l_len=4, v_len=4, a_len=4, dim=24,
                             n_heads=2, l_dim=10, v_dim=7, a_dim=5, p_len=2)
    rmodel = build_model(dataclasses.replace(rexp, model=rm))
    rspecs = tp_param_spec(rmodel.init(jax.random.PRNGKey(1)), enable=True)
    rblocks = rspecs["feature"]["blocks"]["ll"][0]
    assert rblocks["wq"]["w"] == P(None, "model")
    assert rblocks["proj"]["w"] == P("model", None)
    # and the classifier's input axis divides the model-axis size
    assert params["stimulation"]["classifier"]["w"].shape[0] % 2 == 0


def test_dp_tp_step_runs():
    exp = _tiny_exp()
    model = build_model(exp)
    mesh = make_mesh(n_data=4, n_model=2)
    tx, step, place = make_sharded_train_step(model, exp.train, mesh, tp=True)
    state = place(eng.init_state(model, tx, seed=0))
    batch = jax.device_put(_batch(exp.model, b=8),
                           batch_sharding(mesh, _batch(exp.model, b=8)))
    state, loss = step(state, batch)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_forward_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, (params, batch) = ge.entry()
    out = jax.jit(fn)(params, batch)
    assert out.shape == (64, 7)
    assert np.isfinite(np.asarray(out)).all()
