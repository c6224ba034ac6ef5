"""Half-width H2D wire format (`transfer_dtype`).

The loader may cast float32 batch leaves to float16/bfloat16 for the
host->device transfer (and for the device-resident HBM staging); the jitted
steps restore float32 in-graph before any math (engine.upcast_wire).  The
contract under test: the wire format is a BYTE optimization, not a compute
dtype — with float16-representable inputs every driver's trajectory is
unchanged, and with arbitrary inputs only the documented ~1e-3 feature
rounding enters.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from multimodal_emotion_processing_tpu import configs
from multimodal_emotion_processing_tpu.data.loader import (
    Batcher, cast_for_transfer, prefetch_to_device, resolve_transfer_dtype)
from multimodal_emotion_processing_tpu.data.synthetic import synthetic_dataset
from multimodal_emotion_processing_tpu.models import build_model
from multimodal_emotion_processing_tpu.train import engine as eng
from multimodal_emotion_processing_tpu.train.engine import Trainer, upcast_wire
from multimodal_emotion_processing_tpu.train.vmap_kfold import (
    run_kfold_fully_compiled, run_kfold_vmapped)


def _round_f16(samples):
    """Snap float32 features onto the float16 grid so the f16 wire round-trip
    is value-identical and trajectory comparisons can be exact."""
    return [{k: (v.astype(np.float16).astype(np.float32)
                 if v.dtype == np.float32 else v) for k, v in s.items()}
            for s in samples]


def _exp():
    exp = configs.get("rencecps")
    return dataclasses.replace(
        exp,
        model=dataclasses.replace(exp.model, dim=16),
        train=dataclasses.replace(exp.train, n_folds=2, batch_size=8))


def _loaders(exp):
    def make_loaders(train, valid):
        return (Batcher(train, exp.train.batch_size, seed=1),
                Batcher(valid, exp.train.batch_size, shuffle=False))
    return make_loaders


def test_cast_for_transfer_leaves():
    batch = {"feat": np.ones((2, 3), np.float32) * 1.5,
             "idx": np.arange(2, dtype=np.int32),
             "flag": np.array([True, False]),
             "half": np.ones(2, np.float16)}
    out = cast_for_transfer(batch, resolve_transfer_dtype("float16"))
    assert out["feat"].dtype == np.float16
    assert out["idx"].dtype == np.int32          # non-float untouched
    assert out["flag"].dtype == np.bool_
    assert out["half"].dtype == np.float16       # already half: pass-through
    assert cast_for_transfer(batch, None) is batch

    bf = cast_for_transfer(batch, resolve_transfer_dtype("bfloat16"))
    assert bf["feat"].dtype == jnp.bfloat16


def test_resolve_transfer_dtype_rejects_unknown():
    with pytest.raises(ValueError, match="transfer_dtype"):
        resolve_transfer_dtype("float8")


def test_upcast_wire_restores_float32():
    x = np.linspace(-3, 3, 16, dtype=np.float32).astype(np.float16)
    batch = {"a": jnp.asarray(x), "b": jnp.arange(4),
             "c": jnp.ones(4, jnp.bfloat16)}
    out = upcast_wire(batch)
    assert out["a"].dtype == jnp.float32
    assert out["c"].dtype == jnp.float32
    assert out["b"].dtype == batch["b"].dtype
    np.testing.assert_array_equal(np.asarray(out["a"]),
                                  x.astype(np.float32))


def test_wire_to_bf16_matches_upcast_then_cast():
    """wire_to_bf16 (the fused bf16-compute entry, round 4) is
    value-identical to upcast_wire followed by the old f32->bf16 cast for
    EVERY wire dtype: f32-staged, f16/bf16 half wires, int8-quantized (its
    dequant multiply stays f32); keep-set vectors restore to f32; ints
    untouched."""
    rng = np.random.default_rng(0)
    f32 = rng.standard_normal((4, 6)).astype(np.float32) * 3
    base = {"x": f32, "sample_weight": np.ones(4, np.float32),
            "label": np.zeros((4, 3), np.int32)}
    wires = [None, "float16", "bfloat16", "int8"]
    for wire in wires:
        host = (base if wire is None else
                cast_for_transfer(base, resolve_transfer_dtype(wire)))
        dev = {k: jnp.asarray(v) for k, v in host.items()}
        got = eng.wire_to_bf16(dev)
        ref = {k: (v if k in ("sample_weight",)
                   or not jnp.issubdtype(v.dtype, jnp.floating)
                   else v.astype(jnp.bfloat16))
               for k, v in upcast_wire(dev).items()}
        assert set(got) == set(ref), wire
        for k in ref:
            assert got[k].dtype == ref[k].dtype, (wire, k)
            np.testing.assert_array_equal(np.asarray(got[k], np.float32),
                                          np.asarray(ref[k], np.float32),
                                          err_msg=f"{wire}/{k}")
    assert eng.wire_to_bf16({"x": jnp.asarray(f32)})["x"].dtype == jnp.bfloat16


def test_prefetch_transfer_dtype_and_step():
    exp = _exp()
    samples = _round_f16(synthetic_dataset("rencecps", exp.model, n=24,
                                           seed=0))
    model = build_model(exp)
    tx, step = eng.make_train_step(model, exp.train, donate=False)
    state = eng.init_state(model, tx, seed=0)

    batcher = Batcher(samples, exp.train.batch_size, shuffle=False)
    wired = list(prefetch_to_device(iter(batcher()),
                                    transfer_dtype="float16"))
    assert all(b["feat"].dtype == jnp.float16 for b in wired)
    assert all(b["sample_weight"].dtype == jnp.float16 for b in wired)

    plain = list(prefetch_to_device(iter(batcher())))
    s_w = s_p = state
    for bw, bp in zip(wired, plain):
        s_w, loss_w = step(s_w, bw)
        s_p, loss_p = step(s_p, bp)
        # same f32 values after the in-graph upcast -> same math (tolerance
        # only for XLA refusing to guarantee fusion-order stability across
        # the two programs)
        np.testing.assert_allclose(float(loss_w), float(loss_p),
                                   rtol=1e-6, atol=1e-7)


def test_trainer_wire_exact_on_f16_grid():
    exp = _exp()
    samples = _round_f16(synthetic_dataset("rencecps", exp.model, n=32,
                                           seed=1))
    model = build_model(exp)
    train, valid = samples[:24], samples[24:]

    def loaders():
        return (lambda: Batcher(train, 8, seed=2)(),
                lambda: Batcher(valid, 8, shuffle=False)())

    tl, vl = loaders()
    _, hist = Trainer(model, exp.train).fit(tl, vl, epochs=2)
    tl, vl = loaders()
    _, hist16 = Trainer(model, exp.train,
                        transfer_dtype="float16").fit(tl, vl, epochs=2)
    for a, b in zip(hist, hist16):
        np.testing.assert_allclose(b.train_loss, a.train_loss,
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(b.valid_loss, a.valid_loss,
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("mode", ["hostfed", "device_resident"])
def test_vmapped_wire_matches_plain(mode):
    exp = _exp()
    model = build_model(exp)
    samples = _round_f16(synthetic_dataset("rencecps", exp.model, n=64,
                                           seed=2))
    kw = dict(epochs=2, shuffle_seed=0,
              device_resident=(mode == "device_resident"))
    _, h0, _, l0 = run_kfold_vmapped(samples, _loaders(exp), model,
                                     exp.train, **kw)
    _, h1, _, l1 = run_kfold_vmapped(samples, _loaders(exp), model,
                                     exp.train, transfer_dtype="float16",
                                     **kw)
    for hist0, hist1 in zip(h0, h1):
        assert len(hist0) == len(hist1)
        for a, b in zip(hist0, hist1):
            np.testing.assert_allclose(b.train_loss, a.train_loss,
                                       rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(b.valid_loss, a.valid_loss,
                                       rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(l1, l0, rtol=1e-6, atol=1e-7)


def test_fully_compiled_wire_matches_plain():
    exp = _exp()
    model = build_model(exp)
    samples = _round_f16(synthetic_dataset("rencecps", exp.model, n=64,
                                           seed=3))
    _, h0, _, l0 = run_kfold_fully_compiled(samples, model, exp.train,
                                            epochs=2, shuffle_seed=0)
    _, h1, _, l1 = run_kfold_fully_compiled(samples, model, exp.train,
                                            epochs=2, shuffle_seed=0,
                                            transfer_dtype="float16")
    for hist0, hist1 in zip(h0, h1):
        for a, b in zip(hist0, hist1):
            np.testing.assert_allclose(b.valid_loss, a.valid_loss,
                                       rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(l1, l0, rtol=1e-6, atol=1e-7)


def test_bfloat16_wire_close_on_unrounded_features():
    """Arbitrary f32 features: bf16 wire rounds at ~0.4% relative — the
    trajectory must stay close (the documented lossy contract), not exact."""
    exp = _exp()
    samples = synthetic_dataset("rencecps", exp.model, n=32, seed=4)
    model = build_model(exp)
    train, valid = samples[:24], samples[24:]

    def fit(dtype):
        return Trainer(model, exp.train, transfer_dtype=dtype).fit(
            lambda: Batcher(train, 8, seed=2)(),
            lambda: Batcher(valid, 8, shuffle=False)(), epochs=2)[1]

    h0, hb = fit(None), fit("bfloat16")
    for a, b in zip(h0, hb):
        np.testing.assert_allclose(b.train_loss, a.train_loss, rtol=0.05)
        np.testing.assert_allclose(b.valid_loss, a.valid_loss, rtol=0.05)


def test_accum_steps_with_wire_batch():
    exp = _exp()
    samples = _round_f16(synthetic_dataset("rencecps", exp.model, n=8,
                                           seed=5))
    model = build_model(exp)
    batch = next(iter(Batcher(samples, 8, shuffle=False)()))
    tx, step2 = eng.make_train_step(model, exp.train, accum_steps=2,
                                    donate=False)
    state = eng.init_state(model, tx, seed=0)
    _, loss_f32 = step2(state, batch)
    _, loss_f16 = step2(state, cast_for_transfer(
        batch, resolve_transfer_dtype("float16")))
    np.testing.assert_allclose(float(loss_f16), float(loss_f32),
                               rtol=1e-6, atol=1e-7)


def test_sweep_wire_matches_plain():
    from multimodal_emotion_processing_tpu.train.sweep import run_lr_sweep

    exp = _exp()
    model = build_model(exp)
    samples = _round_f16(synthetic_dataset("rencecps", exp.model, n=40,
                                           seed=6))
    kw = dict(lrs=[1e-3, 3e-4], epochs=2)
    r0 = run_lr_sweep(samples[:32], samples[32:], model, exp.train, **kw)
    r1 = run_lr_sweep(samples[:32], samples[32:], model, exp.train,
                      transfer_dtype="float16", **kw)
    assert r1.winner == r0.winner
    for a, b in zip(r0.members, r1.members):
        np.testing.assert_allclose(b.best_valid_loss, a.best_valid_loss,
                                   rtol=1e-6, atol=1e-7)


def test_ensemble_predict_all_wire_matches_plain():
    from multimodal_emotion_processing_tpu.eval.ensemble import Ensemble

    exp = _exp()
    model = build_model(exp)
    samples = _round_f16(synthetic_dataset("rencecps", exp.model, n=20,
                                           seed=7))
    members = [model.init(jax.random.PRNGKey(s)) for s in (0, 1)]
    ens = Ensemble(model, members)
    loader = lambda: Batcher(samples, 8, shuffle=False)()
    lg0 = ens.predict_all(loader)
    lg16 = ens.predict_all(loader, transfer_dtype="float16")
    assert lg0.shape == (20, 9)
    np.testing.assert_allclose(lg16, lg0, rtol=1e-6, atol=1e-7)


def test_int8_quantization_error_bound():
    rng = np.random.default_rng(0)
    batch = {"feat": (rng.standard_normal((4, 8, 6)) * 50).astype(np.float32),
             "x_mask": (rng.random((4, 8)) > 0.3).astype(np.float32),
             "label": rng.integers(0, 2, (4, 9)).astype(np.int32)}
    wired = cast_for_transfer(batch, resolve_transfer_dtype("int8"))
    assert wired["feat"].dtype == np.int8
    assert wired["feat__wire_scale"].shape == (4,)
    assert wired["x_mask"].dtype == np.float16    # exact path
    assert wired["label"].dtype == np.int32

    out = upcast_wire({k: jnp.asarray(v) for k, v in wired.items()})
    assert set(out) == {"feat", "x_mask", "label"}  # scale keys consumed
    deq = np.asarray(out["feat"])
    # symmetric per-row quantization: worst-case error is scale/2
    bound = wired["feat__wire_scale"][:, None, None] / 2 + 1e-6
    assert np.all(np.abs(deq - batch["feat"]) <= bound)
    np.testing.assert_array_equal(np.asarray(out["x_mask"]),
                                  batch["x_mask"])


def test_int8_trainer_close_and_scan_composes():
    exp = _exp()
    samples = synthetic_dataset("rencecps", exp.model, n=32, seed=8)
    model = build_model(exp)
    train, valid = samples[:24], samples[24:]

    def fit(**kw):
        return Trainer(model, exp.train, **kw).fit(
            lambda: Batcher(train, 8, seed=2)(),
            lambda: Batcher(valid, 8, shuffle=False)(), epochs=2)[1]

    h0 = fit()
    h8 = fit(transfer_dtype="int8")
    for a, b in zip(h0, h8):
        # int8 quantization noise (~0.4% of per-row max-abs) perturbs the
        # trajectory slightly — the lossy contract, not exactness
        np.testing.assert_allclose(b.train_loss, a.train_loss, rtol=0.05)
        np.testing.assert_allclose(b.valid_loss, a.valid_loss, rtol=0.05)
    h8s = fit(transfer_dtype="int8", scan_steps=2)
    assert all(np.isfinite([e.train_loss for e in h8s]))
    for a, b in zip(h8, h8s):
        # scan stacks before casting -> coarser (per-group) scales; close,
        # not equal (documented in cast_for_transfer)
        np.testing.assert_allclose(b.valid_loss, a.valid_loss, rtol=0.05)


def test_int8_guards():
    exp = _exp()
    model = build_model(exp)
    samples = synthetic_dataset("rencecps", exp.model, n=32, seed=9)

    # HOST-FED vmapped driver: (k, B, ...) stacks would quantize per fold
    with pytest.raises(ValueError, match="int8"):
        run_kfold_vmapped(samples, _loaders(exp), model, exp.train,
                          epochs=1, transfer_dtype="int8")
    # mesh + scan chunks: (s,)-group scales have no data axis to slice
    from multimodal_emotion_processing_tpu.parallel.mesh import make_mesh
    with pytest.raises(ValueError, match="int8"):
        Trainer(model, exp.train, mesh=make_mesh(n_data=2),
                transfer_dtype="int8", scan_steps=2)


def test_int8_composes_with_dp_mesh():
    """--transfer-dtype int8 --dp N (the sequential driver the pipeline
    demotes host-fed int8 runs to) must RUN — this path used to raise — and
    match the single-device int8 trajectory: the (B,) scale leaves shard on
    'data' like every other batch leaf."""
    from multimodal_emotion_processing_tpu.pipelines import run_experiment

    ov = {"train": {"n_folds": 2, "batch_size": 8}, "model": {"dim": 16}}
    kw = dict(synthetic_data=True, n_train=32, n_test=8, epochs=2,
              quiet=True, overrides=ov)
    r_dp = run_experiment("rencecps", dp=4, transfer_dtype="int8", **kw)
    r_1d = run_experiment("rencecps", transfer_dtype="int8",
                          vmap_folds=False, **kw)
    t_dp = np.asarray([(e.train_loss, e.valid_loss)
                       for h in r_dp.fold_histories for e in h])
    t_1d = np.asarray([(e.train_loss, e.valid_loss)
                       for h in r_1d.fold_histories for e in h])
    assert r_dp.report is not None
    np.testing.assert_allclose(t_dp, t_1d, rtol=2e-4, atol=2e-5)


def test_int8_staging_gather_upcast_exact():
    """Device-resident int8: staging quantizes per SAMPLE (the SoA leading
    axis), so gather+upcast must reproduce the host-fed wire's dequantized
    values exactly for the same samples."""
    from multimodal_emotion_processing_tpu.train.device_epochs import (
        gather_rows, stage_dataset)

    exp = _exp()
    samples = synthetic_dataset("rencecps", exp.model, n=16, seed=12)
    data, n = stage_dataset(samples, transfer_dtype="int8")
    assert n == 16
    feat_keys = [k for k in data if k.endswith("__wire_scale")]
    assert feat_keys, "int8 staging must emit per-sample scale leaves"

    idx = jnp.asarray([3, 0, 15, 7], dtype=jnp.int32)
    got = upcast_wire(gather_rows(data, idx))
    # host-side oracle: cast each picked sample alone, dequantize in numpy
    for k in got:
        if got[k].dtype != jnp.float32 or any(
                t in k for t in ("mask", "weight", "label")):
            continue
        for row, i in enumerate([3, 0, 15, 7]):
            wired = cast_for_transfer(
                {k: samples[i][k][None]}, resolve_transfer_dtype("int8"))
            want = (wired[k].astype(np.float32)
                    * wired[k + "__wire_scale"].reshape(
                        (-1,) + (1,) * (wired[k].ndim - 1)))[0]
            np.testing.assert_array_equal(np.asarray(got[k])[row], want)


def test_int8_device_resident_and_one_dispatch():
    """int8-staged device-resident k-fold runs close to f32, and the
    one-dispatch driver (same staging, same RNG chain) matches it exactly."""
    exp = _exp()
    model = build_model(exp)
    samples = synthetic_dataset("rencecps", exp.model, n=64, seed=13)

    kw = dict(epochs=2, shuffle_seed=0)
    _, h0, _, l0 = run_kfold_vmapped(samples, _loaders(exp), model, exp.train,
                                     device_resident=True, **kw)
    _, h8, _, l8 = run_kfold_vmapped(samples, _loaders(exp), model, exp.train,
                                     device_resident=True,
                                     transfer_dtype="int8", **kw)
    for hist0, hist8 in zip(h0, h8):
        for a, b in zip(hist0, hist8):
            np.testing.assert_allclose(b.train_loss, a.train_loss, rtol=0.05)
            np.testing.assert_allclose(b.valid_loss, a.valid_loss, rtol=0.05)

    _, hf, _, lf = run_kfold_fully_compiled(samples, model, exp.train,
                                            transfer_dtype="int8", **kw)
    for hist8, histf in zip(h8, hf):
        for a, b in zip(hist8, histf):
            np.testing.assert_allclose(b.valid_loss, a.valid_loss,
                                       rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(lf, l8, rtol=1e-6, atol=1e-7)


def test_run_experiment_int8_device_resident_keeps_vmapped(capsys):
    from multimodal_emotion_processing_tpu.pipelines import run_experiment

    res = run_experiment(
        "rencecps", synthetic_data=True, n_train=48, n_test=12, epochs=1,
        transfer_dtype="int8", device_resident=True,
        overrides={"train": {"n_folds": 2, "batch_size": 8},
                   "model": {"dim": 16}})
    assert res.report is not None
    assert "sequential k-fold driver" not in capsys.readouterr().err


def test_cast_for_transfer_is_idempotent_on_cast_dicts():
    """Re-casting an already-cast batch (e.g. a pre-cast loader feeding
    prefetch_to_device(transfer_dtype=...)) must not re-quantize the f32
    '__wire_scale' leaves as features."""
    rng = np.random.default_rng(3)
    batch = {"feat": rng.standard_normal((4, 6)).astype(np.float32)}
    once = cast_for_transfer(batch, resolve_transfer_dtype("int8"))
    twice = cast_for_transfer(once, resolve_transfer_dtype("int8"))
    assert set(twice) == set(once)
    np.testing.assert_array_equal(twice["feat"], once["feat"])
    np.testing.assert_array_equal(twice["feat__wire_scale"],
                                  once["feat__wire_scale"])


def test_int8_accum_and_ensemble():
    from multimodal_emotion_processing_tpu.eval.ensemble import Ensemble

    exp = _exp()
    model = build_model(exp)
    samples = synthetic_dataset("rencecps", exp.model, n=8, seed=10)
    batch = next(iter(Batcher(samples, 8, shuffle=False)()))
    tx, step2 = eng.make_train_step(model, exp.train, accum_steps=2,
                                    donate=False)
    state = eng.init_state(model, tx, seed=0)
    _, loss_f32 = step2(state, batch)
    _, loss_i8 = step2(state, cast_for_transfer(
        batch, resolve_transfer_dtype("int8")))
    np.testing.assert_allclose(float(loss_i8), float(loss_f32), rtol=0.05)

    ens = Ensemble(model, [model.init(jax.random.PRNGKey(0))])
    lg0 = ens.predict_all(lambda: Batcher(samples, 8, shuffle=False)())
    lg8 = ens.predict_all(lambda: Batcher(samples, 8, shuffle=False)(),
                          transfer_dtype="int8")
    np.testing.assert_allclose(lg8, lg0, rtol=0.1, atol=0.05)


def test_run_experiment_int8_falls_back_to_sequential(capsys):
    from multimodal_emotion_processing_tpu.pipelines import run_experiment

    res = run_experiment(
        "rencecps", synthetic_data=True, n_train=48, n_test=12, epochs=1,
        transfer_dtype="int8",
        overrides={"train": {"n_folds": 2, "batch_size": 8},
                   "model": {"dim": 16}})
    assert res.report is not None
    assert "sequential k-fold driver" in capsys.readouterr().err


def test_cli_parses_transfer_dtype():
    from multimodal_emotion_processing_tpu.cli import build_parser

    args = build_parser().parse_args(
        ["train", "rencecps", "--transfer-dtype", "float16"])
    assert args.transfer_dtype == "float16"
    with pytest.raises(SystemExit):
        build_parser().parse_args(
            ["train", "rencecps", "--transfer-dtype", "float8"])


def test_run_experiment_transfer_dtype_smoke():
    from multimodal_emotion_processing_tpu.pipelines import run_experiment

    res = run_experiment(
        "rencecps", synthetic_data=True, n_train=48, n_test=12, epochs=1,
        quiet=True, transfer_dtype="float16",
        overrides={"train": {"n_folds": 2, "batch_size": 8},
                   "model": {"dim": 16}})
    assert res.report is not None
    assert all(np.isfinite([h.valid_loss for hist in res.fold_histories
                            for h in hist]).tolist())
