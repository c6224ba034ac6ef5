"""Golden parity: torch oracles (reference-compatible state_dicts) -> our
converter -> identical forward logits, for every model family."""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from multimodal_emotion_processing_tpu import configs
from multimodal_emotion_processing_tpu.interop import from_reference_state_dict
from multimodal_emotion_processing_tpu.models import build_model

import torch_reference as tref


def _allclose(a, b, tol=2e-4):
    np.testing.assert_allclose(np.asarray(a), b.detach().numpy(),
                               rtol=tol, atol=tol)


def test_concat_trans_mosei_parity():
    exp = configs.get("mosei_trans")
    m = dataclasses.replace(exp.model, l_len=4, v_len=5, a_len=6, dim=12,
                            n_heads=2, l_dim=7, v_dim=3, a_dim=5)
    torch.manual_seed(0)
    oracle = tref.ConcatTrans(m, top_norm="norm1", block_norm="norm1")
    params = from_reference_state_dict(oracle.state_dict(), m)
    model = build_model(dataclasses.replace(exp, model=m))

    rng = np.random.default_rng(0)
    b = 3
    l = rng.standard_normal((b, 2, m.l_len, m.l_dim)).astype(np.float32)
    v = rng.standard_normal((b, 2, m.v_len, m.v_dim)).astype(np.float32)
    a = rng.standard_normal((b, 2, m.a_len, m.a_dim)).astype(np.float32)
    lm = np.ones((b, 2, m.l_len), np.float32)
    vm = (rng.random((b, 2, m.v_len)) > 0.25).astype(np.float32)
    vm[..., 0] = 1.0
    am = np.ones((b, 2, m.a_len), np.float32)

    ours = model.apply(params, {"l": l, "v": v, "a": a, "l_mask": lm,
                                "v_mask": vm, "a_mask": am})
    theirs = oracle(*(torch.tensor(x) for x in (l, v, a, lm, vm, am)))
    _allclose(ours, theirs)


def test_base_model_ren_mme_parity():
    exp = configs.get("ren_mme")
    m = dataclasses.replace(exp.model, l_len=4, v_len=5, a_len=6, dim=16,
                            n_heads=2, l_dim=7, v_dim=3, a_dim=5)
    torch.manual_seed(1)
    oracle = tref.ConcatTrans(m, top_norm="norm3", block_norm="norm2")
    params = from_reference_state_dict(oracle.state_dict(), m)
    model = build_model(dataclasses.replace(exp, model=m))

    rng = np.random.default_rng(1)
    b = 4
    batch = {
        "l": rng.standard_normal((b, 2, m.l_len, m.l_dim)).astype(np.float32),
        "v": rng.standard_normal((b, 2, m.v_len, m.v_dim)).astype(np.float32),
        "a": rng.standard_normal((b, 2, m.a_len, m.a_dim)).astype(np.float32),
        "l_mask": np.ones((b, 2, m.l_len), np.float32),
        "v_mask": np.ones((b, 2, m.v_len), np.float32),
        "a_mask": np.ones((b, 2, m.a_len), np.float32),
    }
    ours = model.apply(params, batch)
    theirs = oracle(*(torch.tensor(batch[k]) for k in
                      ("l", "v", "a", "l_mask", "v_mask", "a_mask")))
    _allclose(ours, theirs)


def test_concat_linear_rencecps_parity():
    exp = configs.get("rencecps")
    m = dataclasses.replace(exp.model, dim=24)
    torch.manual_seed(2)
    oracle = tref.ConcatLinear(m.dim, e=9)
    params = from_reference_state_dict(oracle.state_dict(), m)
    model = build_model(dataclasses.replace(exp, model=m))
    feat = np.random.default_rng(2).standard_normal((5, 2, m.dim)).astype(np.float32)
    ours = model.apply(params, {"feat": feat})
    _allclose(ours, oracle(torch.tensor(feat)))


def test_state_transfer_realformer_parity():
    exp = configs.get("mosei_realformer")
    m = dataclasses.replace(exp.model, l_len=4, v_len=5, a_len=6, dim=12,
                            n_heads=2, l_dim=7, v_dim=3, a_dim=5, p_len=3,
                            n_layers=2, ffn=2)
    torch.manual_seed(3)
    oracle = tref.StateTransfer(m)
    params = from_reference_state_dict(oracle.state_dict(), m)
    model = build_model(dataclasses.replace(exp, model=m))

    rng = np.random.default_rng(3)
    b, p = 2, m.p_len
    batch = {
        "l": rng.standard_normal((b, p, m.l_len, m.l_dim)).astype(np.float32),
        "v": rng.standard_normal((b, p, m.v_len, m.v_dim)).astype(np.float32),
        "a": rng.standard_normal((b, p, m.a_len, m.a_dim)).astype(np.float32),
        "l_mask": np.ones((b, p, m.l_len), np.float32),
        "v_mask": np.ones((b, p, m.v_len), np.float32),
        "a_mask": np.ones((b, p, m.a_len), np.float32),
    }
    ours = model.apply(params, batch)
    theirs = oracle(*(torch.tensor(batch[k]) for k in
                      ("l", "v", "a", "l_mask", "v_mask", "a_mask")))
    _allclose(ours, theirs, tol=5e-4)  # scan vs loop accumulation


def test_robot_multiclass_parity():
    exp = configs.get("robot_demo")
    m = dataclasses.replace(exp.model, l_len=4, v_len=5, a_len=6, dim=12,
                            n_heads=2, l_dim=7, a_dim=5, n_layers=2, ffn=2,
                            v_dims_multires=(4, 6, 8))
    torch.manual_seed(4)
    oracle = tref.RobotMultiClass(m)
    params = from_reference_state_dict(oracle.state_dict(), m)
    model = build_model(dataclasses.replace(exp, model=m))

    rng = np.random.default_rng(4)
    b = 3
    batch = {
        "l": rng.standard_normal((b, m.l_len, m.l_dim)).astype(np.float32),
        "v256": rng.standard_normal((b, m.v_len, 4)).astype(np.float32),
        "v512": rng.standard_normal((b, m.v_len, 6)).astype(np.float32),
        "v1024": rng.standard_normal((b, m.v_len, 8)).astype(np.float32),
        "a": rng.standard_normal((b, m.a_len, m.a_dim)).astype(np.float32),
        "l_mask": np.ones((b, m.l_len), np.float32),
        "v_mask": np.ones((b, m.v_len), np.float32),
        "a_mask": np.ones((b, m.a_len), np.float32),
    }
    ours = model.apply(params, batch)
    theirs = oracle(*(torch.tensor(batch[k]) for k in
                      ("l", "v256", "v512", "v1024", "a",
                       "l_mask", "v_mask", "a_mask")))
    _allclose(ours, theirs)


def test_load_reference_checkpoint_roundtrip(tmp_path):
    """torch.save(state_dict) -> load_reference_checkpoint == direct convert."""
    from multimodal_emotion_processing_tpu.interop import load_reference_checkpoint

    exp = configs.get("rencecps")
    m = dataclasses.replace(exp.model, dim=24)
    torch.manual_seed(5)
    oracle = tref.ConcatLinear(m.dim, e=9)
    path = str(tmp_path / "model_d1_2.11.pt")
    torch.save(oracle.state_dict(), path)
    p1 = load_reference_checkpoint(path, m)
    p2 = from_reference_state_dict(oracle.state_dict(), m)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("family", ["mosei_trans", "ren_mme", "rencecps",
                                    "mosei_realformer", "robot_demo"])
def test_state_dict_roundtrip(family):
    """params -> reference state_dict -> params is the identity, and the
    exported keys load into the torch oracles."""
    from multimodal_emotion_processing_tpu.interop import to_reference_state_dict

    exp = configs.get(family)
    m = dataclasses.replace(
        exp.model, l_len=4, v_len=5, a_len=6,
        dim=24 if family == "rencecps" else 12,
        n_heads=1 if family == "rencecps" else 2,
        l_dim=exp.model.l_dim if family == "rencecps" else 7,
        v_dim=0 if exp.model.unify == "conv_multires" else 3,
        a_dim=5, p_len=2, v_dims_multires=(4, 6, 8))
    if family == "rencecps":
        m = dataclasses.replace(m, dim=24)
    model = build_model(dataclasses.replace(exp, model=m))
    params = model.init(jax.random.PRNGKey(9))
    sd = to_reference_state_dict(params, m)
    back = from_reference_state_dict(sd, m)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # exported dicts load into the reference-keyed torch oracles
    oracles = {
        "mosei_trans": lambda: tref.ConcatTrans(m, "norm1", "norm1"),
        "ren_mme": lambda: tref.ConcatTrans(m, "norm3", "norm2"),
        "rencecps": lambda: tref.ConcatLinear(m.dim, e=9),
        "mosei_realformer": lambda: tref.StateTransfer(m),
        "robot_demo": lambda: tref.RobotMultiClass(m),
    }
    oracle = oracles[family]()
    tsd = {k: torch.tensor(v) for k, v in sd.items()}
    missing, unexpected = oracle.load_state_dict(tsd, strict=False)
    assert not unexpected, f"unexpected keys: {unexpected}"
    # the only permitted missing keys are the reference's unused FC params
    allowed = {"fully_connected.weight", "fully_connected.bias",
               "normalization.weight", "normalization.bias"}
    assert set(missing) <= allowed, f"missing keys: {missing}"


def test_cli_import_export_torch_roundtrip(tmp_path, capsys):
    """The migration CLI: our members -> reference .pt files (export-torch)
    -> back into a fresh store (import-torch), with forward parity and the
    reference's loss-tagged filename convention."""
    import jax
    import numpy as np

    from multimodal_emotion_processing_tpu.cli import main
    from multimodal_emotion_processing_tpu.models import build_model
    from multimodal_emotion_processing_tpu.train.checkpoint import CheckpointStore

    exp = configs.get("rencecps")
    model = build_model(exp)
    src = CheckpointStore(str(tmp_path / "src"))
    members = [model.init(jax.random.PRNGKey(i)) for i in range(2)]
    for i, p in enumerate(members):
        src.save_params(f"rencecps_{i + 1}", p, valid_loss=2.11 + i * 0.01)

    out_dir = tmp_path / "pt"
    main(["export-torch", "rencecps", "--checkpoint-dir", str(tmp_path / "src"),
          "--out", str(out_dir)])
    pts = sorted(str(f) for f in out_dir.iterdir())
    assert len(pts) == 2 and pts[0].endswith("rencecps_1_2.11.pt")

    main(["import-torch", "rencecps", *pts,
          "--checkpoint-dir", str(tmp_path / "dst")])
    dst = CheckpointStore(str(tmp_path / "dst"))
    assert dst.best_members("rencecps") == ["rencecps_1", "rencecps_2"]
    assert dst.manifest["rencecps_1"]["valid_loss"] == 2.11

    batch = {"feat": np.random.default_rng(0)
             .standard_normal((4, 2, exp.model.l_dim)).astype(np.float32)}
    params_like = model.init(jax.random.PRNGKey(9))
    for i in range(2):
        got = model.apply(dst.restore_params(f"rencecps_{i + 1}", params_like),
                          batch)
        want = model.apply(members[i], batch)
        # params roundtrip bit-exact; ~2e-6 output delta comes from the
        # transposed weights' memory layout changing XLA's dot rounding
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_cli_import_torch_refuses_overwrite(tmp_path):
    """Importing over existing members requires --force, and a forced import
    drops the stale train-state keys so restore_state can't resurrect the
    pre-import weights."""
    import jax
    import pytest

    from multimodal_emotion_processing_tpu.cli import main
    from multimodal_emotion_processing_tpu.models import build_model
    from multimodal_emotion_processing_tpu.train import engine as eng
    from multimodal_emotion_processing_tpu.train.checkpoint import CheckpointStore

    exp = configs.get("rencecps")
    model = build_model(exp)
    store = CheckpointStore(str(tmp_path / "ck"))
    tx = eng.make_optimizer(exp.train)
    state = eng.init_state(model, tx, seed=0)
    store.save_best("rencecps_1", state, 0, 2.0)   # trained member w/ 'full'
    assert "full" in store.manifest["rencecps_1"]

    out_dir = tmp_path / "pt"
    main(["export-torch", "rencecps", "--checkpoint-dir", str(tmp_path / "ck"),
          "--out", str(out_dir)])
    pt = str(next(out_dir.iterdir()))
    with pytest.raises(SystemExit, match="--force"):
        main(["import-torch", "rencecps", pt,
              "--checkpoint-dir", str(tmp_path / "ck")])
    main(["import-torch", "rencecps", pt, "--force",
          "--checkpoint-dir", str(tmp_path / "ck")])
    fresh = CheckpointStore(str(tmp_path / "ck"))
    assert fresh.manifest["rencecps_1"]["imported"] is True
    assert "full" not in fresh.manifest["rencecps_1"]
