"""Torch checkpoint interop: load the reference's saved `.pt` state dicts into
this framework's parameter pytrees.

The reference saves `model.state_dict()` per fold (cmu-mosei/run.py:415 etc.);
users migrating from it hold those files.  The key namespace is fixed by the
reference's module attribute names (cited per family below); this module maps
every key to our layout:

  * torch Linear weights are (out, in) — ours are (in, out): transposed;
  * torch Conv1d(k=1) weights are (out, in, 1): squeezed + transposed;
  * LayerNorm weight/bias -> scale/bias;
  * nn.Embedding weight -> position table.

Families (state-dict key prefixes in the reference):
  * Concat_Trans (cmu-mosei/run.py:321-339): intensity./stimulation. grids
    (unify_dimension.{linguistic,visual,acoustic}, multimodal_blocks.N.
    {proj,minus,norm1,c}, classifier), trans, norm1, out.
  * Base_model (Ren-MME/run.py:273-292): same but grid unify has a shared
    norm1, blocks use norm2, top norm is norm3.
  * Concat_Linear (rencecps/run.py:130-148): intensity, stimulation, trans,
    norm, out.
  * State_Transfer (others/realformer.py:266-286): feature. grid (conv unify,
    {l,v,a}_position.position_embeddings, blocks with w_qkv.{0,1,2}, proj,
    norm1, norm2, ffn.{0,2}, a, b, c, fully_connected, normalization),
    classifier, trans.
  * robot Multi_class (robot_demo.py:377-441): conv unify with visual_
    {256,512,1024} slots and biases, positions, realformer blocks,
    classifier (fully_connected/normalization exist but are unused: the FC
    path is commented out at robot_demo.py:440).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..models.grid import STREAMS


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


def _conv(w) -> np.ndarray:
    return _t(np.asarray(w, np.float32)[:, :, 0])


def _arr(x) -> np.ndarray:
    # np.asarray of a torch tensor is a VIEW into its storage — an in-place
    # optimizer step on the torch side would silently mutate our params
    return np.array(x, dtype=np.float32, copy=True)


def _ln(sd, key):
    return {"scale": _arr(sd[f"{key}.weight"]), "bias": _arr(sd[f"{key}.bias"])}


def _convert_block_minus(sd, base):
    # cmu-mosei blocks name their LayerNorm norm1, Ren-MME blocks norm2
    norm_key = f"{base}.norm1" if f"{base}.norm1.weight" in sd else f"{base}.norm2"
    return {
        "proj": {"w": _t(sd[f"{base}.proj.weight"])},
        "minus": {"w": _t(sd[f"{base}.minus.weight"])},
        "norm": _ln(sd, norm_key),
        "c": _arr(sd[f"{base}.c"]),
    }


def _convert_block_realformer(sd, base):
    return {
        "wq": {"w": _t(sd[f"{base}.w_qkv.0.weight"])},
        "wk": {"w": _t(sd[f"{base}.w_qkv.1.weight"])},
        "wv": {"w": _t(sd[f"{base}.w_qkv.2.weight"])},
        "proj": {"w": _t(sd[f"{base}.proj.weight"])},
        "norm1": _ln(sd, f"{base}.norm1"),
        "norm2": _ln(sd, f"{base}.norm2"),
        "ffn1": {"w": _t(sd[f"{base}.ffn.0.weight"]),
                 "b": _arr(sd[f"{base}.ffn.0.bias"])},
        "ffn2": {"w": _t(sd[f"{base}.ffn.2.weight"]),
                 "b": _arr(sd[f"{base}.ffn.2.bias"])},
        "a": _arr(sd[f"{base}.a"]),
        "b": _arr(sd[f"{base}.b"]),
        "c": _arr(sd[f"{base}.c"]),
    }


def _convert_grid(sd, prefix: str, cfg) -> Dict:
    p: Dict = {}
    u = f"{prefix}unify_dimension"
    if cfg.unify in ("linear", "linear_ln"):
        p["unify"] = {
            "l": {"w": _t(sd[f"{u}.linguistic.weight"])},
            "v": {"w": _t(sd[f"{u}.visual.weight"])},
            "a": {"w": _t(sd[f"{u}.acoustic.weight"])},
        }
        if cfg.unify == "linear_ln":
            p["unify"]["ln"] = _ln(sd, f"{u}.norm1")
    elif cfg.unify == "conv":
        p["unify"] = {
            "l": {"w": _conv(sd[f"{u}.linguistic.weight"])},
            "v": {"w": _conv(sd[f"{u}.visual.weight"])},
            "a": {"w": _conv(sd[f"{u}.acoustic.weight"])},
        }
    elif cfg.unify == "conv_multires":
        p["unify"] = {
            "l": {"w": _conv(sd[f"{u}.linguistic.weight"]),
                  "b": _arr(sd[f"{u}.linguistic.bias"])},
            "v256": {"w": _conv(sd[f"{u}.visual_256.weight"]),
                     "b": _arr(sd[f"{u}.visual_256.bias"])},
            "v512": {"w": _conv(sd[f"{u}.visual_512.weight"]),
                     "b": _arr(sd[f"{u}.visual_512.bias"])},
            "v1024": {"w": _conv(sd[f"{u}.visual_1024.weight"]),
                      "b": _arr(sd[f"{u}.visual_1024.bias"])},
            "a": {"w": _conv(sd[f"{u}.acoustic.weight"]),
                  "b": _arr(sd[f"{u}.acoustic.bias"])},
        }

    if cfg.use_position_embedding:
        for ours, theirs in (("pos_l", "linguistic"), ("pos_v", "visual"),
                             ("pos_a", "acoustic")):
            p[ours] = {"table": _arr(
                sd[f"{prefix}{theirs}_position.position_embeddings.weight"])}

    convert_block = (_convert_block_minus if cfg.block == "minus"
                     else _convert_block_realformer)
    blocks: Dict = {}
    for s, (name, _, _) in enumerate(STREAMS):
        blocks[name] = [
            convert_block(sd, f"{prefix}multimodal_blocks.{cfg.n_layers * s + i}")
            for i in range(cfg.n_layers)
        ]
    p["blocks"] = blocks
    return p


def from_reference_state_dict(sd: Dict, cfg) -> Dict:
    """Convert a reference `model.state_dict()` (tensors or arrays) into this
    framework's parameter pytree for ModelConfig `cfg`."""
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu()
                        if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    head = cfg.head
    if head == "concat_trans":
        out = {}
        for grid_name in ("intensity", "stimulation"):
            g = _convert_grid(sd, f"{grid_name}.", cfg)
            g["classifier"] = {"w": _t(sd[f"{grid_name}.classifier.weight"])}
            out[grid_name] = g
        # top LayerNorm: norm1 in cmu-mosei, norm3 in Ren-MME
        norm_key = "norm1" if "norm1.weight" in sd else "norm3"
        out["trans"] = _arr(sd["trans"])
        out["norm"] = _ln(sd, norm_key)
        out["out"] = {"w": _t(sd["out.weight"]), "b": _arr(sd["out.bias"])}
        return out
    if head == "concat_linear":
        return {
            "intensity": {"w": _t(sd["intensity.weight"])},
            "stimulation": {"w": _t(sd["stimulation.weight"])},
            "trans": _arr(sd["trans"]),
            "norm": _ln(sd, "norm"),
            "out": {"w": _t(sd["out.weight"]), "b": _arr(sd["out.bias"])},
        }
    if head == "state_transfer":
        feature = _convert_grid(sd, "feature.", cfg)
        feature["fc"] = {"w": _t(sd["feature.fully_connected.weight"]),
                         "b": _arr(sd["feature.fully_connected.bias"])}
        feature["ln"] = _ln(sd, "feature.normalization")
        return {
            "feature": feature,
            "classifier": {"w": _t(sd["classifier.weight"]),
                           "b": _arr(sd["classifier.bias"])},
            "trans": _arr(sd["trans"]),
        }
    if head == "grid_only":
        g = _convert_grid(sd, "", cfg)
        g["classifier"] = {"w": _t(sd["classifier.weight"]),
                           "b": _arr(sd["classifier.bias"])}
        return g
    raise ValueError(head)


def load_reference_checkpoint(path: str, cfg) -> Dict:
    """Load a reference-saved `.pt` file (torch.save(state_dict)) and convert."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return from_reference_state_dict(sd, cfg)


# ---------------------------------------------------------------------------
# Export: our params -> reference-compatible state_dict
# ---------------------------------------------------------------------------

def _export_block(blk, base, variant, norm_key, out):
    if variant == "minus":
        out[f"{base}.proj.weight"] = _t(blk["proj"]["w"])
        out[f"{base}.minus.weight"] = _t(blk["minus"]["w"])
        out[f"{base}.{norm_key}.weight"] = _arr(blk["norm"]["scale"])
        out[f"{base}.{norm_key}.bias"] = _arr(blk["norm"]["bias"])
        out[f"{base}.c"] = _arr(blk["c"])
    else:
        for i, k in enumerate(("wq", "wk", "wv")):
            out[f"{base}.w_qkv.{i}.weight"] = _t(blk[k]["w"])
        out[f"{base}.proj.weight"] = _t(blk["proj"]["w"])
        for nk in ("norm1", "norm2"):
            out[f"{base}.{nk}.weight"] = _arr(blk[nk]["scale"])
            out[f"{base}.{nk}.bias"] = _arr(blk[nk]["bias"])
        out[f"{base}.ffn.0.weight"] = _t(blk["ffn1"]["w"])
        out[f"{base}.ffn.0.bias"] = _arr(blk["ffn1"]["b"])
        out[f"{base}.ffn.2.weight"] = _t(blk["ffn2"]["w"])
        out[f"{base}.ffn.2.bias"] = _arr(blk["ffn2"]["b"])
        for g in ("a", "b", "c"):
            out[f"{base}.{g}"] = _arr(blk[g])


def _export_grid(g, prefix, cfg, block_norm_key, out):
    u = f"{prefix}unify_dimension"
    if cfg.unify in ("linear", "linear_ln"):
        out[f"{u}.linguistic.weight"] = _t(g["unify"]["l"]["w"])
        out[f"{u}.visual.weight"] = _t(g["unify"]["v"]["w"])
        out[f"{u}.acoustic.weight"] = _t(g["unify"]["a"]["w"])
        if cfg.unify == "linear_ln":
            out[f"{u}.norm1.weight"] = _arr(g["unify"]["ln"]["scale"])
            out[f"{u}.norm1.bias"] = _arr(g["unify"]["ln"]["bias"])
    elif cfg.unify == "conv":
        for ours, theirs in (("l", "linguistic"), ("v", "visual"), ("a", "acoustic")):
            out[f"{u}.{theirs}.weight"] = _t(g["unify"][ours]["w"])[:, :, None]
    elif cfg.unify == "conv_multires":
        for ours, theirs in (("l", "linguistic"), ("v256", "visual_256"),
                             ("v512", "visual_512"), ("v1024", "visual_1024"),
                             ("a", "acoustic")):
            out[f"{u}.{theirs}.weight"] = _t(g["unify"][ours]["w"])[:, :, None]
            out[f"{u}.{theirs}.bias"] = _arr(g["unify"][ours]["b"])
    if cfg.use_position_embedding:
        for ours, theirs in (("pos_l", "linguistic"), ("pos_v", "visual"),
                             ("pos_a", "acoustic")):
            out[f"{prefix}{theirs}_position.position_embeddings.weight"] = _arr(
                g[ours]["table"])
    for s, (name, _, _) in enumerate(STREAMS):
        for i in range(cfg.n_layers):
            _export_block(g["blocks"][name][i],
                          f"{prefix}multimodal_blocks.{cfg.n_layers * s + i}",
                          cfg.block, block_norm_key, out)


def to_reference_state_dict(params: Dict, cfg) -> Dict[str, np.ndarray]:
    """Export our params as a reference-key state dict (numpy values; pass
    through torch.save after tensor-ifying to produce a reference-loadable
    .pt).  Inverse of from_reference_state_dict."""
    out: Dict[str, np.ndarray] = {}
    head = cfg.head
    if head == "concat_trans":
        # Ren-MME naming (norm2 blocks, norm3 top) when the unify has the
        # shared LayerNorm; cmu-mosei naming otherwise
        ren = cfg.unify == "linear_ln"
        for gname in ("intensity", "stimulation"):
            _export_grid(params[gname], f"{gname}.", cfg,
                         "norm2" if ren else "norm1", out)
            out[f"{gname}.classifier.weight"] = _t(params[gname]["classifier"]["w"])
        out["trans"] = _arr(params["trans"])
        top = "norm3" if ren else "norm1"
        out[f"{top}.weight"] = _arr(params["norm"]["scale"])
        out[f"{top}.bias"] = _arr(params["norm"]["bias"])
        out["out.weight"] = _t(params["out"]["w"])
        out["out.bias"] = _arr(params["out"]["b"])
        return out
    if head == "concat_linear":
        out["intensity.weight"] = _t(params["intensity"]["w"])
        out["stimulation.weight"] = _t(params["stimulation"]["w"])
        out["trans"] = _arr(params["trans"])
        out["norm.weight"] = _arr(params["norm"]["scale"])
        out["norm.bias"] = _arr(params["norm"]["bias"])
        out["out.weight"] = _t(params["out"]["w"])
        out["out.bias"] = _arr(params["out"]["b"])
        return out
    if head == "state_transfer":
        _export_grid(params["feature"], "feature.", cfg, "norm1", out)
        out["feature.fully_connected.weight"] = _t(params["feature"]["fc"]["w"])
        out["feature.fully_connected.bias"] = _arr(params["feature"]["fc"]["b"])
        out["feature.normalization.weight"] = _arr(params["feature"]["ln"]["scale"])
        out["feature.normalization.bias"] = _arr(params["feature"]["ln"]["bias"])
        out["classifier.weight"] = _t(params["classifier"]["w"])
        out["classifier.bias"] = _arr(params["classifier"]["b"])
        out["trans"] = _arr(params["trans"])
        return out
    if head == "grid_only":
        _export_grid(params, "", cfg, "norm1", out)
        out["classifier.weight"] = _t(params["classifier"]["w"])
        out["classifier.bias"] = _arr(params["classifier"]["b"])
        return out
    raise ValueError(head)
