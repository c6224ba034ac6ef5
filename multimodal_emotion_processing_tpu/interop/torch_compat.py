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
