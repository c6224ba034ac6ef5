"""Model heads: rank-3 emotion-transition fusion, linear-only variant, and the
recurrent paragraph state-transfer head.

The rank-3 head replaces the reference's per-sample Python loop
(cmu-mosei/run.py:332-337, Ren-MME/run.py:285-290, rencecps/run.py:141-146)
with a single batched einsum:

    torch:  temp = last[i] @ trans   -> temp[g,h] = Σ_e last[e]·trans[g,e,h]
            out  = this[i] @ temp    -> out[h]   = Σ_g this[g]·temp[g,h]
    here:   out  = einsum('bg,be,geh->bh', this, last, trans)

The recurrent head folds the paragraph axis into the batch for ONE grid
forward (the reference re-runs the 108-attention-call grid sequentially per
clip, others/realformer.py:272-286), then runs the cheap gated recurrence as a
`lax.scan` over time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import initializers as init
from . import grid as grid_mod


# ---------------------------------------------------------------------------
# Concat_Trans (cmu-mosei/run.py:321-339) / Base_model (Ren-MME/run.py:273-292)
# ---------------------------------------------------------------------------

def init_concat_trans(key, cfg):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    e = cfg.n_emotions
    return {
        "intensity": {**grid_mod.init_grid(k1, cfg),
                      **grid_mod.init_grid_head(k2, cfg, "per_layer", "classifier")},
        "stimulation": {**grid_mod.init_grid(k3, cfg),
                        **grid_mod.init_grid_head(k4, cfg, "per_layer", "classifier")},
        "trans": init.uniform01(k5, (e, e, e)),
        "norm": init.layer_norm(e),
        "out": init.linear(k6, 2 * e, e, bias=True),
    }


def bilinear_transition(trans, last_feat, this_feat):
    """out[b,h] = Σ_{g,e} this[b,g]·last[b,e]·trans[g,e,h]."""
    acc = jnp.promote_types(this_feat.dtype, jnp.float32)
    return jnp.einsum("bg,be,geh->bh", this_feat, last_feat, trans,
                      preferred_element_type=acc).astype(this_feat.dtype)


def apply_concat_trans(p, cfg, batch, *, rng=None, train=False, impl="xla",
                       stacked=None):
    """batch: l/v/a (B,2,len,dm), *_mask (B,2,len); slot 0 = previous utterance,
    slot 1 = current (cmu-mosei/run.py:329-331)."""
    r1, r2 = jax.random.split(rng) if rng is not None else (None, None)

    def run(gp, slot, r):
        pooled = grid_mod.apply_grid(
            gp, cfg, batch["l"][:, slot], batch["v"][:, slot], batch["a"][:, slot],
            batch["l_mask"][:, slot], batch["v_mask"][:, slot], batch["a_mask"][:, slot],
            rng=r, train=train, impl=impl, collect="per_layer", stacked=stacked)
        return grid_mod.apply_grid_head(gp, cfg, pooled, out="classifier")

    last_feat = run(p["intensity"], 0, r1)
    this_feat = run(p["stimulation"], 1, r2)
    fused = bilinear_transition(p["trans"], last_feat, this_feat)
    out = jnp.concatenate([this_feat, init.apply_layer_norm(p["norm"], fused)], axis=1)
    return init.apply_linear(p["out"], out)


# ---------------------------------------------------------------------------
# Concat_Linear (rencecps/run.py:130-148)
# ---------------------------------------------------------------------------

def init_concat_linear(key, cfg):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    e = cfg.n_emotions
    return {
        "intensity": init.linear(k1, cfg.dim, e),
        "stimulation": init.linear(k2, cfg.dim, e),
        "trans": init.uniform01(k3, (e, e, e)),
        "norm": init.layer_norm(e),
        "out": init.linear(k4, 2 * e, e, bias=True),
    }


def apply_concat_linear(p, cfg, batch, *, rng=None, train=False, impl="xla",
                        stacked=None):  # no grid; `stacked` accepted for a uniform head signature
    """batch: feat (B, 2, dim) — (previous, current) flattened BERT features."""
    feat = batch["feat"]
    last_feat = init.apply_linear(p["intensity"], feat[:, 0, :])
    this_feat = init.apply_linear(p["stimulation"], feat[:, 1, :])
    fused = bilinear_transition(p["trans"], last_feat, this_feat)
    out = jnp.concatenate([this_feat, init.apply_layer_norm(p["norm"], fused)], axis=1)
    return init.apply_linear(p["out"], out)


# ---------------------------------------------------------------------------
# State_Transfer (others/realformer.py:266-286)
# ---------------------------------------------------------------------------

def init_state_transfer(key, cfg):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "feature": {**grid_mod.init_grid(k1, cfg),
                    **grid_mod.init_grid_head(k2, cfg, "final", "feature")},
        "classifier": init.linear(k3, cfg.dim, 2 * cfg.n_emotions, bias=True),
        "trans": init.uniform01(k4, (cfg.n_emotions, cfg.n_emotions)),
    }


def state_transfer_clip(p, cfg, l, v, a, l_mask, v_mask, a_mask, *,
                        rng=None, train=False, impl="xla", stacked=None):
    """The per-clip half of the State_Transfer head: grid → feature →
    classifier, split into (out_t1, feats) — torch's `chunk(2, 1)` of the
    (…, 2E) classifier output (others/realformer.py:277-278).  Inputs are
    clip-flattened (N, len, dim) / (N, len); used by apply_state_transfer on
    the folded (B·P) axis and by the stateful streaming predictor on one
    clip at a time (serve/stream.ParagraphStreamingPredictor)."""
    e = cfg.n_emotions
    r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
    pooled = grid_mod.apply_grid(
        p["feature"], cfg, l, v, a, l_mask, v_mask, a_mask,
        rng=r1, train=train, impl=impl, collect="final", stacked=stacked)
    feat = grid_mod.apply_grid_head(p["feature"], cfg, pooled, out="feature",
                                    rng=r2, train=train)
    cls = init.apply_linear(p["classifier"], feat)
    return cls[..., :e], cls[..., e:]


def state_transfer_recurrence(trans, prev_out, prev_feats, out_t1, feats):
    """One step of the gated recurrence (others/realformer.py:280-282):
    α = σ(feats_t + feats_{t-1}); out = (1−α)·out_t1 + α·tanh(out_{t-1}·T)."""
    alpha = jax.nn.sigmoid(feats + prev_feats)
    out_t0 = jnp.tanh(prev_out @ trans)
    return (1.0 - alpha) * out_t1 + alpha * out_t0


def apply_state_transfer(p, cfg, batch, *, rng=None, train=False, impl="xla",
                         stacked=None):
    """batch: l/v/a (B,P,len,dm), *_mask (B,P,len). Returns (B, P, E)."""
    l, v, a = batch["l"], batch["v"], batch["a"]
    b, plen = l.shape[0], l.shape[1]
    e = cfg.n_emotions

    def flat(x):
        return x.reshape((b * plen,) + x.shape[2:])

    out_t1_flat, feats_flat = state_transfer_clip(
        p, cfg, flat(l), flat(v), flat(a),
        flat(batch["l_mask"]), flat(batch["v_mask"]), flat(batch["a_mask"]),
        rng=rng, train=train, impl=impl, stacked=stacked)
    out_t1_all = out_t1_flat.reshape(b, plen, e)
    feats_all = feats_flat.reshape(b, plen, e)

    out0, feats0 = out_t1_all[:, 0], feats_all[:, 0]

    def body(carry, xs):
        prev_out, prev_feats = carry
        out_t1, feats = xs
        out = state_transfer_recurrence(p["trans"], prev_out, prev_feats,
                                        out_t1, feats)
        return (out, feats), out

    xs = (out_t1_all[:, 1:].swapaxes(0, 1), feats_all[:, 1:].swapaxes(0, 1))
    _, outs = jax.lax.scan(body, (out0, feats0), xs)
    return jnp.concatenate([out0[:, None, :], outs.swapaxes(0, 1)], axis=1)


# ---------------------------------------------------------------------------
# Grid-only classifier (robot Multi_class, robot_demo.py:377-441)
# ---------------------------------------------------------------------------

def init_grid_only(key, cfg):
    k1, k2 = jax.random.split(key)
    return {**grid_mod.init_grid(k1, cfg),
            **grid_mod.init_grid_head(k2, cfg, "per_layer", "classifier_bias")}


def apply_grid_only(p, cfg, batch, *, rng=None, train=False, impl="xla",
                    stacked=None):
    """batch: l (B,Ll,768), v256/v512/v1024, a, masks. Returns (B, 7)."""
    v = (batch["v256"], batch["v512"], batch["v1024"])
    pooled = grid_mod.apply_grid(
        p, cfg, batch["l"], v, batch["a"],
        batch["l_mask"], batch["v_mask"], batch["a_mask"],
        rng=rng, train=train, impl=impl, collect="per_layer", stacked=stacked)
    return grid_mod.apply_grid_head(p, cfg, pooled, out="classifier_bias")
