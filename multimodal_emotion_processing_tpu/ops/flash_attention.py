"""Flash (online-softmax) Pallas TPU kernel for terminal attention blocks.

The materializing kernels in `ops/pallas_attention.py` keep the whole
(B, H, Lq, Lkv) score tensor resident because the RealFormer residual-score
chain CONSUMES it (cmu-mosei/run.py:236-257).  But every `n_layers=1` family
— the flagship and all scaled presets — runs single-block streams whose
scores have NO consumer (`scores_prev=None`, `emit_scores=False`), and at
scaled dims the score tensor is where the HBM time goes: at s1024 the a←a
stream's S is 16·16·512·512·4 B ≈ 268 MB, and XLA's materializing softmax
makes 3-4 passes over it.  This kernel never materializes S beyond a
(block_q, block_kv) tile: softmax runs online (running max / running sum,
rescaled accumulator — the standard flash recurrence), so attention HBM
traffic drops from O(H·L²) to O(L·D).

Scope (everything else falls back to the einsum path in ops/attention.py):
  * scores_prev is None and emit_scores=False (terminal blocks only);
  * 2-D key mask (the only kind the reference configs use) — applied as the
    reference's additive −1e8·(1−mask) penalty, so fully-masked rows still
    produce the same uniform softmax the oracle does (finite penalty, no
    0/0);
  * any kv length — non-128-multiples (all reference configs) are
    zero-padded to the lane width, which is EXACT under the finite −1e8
    penalty (see flash_scored_attention's docstring).

Backward is a custom VJP with TWO flash kernels (dQ; dK/dV/dmask) that
recompute S per tile from q/k and the forward's saved row stats —
`p = exp(s − m)/l` IS the softmax row, no renormalization pass needed.
The stats ride as SEPARATE m and l arrays, not a folded lse = m + log(l):
with a fully-masked row m ≈ −1e8 whose f32 ulp is 8, so folding would
round log(l) away and leave the recomputed p unnormalized (caught by the
zero-mask-row parity test); s − m stays exact because both operands share
the −1e8 magnitude.  Unlike the materializing fused backward (measured 17×
slower at flagship shapes — its score-sized cotangent set left no VMEM
headroom), the flash backward moves no score-sized HBM arrays at all.
`delta = Σ_dh dO·O` is recomputed inline per tile from the o/do blocks
(cheaper than staging a broadcast (B,H,Lq,128) array).

Layouts follow jax's reference TPU flash kernel
(jax/experimental/pallas/ops/tpu/flash_attention.py): heads pre-split to
(B, H, L, dh) outside the kernel; per-row stats kept lane-broadcast at
width 128 (the VPU lane count) so no (bq, 1) column ever needs a lane
relayout; m/l ride between forward and backward as (B, H, Lq, 128).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import MASK_PENALTY, merge_heads, split_heads

_LANES = 128


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _pad_lanes(n: int) -> int:
    return -(-n // _LANES) * _LANES


def _row_tile(col128: jnp.ndarray, width: int) -> jnp.ndarray:
    """(rows, 128) lane-broadcast stats -> (rows, width); width % 128 == 0."""
    return jnp.tile(col128, (1, width // _LANES))


def flash_supported(lq: int, lkv: int, mask, scores_prev,
                    emit_scores: bool, d_head: int = _LANES) -> bool:
    """Whether the flash kernel implements this call's exact semantics."""
    if scores_prev is not None or emit_scores:
        return False  # the score tensor has a consumer — it must materialize
    if mask is not None and mask.ndim != 2:
        return False
    if d_head > 2 * _LANES:
        # a >256-wide head makes even single-head whole-seq blocks VMEM-
        # hostile (e.g. H=1 at dim 1024: 8 MB of q/k/v/o per step before
        # double-buffering); no config comes close — einsum handles it
        return False
    return True  # non-128-multiple kv lens are zero-padded (exactly; see
    # flash_scored_attention) — every terminal-block shape qualifies


def _pick_block_q(lq: int, cap: int = 256) -> int:
    if lq <= cap:
        return lq
    return max(d for d in range(1, cap + 1) if lq % d == 0)


def _pick_block_kv(lkv: int, cap: int = 512) -> int:
    best = _LANES
    for cand in range(_LANES, cap + 1, _LANES):
        if lkv % cand == 0:
            best = cand
    return min(best, lkv)


# ------------------------------------------------- whole-sequence fast path
#
# Every scale preset has L <= 512, so with block caps 256/512 the tiled flash
# grid degenerates to nkv == 1 — yet still pays B*H*nq grid steps of fixed
# per-step cost for ~34 MFLOP each (measured overhead-dominated: 3.2 ms vs
# ~0.5 ms speed-of-light at s1024).  The whole-sequence variants block HEADS
# into the grid step instead: one (b, head-group) step computes softmax(QK^T)V
# for hb heads back-to-back with no running-stats scratch (single kv block =>
# plain softmax), and the backward fuses dQ/dK/dV/dmask into ONE kernel that
# computes s/p/dp/ds once per head instead of twice (tiled path recomputes
# them in both the dQ and dK/dV sweeps).

_WHOLE_CAP = 512           # max seq len for the whole-sequence variants
# scoped-VMEM budget for one grid step: pipeline double-buffers the io
# blocks, and the UNROLLED head loop can keep several heads' score-tile
# temporaries live at once (observed: hb=4 at Lq=512/Lkv=256 allocated
# 16.61M vs the 16M cap at B=64) — both must be modeled, with headroom
_WHOLE_VMEM_BUDGET = 12 * 1024 * 1024


def _whole_fit(lq: int, lkv: int) -> bool:
    return lq <= _WHOLE_CAP and lkv <= _WHOLE_CAP


def _pick_hb(h: int, per_head_io: int, per_head_temps: int,
             fixed: int = 0) -> int:
    """Largest head-group divisor whose step working set (2x double-buffered
    io + unrolled temps) fits the budget; 0 when even one head does not."""
    best = 0
    for cand in range(1, h + 1):
        if h % cand == 0 and (2 * (cand * per_head_io + fixed)
                              + cand * per_head_temps) <= _WHOLE_VMEM_BUDGET:
            best = cand
    return best


def _row_bcast(col: jnp.ndarray, width: int) -> jnp.ndarray:
    """(rows, 1) -> (rows, width) via the lane-safe 128-tile idiom."""
    if width % _LANES == 0:
        return _row_tile(jnp.broadcast_to(col, (col.shape[0], _LANES)), width)
    return jnp.broadcast_to(col, (col.shape[0], width))


def _make_whole_fwd_kernel(hb: int, inv_sqrt: float, emit_stats: bool):
    def kernel(q_ref, k_ref, v_ref, neg_ref, *rest):
        if emit_stats:
            o_ref, m_out, l_out = rest
        else:
            (o_ref,) = rest
            m_out = l_out = None
        neg = neg_ref[0, 0, :][None, :]
        for hh in range(hb):
            q = q_ref[0, hh]                                # (Lq, dh)
            k = k_ref[0, hh]                                # (Lkv, dh)
            lkv = k.shape[0]
            dh = q.shape[1]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * inv_sqrt
            s = s + neg
            mx = jnp.max(s, axis=1)[:, None]                # (Lq, 1)
            pu = jnp.exp(s - _row_bcast(mx, lkv))
            l = jnp.sum(pu, axis=1)[:, None]                # (Lq, 1), >= 1
            pv = jax.lax.dot_general(
                pu, v_ref[0, hh].astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, hh] = (pv * _row_bcast(1.0 / l, dh)).astype(o_ref.dtype)
            if emit_stats:
                m_out[0, hh] = jnp.broadcast_to(mx, (mx.shape[0], _LANES))
                l_out[0, hh] = jnp.broadcast_to(l, (l.shape[0], _LANES))

    return kernel


def _flash_forward_whole(qh, kh, vh, neg, *, emit_stats: bool):
    b, h, lq, dh = qh.shape
    lkv = kh.shape[2]
    itemsize = jnp.dtype(qh.dtype).itemsize
    per_head_io = (2 * lq + 2 * lkv) * max(dh, _LANES) * itemsize
    if emit_stats:
        per_head_io += 2 * lq * _LANES * 4                  # m/l outputs
    # s, p, exp/tile intermediates (f32 score tiles) + row stats per head
    per_head_temps = 3 * lq * _pad_lanes(lkv) * 4 + 2 * lq * _LANES * 4
    hb = _pick_hb(h, per_head_io, per_head_temps, fixed=lkv * 4)
    if hb == 0:
        return None                                         # caller tiles
    inv_sqrt = 1.0 / math.sqrt(dh)

    def hix(ib, ih):
        return (ib, ih, 0, 0)

    qspec = pl.BlockSpec((1, hb, lq, dh), hix, memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, hb, lkv, dh), hix, memory_space=pltpu.VMEM)
    negspec = pl.BlockSpec((1, 1, lkv), lambda ib, ih: (ib, 0, 0),
                           memory_space=pltpu.VMEM)
    out_specs = [qspec]
    out_shape = [jax.ShapeDtypeStruct((b, h, lq, dh), qh.dtype)]
    if emit_stats:
        stat_spec = pl.BlockSpec((1, hb, lq, _LANES), hix,
                                 memory_space=pltpu.VMEM)
        stat_shape = jax.ShapeDtypeStruct((b, h, lq, _LANES), jnp.float32)
        out_specs += [stat_spec, stat_spec]
        out_shape += [stat_shape, stat_shape]
    out = pl.pallas_call(
        _make_whole_fwd_kernel(hb, inv_sqrt, emit_stats),
        grid=(b, h // hb),
        in_specs=[qspec, kvspec, kvspec, negspec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(qh, kh, vh, neg)
    return (out[0], (out[1], out[2])) if emit_stats else (out[0], None)


def _make_whole_bwd_kernel(hb: int, inv_sqrt: float, with_stats: bool):
    """with_stats=False: the kernel already materializes the full score tile
    s, so the softmax row stats are RECOMPUTED from it (bit-identical ops to
    the whole forward kernel) instead of read from HBM — the forward then
    skips emitting its (B, H, Lq, 128)-replicated f32 m/l outputs entirely,
    saving ~2.3 GB/step of stat traffic at s1024 B=64."""
    def kernel(q_ref, k_ref, v_ref, neg_ref, *rest):
        if with_stats:
            (m_ref, l_ref, o_ref, do_ref,
             dq_ref, dk_ref, dv_ref, dmh_ref) = rest
        else:
            o_ref, do_ref, dq_ref, dk_ref, dv_ref, dmh_ref = rest
        neg = neg_ref[0, 0, :][None, :]
        for hh in range(hb):
            q = q_ref[0, hh]
            k = k_ref[0, hh]
            lkv = k.shape[0]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * inv_sqrt
            s = s + neg
            if with_stats:
                p = (jnp.exp(s - _row_tile(m_ref[0, hh], lkv))
                     * _row_tile(1.0 / l_ref[0, hh], lkv))
            else:
                mx = jnp.max(s, axis=1)[:, None]
                pu = jnp.exp(s - _row_bcast(mx, lkv))
                l = jnp.sum(pu, axis=1)[:, None]
                p = pu * _row_bcast(1.0 / l, lkv)
            do = do_ref[0, hh].astype(jnp.float32)
            o = o_ref[0, hh].astype(jnp.float32)
            delta = jnp.sum(do * o, axis=1)[:, None]        # (Lq, 1)
            # dq/dk/dv compute in f32 and store at the INPUT dtype: the VJP
            # boundary casts cotangents to the primal dtype anyway, so
            # rounding here is the same value — and the kernel then writes
            # half the HBM bytes and XLA's merge_heads epilogue becomes a
            # pure (cheap bf16) transpose instead of convert+transpose
            # (measured 15.4 ms/step of convert_bitcast fusions at
            # s1024-bf16 B=64 before this change).
            dv_ref[0, hh] = jax.lax.dot_general(
                p, do, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dv_ref.dtype)
            dp = jax.lax.dot_general(
                do, v_ref[0, hh].astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - _row_bcast(delta, lkv))
            dq_ref[0, hh] = (jax.lax.dot_general(
                ds, k.astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
                * inv_sqrt).astype(dq_ref.dtype)
            dk_ref[0, hh] = (jax.lax.dot_general(
                ds, q.astype(jnp.float32),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
                * inv_sqrt).astype(dk_ref.dtype)
            # scores = raw - 1e8*(1-mask): d(scores)/d(mask) = +1e8
            dmh_ref[0, hh, 0, :] = MASK_PENALTY * jnp.sum(ds, axis=0)

    return kernel


def _whole_bwd_hb(lq: int, lkv: int, dh: int, h: int, itemsize: int) -> int:
    """Head-group size the whole-backward kernel can run at (0 = must tile).
    Shared by the backward itself and the VJP forward, which uses it to
    decide whether emitting m/l stats is needed at all."""
    # io per head: q,k,v,o,do + dq,dk,dv at input width + the dmask row
    # (stats-free recompute variant — the stats reads are gone)
    per_head_io = ((3 * lq + 2 * lkv) * max(dh, _LANES) * itemsize
                   + (lq + 2 * lkv) * max(dh, _LANES) * itemsize
                   + lkv * 4)
    # s, p, dp, ds f32 score tiles + row stats per unrolled head
    per_head_temps = 4 * lq * _pad_lanes(lkv) * 4 + 3 * lq * _LANES * 4
    return _pick_hb(h, per_head_io, per_head_temps, fixed=lkv * 4)


def _flash_backward_whole(qh, kh, vh, neg, m, l, oh, doh):
    b, h, lq, dh = qh.shape
    lkv = kh.shape[2]
    itemsize = jnp.dtype(qh.dtype).itemsize
    hb = _whole_bwd_hb(lq, lkv, dh, h, itemsize)
    if hb == 0:
        return None                                         # caller tiles
    with_stats = m is not None
    inv_sqrt = 1.0 / math.sqrt(dh)

    def hix(ib, ih):
        return (ib, ih, 0, 0)

    qspec = pl.BlockSpec((1, hb, lq, dh), hix, memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, hb, lkv, dh), hix, memory_space=pltpu.VMEM)
    negspec = pl.BlockSpec((1, 1, lkv), lambda ib, ih: (ib, 0, 0),
                           memory_space=pltpu.VMEM)
    statspec = pl.BlockSpec((1, hb, lq, _LANES), hix, memory_space=pltpu.VMEM)
    dmhspec = pl.BlockSpec((1, hb, 1, lkv), lambda ib, ih: (ib, ih, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [qspec, kvspec, kvspec, negspec]
    ins = [qh, kh, vh, neg]
    if with_stats:
        in_specs += [statspec, statspec]
        ins += [m, l]
    dq, dk, dv, dmh = pl.pallas_call(
        _make_whole_bwd_kernel(hb, inv_sqrt, with_stats),
        grid=(b, h // hb),
        in_specs=in_specs + [qspec, qspec],
        out_specs=[qspec, kvspec, kvspec, dmhspec],
        out_shape=[jax.ShapeDtypeStruct((b, h, lq, dh), qh.dtype),
                   jax.ShapeDtypeStruct((b, h, lkv, dh), qh.dtype),
                   jax.ShapeDtypeStruct((b, h, lkv, dh), qh.dtype),
                   jax.ShapeDtypeStruct((b, h, 1, lkv), jnp.float32)],
        interpret=_interpret(),
    )(*ins, oh, doh)
    return dq, dk, dv, jnp.sum(dmh[:, :, 0, :], axis=1)


# ---------------------------------------------------------------- forward

def _make_flash_fwd_kernel(inv_sqrt: float, emit_stats: bool):
    def kernel(q_ref, k_ref, v_ref, neg_ref, *rest):
        if emit_stats:
            o_ref, m_out, l_out, m_ref, l_ref, acc_ref = rest
        else:
            o_ref, m_ref, l_ref, acc_ref = rest
            m_out = l_out = None
        ikv = pl.program_id(3)
        nkv = pl.num_programs(3)

        @pl.when(ikv == 0)
        def _init():
            m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
            l_ref[...] = jnp.zeros(l_ref.shape, jnp.float32)
            acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

        q = q_ref[0, 0]                                     # (bq, dh)
        k = k_ref[0, 0]                                     # (bkv, dh)
        bkv = k.shape[0]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt  # (bq, bkv)
        s = s + neg_ref[0, 0, :][None, :]                   # additive −1e8·(1−mask)

        m_prev = m_ref[...]                                 # (bq, 128)
        l_prev = l_ref[...]
        m_curr = jnp.max(s, axis=1)[:, None]                # (bq, 1)
        m_next = jnp.maximum(m_prev, m_curr)                # (bq, 128)
        p = jnp.exp(s - _row_tile(m_next, bkv))             # (bq, bkv)
        alpha = jnp.exp(m_prev - m_next)                    # (bq, 128)
        l_corr = alpha * l_prev
        l_next = jnp.sum(p, axis=1)[:, None] + l_corr       # (bq, 128)
        m_ref[...] = m_next
        l_ref[...] = l_next
        # finite mask penalty => p's row max is exactly 1.0, l_next >= 1
        l_inv = 1.0 / l_next
        dh = acc_ref.shape[-1]
        if dh % _LANES == 0:
            bcast = lambda x: _row_tile(x, dh)
        else:
            bcast = lambda x: x[:, :dh] if dh < _LANES else None
        acc_ref[...] *= bcast(l_corr * l_inv)
        pv = jax.lax.dot_general(
            p, v_ref[0, 0].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[...] += pv * bcast(l_inv)

        @pl.when(ikv == nkv - 1)
        def _store():
            o_ref[0, 0] = acc_ref[...].astype(o_ref.dtype)
            if emit_stats:
                # m and l ride SEPARATELY: with a fully-masked row m ≈ −1e8
                # (ulp 8 in f32), so a folded lse = m + log(l) would round
                # the log(l) normalization away entirely — the backward's
                # p = exp(s − m)/l keeps both subtractions exact
                m_out[0, 0] = m_ref[...]
                l_out[0, 0] = l_ref[...]

    return kernel


def _flash_forward(qh, kh, vh, neg, *, emit_stats: bool,
                   block_q: Optional[int], block_kv: Optional[int]):
    """qh/kh/vh: (B, H, L, dh) head-split; neg: (B, 1, Lkv) f32 additive
    penalty.  Returns (o (B,H,Lq,dh), (m, l) lane-broadcast row stats
    (B,H,Lq,128) each, or None)."""
    b, h, lq, dh = qh.shape
    lkv = kh.shape[2]
    if block_q is None and block_kv is None and _whole_fit(lq, lkv):
        out = _flash_forward_whole(qh, kh, vh, neg, emit_stats=emit_stats)
        if out is not None:
            return out                  # fits; else tile below
    bq = block_q or _pick_block_q(lq)
    bkv = block_kv or _pick_block_kv(lkv)
    grid = (b, h, lq // bq, lkv // bkv)
    inv_sqrt = 1.0 / math.sqrt(dh)

    qspec = pl.BlockSpec((1, 1, bq, dh), lambda ib, ih, iq, ikv: (ib, ih, iq, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, bkv, dh),
                          lambda ib, ih, iq, ikv: (ib, ih, ikv, 0),
                          memory_space=pltpu.VMEM)
    negspec = pl.BlockSpec((1, 1, bkv), lambda ib, ih, iq, ikv: (ib, 0, ikv),
                           memory_space=pltpu.VMEM)
    out_specs = [qspec]
    out_shape = [jax.ShapeDtypeStruct((b, h, lq, dh), qh.dtype)]
    if emit_stats:
        stat_spec = pl.BlockSpec(
            (1, 1, bq, _LANES), lambda ib, ih, iq, ikv: (ib, ih, iq, 0),
            memory_space=pltpu.VMEM)
        stat_shape = jax.ShapeDtypeStruct((b, h, lq, _LANES), jnp.float32)
        out_specs += [stat_spec, stat_spec]
        out_shape += [stat_shape, stat_shape]
    out = pl.pallas_call(
        _make_flash_fwd_kernel(inv_sqrt, emit_stats),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec, negspec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bq, _LANES), jnp.float32),   # running max
            pltpu.VMEM((bq, _LANES), jnp.float32),   # running sum
            pltpu.VMEM((bq, dh), jnp.float32),       # output accumulator
        ],
        interpret=_interpret(),
    )(qh, kh, vh, neg)
    return (out[0], (out[1], out[2])) if emit_stats else (out[0], None)


# ---------------------------------------------------------------- backward

def _make_flash_dq_kernel(inv_sqrt: float):
    def kernel(q_ref, k_ref, v_ref, neg_ref, m_ref, l_ref, o_ref, do_ref,
               dq_ref, dq_acc):
        ikv = pl.program_id(3)
        nkv = pl.num_programs(3)

        @pl.when(ikv == 0)
        def _init():
            dq_acc[...] = jnp.zeros(dq_acc.shape, jnp.float32)

        q = q_ref[0, 0]
        k = k_ref[0, 0]
        bkv = k.shape[0]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt
        s = s + neg_ref[0, 0, :][None, :]
        p = (jnp.exp(s - _row_tile(m_ref[0, 0], bkv))
             * _row_tile(1.0 / l_ref[0, 0], bkv))           # softmax rows
        do = do_ref[0, 0].astype(jnp.float32)               # (bq, dh)
        o = o_ref[0, 0].astype(jnp.float32)
        delta = jnp.sum(do * o, axis=1)[:, None]            # (bq, 1)
        dp = jax.lax.dot_general(
            do, v_ref[0, 0].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (bq, bkv)
        ds = p * (dp - delta)
        dq_acc[...] += jax.lax.dot_general(
            ds, k.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt

        @pl.when(ikv == nkv - 1)
        def _store():
            # input-dtype store: same value as the VJP boundary cast, half
            # the HBM bytes (see _make_whole_bwd_kernel)
            dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)

    return kernel


def _make_flash_dkv_kernel(inv_sqrt: float):
    def kernel(q_ref, k_ref, v_ref, neg_ref, m_ref, l_ref, o_ref, do_ref,
               dk_ref, dv_ref, dmh_ref, dk_acc, dv_acc, dm_acc):
        iq = pl.program_id(3)
        nq = pl.num_programs(3)

        @pl.when(iq == 0)
        def _init():
            dk_acc[...] = jnp.zeros(dk_acc.shape, jnp.float32)
            dv_acc[...] = jnp.zeros(dv_acc.shape, jnp.float32)
            dm_acc[...] = jnp.zeros(dm_acc.shape, jnp.float32)

        q = q_ref[0, 0]
        k = k_ref[0, 0]
        bkv = k.shape[0]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt
        s = s + neg_ref[0, 0, :][None, :]
        p = (jnp.exp(s - _row_tile(m_ref[0, 0], bkv))
             * _row_tile(1.0 / l_ref[0, 0], bkv))
        do = do_ref[0, 0].astype(jnp.float32)
        o = o_ref[0, 0].astype(jnp.float32)
        delta = jnp.sum(do * o, axis=1)[:, None]
        dv_acc[...] += jax.lax.dot_general(
            p, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (bkv, dh)
        dp = jax.lax.dot_general(
            do, v_ref[0, 0].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta)                               # (bq, bkv)
        dk_acc[...] += jax.lax.dot_general(
            ds, q.astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt
        dm_acc[...] += jnp.sum(ds, axis=0)[None, :]

        @pl.when(iq == nq - 1)
        def _store():
            dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
            dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)
            # scores = raw − 1e8·(1−mask): d(scores)/d(mask) = +1e8
            dmh_ref[0, 0, 0, :] = MASK_PENALTY * dm_acc[0, :]

    return kernel


def _flash_backward(qh, kh, vh, neg, m, l, oh, doh,
                    block_q: Optional[int], block_kv: Optional[int]):
    """Returns (dq, dk, dv) head-split at the INPUT dtype (f32 compute,
    one round at the store — the same value the VJP boundary cast produced
    when these were f32) and dmask (B, Lkv) f32."""
    b, h, lq, dh = qh.shape
    lkv = kh.shape[2]
    if block_q is None and block_kv is None and _whole_fit(lq, lkv):
        out = _flash_backward_whole(qh, kh, vh, neg, m, l, oh, doh)
        if out is not None:
            return out                  # fits; else tile below
    assert m is not None and l is not None, (
        "tiled flash backward needs the forward's m/l stats — the VJP "
        "forward's whole_bwd predicate must match _flash_backward_whole's")
    bq = block_q or _pick_block_q(lq)
    bkv = block_kv or _pick_block_kv(lkv)
    inv_sqrt = 1.0 / math.sqrt(dh)

    def qix(ib, ih, iq, ikv):
        return (ib, ih, iq, 0)

    def kvix(ib, ih, iq, ikv):
        return (ib, ih, ikv, 0)

    qspec = pl.BlockSpec((1, 1, bq, dh), qix, memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, bkv, dh), kvix, memory_space=pltpu.VMEM)
    negspec = pl.BlockSpec((1, 1, bkv), lambda ib, ih, iq, ikv: (ib, 0, ikv),
                           memory_space=pltpu.VMEM)
    statspec = pl.BlockSpec((1, 1, bq, _LANES), qix, memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        _make_flash_dq_kernel(inv_sqrt),
        grid=(b, h, lq // bq, lkv // bkv),
        in_specs=[qspec, kvspec, kvspec, negspec, statspec, statspec,
                  qspec, qspec],
        out_specs=[qspec],
        out_shape=[jax.ShapeDtypeStruct((b, h, lq, dh), qh.dtype)],
        scratch_shapes=[pltpu.VMEM((bq, dh), jnp.float32)],
        interpret=_interpret(),
    )(qh, kh, vh, neg, m, l, oh, doh)[0]

    # dK/dV sweep: kv blocks outer, q blocks inner (accumulate over queries)
    def qix2(ib, ih, ikv, iq):
        return (ib, ih, iq, 0)

    def kvix2(ib, ih, ikv, iq):
        return (ib, ih, ikv, 0)

    qspec2 = pl.BlockSpec((1, 1, bq, dh), qix2, memory_space=pltpu.VMEM)
    kvspec2 = pl.BlockSpec((1, 1, bkv, dh), kvix2, memory_space=pltpu.VMEM)
    negspec2 = pl.BlockSpec((1, 1, bkv), lambda ib, ih, ikv, iq: (ib, 0, ikv),
                            memory_space=pltpu.VMEM)
    statspec2 = pl.BlockSpec((1, 1, bq, _LANES), qix2, memory_space=pltpu.VMEM)
    # (B, H, 1, Lkv) with a singleton sublane axis: a (1, bkv) trailing
    # block is only legal when the sublane block dim EQUALS the array dim
    dmhspec = pl.BlockSpec((1, 1, 1, bkv),
                           lambda ib, ih, ikv, iq: (ib, ih, 0, ikv),
                           memory_space=pltpu.VMEM)
    dk, dv, dmh = pl.pallas_call(
        _make_flash_dkv_kernel(inv_sqrt),
        grid=(b, h, lkv // bkv, lq // bq),
        in_specs=[qspec2, kvspec2, kvspec2, negspec2, statspec2, statspec2,
                  qspec2, qspec2],
        out_specs=[kvspec2, kvspec2, dmhspec],
        out_shape=[jax.ShapeDtypeStruct((b, h, lkv, dh), qh.dtype),
                   jax.ShapeDtypeStruct((b, h, lkv, dh), qh.dtype),
                   jax.ShapeDtypeStruct((b, h, 1, lkv), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((bkv, dh), jnp.float32),
                        pltpu.VMEM((bkv, dh), jnp.float32),
                        pltpu.VMEM((1, bkv), jnp.float32)],
        interpret=_interpret(),
    )(qh, kh, vh, neg, m, l, oh, doh)
    return dq, dk, dv, jnp.sum(dmh[:, :, 0, :], axis=1)


# ------------------------------------------------------------------ VJP

@functools.lru_cache(maxsize=None)
def _make_flash(n_heads: int, block_q: Optional[int],
                block_kv: Optional[int]):
    def _neg(mask, b, lkv):
        return (MASK_PENALTY * (mask.astype(jnp.float32) - 1.0)
                ).reshape(b, 1, lkv)

    @jax.custom_vjp
    def attn(q, k, v, mask, c):
        b, _, _ = q.shape
        lkv = k.shape[1]
        o, _ = _flash_forward(
            split_heads(q, n_heads), split_heads(k, n_heads),
            split_heads(v, n_heads), _neg(mask, b, lkv),
            emit_stats=False, block_q=block_q, block_kv=block_kv)
        return merge_heads(o)

    def fwd(q, k, v, mask, c):
        b, _, _ = q.shape
        lkv = k.shape[1]
        qh = split_heads(q, n_heads)
        kh = split_heads(k, n_heads)
        vh = split_heads(v, n_heads)
        neg = _neg(mask, b, lkv)
        # the whole-backward kernel materializes the full score tile anyway
        # and recomputes m/l from it bit-identically, so when it will run,
        # the forward skips emitting its lane-replicated f32 stats entirely
        # (~2.3 GB/step of write+read traffic at s1024 B=64)
        h, dh = n_heads, qh.shape[3]
        lq = qh.shape[2]
        whole_bwd = (block_q is None and block_kv is None
                     and _whole_fit(lq, lkv)
                     and _whole_bwd_hb(lq, lkv, dh, h,
                                       jnp.dtype(qh.dtype).itemsize) > 0)
        oh, stats = _flash_forward(qh, kh, vh, neg,
                                   emit_stats=not whole_bwd,
                                   block_q=block_q, block_kv=block_kv)
        m, l = stats if stats is not None else (None, None)
        return merge_heads(oh), (qh, kh, vh, neg, m, l, oh, c)

    def bwd(res, doc):
        qh, kh, vh, neg, m, l, oh, c = res
        doh = split_heads(doc, n_heads)
        dq, dk, dv, dmask = _flash_backward(qh, kh, vh, neg, m, l, oh, doh,
                                            block_q, block_kv)
        return (merge_heads(dq).astype(qh.dtype),
                merge_heads(dk).astype(kh.dtype),
                merge_heads(dv).astype(vh.dtype),
                dmask.astype(qh.dtype), jnp.zeros_like(c))

    attn.defvjp(fwd, bwd)
    return attn


def flash_scored_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    c: jnp.ndarray,
    *,
    n_heads: int,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
):
    """Terminal-block scored attention without materializing S.

    Same math as `ops.attention.scored_attention(..., scores_prev=None,
    emit_scores=False)` up to online-softmax fp reassociation; returns
    (ctx, None).  Callers must check `flash_supported` first.

    Non-128-multiple kv lengths (every reference config: a_len 200, v_len
    100, ...) are zero-padded to the next lane multiple.  The padding is
    EXACT, not approximate: padded mask entries are 0, so padded scores sit
    at ≈ −1e8 while real rows keep finite maxima — `exp(−1e8 − m)`
    underflows to exactly 0.0 in f32, contributing nothing to the row sum,
    the context, or (through the zero p and sliced-away cotangents) any
    gradient.  This is the same reason fully-masked ROWS are safe: the
    reference's finite penalty (not −inf) makes masked weights exact zeros
    here while keeping exp() well-defined.
    """
    b, lq, d = q.shape
    lkv = k.shape[1]
    if mask is None:
        mask = jnp.ones((b, lkv), q.dtype)
    pad = _pad_lanes(lkv) - lkv
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))  # zeros = masked out
    fn = _make_flash(n_heads, block_q, block_kv)
    return fn(q, k, v, mask, c), None
