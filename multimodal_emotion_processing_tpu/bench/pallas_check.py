"""On-device Pallas kernel parity check — forward AND backward.

The test suite exercises the kernel in interpret mode on CPU; this module
runs the TPU-COMPILED kernel on the current device and prints one JSON line,
so hardware kernel correctness is a recorded artifact, not an anecdote:

    python -m multimodal_emotion_processing_tpu.bench.pallas_check
    (or `make pallas-check`)

Checks the full op contract at flagship shapes (ops/attention.py: context,
emitted masked scores, and all six input cotangents through the custom VJP)
against the XLA einsum oracle.  Exits non-zero on tolerance failure.
"""

from __future__ import annotations

import json
import sys

import numpy as np


def run_check(b=8, lq=100, lkv=200, d=96, h=6, seed=0, tol=2e-2):
    """Relative-tolerance parity vs the XLA path on the current device.
    `tol` is relative to each tensor's own max magnitude (TPU f32 matmuls run
    bf16 MXU passes, so both paths carry ~1e-3 relative rounding)."""
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_processing_tpu.ops.attention import scored_attention

    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, lq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, lkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, lkv, d)), jnp.float32)
    mask = jnp.asarray(rng.random((b, lkv)) > 0.2, jnp.float32)
    sprev = jnp.asarray(rng.standard_normal((b, h, lq, lkv)), jnp.float32)
    c = jnp.asarray([0.37], jnp.float32)

    def loss(impl):
        def f(q, k, v, mask, sprev, c):
            ctx, scores = scored_attention(q, k, v, mask, sprev, c,
                                           n_heads=h, impl=impl)
            # weight both outputs so every cotangent path is exercised;
            # tanh keeps the ~-1e8 masked score entries from dominating
            return jnp.sum(ctx * ctx) + jnp.sum(jnp.tanh(scores))
        return f

    report = {"device": str(jax.devices()[0]), "shapes": [b, lq, lkv, d, h]}
    ok = True

    fx = jax.jit(loss("xla"))
    fp = jax.jit(loss("pallas"))
    ctx_x, s_x = scored_attention(q, k, v, mask, sprev, c, n_heads=h, impl="xla")
    ctx_p, s_p = scored_attention(q, k, v, mask, sprev, c, n_heads=h, impl="pallas")

    def rel(a, b_):
        a, b_ = np.asarray(a), np.asarray(b_)
        return float(np.max(np.abs(a - b_)) / (np.max(np.abs(a)) + 1e-9))

    report["forward"] = {"ctx_rel": rel(ctx_x, ctx_p), "scores_rel": rel(s_x, s_p)}
    ok &= report["forward"]["ctx_rel"] < tol
    ok &= report["forward"]["scores_rel"] < tol

    gx = jax.grad(fx, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, mask, sprev, c)
    gp = jax.grad(fp, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, mask, sprev, c)
    names = ("dq", "dk", "dv", "dmask", "dsprev", "dc")
    report["backward"] = {n: rel(a, b_) for n, a, b_ in zip(names, gx, gp)}
    ok &= all(r < tol for r in report["backward"].values())

    report["ok"] = bool(ok)
    report["tol_relative"] = tol
    return report


def run_flash_check(b=8, lq=256, lkv=512, d=128, h=4, seed=1, tol=2e-2):
    """Flash (online-softmax) kernel parity on the current device at a
    scale-preset-like shape (terminal-block semantics: no scores_prev, no
    emitted scores; Lkv a 128-multiple so the kernel engages)."""
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_processing_tpu.ops.attention import scored_attention

    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, lq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, lkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, lkv, d)), jnp.float32)
    mask = jnp.asarray(rng.random((b, lkv)) > 0.2, jnp.float32)
    c = jnp.asarray([0.37], jnp.float32)

    def loss(impl):
        def f(q, k, v, mask, c):
            ctx, _ = scored_attention(q, k, v, mask, None, c, n_heads=h,
                                      impl=impl, emit_scores=False)
            return jnp.sum(ctx * ctx)
        return f

    def rel(a, b_):
        a, b_ = np.asarray(a), np.asarray(b_)
        return float(np.max(np.abs(a - b_)) / (np.max(np.abs(a)) + 1e-9))

    report = {"shapes": [b, lq, lkv, d, h]}
    ctx_x, _ = scored_attention(q, k, v, mask, None, c, n_heads=h,
                                impl="xla", emit_scores=False)
    ctx_f, _ = scored_attention(q, k, v, mask, None, c, n_heads=h,
                                impl="flash", emit_scores=False)
    report["forward"] = {"ctx_rel": rel(ctx_x, ctx_f)}
    ok = report["forward"]["ctx_rel"] < tol
    gx = jax.grad(jax.jit(loss("xla")), argnums=(0, 1, 2, 3))(q, k, v, mask, c)
    gf = jax.grad(jax.jit(loss("flash")), argnums=(0, 1, 2, 3))(q, k, v, mask, c)
    report["backward"] = {n: rel(a, b_) for n, a, b_ in
                          zip(("dq", "dk", "dv", "dmask"), gx, gf)}
    ok &= all(r < tol for r in report["backward"].values())
    report["ok"] = bool(ok)
    report["tol_relative"] = tol
    return report


def main():
    report = run_check()
    flash = run_flash_check()
    print(json.dumps({"pallas_check": report, "flash_check": flash}))
    sys.exit(0 if (report["ok"] and flash["ok"]) else 1)


if __name__ == "__main__":
    main()
