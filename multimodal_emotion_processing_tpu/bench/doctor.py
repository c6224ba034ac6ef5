"""Environment doctor: measure the host/device properties every perf number
in this framework depends on, and flag the pathologies we have actually hit.

`python -m multimodal_emotion_processing_tpu doctor [--json-only]`

Probes (each bounded; all timing windows end with a scalar device fetch —
utils/sync.py):

  * devices / platform — what JAX actually sees;
  * dispatch floor     — p50 round-trip of a trivial jitted program: the
                         per-step overhead that scan-chaining amortizes;
  * H2D bandwidth      — device_put of a ~8 MB array; relay-attached hosts
                         measure ~MB/s (data-fed training is then
                         transfer-bound — use --device-resident);
  * matmul throughput  — 1024^3 f32 and bf16 GEMMs, GFLOP/s and %-of-peak
                         (MEP_PEAK_TFLOPS overrides the v5e default);
  * sync honesty       — compares `jax.block_until_ready` against a scalar
                         fetch on a multi-step scan program.  On this
                         image's relay, block_until_ready acks large
                         programs ~1000x early (the round-3 retraction,
                         docs/ENGINEERING_NOTES.md); any timing that trusts
                         it is measuring dispatch SUBMISSION.  The probe
                         reports the ratio and a verdict.

Prints ONE JSON object to stdout; human-readable findings to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _p50(samples):
    s = sorted(samples)
    return s[len(s) // 2]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--json-only", action="store_true",
                    help="suppress the stderr findings")
    ap.add_argument("--scan-k", type=int, default=64,
                    help="scan length for the sync-honesty probe")
    ap.add_argument("--n", type=int, default=1024,
                    help="GEMM size for the matmul probe")
    ap.add_argument("--scan-dim", type=int, default=512,
                    help="matrix size inside the sync-honesty scan")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..utils.sync import fetch_scalar

    log = (lambda m: None) if args.json_only else (
        lambda m: print(m, file=sys.stderr, flush=True))
    out = {}

    devs = jax.devices()
    out["platform"] = devs[0].platform
    out["devices"] = [str(d) for d in devs]
    log(f"devices: {out['devices']} (platform {out['platform']})")

    # --- dispatch floor -----------------------------------------------------
    f = jax.jit(lambda x: x + 1.0)
    x = jax.device_put(jnp.zeros((), jnp.float32))
    fetch_scalar(f(x))  # compile
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        fetch_scalar(f(x))
        times.append(time.perf_counter() - t0)
    out["dispatch_floor_ms"] = round(_p50(times) * 1e3, 3)
    log(f"dispatch floor (p50 round-trip of a trivial program): "
        f"{out['dispatch_floor_ms']} ms")

    # --- H2D bandwidth ------------------------------------------------------
    host = np.zeros((2 * 1024 * 1024,), np.float32)  # 8 MB
    jax.device_put(host[:8]).block_until_ready()     # lane warm-up
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        d = jax.device_put(host)
        fetch_scalar(d[-1])  # the bytes must actually be there
        best = min(best, time.perf_counter() - t0)
    mbps = host.nbytes / best / 1e6
    out["h2d_mb_per_s"] = round(mbps, 1)
    log(f"H2D bandwidth (8 MB device_put, best of 3): {mbps:.0f} MB/s")
    if mbps < 100:
        log("  ! relay-grade H2D: data-fed training is transfer-bound here "
            "— prefer --device-resident / --one-dispatch")

    # --- matmul throughput ---------------------------------------------------
    n = args.n
    peak_tflops = float(os.environ.get("MEP_PEAK_TFLOPS", "197"))  # v5e bf16
    for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        a = jax.device_put(jnp.ones((n, n), dt))
        mm = jax.jit(lambda a: a @ a)
        fetch_scalar(mm(a)[0, 0])  # compile
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            fetch_scalar(mm(a)[0, 0])
            best = min(best, time.perf_counter() - t0)
        gflops = 2 * n**3 / best / 1e9
        out[f"matmul_{name}_gflop_s"] = round(gflops, 1)
        log(f"matmul {n}^3 {name}: {gflops:.0f} GFLOP/s "
            f"({gflops / (peak_tflops * 1e3):.1%} of {peak_tflops:.0f} "
            f"TFLOP/s peak; single {n}^3 GEMMs underfill — see "
            "bench/scaling.py for sustained MFU)")

    # --- sync honesty ---------------------------------------------------------
    k = args.scan_k

    def chain(x):
        def body(c, _):
            c = c @ c * 1e-3 + 1.0
            return c, c[0, 0]

        return jax.lax.scan(body, x, None, length=k)

    xm = jax.device_put(jnp.eye(args.scan_dim, dtype=jnp.float32))
    chain_j = jax.jit(chain)
    fetch_scalar(chain_j(xm)[1])  # compile
    # best-of-3 per leg: one host-contention spike in a single-shot window
    # flipped the verdict on a loaded 1-core host (2026-08-19 full-suite
    # run); a real early-ack relay shows ratio >> 3 on EVERY rep, so the
    # min-based ratio keeps the detection while shedding the spikes
    t_block = t_fetch = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        carry, losses = chain_j(xm)
        jax.block_until_ready((carry, losses))
        t_block = min(t_block, time.perf_counter() - t0)
        t0 = time.perf_counter()
        carry, losses = chain_j(xm)
        fetch_scalar(losses)
        t_fetch = min(t_fetch, time.perf_counter() - t0)
    ratio = t_fetch / max(t_block, 1e-9)
    out["sync_block_ms"] = round(t_block * 1e3, 2)
    out["sync_fetch_ms"] = round(t_fetch * 1e3, 2)
    out["sync_early_ack_ratio"] = round(ratio, 2)
    out["sync_honest"] = bool(ratio < 3.0)
    log(f"sync probe (scan k={k}): block_until_ready {t_block * 1e3:.1f} ms "
        f"vs scalar fetch {t_fetch * 1e3:.1f} ms (ratio {ratio:.1f}x)")
    if not out["sync_honest"]:
        log("  ! block_until_ready acks this program EARLY — any timing "
            "that trusts it measures dispatch submission, not execution. "
            "End timed windows with a scalar device fetch (utils/sync.py).")

    # --- compile cache ---------------------------------------------------------
    cache = os.environ.get("MEP_COMPILE_CACHE") or None
    out["compile_cache"] = cache
    log(f"persistent compile cache: {cache or 'off'} "
        "(--compile-cache DIR / MEP_COMPILE_CACHE)")

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
