"""The ONE best-of-windows timing helper for device benchmarks.

Companion to utils/sync.py (which owns the honest-sync rationale): every
throughput/latency measurement in this repo should run through
`best_window_ms` rather than re-inlining the warm-up + reps x steps +
scalar-fetch loop — near-copies of the window are how a future timing site
quietly regresses to `block_until_ready` or forgets the warm-up call.

The window: one warm call (compile + first-dispatch costs excluded), then
`reps` windows of `steps` back-to-back calls each, every window ended by a
scalar device_get of the last result; the BEST window is returned (the
shared chip wanders ~4x — CLAUDE.md — so best-of-short-windows is the
stable statistic; callers that also want the median pass reps windows
through `all_windows`).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

from .sync import fetch_scalar


def best_window_ms(fn: Callable, *args, steps: int = 20, reps: int = 4,
                   sync_pick: Optional[Callable] = None,
                   all_windows: Optional[list] = None) -> float:
    """Milliseconds per `fn(*args)` call, best of `reps` windows.

    `sync_pick`: maps fn's return value to the array to fetch (default: the
    value itself; fetch_scalar handles pytrees).  `all_windows`: optional
    list that receives every window's ms/call (for median reporting)."""
    pick = sync_pick if sync_pick is not None else (lambda o: o)
    fetch_scalar(pick(fn(*args)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(steps):
            out = fn(*args)
        fetch_scalar(pick(out))
        ms = (time.perf_counter() - t0) * 1e3 / steps
        if all_windows is not None:
            all_windows.append(ms)
        best = min(best, ms)
    return best
