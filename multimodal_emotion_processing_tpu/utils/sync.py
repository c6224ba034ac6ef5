"""The ONE honest device-synchronization helper for timed windows.

On this image's relay-tunneled TPU, ``jax.block_until_ready`` has been
measured (round-3 probe, docs/ENGINEERING_NOTES.md "measurement-integrity
finding") to acknowledge large programs ~1000x EARLY: a k=128 scan whose
true completion — verified by fetching its losses — takes 1370 ms "blocks"
in 1-4 ms.  Every pre-round-3 M-samples/s headline was this artifact.

A device_get cannot lie: the bytes must exist before the host can read
them.  Therefore EVERY timed window in this repo must end by fetching a
scalar derived from the window's last device result — via this function.
Do not re-implement the idiom inline (four near-copies existed before this
module; a fifth that quietly used block_until_ready instead would regress
the whole measurement record).

Fetching the full result array (e.g. ``np.asarray(out)`` in
bench/latency.py) is strictly stronger and equally honest; the scalar form
exists to keep the fetch O(1) so it does not distort throughput windows.
"""

from __future__ import annotations


def fetch_scalar(x) -> float:
    """Force true device completion of `x` (array or pytree) by fetching a
    scalar reduction of its first leaf; returns the fetched value."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0]))
