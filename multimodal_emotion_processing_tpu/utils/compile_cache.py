"""Persistent XLA compilation cache — cold-start control for CLI runs.

The reference scripts have no compiled artifacts at all: every
``python run.py`` launch rebuilds the model and pays torch's warm-up from
scratch.  Under XLA the equivalent cost is the first jit compile of the
train/eval programs — the dominant cold-start on TPU (20-40 s for the
k-fold programs on this image, per CLAUDE.md) — and JAX ships a persistent
compilation cache that serializes every compiled executable to disk so
subsequent *process launches* reuse them (same program + same jaxlib +
same topology => cache hit).

This module is the framework's single switch for that cache.  It is wired
to the CLI as a global ``--compile-cache DIR`` flag and the
``MEP_COMPILE_CACHE`` environment variable, so

    python -m multimodal_emotion_processing_tpu --compile-cache ~/.mep_cache \
        train mosei_trans ...

pays compilation once per program shape, ever, instead of once per run.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str, *, min_compile_secs: float = 1.0,
                             min_entry_bytes: int = 0) -> str:
    """Point JAX's persistent compilation cache at `path` (created if
    missing) and return the resolved directory.

    min_compile_secs: only cache programs whose compile took at least this
      long (default 1 s — skips trivial convert/broadcast programs whose
      disk round-trip would cost more than recompiling them).
    min_entry_bytes: only cache serialized executables at least this large
      (-1 disables the size floor entirely; used by tests to force tiny
      programs into the cache).
    """
    import jax

    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                      int(min_entry_bytes))
    # jax pins its cache backend to the directory current at the process's
    # FIRST compile; without a reset, enabling/repointing after any earlier
    # jit silently keeps writing to the old location (or nowhere)
    from jax._src import compilation_cache as _cc

    _cc.reset_cache()
    return path


def cache_dir_from_env() -> str | None:
    """The ``MEP_COMPILE_CACHE`` directory, or None when unset/empty."""
    return os.environ.get("MEP_COMPILE_CACHE") or None
