"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (SURVEY §4.4).

Note: this environment pre-sets JAX_PLATFORMS=axon and a sitecustomize hook
registers the TPU plugin at interpreter startup, so the env var alone is not
enough — the platform must be overridden through jax.config before any backend
initializes.  XLA_FLAGS still must be set before first backend use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite is compile-dominated on this 1-core
# host; repeat runs skip most XLA compilation
jax.config.update("jax_compilation_cache_dir", "/tmp/mep_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
