"""Test bootstrap: force an 8-device virtual CPU mesh so sharding logic is exercised
without TPU hardware (SURVEY.md §4 'distributed without a cluster').

The container's sitecustomize registers the TPU ('axon') PJRT plugin at interpreter
startup and sets jax_platforms itself, so we must override the config after import —
env vars alone are not enough.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite is compile-bound on CPU; warm runs skip XLA.
_cache_dir = os.environ.get("JAX_TEST_COMPILE_CACHE", "/tmp/jax_test_compile_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
