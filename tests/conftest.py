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
# The dir is keyed by a CPU-feature fingerprint: XLA:CPU AOT results compiled on
# a machine with different vector extensions LOAD with a warning but execute
# WRONG MATH (observed: avx512 cache entries silently corrupting adam updates
# on an avx2 host), so a cache must never be shared across machine types.
def _cpu_fingerprint() -> str:
    import hashlib

    # the key must cover everything that changes XLA:CPU AOT codegen: host CPU
    # flags, the jaxlib version, and XLA_FLAGS.  Observed failure mode when it
    # doesn't: cpu_aot_loader loads an entry compiled under a different
    # target-feature profile (e.g. ±prefer-no-scatter) and the process ABORTS
    # (SIGABRT mid-run) or silently computes wrong math.
    parts = [jax.__version__, os.environ.get("XLA_FLAGS", "")]
    try:
        import jaxlib

        parts.append(getattr(jaxlib, "__version__", ""))
    except Exception:  # pragma: no cover
        pass
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    parts.append(line)
                    break
    except OSError:
        import platform

        parts.append(platform.processor())
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


_cache_dir = os.environ.get(
    "JAX_TEST_COMPILE_CACHE", f"/tmp/jax_test_compile_cache_{_cpu_fingerprint()}"
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
