"""Test harness config: force an 8-device virtual CPU mesh before backend init.

Mirrors the reference's CI trick of re-running with `-tags=purego` to force
portable paths (/root/reference/.github/workflows/pr.yml:73-78): all tests run
on CPU (exact int32 semantics, identical to TPU) with 8 virtual devices so
sharding/collective code paths are exercised without real hardware.

NOTE: in this environment the JAX_PLATFORMS env var is ignored (axon plugin);
jax.config.update('jax_platforms', ...) is authoritative.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# Persistent compile cache, CPU-ONLY path. Never share this directory with
# TPU-platform processes: entries written by mixed-platform runs reload with
# mismatched CPU features and SIGILL the process (observed). Pure-CPU runs
# produce/consume consistent entries and cut repeat-suite compile time ~10x.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
