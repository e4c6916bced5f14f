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
# NOTE: do NOT enable the persistent compilation cache here — in this
# environment cached CPU AOT artifacts reload with mismatched target features
# and SIGILL the test process.
