"""Test harness config: force an 8-device virtual CPU mesh before jax import.

Mirrors the reference's CI trick of re-running with `-tags=purego` to force
portable paths (/root/reference/.github/workflows/pr.yml:73-78): here all tests
run on CPU (exact int32 semantics identical to TPU) with 8 virtual devices so
sharding/collective code paths are exercised without real hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
