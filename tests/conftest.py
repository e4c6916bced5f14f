"""Test harness config: force an 8-device virtual CPU mesh before backend init.

Mirrors the reference's CI trick of re-running with `-tags=purego` to force
portable paths (/root/reference/.github/workflows/pr.yml:73-78): all tests run
on CPU (exact int32 semantics, identical to TPU) with 8 virtual devices so
sharding/collective code paths are exercised without real hardware.

NOTE: in this environment the JAX_PLATFORMS env var is ignored (axon plugin);
jax.config.update('jax_platforms', ...) is authoritative.
"""

import os
import resource

# Raise the stack soft-limit BEFORE jax/XLA initializes its thread pools:
# the recurring segfault inside backend_compile on very large scan bodies
# (pairing exp_cyclotomic: thousands-of-ops loop body) is consistent with
# LLVM stack exhaustion during deeply recursive passes; pthread stacks size
# from the soft rlimit at thread creation.
try:
    resource.setrlimit(resource.RLIMIT_STACK,
                       (512 << 20, resource.RLIM_INFINITY))
except (ValueError, OSError):
    pass

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "parallel_codegen" not in flags:
    # serialize LLVM codegen: XLA:CPU's parallel codegen has aborted the
    # process while compiling large scan bodies (observed in backend_compile
    # on pairing/scalar-mul programs)
    flags += " --xla_cpu_parallel_codegen_split_count=1"
if "optimization_level" not in flags:
    # O1: the recurring backend_compile segfault on very large scan bodies
    # (pairing exp_cyclotomic) lives in an O2 LLVM pass; O1 also cuts
    # compile time for the hundreds of heavy programs in this suite
    flags += " --xla_backend_optimization_level=1"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# NOTE: the persistent compilation cache MUST stay off in this environment.
# This jaxlib's CPU AOT loader compares pseudo-features (prefer-no-scatter/
# gather) that differ between compile and load, and reloaded gather/scatter
# kernels SIGILL/segfault the process (reproduced twice on full-suite runs;
# small arithmetic-only entries reload fine, which makes it look spuriously
# healthy in smoke tests).


# NOTE: an earlier revision cleared jax caches per module to bound compiler
# state. Removed: the backend_compile segfaults kept occurring right after
# module boundaries, consistent with executable deallocation + JIT memory
# reuse being part of the trigger, and re-compiling shared kernels tripled
# the number of compiles (each one a new chance to crash).


_HEAVY_FIRST = ("test_pairing", "test_bw6", "test_tower24", "test_mpcsetup",
                "test_kzg", "test_shplonk_fflonk", "test_vortex",
                "test_signatures", "test_towers")


def pytest_collection_modifyitems(session, config, items):
    """Run the compile-heaviest modules first: the XLA:CPU backend_compile
    segfault is strongly correlated with how much compilation a process has
    already done, so the big pairing/protocol programs get fresh LLVM state
    and the cheap modules absorb the late-life risk."""
    items.sort(key=lambda it: 0 if any(h in it.nodeid for h in _HEAVY_FIRST)
               else 1)


# -- rerun tests whose worker crashed (environmental jaxlib bug) -------------
# XLA:CPU segfaults in backend_compile a few times per full-suite run
# (probabilistic, after lots of prior compilation — see NEXT.md). A crashed
# worker takes its current test down with it; reschedule that test (up to 3
# times) on a replacement worker instead of reporting a spurious failure.
# Same mechanism as pytest-rerunfailures' crash handling.

_crash_reruns: dict = {}


def pytest_handlecrashitem(crashitem, report, sched):
    n = _crash_reruns.get(crashitem, 0)
    if n < 3:
        _crash_reruns[crashitem] = n + 1
        sched.mark_test_pending(crashitem)
        report.outcome = "rerun"


def pytest_report_teststatus(report, config):
    if report.outcome == "rerun":
        return "rerun", "R", ("RERUN", {"yellow": True})
