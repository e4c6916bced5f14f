"""VPU throughput probe: int32 multiply vs f32 FMA inside one Pallas kernel.

Decides whether a float-limb Montgomery engine (11-bit limbs in f32) can
beat the int32 CIOS path (203M bn254 muls/s in round 3)."""
import functools
import os
import sys
sys.path.insert(0, "/root/repo")
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_tpu_cache")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 256         # madd chain length inside the kernel
M, N = 512, 512


def _kernel_int(a_ref, b_ref, o_ref):
    a = a_ref[:]
    b = b_ref[:]

    def body(_, acc):
        return acc * b + a
    o_ref[:] = jax.lax.fori_loop(0, R, body, a)


def _kernel_f32(a_ref, b_ref, o_ref):
    a = a_ref[:]
    b = b_ref[:]

    def body(_, acc):
        return acc * b + a
    o_ref[:] = jax.lax.fori_loop(0, R, body, a)


def _kernel_f32_mod(a_ref, b_ref, o_ref):
    # f32 madd + the mod-extract pattern a float-limb CIOS needs:
    # hi = floor(acc * 2^-11), lo = acc - hi * 2^11 (counts as 4 madds)
    a = a_ref[:]
    b = b_ref[:]
    inv = jnp.float32(1.0 / 2048.0)

    def body(_, acc):
        acc = acc * b + a
        hi = jnp.floor(acc * inv)
        return acc - hi * jnp.float32(2048.0) + hi
    o_ref[:] = jax.lax.fori_loop(0, R // 4, body, a)


def run(name, kern, dtype):
    if dtype == jnp.int32:
        a = jnp.asarray(np.random.randint(1, 1000, (M, N), np.int32))
        b = jnp.asarray(np.random.randint(1, 3, (M, N), np.int32))
    else:
        a = jnp.asarray(np.random.rand(M, N), jnp.float32)
        b = jnp.asarray(np.random.rand(M, N) * 0.001 + 1.0, jnp.float32)
    fn = jax.jit(functools.partial(
        pl.pallas_call, kern,
        out_shape=jax.ShapeDtypeStruct((M, N), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))())
    r = fn(a, b)
    np.asarray(r[:1])
    t0 = time.perf_counter()
    iters = 200
    for _ in range(iters):
        r = fn(a, b)
    np.asarray(r[:1])
    dt = (time.perf_counter() - t0) / iters
    ops = M * N * R  # madds
    print(f"{name}: {dt*1e6:.0f} us = {ops/dt/1e9:.1f} G madd/s", flush=True)


print(jax.devices(), flush=True)
run("int32 madd", _kernel_int, jnp.int32)
run("f32   madd", _kernel_f32, jnp.float32)
run("f32 madd+modextract", _kernel_f32_mod, jnp.float32)
