"""Incremental TPU probe: find where the four-step NTT hangs on real HW."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_tpu_cache")

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    x = jnp.ones((8, 128), jnp.int32)
    np.asarray((x + x)[:1])
    log("tiny op OK")

    from gnark_crypto_tpu.field.pallas.mont_mul import mont_mul
    from gnark_crypto_tpu.specs import field as fs
    spec = fs.BN254_FR
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 12, size=(4096, spec.n_limbs),
                                 dtype=np.int32))
    log("mont_mul 4096 transfer done; compiling...")
    r = mont_mul(spec, a, a)
    np.asarray(r[:1])
    log("pallas mont_mul OK")

    n = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 14
    from gnark_crypto_tpu.ntt import fft as fftm
    from gnark_crypto_tpu.ntt.domain import Domain
    dom = Domain(spec, n, with_coset=False)
    log(f"domain n={n} built")
    base = jnp.asarray(rng.integers(0, 1 << 12, size=(n, spec.n_limbs),
                                    dtype=np.int32))
    np.asarray(base[:1])
    log("input on device")
    fn = __import__("jax").jit(lambda v: fftm.fft(dom, v, fftm.DIF))
    r = fn(base)
    log("dispatched; waiting for result...")
    np.asarray(r[:1])
    log("four-step NTT compile+run OK")
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        r = fn(r)
    np.asarray(r[:1])
    dt = (time.perf_counter() - t0) / iters
    log(f"n={n}: {dt*1e3:.2f} ms/transform = {n/dt/1e6:.1f}M elems/s")


if __name__ == "__main__":
    main()
