"""koalabear NTT 2^20 r2 vs r4 on the real chip."""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_tpu_cache")
import sys
import numpy as np

if len(sys.argv) > 1:
    os.environ["GNARK_NTT_RADIX4"] = sys.argv[1]

import jax
import jax.numpy as jnp

if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gnark_crypto_tpu.ntt import fft as fftm
from gnark_crypto_tpu.ntt.domain import Domain
from gnark_crypto_tpu.specs import field as fs

spec = fs.KOALABEAR
n = 1 << 20
dom = Domain(spec, n, with_coset=False)
rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(0, spec.modulus, size=(n,), dtype=np.uint32))
fn = jax.jit(lambda v: fftm.fft(dom, v, fftm.DIF))
r = fn(a)
np.asarray(r[:1])
t0 = time.perf_counter()
iters = 20
for _ in range(iters):
    r = fn(r)
np.asarray(r[:1])
dt = (time.perf_counter() - t0) / iters
print(f"radix4={os.environ.get('GNARK_NTT_RADIX4','default')} "
      f"{dt*1e3:.2f} ms = {n/dt/1e6:.0f}M elems/s", flush=True)
