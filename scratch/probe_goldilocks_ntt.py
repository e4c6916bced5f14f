"""goldilocks NTT 2^20 on the chip (f64 pair engine, XLA path)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_tpu_cache")
import jax
import jax.numpy as jnp
import numpy as np

from gnark_crypto_tpu.ntt import fft as fftm
from gnark_crypto_tpu.ntt.domain import Domain
from gnark_crypto_tpu.specs import field as fs

spec = fs.GOLDILOCKS
n = 1 << 20
dom = Domain(spec, n, with_coset=False)
fn = jax.jit(lambda a: fftm.fft(dom, a, fftm.DIF))
rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(0, 1 << 32, size=(n, 2), dtype=np.uint32))
a = a.at[:, 1].set(a[:, 1] & np.uint32(0x7FFFFFFF))
print(jax.devices(), flush=True)
r = fn(a)
np.asarray(r[:1])
t0 = time.perf_counter()
iters = 10
for _ in range(iters):
    r = fn(r)
np.asarray(r[:1])
dt = (time.perf_counter() - t0) / iters
print(f"goldilocks ntt 2^20: {dt*1e3:.2f} ms = {n/dt/1e6:.0f}M elems/s",
      flush=True)
