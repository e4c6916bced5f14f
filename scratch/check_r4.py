"""On-chip bit-exactness: fft() with radix-4 default vs radix-2 vs host oracle."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_tpu_cache")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gnark_crypto_tpu.ntt import fft as fftm
from gnark_crypto_tpu.ntt.domain import Domain
from gnark_crypto_tpu.specs import field as fs

spec = fs.BN254_FR
n = 1 << 14
dom = Domain(spec, n, with_coset=False)
rng = np.random.default_rng(3)
a = jnp.asarray(rng.integers(0, 1 << 12, size=(n, spec.n_limbs),
                             dtype=np.int32))

r4 = np.asarray(jax.jit(lambda v: fftm.fft(dom, v, fftm.DIF))(a))
inv4 = np.asarray(jax.jit(
    lambda v: fftm.fft_inverse(dom, v, fftm.DIT))(jnp.asarray(r4)))
os.environ["GNARK_NTT_RADIX4"] = "0"
jax.clear_caches()
r2 = np.asarray(jax.jit(lambda v: fftm.fft(dom, v, fftm.DIF))(a))
assert np.array_equal(r4, r2), "radix-4 != radix-2 on chip"
assert np.array_equal(inv4, np.asarray(a)), "fft_inverse(fft(a)) != a"

# host big-int oracle on a few outputs
eng = dom.eng
vals_in = eng.to_int(a)
q = spec.modulus
w = dom.generator_int
k = n.bit_length() - 1
rev = [int(f"{i:0{k}b}"[::-1], 2) for i in range(n)]
out_vals = eng.to_int(jnp.asarray(r4))
for j in [0, 1, 5, 1000]:
    expect = sum(v * pow(w, rev[j] * i, q) for i, v in enumerate(vals_in)) % q
    assert out_vals[j] == expect, j
print("radix-4 default: on-chip bit-exact vs radix-2, inverse roundtrip, "
      "and host DFT oracle")
