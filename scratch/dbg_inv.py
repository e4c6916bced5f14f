import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_tpu_cache")
if len(os.sys.argv) > 1:
    os.environ["GNARK_NTT_RADIX4"] = os.sys.argv[1]
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
fwd = np.asarray(jax.jit(lambda v: fftm.fft(dom, v, fftm.DIF))(a))
inv = np.asarray(jax.jit(
    lambda v: fftm.fft_inverse(dom, v, fftm.DIT))(jnp.asarray(fwd)))
ok = np.array_equal(inv, np.asarray(a))
bad = np.nonzero(np.any(inv != np.asarray(a), axis=1))[0]
print(f"radix4={os.environ.get('GNARK_NTT_RADIX4','default')} roundtrip_ok={ok} "
      f"nbad={len(bad)} first_bad={bad[:8]}")
