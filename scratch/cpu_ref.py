"""CPU reference: save fft / fft_inverse results for comparison vs chip."""
import os
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from gnark_crypto_tpu.ntt import fft as fftm
from gnark_crypto_tpu.ntt.domain import Domain
from gnark_crypto_tpu.specs import field as fs

spec = fs.BN254_FR
n = 1 << 14
dom = Domain(spec, n, with_coset=False)
rng = np.random.default_rng(3)
a = jnp.asarray(rng.integers(0, 1 << 12, size=(n, spec.n_limbs),
                             dtype=np.int32))
fwd = np.asarray(fftm.fft(dom, a, fftm.DIF))
inv = np.asarray(fftm.fft_inverse(dom, jnp.asarray(fwd), fftm.DIT))
assert np.array_equal(inv, np.asarray(a)), "CPU roundtrip broken?!"
np.save("/tmp/ref_fwd.npy", fwd)
np.save("/tmp/ref_inv.npy", inv)
print("CPU reference saved; roundtrip ok")
