"""North-star MSM sizes on the real chip: bn254 G1 at 2^20 / 2^24.

Points: 2^16 distinct points generated on device ([i+1]G ladder), tiled to
n (MSM cost is value-independent). Scalars: generated ON DEVICE as random
13-bit limb rows masked to < 2^253 < r (zero tunnel transfer).
Usage: python scratch_probe_msm_big.py [log2_n] [c]"""
import os
import sys
sys.path.insert(0, "/root/repo")
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_tpu_cache")
import jax
import jax.numpy as jnp
import numpy as np

from gnark_crypto_tpu.curve.jacobian import Affine, curve_ops
from gnark_crypto_tpu.msm.pippenger import best_c, msm
from gnark_crypto_tpu.specs import curve as cs

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
c_ovr = int(sys.argv[2]) if len(sys.argv) > 2 else None
n = 1 << logn
print(jax.devices(), flush=True)

spec = cs.get_curve("bn254_g1")
curve = curve_ops(spec)
fr = spec.fr
L = fr.n_limbs

t0 = time.perf_counter()
nbase = min(n, 1 << 16)
g = curve.generator_affine()
base = curve.from_affine(Affine(
    curve.fp.broadcast_to(g.x, (nbase,)),
    curve.fp.broadcast_to(g.y, (nbase,))))
small = curve.fr.from_int([i + 1 for i in range(nbase)], mont=False)
pts16 = curve.to_affine(curve.scalar_mul(base, small, nbits=17))
reps = n // nbase
pts = Affine(jnp.tile(pts16.x, (reps, 1)), jnp.tile(pts16.y, (reps, 1)))
np.asarray(pts.x[:1])
print(f"points ready: {time.perf_counter()-t0:.1f}s "
      f"({pts.x.nbytes*2/2**30:.2f} GiB)", flush=True)

# on-device scalars: random limb rows, top limb masked so value < 2^253 < r
t0 = time.perf_counter()
b = fr.limb_bits
top_bits = 253 - b * (L - 1)
assert top_bits > 0
key = jax.random.PRNGKey(7)
raw = jax.random.randint(key, (n, L), 0, 1 << b, dtype=jnp.int32)
mask = jnp.asarray([(1 << b) - 1] * (L - 1) + [(1 << top_bits) - 1],
                   jnp.int32)
k_dev = raw & mask
np.asarray(k_dev[:1])
print(f"scalars ready: {time.perf_counter()-t0:.1f}s", flush=True)

c = c_ovr or best_c(n)
t0 = time.perf_counter()
res = msm(spec, pts, k_dev, c=c)
np.asarray(res.x[:1])
t_first = time.perf_counter() - t0
print(f"n=2^{logn} c={c} first run (incl compile): {t_first:.1f}s", flush=True)

t0 = time.perf_counter()
res = msm(spec, pts, k_dev, c=c)
np.asarray(res.x[:1])
dt = time.perf_counter() - t0
print(f"n=2^{logn} c={c} warm: {dt*1e3:.1f} ms = {n/dt:,.0f} pts/s",
      flush=True)
