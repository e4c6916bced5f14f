"""Do the bls24/bw6 VM pairing programs compile on this chip?"""
import os
import sys
import time
import warnings

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_tpu_cache")
import jax
import numpy as np

from gnark_crypto_tpu.curve.g2 import g2_curve
from gnark_crypto_tpu.curve.jacobian import Affine, curve_ops
from gnark_crypto_tpu.pairing import api as papi
from gnark_crypto_tpu.specs import curve as cs

print(jax.devices(), flush=True)
for name in (sys.argv[1:] or ["bls24_315", "bw6_633"]):
    g1 = curve_ops(cs.get_curve(f"{name}_g1"))
    g2 = g2_curve(name)
    gp, gq = g1.generator_affine(), g2.generator_affine()
    b = 128
    P = Affine(g1.fp.broadcast_to(gp.x, (b,)), g1.fp.broadcast_to(gp.y, (b,)))
    QX = g2.fp.broadcast_to(gq.x, (b,))
    QY = g2.fp.broadcast_to(gq.y, (b,))
    t0 = time.perf_counter()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        r = papi.pair(name, P, QX, QY)
        np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
    dt = time.perf_counter() - t0
    fb = any("falling back" in str(x.message) for x in w)
    print(f"{name}: first pair (compile) {dt:.1f}s "
          f"{'EAGER-FALLBACK' if fb else 'VM'}", flush=True)
    t0 = time.perf_counter()
    r = papi.pair(name, P, QX, QY)
    np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
    print(f"{name}: warm {time.perf_counter()-t0:.2f}s batch={b}", flush=True)
