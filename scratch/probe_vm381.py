"""Which bls12_381 VM program variant kills the remote compile helper?"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_tpu_cache")
import jax
import jax.numpy as jnp
import numpy as np

from gnark_crypto_tpu.field.pallas import vm
from gnark_crypto_tpu.pairing import vm_pairing as vp
from gnark_crypto_tpu.specs import field as fs

name = sys.argv[1] if len(sys.argv) > 1 else "bls12_381"
print(jax.devices(), name, flush=True)
spec = fs.get_field(f"{name}_fp")
L = spec.n_limbs
nc = vp._gt_coeffs(name)

for variant in ("miller", "product", "reduce", "full"):
    prog = vp.build_program(name, variant)
    print(f"{variant}: program built, {len(prog.code) if hasattr(prog,'code') else '?'} ops", flush=True)
    # minimal inputs for a TILE execute
    n_pad = vm.TILE
    rng = np.random.default_rng(0)
    if variant in ("product", "reduce"):
        inputs = {f"f{i}": jnp.asarray(
            rng.integers(0, 7, size=(n_pad, L), dtype=np.int32))
            for i in range(nc)}
    else:
        zero = jnp.zeros((n_pad, L), jnp.int32)
        inputs = {"px": zero, "py": zero, "m": zero, "mc": zero}
        d = vp._q_coords(name)
        for i in range(d):
            inputs[f"qx{i}"] = zero
            inputs[f"qy{i}"] = zero
    t0 = time.perf_counter()
    try:
        out = vm.execute(prog, inputs, n_pad)
        np.asarray(out[f"g0"].ravel()[:1])
        print(f"{variant}: COMPILED+RAN in {time.perf_counter()-t0:.0f}s",
              flush=True)
    except Exception as e:
        print(f"{variant}: FAILED after {time.perf_counter()-t0:.0f}s "
              f"({type(e).__name__}): {str(e)[:300]}", flush=True)
