"""Ablation profile of the MSM accumulate at bench shape (2^16, c=10).

Times the group-accumulate jit with pieces knocked out to attribute cost:
  full        : as shipped
  no_scatter  : bucket scatters replaced by identity
  no_invert   : _log_batch_inverse replaced by identity (den passthrough)
  no_sortgath : argsort+gather skipped (identity order)
Differences between variants ~= cost of the removed piece."""
import os
import sys
sys.path.insert(0, "/root/repo")
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_tpu_cache")
import jax
import jax.numpy as jnp
import numpy as np

from gnark_crypto_tpu.curve.jacobian import Affine, curve_ops
from gnark_crypto_tpu.msm import pippenger as pp
from gnark_crypto_tpu.specs import curve as cs

n = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
c = 10
spec = cs.get_curve("bn254_g1")
curve = curve_ops(spec)
fr = spec.fr
print(jax.devices(), flush=True)

g = curve.generator_affine()
base = curve.from_affine(Affine(
    curve.fp.broadcast_to(g.x, (n,)), curve.fp.broadcast_to(g.y, (n,))))
small = curve.fr.from_int([i + 1 for i in range(n)], mont=False)
pts = curve.to_affine(curve.scalar_mul(base, small, nbits=17))
key = jax.random.PRNGKey(7)
b, L = fr.limb_bits, fr.n_limbs
raw = jax.random.randint(key, (n, L), 0, 1 << b, dtype=jnp.int32)
mask = jnp.asarray([(1 << b) - 1] * (L - 1)
                   + [(1 << (253 - b * (L - 1))) - 1], jnp.int32)
k_dev = raw & mask
np.asarray(k_dev[:1])

dig = jax.jit(lambda s: pp.signed_digits(curve, s, c))
mags, negs = dig(k_dev)
np.asarray(mags[:1])
nwin = mags.shape[0]
print(f"n={n} c={c} nwin={nwin} flat={nwin*n}", flush=True)

orig_scatter_ctx = {}


def timed(tag, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])[:1]
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])[:1]
    dt = (time.perf_counter() - t0) / 3
    print(f"{tag:12s}: {dt*1e3:7.1f} ms", flush=True)
    return dt


def run_variant(tag, patch=None):
    saved = {}
    if patch:
        saved = patch()
    try:
        acc = jax.jit(lambda px, py, m, g: tuple(
            pp._bucket_accumulate_affine(curve, Affine(px, py), m, g, c)))
        return timed(tag, acc, pts.x, pts.y, mags, negs)
    finally:
        for k, v in saved.items():
            setattr(pp, k, v)


t_full = 0.2596  # measured this round


def patch_no_invert():
    saved = {"_log_batch_inverse": pp._log_batch_inverse}
    pp._log_batch_inverse = lambda f, d: d
    return saved


t_noinv = 0.2346  # measured this round


def patch_no_sort():
    saved = {}
    orig = jnp.argsort

    def fake_argsort(x, *a, **k):
        return jnp.arange(x.shape[0], dtype=jnp.int32)
    jnp.argsort = fake_argsort
    saved["_restore_argsort"] = orig
    return saved


# argsort monkeypatch restores via finally-dict abuse
saved_as = jnp.argsort
jnp.argsort = lambda x, *a, **k: jnp.arange(x.shape[0], dtype=jnp.int32)
try:
    acc = jax.jit(lambda px, py, m, g: tuple(
        pp._bucket_accumulate_affine(curve, Affine(px, py), m, g, c)))
    out = acc(pts.x, pts.y, mags, negs)
    np.asarray(jax.tree.leaves(out)[0])[:1]
    t0 = time.perf_counter()
    for _ in range(3):
        out = acc(pts.x, pts.y, mags, negs)
    np.asarray(jax.tree.leaves(out)[0])[:1]
    t_nosort = (time.perf_counter() - t0) / 3
    print(f"{'no_sort':12s}: {t_nosort*1e3:7.1f} ms", flush=True)
finally:
    jnp.argsort = saved_as

print(f"inversion cost ~= {(t_full-t_noinv)*1e3:.1f} ms", flush=True)
print(f"sort cost      ~= {(t_full-t_nosort)*1e3:.1f} ms", flush=True)

# standalone scatter microbench: one level-0-shaped bucket scatter
half = 1 << (c - 1)
slots = half + 1
sentinel = nwin * slots
m = 1 << (nwin * n - 1).bit_length()
tgt = [jnp.zeros((sentinel + 1, L), jnp.int32) for _ in range(3)]
idx = jax.random.randint(key, (m,), 0, sentinel, dtype=jnp.int32)
valid = jax.random.bernoulli(key, 0.01, (m,))
vals = [jnp.ones((m, L), jnp.int32) for _ in range(3)]


def scat(tgt0, tgt1, tgt2, idx, valid, v0, v1, v2):
    i = jnp.where(valid, idx, 0)
    outs = []
    for t, v in ((tgt0, v0), (tgt1, v1), (tgt2, v2)):
        outs.append(t.at[i].set(jnp.where(valid[:, None], v, t[i])))
    return tuple(outs)


jscat = jax.jit(scat)
out = jscat(*tgt, idx, valid, *vals)
np.asarray(jax.tree.leaves(out)[0])[:1]
t0 = time.perf_counter()
for _ in range(5):
    out = jscat(*tgt, idx, valid, *vals)
np.asarray(jax.tree.leaves(out)[0])[:1]
dt = (time.perf_counter() - t0) / 5
print(f"one 3-coord scatter at width {m}: {dt*1e3:.1f} ms", flush=True)
