"""Time each MSM accumulate component separately at level-0 shapes.

All pieces jitted standalone at (2^20 pairs, 22 limbs) = level-0 of the
2^16/c=10 bench shape; lower levels halve, so sum over levels ~= 2x level0.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_tpu_cache")
import jax
import jax.numpy as jnp
import numpy as np

from gnark_crypto_tpu.curve.jacobian import curve_ops
from gnark_crypto_tpu.field.pallas.point_add import affine_finish, affine_prep
from gnark_crypto_tpu.msm import pippenger as pp
from gnark_crypto_tpu.specs import curve as cs

spec = cs.get_curve("bn254_g1")
curve = curve_ops(spec)
f = curve.fp
L = spec.fp.n_limbs
W = 1 << 20   # pairs at level 0
print(jax.devices(), f"L={L} W={W}", flush=True)

rng = np.random.default_rng(0)


def arr(shape):
    return jnp.asarray(rng.integers(0, 1 << 12, size=shape, dtype=np.int32))


def timed(tag, fn, *args, iters=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:28s}: {dt*1e3:7.2f} ms", flush=True)
    return dt


xs = [arr((W, L)) for _ in range(8)]
num = arr((W, L))
dinv = arr((W, L))
mb = jnp.zeros((W,), jnp.int32)
tb = jnp.zeros((W,), jnp.int32)

prep = jax.jit(lambda a, b, c, d: affine_prep(spec.fp, spec.a, a, b, c, d))
timed("prep kernel (W)", prep, *xs[:4])

fin = jax.jit(lambda *a: affine_finish(spec.fp, spec.a, *a))
timed("finish kernel (W)", fin, *xs, num, dinv, mb, tb)

inv = jax.jit(lambda d: pp._log_batch_inverse(f, d))
timed("log_batch_inverse (W)", inv, xs[0])

# one mont mul at W for scale
mul1 = jax.jit(lambda a, b: f.mul(a, b))
timed("one mont mul (W)", mul1, xs[0], xs[1])

# argsort + rebuild at 2M keys
keys = jnp.asarray(rng.integers(0, 13853, size=(2 * W,), dtype=np.int32))
srt = jax.jit(lambda k: jnp.argsort(k))
timed("argsort (2W keys)", srt, keys)

ep = arr((2 * W, L))


def rebuild(k, epx):
    order = jax.lax.slice(jnp.argsort(k), (0,), (13854,))
    return jnp.take(epx, order, axis=0)


timed("argsort+take rebuild (2W)", jax.jit(rebuild), keys, ep)

# pair-split reshuffles per level: 8 arrays
def splits(a):
    return pp._pair_split(a)


timed("one _pair_split (2W rows)", jax.jit(splits), ep)

# phase-2 strided scan at BOT_W
B = 1 << 14
jac = tuple(arr((B, L)) for _ in range(3))
iota = jnp.arange(B, dtype=jnp.int32)


def phase2(x, y, z, pd, sd, sg):
    from jax import lax
    preJ = (x, y, z)
    sufJ = (x, y, z)
    buckets = curve.inf_jac((13853,))

    def scatter(bk, valid, pt, d):
        idx = jnp.where(valid, d, 0)
        return tuple(bc.at[idx].set(f.where(valid, pc, bc[idx]))
                     for bc, pc in zip(bk, pt))

    def step(carry, j):
        preJ, sufJ, pre_d, suf_d, single, buckets = carry
        s = jnp.left_shift(jnp.int32(1), j)
        rl = lambda a: jnp.roll(a, -s, axis=0)
        r_pre = tuple(rl(a) for a in preJ)
        r_suf = tuple(rl(a) for a in sufJ)
        r_pre_d, r_suf_d = rl(pre_d), rl(suf_d)
        r_single = rl(single)
        aligned = (iota & (2 * s - 1)) == 0
        from gnark_crypto_tpu.curve.jacobian import Jac
        mid = curve.add(Jac(*sufJ), Jac(*r_pre))
        eq = suf_d == r_pre_d
        emit_a = aligned & (~single) & ((~eq) | (~r_single))
        pt_a = pp._sel(f, eq, mid, Jac(*sufJ))
        buckets = scatter(buckets, emit_a, pt_a, suf_d)
        emit_b = aligned & (~eq) & (~r_single)
        buckets = scatter(buckets, emit_b, r_pre, r_pre_d)
        upd = lambda new, old: pp._sel(f, aligned, new, old)
        new_pre = upd(pp._sel(f, single & eq, mid, Jac(*preJ)), Jac(*preJ))
        new_suf = upd(pp._sel(f, r_single & eq, mid, r_suf), Jac(*sufJ))
        new_suf_d = jnp.where(aligned, r_suf_d, suf_d)
        new_single = jnp.where(aligned, single & r_single & eq, single)
        return (tuple(new_pre), tuple(new_suf), pre_d, new_suf_d,
                new_single, buckets), None

    carry = (preJ, sufJ, pd, sd, sg, tuple(buckets))
    carry, _ = jax.lax.scan(step, carry, jnp.arange(14, dtype=jnp.int32))
    return carry[5]


pd = jnp.asarray(rng.integers(0, 13853, size=(B,), dtype=np.int32))
sg = jnp.ones((B,), bool)
timed("phase2 scan (B=2^14, 14 it)", jax.jit(phase2), *jac, pd, pd, sg)

# gather of packed points at 2W (the initial sort+gather)
packed = arr((W, 2 * L))
idx = jnp.asarray(rng.integers(0, W, size=(2 * W,), dtype=np.int32))
timed("packed gather (2W x 2L)", jax.jit(lambda p, i: jnp.take(p, i, axis=0)),
      packed, idx)
