"""31-bit Montgomery fields (babybear / koalabear) — one uint32 lane each.

TPU-native counterpart of the reference's F31 tier
(``field/{babybear,koalabear}/element.go`` + the AVX-512 vector kernels in
``internal/generator/field/asm/amd64/element_vec_F31.go``). Same radix-2^32
Montgomery scheme (Plonky3-style); the 32x32->64-bit products the reference
gets from VPMULUDQ are synthesized from 16-bit half products, which keeps
everything in native uint32 VPU lanes (TPUs have no 64-bit integer multiply).

Elements are plain ``uint32[...]`` arrays (no limb axis) in Montgomery form,
strictly reduced (< q) at rest.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gnark_crypto_tpu.specs.field import FieldSpec

U32 = jnp.uint32


def _u32(x):
    return jnp.asarray(x, dtype=U32)


# ---------------------------------------------------------------------------
# host conversions
# ---------------------------------------------------------------------------

def from_int(spec: FieldSpec, values, mont: bool = True,
             reduce: bool = True) -> jax.Array:
    """reduce=False keeps raw uint32 scalars >= modulus (requires
    mont=False); see field/mont.py from_int."""
    if isinstance(values, int):
        values = [values]
        squeeze = True
    else:
        values = list(values)
        squeeze = False
    out = []
    for v in values:
        if reduce:
            v = v % spec.modulus
        else:
            assert not mont and 0 <= v < 1 << 32
        if mont:
            v = (v * spec.r) % spec.modulus
        out.append(v)
    arr = jnp.asarray(np.asarray(out, dtype=np.uint32))
    return arr[0] if squeeze else arr


def to_int(spec: FieldSpec, x, mont: bool = True):
    arr = np.asarray(x)
    single = arr.ndim == 0
    flat = np.atleast_1d(arr).ravel()
    out = [int(v) * (spec.r_inv if mont else 1) % spec.modulus for v in flat]
    return out[0] if single else out


def zeros(spec: FieldSpec, shape=()) -> jax.Array:
    return jnp.zeros(shape, dtype=U32)


def ones(spec: FieldSpec, shape=()) -> jax.Array:
    return jnp.full(shape, np.uint32(spec.r), dtype=U32)


# ---------------------------------------------------------------------------
# core ops
# ---------------------------------------------------------------------------

def _mul_wide(a, b):
    """(hi, lo) 32-bit halves of the 64-bit product of two uint32 (< 2^31).

    16-bit split: a = a1*2^16 + a0. All partial sums proven < 2^32 for
    a, b < 2^31 (a1 <= 2^15-1), so no uint32 overflow anywhere.
    """
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = p10 + p01 + (p00 >> 16)          # < 2^32 (proof in docstring)
    hi = p11 + (mid >> 16)
    lo = (mid << 16) | (p00 & 0xFFFF)      # == (a*b) mod 2^32
    return hi, lo


@functools.partial(jax.jit, static_argnums=0)
def add(spec: FieldSpec, x, y):
    q = np.uint32(spec.modulus)
    s = x + y                    # < 2^32 (both < q < 2^31)
    return jnp.where(s >= q, s - q, s)


@functools.partial(jax.jit, static_argnums=0)
def sub(spec: FieldSpec, x, y):
    q = np.uint32(spec.modulus)
    d = x + q - y
    return jnp.where(d >= q, d - q, d)


@functools.partial(jax.jit, static_argnums=0)
def neg(spec: FieldSpec, x):
    q = np.uint32(spec.modulus)
    return jnp.where(x == 0, x, q - x)


def double(spec: FieldSpec, x):
    return add(spec, x, x)


@functools.partial(jax.jit, static_argnums=0)
def halve(spec: FieldSpec, x):
    q = np.uint32(spec.modulus)
    odd = (x & 1) == 1
    return jnp.where(odd, (x >> 1) + ((q + 1) >> 1), x >> 1)


@functools.partial(jax.jit, static_argnums=0)
def mul(spec: FieldSpec, x, y):
    """Montgomery product x*y*2^-32 mod q (reference F31 mulVec semantics)."""
    q = np.uint32(spec.modulus)
    qinv = np.uint32(spec.qinv_neg)  # -q^-1 mod 2^32
    t_hi, t_lo = _mul_wide(x, y)
    m = t_lo * qinv                   # mod 2^32 (native wrap)
    mq_hi, mq_lo = _mul_wide(m, q)
    carry = (t_lo != 0).astype(U32)   # t_lo + mq_lo is 0 or 2^32
    r = t_hi + mq_hi + carry          # < 2q < 2^32
    return jnp.where(r >= q, r - q, r)


def square(spec: FieldSpec, x):
    return mul(spec, x, x)


def to_mont(spec: FieldSpec, x):
    return mul(spec, x, _u32(np.uint32(spec.r2)))


def from_mont(spec: FieldSpec, x):
    return mul(spec, x, _u32(np.uint32(1)))


def mul_const(spec: FieldSpec, x, c: int):
    return mul(spec, x, jnp.full((), np.uint32(c * spec.r % spec.modulus), U32))


# ---------------------------------------------------------------------------
# predicates
# ---------------------------------------------------------------------------

def is_zero(spec: FieldSpec, x):
    return x == 0


def equal(spec: FieldSpec, x, y):
    return x == y


def select(spec: FieldSpec, cond, x, y):
    return jnp.where(cond, x, y)


# ---------------------------------------------------------------------------
# exponentiation / inversion / sqrt
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 2))
def exp_const(spec: FieldSpec, x, e: int):
    if e == 0:
        return jnp.broadcast_to(ones(spec), x.shape)
    nbits = e.bit_length()
    bits = jnp.asarray(
        [(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=U32)
    res0 = ones(spec, x.shape)

    def body(res, bit):
        res = square(spec, res)
        return jnp.where(bit == 1, mul(spec, res, x), res), None

    res, _ = lax.scan(body, res0, bits)
    return res


@functools.partial(jax.jit, static_argnums=0)
def inverse(spec: FieldSpec, x):
    return exp_const(spec, x, spec.modulus - 2)


@functools.partial(jax.jit, static_argnums=0)
def batch_inverse(spec: FieldSpec, x):
    zmask = x == 0
    xe = jnp.where(zmask, ones(spec, x.shape), x)

    def fwd(acc, xi):
        return mul(spec, acc, xi), acc

    total, prefix_before = lax.scan(fwd, ones(spec, x.shape[1:]), xe)
    total_inv = inverse(spec, total)

    def bwd(acc, operands):
        xi, pb = operands
        return mul(spec, acc, xi), mul(spec, acc, pb)

    _, out = lax.scan(bwd, total_inv, (xe, prefix_before), reverse=True)
    return jnp.where(zmask, jnp.zeros_like(out), out)


def legendre(spec: FieldSpec, x):
    return exp_const(spec, x, (spec.modulus - 1) // 2)


@functools.lru_cache(maxsize=None)
def _sqrt_consts(spec: FieldSpec):
    c = 2
    while pow(c, (spec.modulus - 1) // 2, spec.modulus) != spec.modulus - 1:
        c += 1
    return pow(c, spec.t_odd, spec.modulus)


@functools.partial(jax.jit, static_argnums=0)
def sqrt(spec: FieldSpec, x):
    """Masked constant-trip Tonelli-Shanks; returns (root, has_root)."""
    q = spec.modulus
    if q % 4 == 3:
        cand = exp_const(spec, x, (q + 1) // 4)
        ok = equal(spec, square(spec, cand), x)
        return jnp.where(ok, cand, 0), ok | (x == 0)
    s, t = spec.two_adicity, spec.t_odd
    z = _sqrt_consts(spec)
    one = ones(spec, x.shape)
    c = jnp.broadcast_to(from_int(spec, z), x.shape)
    w = exp_const(spec, x, (t - 1) // 2)
    r = mul(spec, x, w)
    b = mul(spec, r, w)
    m = jnp.full(x.shape, s, dtype=jnp.int32)
    steps = jnp.arange(s, dtype=jnp.int32)

    def round_body(carry, _):
        r, b, c, m = carry

        def chain(cs, _j):
            val, i_cnt, seen = cs
            seen = seen | (val == one)
            i_cnt = i_cnt + jnp.where(seen, 0, 1)
            return (square(spec, val), i_cnt, seen), None

        (_, i_cnt, _), _ = lax.scan(
            chain, (b, jnp.zeros_like(m), jnp.zeros(x.shape, bool)),
            None, length=s)
        done = i_cnt == 0
        n_sq = jnp.maximum(m - i_cnt - 1, 0)

        def sq_body(f, k):
            return jnp.where(k < n_sq, square(spec, f), f), None

        f, _ = lax.scan(sq_body, c, steps)
        f2 = square(spec, f)
        r = jnp.where(done, r, mul(spec, r, f))
        b = jnp.where(done, b, mul(spec, b, f2))
        c = jnp.where(done, c, f2)
        m = jnp.where(done, m, i_cnt)
        return (r, b, c, m), None

    (r, b, c, m), _ = lax.scan(round_body, (r, b, c, m), None, length=s)
    ok = equal(spec, square(spec, r), x)
    return jnp.where(ok, r, 0), ok | (x == 0)


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
def sum_reduce(spec: FieldSpec, x):
    """Modular sum along the leading axis.

    Unlike the limb engine, partial sums fit in uint32 lazily: add pairs of
    values < q < 2^31 then reduce — log2(N) vectorized halvings (the
    reference's sumVec accumulates in 64-bit lanes, element_vec_F31.go).
    """
    n = x.shape[0]
    while n > 1:
        half = n // 2
        red = add(spec, x[:half], x[half : 2 * half])
        x = jnp.concatenate([red, x[2 * half :]], 0) if n % 2 else red
        n = x.shape[0]
    return x[0]


def inner_product(spec: FieldSpec, x, y):
    return sum_reduce(spec, mul(spec, x, y))


# ---------------------------------------------------------------------------
# bytes (gnark canonical little... big-endian 4 bytes)
# ---------------------------------------------------------------------------

def to_bytes_host(spec: FieldSpec, x, mont: bool = True) -> list[bytes]:
    arr = np.asarray(x)
    if arr.ndim == 1 and arr.shape[0] >= 64 and spec.n_bytes == 4:
        # bulk tier: single uint32 lane, 4-byte big-endian wire format
        vals = arr.astype(np.uint64)
        if mont:
            vals = (vals * spec.r_inv) % spec.modulus
        be = vals.astype(">u4").tobytes()
        return [be[i * 4 : (i + 1) * 4] for i in range(arr.shape[0])]
    vals = to_int(spec, x, mont=mont)
    if isinstance(vals, int):
        vals = [vals]
    return [v.to_bytes(spec.n_bytes, "big") for v in vals]


def from_bytes_host(spec: FieldSpec, bs, mont: bool = True) -> jax.Array:
    if len(bs) >= 64 and spec.n_bytes == 4:
        vals = np.frombuffer(b"".join(bs), ">u4").astype(np.uint64)
        if (vals >= spec.modulus).any():
            raise ValueError("non-canonical field element encoding")
        if mont:
            vals = (vals * spec.r) % spec.modulus
        return jnp.asarray(vals.astype(np.uint32))
    vals = []
    for b in bs:
        v = int.from_bytes(b, "big")
        if v >= spec.modulus:
            raise ValueError("non-canonical field element encoding")
        vals.append(v)
    return from_int(spec, vals, mont=mont)
