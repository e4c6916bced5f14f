"""Goldilocks (p = 2^64 - 2^32 + 1) — dedicated 2x32 engine.

TPU-native counterpart of the reference's single-word goldilocks field
(``field/goldilocks/element.go:36`` Mul / ``:66`` Add): elements are
``uint32[..., 2]`` arrays ``[lo, hi]`` (value = lo + 2^32*hi) in Montgomery
form with R = 2^64, strictly reduced (< q) at rest.

The Montgomery radix-2^32 REDC exploits q ≡ 1 (mod 2^32): the per-round
multiplier is m = -t0 mod 2^32, and m*q = m*2^64 - m*2^32 + m needs NO
multiplies at all — each of the two reduction rounds is pure adds/carries.
A full field mul is therefore 4 wide 32x32 products (16-bit half-product
synthesis, as in ``field/f31.py``) plus carry bookkeeping.

This replaces the generic 13-bit-limb detour (5 int32 limbs, ~70M muls/s);
the pair engine runs one uint32-lane op per word instead of a 5-iteration
CIOS scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gnark_crypto_tpu.specs.field import FieldSpec

U32 = jnp.uint32
_M32 = np.uint32(0xFFFFFFFF)


# ---------------------------------------------------------------------------
# host conversions
# ---------------------------------------------------------------------------

def from_int(spec: FieldSpec, values, mont: bool = True,
             reduce: bool = True) -> jax.Array:
    if isinstance(values, int):
        values = [values]
        squeeze = True
    else:
        values = list(values)
        squeeze = False
    out = np.empty((len(values), 2), np.uint32)
    for i, v in enumerate(values):
        if reduce:
            v = v % spec.modulus
        else:
            assert not mont and 0 <= v < 1 << 64
        if mont:
            v = (v * spec.r) % spec.modulus
        out[i, 0] = v & 0xFFFFFFFF
        out[i, 1] = v >> 32
    arr = jnp.asarray(out)
    return arr[0] if squeeze else arr


def to_int(spec: FieldSpec, x, mont: bool = True):
    arr = np.asarray(x).astype(np.uint64)
    single = arr.ndim == 1
    pairs = arr.reshape(-1, 2)
    vals = pairs[:, 0] | (pairs[:, 1] << np.uint64(32))
    out = [int(v) * (spec.r_inv if mont else 1) % spec.modulus for v in vals]
    return out[0] if single else out


def zeros(spec: FieldSpec, shape=()) -> jax.Array:
    return jnp.zeros((*shape, 2), dtype=U32)


def ones(spec: FieldSpec, shape=()) -> jax.Array:
    one = np.asarray([spec.r & 0xFFFFFFFF, spec.r >> 32], np.uint32)
    return jnp.broadcast_to(jnp.asarray(one), (*shape, 2))


def _const_pair(v: int):
    return (np.uint32(v & 0xFFFFFFFF), np.uint32(v >> 32))


# ---------------------------------------------------------------------------
# uint32 carry helpers (no 64-bit integers on TPU lanes)
# ---------------------------------------------------------------------------

def _mul_wide(a, b):
    """(hi, lo) halves of the 64-bit product — valid for FULL uint32 range
    (f31._mul_wide assumes operands < 2^31; this variant tracks the extra
    carry so goldilocks words up to 2^32-1 are safe)."""
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = p01 + (p00 >> 16)            # <= (2^16-1)^2 + 2^16-1 < 2^32
    s = mid + p10                      # may wrap
    c = (s < p10).astype(U32)
    hi = p11 + (s >> 16) + (c << 16)   # <= (2^16-1)^2 + 2^16-1 + 2^16 < 2^32
    lo = (s << 16) | (p00 & 0xFFFF)
    return hi, lo


def _adc(a, b, cin):
    """a + b + cin -> (sum, carry) with cin in {0, 1}."""
    s = a + b
    c1 = (s < b).astype(U32)
    s2 = s + cin
    c2 = (s2 < cin).astype(U32)
    return s2, c1 + c2


def _split(x):
    return x[..., 0], x[..., 1]


def _join(lo, hi):
    return jnp.stack([lo, hi], axis=-1)


def _ge_q(lo, hi):
    """(hi, lo) >= q, q = (0xFFFFFFFF, 0x00000001)."""
    return (hi == _M32) & (lo >= 1)


def _cond_sub_q(lo, hi, cond):
    """Subtract q where cond (value assumed >= q there, so no borrow out):
    (hi, lo) - (0xFFFFFFFF, 1) = (hi - 0xFFFFFFFF - borrow, lo - 1)."""
    borrow = (lo == 0).astype(U32)
    lo2 = lo - 1
    hi2 = hi + 1 + borrow  # - 0xFFFFFFFF == + 1 (mod 2^32), minus borrow...
    # hi - 0xFFFFFFFF - borrow == hi + 1 - borrow (mod 2^32)
    hi2 = hi + 1 - borrow
    return (jnp.where(cond, lo2, lo), jnp.where(cond, hi2, hi))


def _sub_2to64_q(lo, hi, cond):
    """Where cond: value is s = 2^64 + (hi, lo) (overflowed sum); replace
    with s - q = (hi, lo) + 2^32 - 1."""
    c = (lo != 0).astype(U32)
    lo2 = lo - 1           # lo + (2^32 - 1) mod 2^32
    hi2 = hi + c
    return (jnp.where(cond, lo2, lo), jnp.where(cond, hi2, hi))


# ---------------------------------------------------------------------------
# core ops
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
def add(spec: FieldSpec, x, y):
    xl, xh = _split(x)
    yl, yh = _split(y)
    lo = xl + yl
    c = (lo < yl).astype(U32)
    hi, c2 = _adc(xh, yh, c)
    over = c2 != 0                       # s >= 2^64 > q: subtract q
    lo, hi = _sub_2to64_q(lo, hi, over)
    ge = (~over) & _ge_q(lo, hi)
    lo, hi = _cond_sub_q(lo, hi, ge)
    return _join(lo, hi)


@functools.partial(jax.jit, static_argnums=0)
def sub(spec: FieldSpec, x, y):
    xl, xh = _split(x)
    yl, yh = _split(y)
    lo = xl - yl
    b = (xl < yl).astype(U32)
    hi = xh - yh - b
    borrow = (xh < yh) | ((xh == yh) & (b != 0))
    # underflow: add q = 2^64 - 2^32 + 1 -> (hi, lo) + (q mod 2^64)
    ql, qh = np.uint32(1), _M32
    lo2 = lo + ql
    c = (lo2 < ql).astype(U32)
    hi2 = hi + qh + c
    return _join(jnp.where(borrow, lo2, lo), jnp.where(borrow, hi2, hi))


def neg(spec: FieldSpec, x):
    return sub(spec, zeros(spec, x.shape[:-1]), x)


def double(spec: FieldSpec, x):
    return add(spec, x, x)


@functools.partial(jax.jit, static_argnums=0)
def halve(spec: FieldSpec, x):
    xl, xh = _split(x)
    odd = (xl & 1) == 1
    lo = (xl >> 1) | (xh << 31)
    hi = xh >> 1
    # odd: add (q+1)/2 = 2^63 - 2^31 + 1 = (0x80000001, 0x7FFFFFFF)
    al, ah = np.uint32(0x80000001), np.uint32(0x7FFFFFFF)
    lo2 = lo + al
    c = (lo2 < al).astype(U32)
    hi2 = hi + ah + c                    # < 2^64, no overflow (both < 2^63)
    lo = jnp.where(odd, lo2, lo)
    hi = jnp.where(odd, hi2, hi)
    ge = _ge_q(lo, hi)
    lo, hi = _cond_sub_q(lo, hi, ge)
    return _join(lo, hi)


@functools.partial(jax.jit, static_argnums=0)
def mul(spec: FieldSpec, x, y):
    """Montgomery product x*y*2^-64 mod q.

    Schoolbook 4-word product then two REDC rounds; q ≡ 1 (mod 2^32) makes
    each round multiplier-free (m*q = m*2^64 - m*2^32 + m with m = -t_0)."""
    xl, xh = _split(x)
    yl, yh = _split(y)
    h00, l00 = _mul_wide(xl, yl)
    h01, l01 = _mul_wide(xl, yh)
    h10, l10 = _mul_wide(xh, yl)
    h11, l11 = _mul_wide(xh, yh)
    t0 = l00
    t1, c1 = _adc(h00, l01, jnp.zeros_like(t0))
    t1b, c1b = _adc(t1, l10, jnp.zeros_like(t0))
    t1 = t1b
    t2, c2 = _adc(h01, h10, c1 + c1b)
    t2b, c2b = _adc(t2, l11, jnp.zeros_like(t0))
    t2 = t2b
    t3 = h11 + c2 + c2b                  # < 2^32 (128-bit product bound)

    # REDC round 1: m = -t0; t += m*q; words shift down by one.
    nz0 = (t0 != 0).astype(U32)
    # m*q words above t0: [+t0 (== -m), +m - nz0]; t0 + m -> 0 carry nz0
    s1, a1 = _adc(t1, t0, nz0)
    wh = (jnp.zeros_like(t0) - t0) - nz0     # m - nz0
    s2, a2 = _adc(t2, wh, a1)
    s3 = t3 + a2

    # REDC round 2 on (s3, s2, s1)
    nz1 = (s1 != 0).astype(U32)
    u0, b1 = _adc(s2, s1, nz1)
    wh2 = (jnp.zeros_like(s1) - s1) - nz1
    u1, b2 = _adc(s3, wh2, b1)

    over = b2 != 0
    lo, hi = _sub_2to64_q(u0, u1, over)
    ge = (~over) & _ge_q(lo, hi)
    lo, hi = _cond_sub_q(lo, hi, ge)
    return _join(lo, hi)


def square(spec: FieldSpec, x):
    return mul(spec, x, x)


def to_mont(spec: FieldSpec, x):
    r2 = from_int(spec, spec.r2 % spec.modulus, mont=False)
    return mul(spec, x, r2)


def from_mont(spec: FieldSpec, x):
    one = from_int(spec, 1, mont=False)
    return mul(spec, x, one)


def mul_const(spec: FieldSpec, x, c: int):
    cm = from_int(spec, c)              # Montgomery form
    return mul(spec, x, cm)


# ---------------------------------------------------------------------------
# predicates
# ---------------------------------------------------------------------------

def is_zero(spec: FieldSpec, x):
    return jnp.all(x == 0, axis=-1)


def equal(spec: FieldSpec, x, y):
    return jnp.all(x == y, axis=-1)


def select(spec: FieldSpec, cond, x, y):
    return jnp.where(cond[..., None], x, y)


def _where(cond, x, y):
    return jnp.where(cond[..., None], x, y)


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
    res0 = ones(spec, x.shape[:-1])

    def body(res, bit):
        res = square(spec, res)
        return _where(jnp.broadcast_to(bit == 1, res.shape[:-1]),
                      mul(spec, res, x), res), None

    res, _ = lax.scan(body, res0, bits)
    return res


@functools.partial(jax.jit, static_argnums=0)
def inverse(spec: FieldSpec, x):
    return exp_const(spec, x, spec.modulus - 2)


@functools.partial(jax.jit, static_argnums=0)
def batch_inverse(spec: FieldSpec, x):
    zmask = is_zero(spec, x)
    xe = _where(zmask, ones(spec, x.shape[:-1]), x)

    def fwd(acc, xi):
        return mul(spec, acc, xi), acc

    total, prefix_before = lax.scan(fwd, ones(spec, x.shape[1:-1]), xe)
    total_inv = inverse(spec, total)

    def bwd(acc, operands):
        xi, pb = operands
        return mul(spec, acc, xi), mul(spec, acc, pb)

    _, out = lax.scan(bwd, total_inv, (xe, prefix_before), reverse=True)
    return _where(zmask, jnp.zeros_like(out), out)


def legendre(spec: FieldSpec, x):
    return exp_const(spec, x, (spec.modulus - 1) // 2)


@functools.lru_cache(maxsize=None)
def _sqrt_c(spec: FieldSpec):
    c = 2
    while pow(c, (spec.modulus - 1) // 2, spec.modulus) != spec.modulus - 1:
        c += 1
    return pow(c, spec.t_odd, spec.modulus)


@functools.partial(jax.jit, static_argnums=0)
def sqrt(spec: FieldSpec, x):
    """Masked constant-trip Tonelli-Shanks (two-adicity 32); returns
    (root, has_root) — same shape conventions as f31.sqrt."""
    s, t = spec.two_adicity, spec.t_odd
    sh = x.shape[:-1]
    one = ones(spec, sh)
    c = jnp.broadcast_to(from_int(spec, _sqrt_c(spec)), x.shape)
    w = exp_const(spec, x, (t - 1) // 2)
    r = mul(spec, x, w)
    b = mul(spec, r, w)
    m = jnp.full(sh, s, dtype=jnp.int32)
    steps = jnp.arange(s, dtype=jnp.int32)

    def round_body(carry, _):
        r, b, c, m = carry

        def chain(cs, _j):
            val, i_cnt, seen = cs
            seen = seen | equal(spec, val, one)
            i_cnt = i_cnt + jnp.where(seen, 0, 1)
            return (square(spec, val), i_cnt, seen), None

        (_, i_cnt, _), _ = lax.scan(
            chain, (b, jnp.zeros_like(m), jnp.zeros(sh, bool)),
            None, length=s)
        done = i_cnt == 0
        n_sq = jnp.maximum(m - i_cnt - 1, 0)

        def sq_body(f, k):
            return _where(k < n_sq, square(spec, f), f), None

        f, _ = lax.scan(sq_body, c, steps)
        f2 = square(spec, f)
        r = _where(done, r, mul(spec, r, f))
        b = _where(done, b, mul(spec, b, f2))
        c = _where(done, c, f2)
        m = jnp.where(done, m, i_cnt)
        return (r, b, c, m), None

    (r, b, c, m), _ = lax.scan(round_body, (r, b, c, m), None, length=s)
    ok = equal(spec, square(spec, r), x)
    return _where(ok, r, jnp.zeros_like(r)), ok | is_zero(spec, x)


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
def sum_reduce(spec: FieldSpec, x):
    """Modular sum along the leading axis (log-depth pairwise adds)."""
    n = x.shape[0]
    while n > 1:
        half = n // 2
        red = add(spec, x[:half], x[half:2 * half])
        x = jnp.concatenate([red, x[2 * half:]], 0) if n % 2 else red
        n = x.shape[0]
    return x[0]


def inner_product(spec: FieldSpec, x, y):
    return sum_reduce(spec, mul(spec, x, y))


# ---------------------------------------------------------------------------
# bytes (8-byte big-endian canonical, element.go Bytes/SetBytes)
# ---------------------------------------------------------------------------

def to_bytes_host(spec: FieldSpec, x, mont: bool = True) -> list[bytes]:
    arr = np.asarray(x).astype(np.uint64).reshape(-1, 2)
    vals = arr[:, 0] | (arr[:, 1] << np.uint64(32))
    if mont:
        vals = np.asarray(
            [int(v) * spec.r_inv % spec.modulus for v in vals], np.uint64)
    return [int(v).to_bytes(8, "big") for v in vals]


def from_bytes_host(spec: FieldSpec, bs, mont: bool = True) -> jax.Array:
    vals = []
    for b in bs:
        v = int.from_bytes(b, "big")
        if v >= spec.modulus:
            raise ValueError("non-canonical field element encoding")
        vals.append(v)
    return from_int(spec, vals, mont=mont)
