"""Generic multi-limb Montgomery arithmetic over int32 limb arrays (jnp).

TPU-native counterpart of gnark-crypto's generated field packages
(``ecc/bn254/fr/element.go`` + ``field/asm/element_4w``): where the reference
emits per-field Go+assembly with 64-bit limbs and ADX carry chains, we keep a
single engine generic over :class:`~gnark_crypto_tpu.specs.field.FieldSpec`,
with elements as ``int32[..., L]`` limb vectors in base ``2**b`` (b = 11/12/13).
Every op is batched: a "scalar" is just a batch of size 1.

XLA-shaping decisions (this is what makes it TPU-idiomatic, not a port):
  * mul is an operand-scan CIOS Montgomery multiply (same family as the
    reference's CIOS no-carry asm, ``ecc/bn254/fr/element_amd64.go:46-52``)
    with *lazy carries*: limbs accumulate up to 2L partial products < 2^24 in
    int32 lanes before one carry pass. Two build modes: a ``fori_loop`` over
    limbs (tiny graph, fast compile — default) and a fully unrolled variant
    (``unroll=True``) that XLA fuses into one straight-line kernel for hot
    paths; the Pallas kernel in ``field/pallas`` is the third tier.
  * carry propagation / borrow detection are ``lax.scan`` chains over the limb
    axis — the only serial dependency in the engine.
  * exponentiations (inverse=Fermat, Legendre, sqrt chains) run as
    ``lax.scan`` over the bits of the static exponent, so graphs stay O(1) in
    exponent size. (The reference's branchy Pornin GCD ``element.go:1745``
    does not vectorize; constant-trip Fermat is the TPU answer.)

Values at rest are strictly reduced (< q) and in Montgomery form, like the
reference (``element.go:911-924``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gnark_crypto_tpu.specs.field import FieldSpec, int_to_limbs, limbs_to_int

I32 = jnp.int32


def _unroll_default() -> bool:
    """Unroll limb loops into straight-line code on TPU (Mosaic/XLA-TPU
    compiles nested fori/scan bodies pathologically slowly and runs fused
    straight-line elementwise code much faster); keep scans on CPU where
    compile time dominates the test cycle."""
    import jax

    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# host-side conversions
# ---------------------------------------------------------------------------

def from_int(spec: FieldSpec, values, mont: bool = True,
             reduce: bool = True) -> jax.Array:
    """Python ints / iterable of ints -> limb array (Montgomery form).

    ``reduce=False`` keeps values >= modulus as-is (plain limbs, requires
    mont=False): needed when the limb array carries a SCALAR for a ladder
    rather than a field element — e.g. [r]P subgroup checks, where r mod r
    would otherwise silently become 0 and the ladder a no-op."""
    if isinstance(values, int):
        values = [values]
        squeeze = True
    else:
        values = list(values)
        squeeze = False
    arr = np.empty((len(values), spec.n_limbs), dtype=np.int32)
    for i, v in enumerate(values):
        if reduce:
            v = v % spec.modulus
        else:
            assert not mont and 0 <= v < 1 << (spec.limb_bits * spec.n_limbs)
        if mont:
            v = (v * spec.r) % spec.modulus
        arr[i] = int_to_limbs(v, spec.limb_bits, spec.n_limbs)
    out = jnp.asarray(arr)
    return out[0] if squeeze else out


def to_int(spec: FieldSpec, x, mont: bool = True):
    """Limb array (Montgomery form) -> Python int (1-D input) or list of ints."""
    arr = np.asarray(x)
    single = arr.ndim == 1
    flat = arr.reshape(-1, spec.n_limbs)
    out = []
    for row in flat:
        v = limbs_to_int(row, spec.limb_bits)
        if mont:
            v = (v * spec.r_inv) % spec.modulus
        out.append(v)
    return out[0] if single else out


def _const(spec: FieldSpec, limbs) -> jax.Array:
    return jnp.asarray(np.asarray(limbs, dtype=np.int32))


def zeros(spec: FieldSpec, shape=()) -> jax.Array:
    return jnp.zeros((*shape, spec.n_limbs), dtype=I32)


def ones(spec: FieldSpec, shape=()) -> jax.Array:
    return jnp.broadcast_to(_const(spec, spec.one_limbs), (*shape, spec.n_limbs))


# ---------------------------------------------------------------------------
# carry / reduction primitives (scan over the limb axis)
# ---------------------------------------------------------------------------

def _carry_scan(spec: FieldSpec, t, keep_top: bool = False):
    """Carry/borrow propagation to canonical limbs in [0, 2^b).

    Arithmetic right shift = floor quotient, so negative limbs (borrows)
    propagate correctly. Returns (normalized, carry_out).
    """
    b = spec.limb_bits
    if _unroll_default():
        c = None
        out = []
        for i in range(t.shape[-1]):
            v = t[..., i] if c is None else t[..., i] + c
            out.append(v & spec.mask)
            c = v >> b
        return jnp.stack(out, axis=-1), c
    tl = jnp.moveaxis(t, -1, 0)  # (L, ...)

    def body(c, limb):
        v = limb + c
        return v >> b, v & spec.mask

    c_out, out = lax.scan(body, jnp.zeros(t.shape[:-1], dtype=I32), tl)
    return jnp.moveaxis(out, 0, -1), c_out


def _carry(spec: FieldSpec, t):
    out, _ = _carry_scan(spec, t)
    return out


def _sub_borrow(spec: FieldSpec, t, y_limbs):
    """(t - y) with full borrow propagation; returns (diff, underflow_mask)."""
    d = t - _const(spec, y_limbs)
    out, c = _carry_scan(spec, d)
    return out, c < 0


def _cond_sub_q(spec: FieldSpec, t):
    """t in [0, 2q), carry-normalized -> t mod q."""
    d, under = _sub_borrow(spec, t, spec.q_limbs)
    return jnp.where(under[..., None], t, d)


# ---------------------------------------------------------------------------
# ring ops
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
def add(spec: FieldSpec, x, y):
    """(x + y) mod q. Reference: ``element.go:394``."""
    return _cond_sub_q(spec, _carry(spec, x + y))


@functools.partial(jax.jit, static_argnums=0)
def sub(spec: FieldSpec, x, y):
    """(x - y) mod q. Reference: ``element.go:434``."""
    t = _carry(spec, x - y + _const(spec, spec.q_limbs))
    return _cond_sub_q(spec, t)


@functools.partial(jax.jit, static_argnums=0)
def neg(spec: FieldSpec, x):
    t = _carry(spec, _const(spec, spec.q_limbs) - x)
    return jnp.where(is_zero(spec, x)[..., None], jnp.zeros_like(t), t)


def double(spec: FieldSpec, x):
    return add(spec, x, x)


@functools.partial(jax.jit, static_argnums=0)
def halve(spec: FieldSpec, x):
    """x/2 mod q (q odd). Reference: ``element.go:367``."""
    b = spec.limb_bits
    odd = x[..., 0] & 1
    t = x + jnp.where((odd == 1)[..., None], _const(spec, spec.q_limbs), 0)
    t, top = _carry_scan(spec, t)  # top may be 1 (value < 2q fits L limbs + 1 bit)
    hi = jnp.concatenate([t[..., 1:], top[..., None]], axis=-1)
    return (t >> 1) | ((hi & 1) << (b - 1))


def _mul_loop(spec: FieldSpec, x, y):
    """CIOS main loop via fori_loop (small graph)."""
    L = spec.n_limbs
    b = spec.limb_bits
    qinv = spec.qinv_neg
    q = _const(spec, spec.q_limbs)
    shape = jnp.broadcast_shapes(x.shape[:-1], y.shape[:-1])
    x = jnp.broadcast_to(x, (*shape, L))
    y = jnp.broadcast_to(y, (*shape, L))
    t0 = jnp.zeros((*shape, L), dtype=I32)

    def body(i, t):
        xi = lax.dynamic_index_in_dim(x, i, axis=-1, keepdims=True)
        t = t + xi * y
        m = (t[..., 0] * qinv) & spec.mask
        t = t + m[..., None] * q
        carry = t[..., 0] >> b  # low b bits of t[...,0] are now zero
        t = jnp.concatenate([t[..., 1:], jnp.zeros((*shape, 1), dtype=I32)], -1)
        return t.at[..., 0].add(carry)

    return lax.fori_loop(0, L, body, t0)


def _mul_unrolled(spec: FieldSpec, x, y):
    """CIOS main loop fully unrolled (one fused straight-line kernel)."""
    L = spec.n_limbs
    b = spec.limb_bits
    qinv = spec.qinv_neg
    q = _const(spec, spec.q_limbs)
    t = jnp.zeros(
        (*jnp.broadcast_shapes(x.shape[:-1], y.shape[:-1]), L), dtype=I32)
    for i in range(L):
        xi = x[..., i : i + 1]
        t = t + xi * y
        m = (t[..., 0] * qinv) & spec.mask
        t = t + m[..., None] * q
        carry = t[..., 0] >> b
        t = jnp.concatenate([t[..., 1:], jnp.zeros_like(t[..., :1])], -1)
        t = t.at[..., 0].add(carry)
    return t


def _use_pallas_mul(spec: FieldSpec, x, y) -> bool:
    """Route big batches to the Pallas kernel on TPU: the limbs-in-sublanes
    CIOS kernel runs ~250M muls/s vs ~27M for the XLA limb loop; below the
    threshold the relayout + dispatch overheads dominate."""
    import jax as _jax

    if _jax.default_backend() != "tpu":
        return False
    shape = jnp.broadcast_shapes(x.shape[:-1], y.shape[:-1])
    n = 1
    for d in shape:
        n *= d
    return n >= 2048


def mul(spec: FieldSpec, x, y, unroll: bool | None = None):
    """Montgomery product x*y*R^-1 mod q, lazy-carry operand-scan CIOS.

    Per limb i: t += x_i*y; m = t_0*qinv mod 2^b; t += m*q; t >>= b.
    Limb accumulations stay < 2L*(2^b-1)^2 < 2^31 (enforced by the spec
    registry). Reference: ``element_amd64.go:46-52`` / ``element.go:478``.
    Large batches on TPU dispatch to the Pallas kernel
    (``field/pallas/mont_mul.py``), the asm tier of this engine.

    ``unroll=None`` resolves here (outside the jit cache key): straight-line
    unrolled CIOS only for batches big enough to be compute-bound — small
    batches keep the compact ``fori_loop`` form so programs that trace MANY
    muls (the pairing Miller scan: ~300 muls/step) stay compilable (the
    unrolled form is ~2400 HLO ops per mul and crashes the TPU compiler at
    whole-pairing scale).
    """
    if unroll is None:
        n = 1
        for d in jnp.broadcast_shapes(x.shape[:-1], y.shape[:-1]):
            n *= d
        unroll = _unroll_default() and n >= 1024
    return _mul_jit(spec, x, y, unroll)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _mul_jit(spec: FieldSpec, x, y, unroll: bool):
    if _use_pallas_mul(spec, x, y):
        from gnark_crypto_tpu.field.pallas.mont_mul import mont_mul
        L = spec.n_limbs
        shape = jnp.broadcast_shapes(x.shape[:-1], y.shape[:-1])
        xb = jnp.broadcast_to(x, (*shape, L)).reshape(-1, L)
        yb = jnp.broadcast_to(y, (*shape, L)).reshape(-1, L)
        return mont_mul(spec, xb, yb).reshape(*shape, L)
    t = _mul_unrolled(spec, x, y) if unroll else _mul_loop(spec, x, y)
    return _cond_sub_q(spec, _carry(spec, t))


def square(spec: FieldSpec, x, unroll: bool | None = None):
    return mul(spec, x, x, unroll)


def to_mont(spec: FieldSpec, x):
    return mul(spec, x, _const(spec, spec.r2_limbs))


def from_mont(spec: FieldSpec, x):
    one = jnp.zeros_like(x).at[..., 0].set(1)
    return mul(spec, x, one)


@functools.partial(jax.jit, static_argnums=(0, 2))
def mul_const(spec: FieldSpec, x, c: int):
    """x * c for a tiny plain-int constant c (reference ``MulBy3/5/13`` asm).

    Lazy limbwise scale + carry, then branchless repeated conditional
    subtraction (c-1 rounds). Requires c * 2^(2b) * small < 2^31 → c <= ~16.
    """
    if c == 0:
        return jnp.zeros_like(x)
    if c == 1:
        return x
    t, top = _carry_scan(spec, x * c)
    q_ext = np.asarray(list(spec.q_limbs) + [0], dtype=np.int32)
    t = jnp.concatenate([t, top[..., None]], axis=-1)
    for _ in range(c - 1):
        d = t - jnp.asarray(q_ext)
        d, c_out = _carry_scan_ext(spec, d)
        t = jnp.where((c_out < 0)[..., None], t, d)
    return t[..., : spec.n_limbs]


def _carry_scan_ext(spec: FieldSpec, t):
    return _carry_scan(spec, t)


# ---------------------------------------------------------------------------
# vector reductions (reference: Vector.Sum / InnerProduct, vector_amd64.go)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
def sum_reduce(spec: FieldSpec, x):
    """Modular sum along the leading axis: (N, ..., L) -> (..., L).

    Pairwise tree of modular adds (log2 N vectorized stages) — keeps every
    intermediate < q, so no extended-precision accumulator is needed.
    """
    n = x.shape[0]
    while n > 1:
        half = n // 2
        lo, hi = x[:half], x[half : 2 * half]
        red = add(spec, lo, hi)
        if n % 2:
            x = jnp.concatenate([red, x[2 * half :]], axis=0)
        else:
            x = red
        n = x.shape[0]
    return x[0]


def inner_product(spec: FieldSpec, x, y):
    """<x, y> along the leading axis (``vector_amd64.go:118`` InnerProduct)."""
    return sum_reduce(spec, mul(spec, x, y))


def scalar_mul_vec(spec: FieldSpec, x, s):
    """Vector * broadcast scalar (``vector_amd64.go`` ScalarMul)."""
    return mul(spec, x, s[None] if s.ndim == x.ndim - 1 else s)


# ---------------------------------------------------------------------------
# predicates / select
# ---------------------------------------------------------------------------

def is_zero(spec: FieldSpec, x) -> jax.Array:
    return jnp.all(x == 0, axis=-1)


def equal(spec: FieldSpec, x, y) -> jax.Array:
    return jnp.all(x == y, axis=-1)


def select(spec: FieldSpec, cond, x, y):
    """cond ? x : y, broadcasting cond over the limb dim."""
    return jnp.where(cond[..., None], x, y)


# ---------------------------------------------------------------------------
# exponentiation / inversion
# ---------------------------------------------------------------------------

def _exp_bits_scan(spec: FieldSpec, x, e: int, unroll_mul: bool = False):
    """Square-and-multiply MSB-first over the static exponent's bits, as a
    lax.scan so the graph is O(1) in exponent length.

    Mirrors ``element.go:748`` Exp (the reference unrolls via addchain codegen;
    scan keeps XLA compile time bounded — the unrolled tier comes with Pallas).
    """
    nbits = e.bit_length()
    bits = jnp.asarray(
        [(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=I32)
    res0 = ones(spec, x.shape[:-1])

    def body(res, bit):
        res = square(spec, res, unroll_mul)
        res = select(spec, bit == 1, mul(spec, res, x, unroll_mul), res)
        return res, None

    res, _ = lax.scan(body, res0, bits)
    return res


@functools.partial(jax.jit, static_argnums=(0, 2))
def exp_const(spec: FieldSpec, x, e: int):
    """x^e for a static Python-int exponent (Montgomery in/out)."""
    if e == 0:
        return jnp.broadcast_to(ones(spec), x.shape)
    if e < 0:
        raise ValueError("negative exponent: combine with inverse()")
    return _exp_bits_scan(spec, x, e)


@functools.partial(jax.jit, static_argnums=0)
def inverse(spec: FieldSpec, x):
    """x^-1 via Fermat (x^(q-2)); maps 0 -> 0 like the reference Inverse.

    Small batches on TPU run the whole ladder inside one Pallas kernel
    (``field/pallas/exp.py``): the bit-scan form is ~254 sequential tiny
    device ops (~77 ms measured at width 1) while the in-VMEM ladder is
    ~1 ms — this is the Montgomery-trick seed inversion on the MSM hot path.
    """
    import jax as _jax

    n = 1
    for d2 in x.shape[:-1]:
        n *= d2
    if _jax.default_backend() == "tpu" and 0 < n <= 128:
        from gnark_crypto_tpu.field.pallas.exp import inverse_small
        L = spec.n_limbs
        return inverse_small(spec, x.reshape(-1, L)).reshape(x.shape)
    return exp_const(spec, x, spec.modulus - 2)


@functools.partial(jax.jit, static_argnums=0)
def batch_inverse(spec: FieldSpec, x):
    """Montgomery-trick batch inversion along the leading axis.

    x: (N, ..., L); zero entries -> zero (matches ``element.go:666``
    BatchInvert). One Fermat exponentiation total, 3(N-1) muls via scans.
    """
    zmask = is_zero(spec, x)
    xe = select(spec, zmask, ones(spec, x.shape[:-1]), x)

    def fwd(acc, xi):
        nacc = mul(spec, acc, xi)
        return nacc, acc  # emit prefix product *before* xi

    total, prefix_before = lax.scan(fwd, ones(spec, x.shape[1:-1]), xe)
    total_inv = inverse(spec, total)

    def bwd(acc, operands):
        xi, pb = operands
        out = mul(spec, acc, pb)       # inverse of xi
        nacc = mul(spec, acc, xi)
        return nacc, out

    _, out_rev = lax.scan(bwd, total_inv, (xe, prefix_before), reverse=True)
    return select(spec, zmask, jnp.zeros_like(out_rev), out_rev)


def legendre(spec: FieldSpec, x):
    """Euler criterion: x^((q-1)/2), in {0, 1, q-1} (Montgomery form)."""
    return exp_const(spec, x, (spec.modulus - 1) // 2)


# ---------------------------------------------------------------------------
# sqrt
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _sqrt_consts(spec: FieldSpec):
    s = spec.two_adicity
    t = spec.t_odd
    c = 2
    while pow(c, (spec.modulus - 1) // 2, spec.modulus) != spec.modulus - 1:
        c += 1
    z = pow(c, t, spec.modulus)  # generator of the 2-Sylow subgroup
    return s, t, z


@functools.partial(jax.jit, static_argnums=0)
def sqrt(spec: FieldSpec, x):
    """Square root; returns (root, has_root), root = 0 where none exists.

    q = 3 mod 4: one exponentiation x^((q+1)/4) (reference ``SqrtQ3Mod4``,
    ``element.go:1511``). Otherwise constant-trip masked Tonelli-Shanks
    (reference ``element.go:1584``): every data-dependent branch becomes a
    select so a whole batch shares one fixed schedule.
    """
    q = spec.modulus
    if q % 4 == 3:
        cand = exp_const(spec, x, (q + 1) // 4)
        ok = equal(spec, square(spec, cand), x)
        return select(spec, ok, cand, jnp.zeros_like(cand)), ok | is_zero(spec, x)
    return _sqrt_tonelli(spec, x)


def _sqrt_tonelli(spec: FieldSpec, x):
    s, t, z = _sqrt_consts(spec)
    one = ones(spec, x.shape[:-1])
    c0 = jnp.broadcast_to(from_int(spec, z), x.shape)  # order 2^s
    w = exp_const(spec, x, (t - 1) // 2)
    r = mul(spec, x, w)   # invariant: r^2 = x * b
    b = mul(spec, r, w)   # b = x^t, ord(b) | 2^s
    m0 = jnp.full(x.shape[:-1], s, dtype=I32)

    steps = jnp.arange(s, dtype=I32)

    def round_body(carry, _):
        r, b, c, m = carry
        # i = least j >= 0 with b^(2^j) == 1 (exists since ord(b) | 2^m)
        def chain(ch_carry, _j):
            val, i_cnt, seen_one = ch_carry
            seen_one = seen_one | equal(spec, val, one)
            i_cnt = i_cnt + jnp.where(seen_one, 0, 1)
            return (square(spec, val), i_cnt, seen_one), None

        (_, i_cnt, _), _ = lax.scan(
            chain, (b, jnp.zeros_like(m), jnp.zeros(x.shape[:-1], bool)),
            None, length=s)
        done = i_cnt == 0  # b == 1
        # f = c^(2^(m-i-1)) via masked repeated squaring
        n_sq = jnp.maximum(m - i_cnt - 1, 0)

        def sq_body(f, k):
            return select(spec, k < n_sq, square(spec, f), f), None

        f, _ = lax.scan(sq_body, c, steps)
        f2 = square(spec, f)
        r = select(spec, done, r, mul(spec, r, f))
        b = select(spec, done, b, mul(spec, b, f2))
        c = select(spec, done, c, f2)
        m = jnp.where(done, m, i_cnt)
        return (r, b, c, m), None

    (r, b, c, m), _ = lax.scan(round_body, (r, b, c0, m0), None, length=s)
    ok = equal(spec, square(spec, r), x)
    return select(spec, ok, r, jnp.zeros_like(r)), ok | is_zero(spec, x)


# ---------------------------------------------------------------------------
# bytes (gnark-compatible canonical big-endian)
# ---------------------------------------------------------------------------

# Above this many elements the host codec switches from per-element Python
# bigints to the vectorized numpy path (field/mont_np.py) — the bulk-IO tier
# matching the reference's asm-speed Vector.ReadFrom / unsafe dump.
_NP_CODEC_MIN = 64


def to_bytes_host(spec: FieldSpec, x, mont: bool = True) -> list[bytes]:
    """Canonical big-endian fixed-width bytes (``element.go:1000`` Bytes())."""
    arr = np.asarray(x)
    if arr.ndim == 2 and arr.shape[0] >= _NP_CODEC_MIN:
        from gnark_crypto_tpu.field import mont_np

        buf = mont_np.to_bytes_np(spec, arr, mont=mont)
        nb = spec.n_bytes
        return [buf[i * nb : (i + 1) * nb] for i in range(arr.shape[0])]
    vals = to_int(spec, x, mont=mont)
    if isinstance(vals, int):
        vals = [vals]
    return [v.to_bytes(spec.n_bytes, "big") for v in vals]


def from_bytes_host(spec: FieldSpec, bs, mont: bool = True) -> jax.Array:
    """Strict canonical decode; raises on >= q (``SetBytes``, ``element.go:1018``)."""
    if len(bs) >= _NP_CODEC_MIN:
        from gnark_crypto_tpu.field import mont_np

        limbs = mont_np.from_bytes_np(spec, b"".join(bs), len(bs), mont=mont)
        return jnp.asarray(limbs)
    vals = []
    for b in bs:
        v = int.from_bytes(b, "big")
        if v >= spec.modulus:
            raise ValueError("non-canonical field element encoding")
        vals.append(v)
    return from_int(spec, vals, mont=mont)
