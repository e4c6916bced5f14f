"""FFT/NTT domain: roots of unity, twiddle tables, coset tables.

TPU-native counterpart of ``ecc/bn254/fr/fft/domain.go``. Same mathematical
layout as the reference (twiddles[stage][j] = w^(j*2^stage), coset table
u^i — ``domain.go:42-54``, ``buildTwiddles`` ``domain.go:277-298``), but the
tables are built *on device* with log-doubling vectorized multiplies and the
per-stage tables are strided views of the stage-0 table instead of separate
allocations. Works for any registered field engine (bn254 fr ... koalabear).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gnark_crypto_tpu.field.api import FieldEngine, for_spec
from gnark_crypto_tpu.specs.field import FieldSpec


def _exp_table(eng: FieldEngine, w, n: int):
    """[w^0, ..., w^(n-1)] (Montgomery) in log2(n) masked full-width muls.

    table[i] = w^i computed bit-by-bit over the index: all intermediate
    shapes are (n, ...), so XLA compiles exactly two kernel shapes no matter
    the table size. (Reference: ``BuildExpTable`` domain.go:300 — a parallel
    segment walk; concat-doubling would compile one shape per level.)
    """
    assert n & (n - 1) == 0, "table size must be a power of two"
    if n == 1:
        return eng.ones((1,))
    k = n.bit_length() - 1
    idx = jnp.arange(n, dtype=jnp.int32)
    table = eng.ones((n,))
    wp = w[None] if eng.eshape(w) == () else w  # w^(2^bit), batch-of-1
    for bit in range(k):
        bit_set = (idx >> bit) & 1
        table = eng.where(bit_set == 1,
                          eng.mul(table, eng.broadcast_to(wp[0], (n,))),
                          table)
        wp = eng.square(wp)
    return table


class Domain:
    """Radix-2 evaluation domain of size 2^k (any registered field).

    Mirrors the reference Domain: Generator (primitive n-th root),
    GeneratorInv, CardinalityInv, FrMultiplicativeGen (coset shift u),
    twiddle + coset tables (``domain.go:24-58``).
    """

    def __init__(self, spec_or_eng, n: int, shift: int | None = None,
                 with_coset: bool = True):
        eng = (spec_or_eng if isinstance(spec_or_eng, FieldEngine)
               else for_spec(spec_or_eng))
        spec = eng.spec
        assert n & (n - 1) == 0 and n > 0, "cardinality must be a power of two"
        k = n.bit_length() - 1
        if k > spec.two_adicity:
            raise ValueError(
                f"{spec.name}: 2-adicity {spec.two_adicity} < log2(n)={k}")
        if spec.two_adic_root is None:
            raise ValueError(f"{spec.name} has no configured 2-adic root")
        self.eng = eng
        self.spec = spec
        self.n = n
        self.k = k
        q = spec.modulus
        # Generator = root^(2^(s-k)) -> order exactly n (domain.go:202)
        self.generator_int = pow(spec.two_adic_root, 1 << (spec.two_adicity - k), q)
        self.generator_inv_int = pow(self.generator_int, -1, q)
        self.cardinality_inv_int = pow(n, -1, q)
        u = spec.generator if shift is None else shift
        if u is None:
            raise ValueError(f"{spec.name} has no multiplicative generator")
        self.shift_int = u % q
        self.shift_inv_int = pow(self.shift_int, -1, q)

        self.generator = eng.from_int(self.generator_int)
        self.generator_inv = eng.from_int(self.generator_inv_int)
        self.cardinality_inv = eng.from_int(self.cardinality_inv_int)

        # stage-0 twiddles: w^j for j in [0, n/2); stage s reads t0[::2^s].
        # Built LAZILY: the Pallas four-step path never touches them, and at
        # 2^24 the two tables are 1.5 GB of HBM (they OOMed the 2^24 bench
        # before the laziness).
        self._twiddles0 = None
        self._twiddles0_inv = None
        if with_coset:
            self.coset_table = _exp_table(eng, eng.from_int(self.shift_int), n)
            self.coset_table_inv = _exp_table(
                eng, eng.from_int(self.shift_inv_int), n)
        else:
            self.coset_table = None
            self.coset_table_inv = None

    @property
    def twiddles0(self):
        if self._twiddles0 is None:
            # concrete even when first touched inside a jit trace (the
            # cached array must not be a leaked tracer)
            with jax.ensure_compile_time_eval():
                self._twiddles0 = (
                    _exp_table(self.eng, self.generator, self.n // 2)
                    if self.n >= 2 else self.eng.ones((1,)))
        return self._twiddles0

    @property
    def twiddles0_inv(self):
        if self._twiddles0_inv is None:
            with jax.ensure_compile_time_eval():
                self._twiddles0_inv = (
                    _exp_table(self.eng, self.generator_inv, self.n // 2)
                    if self.n >= 2 else self.eng.ones((1,)))
        return self._twiddles0_inv

    def stage_twiddles(self, stage: int, inverse: bool = False) -> jax.Array:
        """Twiddles for one stage: w^(j*2^stage), j in [0, n/2^(stage+1))."""
        t0 = self.twiddles0_inv if inverse else self.twiddles0
        return t0[:: 1 << stage][: self.n >> (stage + 1)]

    # -- serialization (byte parity with fft/domain.go:348 WriteTo) ---------
    def to_bytes(self, with_precompute: bool = True) -> bytes:
        """uint64-BE cardinality || 5 canonical fr elements (CardinalityInv,
        Generator, GeneratorInv, FrMultiplicativeGen, its inverse) || one
        precompute flag byte — the reference's exact wire layout."""
        nb = self.spec.n_bytes
        out = self.n.to_bytes(8, "big")
        for v in (self.cardinality_inv_int, self.generator_int,
                  self.generator_inv_int, self.shift_int,
                  self.shift_inv_int):
            out += v.to_bytes(nb, "big")
        out += bytes([1 if with_precompute else 0])
        return out


def domain_from_bytes(spec_or_eng, buf: bytes) -> Domain:
    """Parse a gnark fft.Domain blob (domain.go:381 ReadFrom): rebuild the
    domain from (cardinality, shift) and check the stored generator chain
    matches the field's 2-adic tower (corruption detection)."""
    eng = (spec_or_eng if isinstance(spec_or_eng, FieldEngine)
           else for_spec(spec_or_eng))
    spec = eng.spec
    nb = spec.n_bytes
    need = 8 + 5 * nb + 1
    if len(buf) < need:
        raise ValueError("domain blob too short")
    n = int.from_bytes(buf[:8], "big")
    vals = [int.from_bytes(buf[8 + i * nb : 8 + (i + 1) * nb], "big")
            for i in range(5)]
    card_inv, gen, gen_inv, shift, shift_inv = vals
    q = spec.modulus
    if any(v >= q for v in vals):
        raise ValueError("non-canonical domain element")
    dom = Domain(eng, n, shift=shift)
    if (dom.generator_int != gen or dom.generator_inv_int != gen_inv
            or dom.cardinality_inv_int != card_inv
            or dom.shift_inv_int != shift_inv):
        raise ValueError("domain blob inconsistent with field constants")
    return dom
