"""IOP polynomial layer: basis x layout tracked polynomials with lazy
conversions (counterpart of ``ecc/<curve>/fr/iop/polynomial.go:22-392``).

A Polynomial tracks (Basis, Layout):
  Basis:  CANONICAL (coefficients) | LAGRANGE (evals on <g>) |
          LAGRANGE_COSET (evals on u*<g>)
  Layout: REGULAR | BIT_REVERSE
Conversions ride the NTT with the same decimation bookkeeping as the
reference (DIF: natural -> bit-reversed, DIT: bit-reversed -> natural), so
conversions never pay a separate bit-reversal when the target layout absorbs
it. Values are stored as plain (non-Montgomery) fr arrays.
"""

from __future__ import annotations

import dataclasses
import enum
import functools

import jax
import jax.numpy as jnp

from gnark_crypto_tpu.field.api import for_spec
from gnark_crypto_tpu.ntt import fft as fftm
from gnark_crypto_tpu.ntt.domain import Domain
from gnark_crypto_tpu.specs.field import FieldSpec
from gnark_crypto_tpu.utils.scans import exp_table


class Basis(enum.Enum):
    CANONICAL = 0
    LAGRANGE = 1
    LAGRANGE_COSET = 2


class Layout(enum.Enum):
    REGULAR = 0
    BIT_REVERSE = 1


@functools.lru_cache(maxsize=None)
def _domain(spec: FieldSpec, n: int) -> Domain:
    return Domain(spec, n)


@dataclasses.dataclass
class Polynomial:
    spec: FieldSpec
    values: jax.Array   # (n,) plain fr
    basis: Basis
    layout: Layout

    @property
    def n(self) -> int:
        return self.values.shape[0]

    @property
    def eng(self):
        return for_spec(self.spec)

    def _dom(self) -> Domain:
        return _domain(self.spec, self.n)

    # -- layout ------------------------------------------------------------
    def to_regular(self) -> "Polynomial":
        if self.layout == Layout.REGULAR:
            return self
        return Polynomial(self.spec, fftm.bit_reverse(self.values),
                          self.basis, Layout.REGULAR)

    def to_bit_reverse(self) -> "Polynomial":
        if self.layout == Layout.BIT_REVERSE:
            return self
        return Polynomial(self.spec, fftm.bit_reverse(self.values),
                          self.basis, Layout.BIT_REVERSE)

    # -- basis (polynomial.go ToCanonical/ToLagrange/ToLagrangeCoset) -------
    def to_canonical(self) -> "Polynomial":
        eng, dom = self.eng, self._dom()
        if self.basis == Basis.CANONICAL:
            return self
        m = eng.to_mont(self.values)
        coset = self.basis == Basis.LAGRANGE_COSET
        if self.layout == Layout.BIT_REVERSE:
            out = fftm.fft_inverse(dom, m, fftm.DIT, coset=coset)
            lay = Layout.REGULAR
        else:
            out = fftm.fft_inverse(dom, m, fftm.DIF, coset=coset)
            lay = Layout.BIT_REVERSE
        return Polynomial(self.spec, eng.from_mont(out), Basis.CANONICAL, lay)

    def to_lagrange(self, coset: bool = False) -> "Polynomial":
        target = Basis.LAGRANGE_COSET if coset else Basis.LAGRANGE
        if self.basis == target:
            return self
        if self.basis != Basis.CANONICAL:
            return self.to_canonical().to_lagrange(coset)
        eng, dom = self.eng, self._dom()
        m = eng.to_mont(self.values)
        if self.layout == Layout.REGULAR:
            out = fftm.fft(dom, m, fftm.DIF, coset=coset)
            lay = Layout.BIT_REVERSE
        else:
            out = fftm.fft(dom, m, fftm.DIT, coset=coset)
            lay = Layout.REGULAR
        return Polynomial(self.spec, eng.from_mont(out), target, lay)

    def to_lagrange_coset(self) -> "Polynomial":
        return self.to_lagrange(coset=True)

    # -- evaluation (polynomial.go Evaluate) --------------------------------
    def evaluate(self, point) -> jax.Array:
        """P(point) for a plain fr scalar (1,); Horner-free inner product."""
        p = self.to_canonical().to_regular()
        eng = self.eng
        pm = eng.to_mont(p.values)
        pows = exp_table(eng, eng.to_mont(point), p.n)
        return eng.from_mont(eng.inner_product(pm, pows))[None]


def from_canonical(spec: FieldSpec, coeffs) -> Polynomial:
    return Polynomial(spec, coeffs, Basis.CANONICAL, Layout.REGULAR)


def to_lagrange_batch(polys: list[Polynomial], coset: bool = False
                      ) -> list[Polynomial]:
    """Convert many polynomials to (LAGRANGE[_COSET], REGULAR) with batched
    transforms: same-(basis, layout, n) groups run ONE ``fft_batch`` (the
    reference's quotient pipeline loops per-poly domain.FFT calls,
    iop/quotient.go:21 — here dozens of rows fuse into one program).
    """
    target = Basis.LAGRANGE_COSET if coset else Basis.LAGRANGE
    out: list[Polynomial | None] = [None] * len(polys)
    groups: dict[tuple, list[int]] = {}
    for i, p in enumerate(polys):
        if p.basis == Basis.CANONICAL:
            groups.setdefault((p.layout, p.n), []).append(i)
        else:  # already Lagrange-family (or coset mismatch): per-poly path
            out[i] = p.to_lagrange(coset).to_regular()
    for (layout, n), idxs in groups.items():
        eng = polys[idxs[0]].eng
        dom = _domain(polys[idxs[0]].spec, n)
        batch = jnp.stack([eng.to_mont(polys[i].values) for i in idxs])
        if layout == Layout.REGULAR:
            ev = fftm.fft_batch(dom, batch, fftm.DIF, coset=coset)
            # DIF output is bit-reversed: undo along axis 1
            ev = jnp.take(ev, jnp.asarray(fftm._bitrev_perm(n)), axis=1)
        else:
            ev = fftm.fft_batch(dom, batch, fftm.DIT, coset=coset)
        ev = eng.from_mont(ev)
        for j, i in enumerate(idxs):
            out[i] = Polynomial(polys[i].spec, ev[j], target, Layout.REGULAR)
    return out


def evaluate_expression(spec: FieldSpec, fn, *polys: Polynomial) -> Polynomial:
    """Pointwise expression over Lagrange vectors (iop/expressions.go:17).

    fn receives Montgomery-form value arrays and the engine; all inputs are
    converted to (LAGRANGE, REGULAR) — canonical inputs in one batched FFT.
    """
    eng = for_spec(spec)
    lag = to_lagrange_batch(list(polys))
    vals = [eng.to_mont(p.values) for p in lag]
    out = fn(eng, *vals)
    return Polynomial(spec, eng.from_mont(out), Basis.LAGRANGE, Layout.REGULAR)


def divide_by_x_minus_one(poly: Polynomial, vanish_n: int | None = None
                          ) -> Polynomial:
    """Quotient h = p / (X^m - 1) via coset evaluation
    (iop/quotient.go:21 DivideByXMinusOne).

    p: CANONICAL of size N (deg p < N); divisor X^m - 1 with m | N, m < N
    (default m = N/2). On the size-N coset u*<g>, the vanishing values
    (u*g^i)^m - 1 are nonzero and periodic with period N/m.
    """
    spec = poly.spec
    eng = poly.eng
    big_n = poly.n
    n = vanish_n or big_n // 2
    assert big_n % n == 0 and n < big_n
    period = big_n // n
    dom_big = _domain(spec, big_n)
    padded = poly.to_canonical().to_regular().values
    evals = fftm.fft(dom_big, eng.to_mont(padded), fftm.DIF, coset=True)
    q = spec.modulus
    u = dom_big.shift_int
    gbig = dom_big.generator_int
    zh = [(pow(u, n, q) * pow(gbig, i * n, q) - 1) % q
          for i in range(period)]
    zh_inv = [pow(z, -1, q) for z in zh]
    zh_vec = eng.to_mont(eng.from_int(
        [zh_inv[i % period] for i in range(big_n)], mont=False))
    # evals are bit-reversed: apply the same permutation to zh_vec
    zh_vec = fftm.bit_reverse(zh_vec)
    h_evals = eng.mul(evals, zh_vec)
    h = fftm.fft_inverse(dom_big, h_evals, fftm.DIT, coset=True)
    return Polynomial(spec, eng.from_mont(h), Basis.CANONICAL, Layout.REGULAR)


def build_ratio_copy_constraint(spec: FieldSpec, entries: list[Polynomial],
                                sigma: list[int], beta: int, gamma: int
                                ) -> Polynomial:
    """Grand-product accumulator Z for the copy-constraint/permutation
    argument (iop/ratios.go:47 BuildRatioCopyConstraint):

      Z_0 = 1;  Z_{i+1} = Z_i * prod_j (f_j(w^i) + beta*w^i*nu^j + gamma)
                              / (f_j(w^i) + beta*sigma_j(i) + gamma)
    where sigma is the permutation over the concatenated index space and
    nu^j shifts each column into its own coset slot.
    """
    eng = for_spec(spec)
    n = entries[0].n
    k = len(entries)
    q = spec.modulus
    dom = _domain(spec, n)
    g = dom.generator_int
    u = dom.shift_int  # column separator (FrMultiplicativeGen)
    fs_vals = [eng.to_mont(p.to_lagrange().to_regular().values)
               for p in entries]
    # id_j(i) = u^j * g^i ; sigma maps flat index t = j*n + i
    ids = []
    for j in range(k):
        base = [pow(u, j, q) * pow(g, i, q) % q for i in range(n)]
        ids.append(base)
    flat_ids = [v for col in ids for v in col]
    sig_vals = [flat_ids[sigma[t]] for t in range(k * n)]
    beta_m = eng.to_mont(eng.from_int([beta], mont=False))
    gamma_m = eng.to_mont(eng.from_int([gamma] * n, mont=False))
    num = eng.to_mont(eng.from_int([1] * n, mont=False))
    den = num
    for j in range(k):
        idj = eng.to_mont(eng.from_int(ids[j], mont=False))
        sgj = eng.to_mont(eng.from_int(sig_vals[j * n:(j + 1) * n],
                                       mont=False))
        num = eng.mul(num, eng.add(eng.add(
            fs_vals[j], eng.mul(idj, eng.broadcast_to(beta_m[0], (n,)))),
            gamma_m))
        den = eng.mul(den, eng.add(eng.add(
            fs_vals[j], eng.mul(sgj, eng.broadcast_to(beta_m[0], (n,)))),
            gamma_m))
    ratio = eng.mul(num, eng.batch_inverse(den))
    # Z = exclusive prefix product of ratio (Z_0 = 1)
    from gnark_crypto_tpu.utils.scans import prefix_sum  # noqa: F401

    # log-stride prefix product
    z = ratio
    d = 1
    while d < n:
        shifted = z[:-d]
        head = z[:d]
        tail = eng.mul(z[d:], shifted)
        z = jnp.concatenate([head, tail], axis=0)
        d *= 2
    one = eng.to_mont(eng.from_int([1], mont=False))
    z_excl = jnp.concatenate([one, z[:-1]], axis=0)
    return Polynomial(spec, eng.from_mont(z_excl), Basis.LAGRANGE,
                      Layout.REGULAR)
