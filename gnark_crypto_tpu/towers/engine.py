"""Extension-field engines: towers as stacked limb arrays.

TPU-native counterpart of the reference's generated ``internal/fptower``
packages (``e2.go``/``e6.go``/``e12.go``): instead of per-curve structs with
hand-specialized methods, extensions are built *compositionally* —
``QuadExtEngine``/``CubicExtEngine`` wrap any engine implementing the field
protocol and expose the same protocol, so the whole stack (G2 group law over
Fp2, Fp12 pairing targets, small-field E4) reuses the generic curve/NTT code.

An element of a degree-d extension over a base with element shape S is an
array of shape (..., d, *S): coefficient index first, lowest degree at 0.

Multiplication algorithms match the reference's choices (Karatsuba 3-mul for
quadratic — ``e2_fallback.go``; Karatsuba/CH-SQR3 for cubic — ``e6.go:15``),
which are also the right call on TPU: fewer base muls >> extra adds.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from gnark_crypto_tpu.field.api import FieldEngine


class ExtEngine:
    """Common protocol bits shared by Quad/Cubic extension engines."""

    base: object  # FieldEngine or ExtEngine
    degree: int

    # -- shape helpers ------------------------------------------------------
    @property
    def elem_dims(self):
        return self.base.elem_dims + 1

    def eshape(self, x):
        return tuple(x.shape[: x.ndim - self.elem_dims])

    def reshape(self, x, shape):
        return x.reshape(*shape, *x.shape[x.ndim - self.elem_dims:])

    def broadcast_to(self, x, shape):
        return jnp.broadcast_to(x, (*shape, *x.shape[x.ndim - self.elem_dims:]))

    def tile_lead(self, x, reps: int):
        return jnp.tile(x, (reps,) + (1,) * (x.ndim - 1))

    def where(self, cond, x, y):
        cond = cond[(...,) + (None,) * self.elem_dims]
        return jnp.where(cond, x, y)

    def select(self, cond, x, y):
        return self.where(cond, x, y)

    # -- coefficient access -------------------------------------------------
    def coeff(self, x, i: int):
        """i-th coefficient (a base element)."""
        idx = (Ellipsis, i) + (slice(None),) * self.base.elem_dims
        return x[idx]

    def build(self, coeffs):
        """Stack base elements into an extension element."""
        return jnp.stack(list(coeffs), axis=-1 - self.base.elem_dims)

    # -- generic constructors ----------------------------------------------
    def zeros(self, shape=()):
        return self.build([self.base.zeros(shape)] * self.degree)

    def ones(self, shape=()):
        one = self.base.ones(shape)
        zero = self.base.zeros(shape)
        return self.build([one] + [zero] * (self.degree - 1))

    def from_int(self, v, mont: bool = True):
        """int -> embed in degree 0; tuple -> coefficients (ints or nested
        tuples for deeper towers); list -> batch of elements."""
        if isinstance(v, (int,)):
            v = (v,) + (0,) * (self.degree - 1)
        if isinstance(v, list):
            return jnp.stack([self.from_int(e, mont=mont) for e in v], axis=0)
        assert len(v) == self.degree, (len(v), self.degree)
        return self.build([self.base.from_int(c, mont=mont) for c in v])

    def to_int(self, x, mont: bool = True):
        return tuple(self.base.to_int(self.coeff(x, i), mont=mont)
                     for i in range(self.degree))

    # -- linear ops ---------------------------------------------------------
    def add(self, x, y):
        return self._lift2(self.base.add, x, y)

    def sub(self, x, y):
        return self._lift2(self.base.sub, x, y)

    def neg(self, x):
        return self._lift1(self.base.neg, x)

    def double(self, x):
        return self._lift1(self.base.double, x)

    def halve(self, x):
        return self._lift1(self.base.halve, x)

    def mul_const(self, x, c: int):
        return self._lift1(lambda a: self.base.mul_const(a, c), x)

    def _lift1(self, fn, x):
        return self.build([fn(self.coeff(x, i)) for i in range(self.degree)])

    def _lift2(self, fn, x, y):
        return self.build([fn(self.coeff(x, i), self.coeff(y, i))
                           for i in range(self.degree)])

    # -- predicates ---------------------------------------------------------
    def is_zero(self, x):
        r = self.base.is_zero(self.coeff(x, 0))
        for i in range(1, self.degree):
            r = r & self.base.is_zero(self.coeff(x, i))
        return r

    def equal(self, x, y):
        r = self.base.equal(self.coeff(x, 0), self.coeff(y, 0))
        for i in range(1, self.degree):
            r = r & self.base.equal(self.coeff(x, i), self.coeff(y, i))
        return r

    # -- exponentiation (generic square-multiply over static int) -----------
    def exp_const(self, x, e: int):
        if e == 0:
            return self.broadcast_to(self.ones(), self.eshape(x))
        from gnark_crypto_tpu.utils import hostloop
        if not hostloop.is_tracing(x):
            # eager: host ladder of small jitted kernels (utils/hostloop.py)
            return hostloop.exp_ladder(self.square, self.mul, x, e)
        nbits = e.bit_length()
        bits = jnp.asarray(
            [(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], jnp.int32)
        res0 = self.broadcast_to(self.ones(), self.eshape(x))

        def body(res, bit):
            res = self.square(res)
            return self.where(bit == 1, self.mul(res, x), res), None

        res, _ = jax.lax.scan(body, res0, bits)
        return res

    def batch_inverse(self, x):
        """Montgomery trick along the leading axis (mirrors base engines)."""
        zmask = self.is_zero(x)
        xe = self.where(zmask, self.broadcast_to(self.ones(), self.eshape(x)), x)

        def fwd(acc, xi):
            return self.mul(acc, xi), acc

        total, prefix = jax.lax.scan(fwd, self.ones(self.eshape(x)[1:]), xe)
        tinv = self.inverse(total)

        def bwd(acc, operands):
            xi, pb = operands
            return self.mul(acc, xi), self.mul(acc, pb)

        _, out = jax.lax.scan(bwd, tinv, (xe, prefix), reverse=True)
        return self.where(zmask, jnp.zeros_like(out), out)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return type(other) is type(self) and other._key() == self._key()

    def __repr__(self):
        return f"{type(self).__name__}({self.base!r}, deg={self.degree})"


class QuadExtEngine(ExtEngine):
    """base[u] / (u^2 - nr). Reference: fptower E2 (over fp) / E12 (over E6)."""

    degree = 2

    def __init__(self, base, nr, mul_by_nr: Callable | None = None,
                 tag: str = ""):
        self.base = base
        self.nr = nr  # int or tuple (base element constant), used if no hook
        self.tag = tag
        if mul_by_nr is not None:
            self.mul_by_nr = mul_by_nr
        else:
            self.mul_by_nr = self._default_mul_by_nr

    def _key(self):
        return ("quad", self.base, self.nr if isinstance(self.nr, (int, tuple))
                else None, self.tag)

    def _default_mul_by_nr(self, a):
        if isinstance(self.nr, int):
            if self.nr == -1:
                return self.base.neg(a)
            if 0 < self.nr <= 16:
                return self.base.mul_const(a, self.nr)
            if -16 <= self.nr < 0:
                return self.base.neg(self.base.mul_const(a, -self.nr))
        const = self.base.from_int(self.nr)
        return self.base.mul(a, self.base.broadcast_to(
            const, self.base.eshape(a)))

    def mul(self, x, y):
        b = self.base
        a0, a1 = self.coeff(x, 0), self.coeff(x, 1)
        b0, b1 = self.coeff(y, 0), self.coeff(y, 1)
        v0 = b.mul(a0, b0)
        v1 = b.mul(a1, b1)
        t = b.mul(b.add(a0, a1), b.add(b0, b1))
        c0 = b.add(v0, self.mul_by_nr(v1))
        c1 = b.sub(b.sub(t, v0), v1)
        return self.build([c0, c1])

    def square(self, x):
        # complex-style squaring (reference e2 Square / e12 CyclotomicSquare
        # uses specialized forms; this is the generic 2-mul version)
        b = self.base
        a0, a1 = self.coeff(x, 0), self.coeff(x, 1)
        v = b.mul(a0, a1)
        t = b.mul(b.add(a0, a1), b.add(a0, self.mul_by_nr(a1)))
        c0 = b.sub(b.sub(t, v), self.mul_by_nr(v))
        c1 = b.double(v)
        return self.build([c0, c1])

    def inverse(self, x):
        # 1/(a0 + a1 u) = (a0 - a1 u) / (a0^2 - nr*a1^2)   (e2.go Inverse)
        b = self.base
        a0, a1 = self.coeff(x, 0), self.coeff(x, 1)
        norm = b.sub(b.square(a0), self.mul_by_nr(b.square(a1)))
        ninv = b.inverse(norm)
        return self.build([b.mul(a0, ninv), b.neg(b.mul(a1, ninv))])

    def conjugate(self, x):
        return self.build([self.coeff(x, 0), self.base.neg(self.coeff(x, 1))])

    def norm(self, a):
        """a0^2 - nr*a1^2 (the Fp2 -> Fp norm for quadratic ext of fp)."""
        f = self.base
        return f.sub(f.square(self.coeff(a, 0)),
                     self.mul_by_nr(f.square(self.coeff(a, 1))))

    def is_square(self, a):
        """QR in Fp2 iff the norm is a QR in Fp."""
        return self.base.is_square(self.norm(a))

    def sgn0(self, a):
        """RFC 9380 sgn0 for GF(p^2): sign of a0, tie-broken by a1."""
        f = self.base
        a0, a1 = self.coeff(a, 0), self.coeff(a, 1)
        s0 = f.sgn0(a0)
        z0 = f.is_zero(a0)
        import jax.numpy as _jnp

        return s0 | (z0.astype(_jnp.int32) & f.sgn0(a1))

    def sqrt(self, a):
        """Square root by the complex method (reference e2.go Sqrt),
        generalized to any base carrying sqrt/is_square (so it serves Fp2
        over fp AND Fp4 over Fp2, for bls24 G2 decompression). Returns
        (root, has_root); all branches masked so one schedule serves the
        batch."""
        f = self.base
        sh = f.eshape(self.coeff(a, 0))
        a0, a1 = self.coeff(a, 0), self.coeff(a, 1)
        norm = f.sub(f.square(a0), self.mul_by_nr(f.square(a1)))
        lam, _ = f.sqrt(norm)
        delta = f.halve(f.add(a0, lam))
        is_sq = f.is_square(delta) | f.is_zero(delta)
        delta = f.select(is_sq, delta, f.halve(f.sub(a0, lam)))
        x0, _ = f.sqrt(delta)
        x1 = f.mul(a1, f.inverse(f.double(x0)))
        cand = self.build([x0, x1])
        # a1 == 0: either sqrt(a0) directly or sqrt(a0/nr)*u
        if isinstance(self.nr, int):
            p = f.spec.modulus
            inv_nr = f.broadcast_to(f.from_int(pow(self.nr % p, -1, p)), sh)
        else:
            inv_nr = f.broadcast_to(f.inverse(f.from_int(self.nr)), sh)
        s0, s0ok = f.sqrt(a0)
        s1, _ = f.sqrt(f.mul(a0, inv_nr))
        zero = f.zeros(sh)
        cand_a1z = self.where(
            s0ok, self.build([s0, zero]), self.build([zero, s1]))
        cand = self.where(f.is_zero(a1), cand_a1z, cand)
        ok = self.equal(self.square(cand), a)
        return self.where(ok, cand, jnp.zeros_like(cand)), ok


class CubicExtEngine(ExtEngine):
    """base[v] / (v^3 - nr). Reference: fptower E6 over E2 (e6.go)."""

    degree = 3

    def __init__(self, base, nr, mul_by_nr: Callable | None = None,
                 tag: str = ""):
        self.base = base
        self.nr = nr
        self.tag = tag
        if mul_by_nr is not None:
            self.mul_by_nr = mul_by_nr
        else:
            self.mul_by_nr = lambda a: base.mul(
                a, base.broadcast_to(base.from_int(nr), base.eshape(a)))

    def _key(self):
        return ("cubic", self.base, self.nr if isinstance(self.nr, (int, tuple))
                else None, self.tag)

    def mul(self, x, y):
        # Karatsuba (e6.go:15 Mul, Devegili et al. 4.Karatsuba)
        b = self.base
        a0, a1, a2 = (self.coeff(x, i) for i in range(3))
        b0, b1, b2 = (self.coeff(y, i) for i in range(3))
        v0, v1, v2 = b.mul(a0, b0), b.mul(a1, b1), b.mul(a2, b2)
        t0 = b.sub(b.sub(b.mul(b.add(a1, a2), b.add(b1, b2)), v1), v2)
        t1 = b.sub(b.sub(b.mul(b.add(a0, a1), b.add(b0, b1)), v0), v1)
        t2 = b.sub(b.sub(b.mul(b.add(a0, a2), b.add(b0, b2)), v0), v2)
        c0 = b.add(v0, self.mul_by_nr(t0))
        c1 = b.add(t1, self.mul_by_nr(v2))
        c2 = b.add(t2, v1)
        return self.build([c0, c1, c2])

    def square(self, x):
        # CH-SQR2 (e6.go Square)
        b = self.base
        a0, a1, a2 = (self.coeff(x, i) for i in range(3))
        s0 = b.square(a0)
        ab = b.mul(a0, a1)
        s1 = b.double(ab)
        s2 = b.square(b.add(b.sub(a0, a1), a2))
        bc = b.mul(a1, a2)
        s3 = b.double(bc)
        s4 = b.square(a2)
        c0 = b.add(s0, self.mul_by_nr(s3))
        c1 = b.add(s1, self.mul_by_nr(s4))
        c2 = b.sub(b.add(b.add(s1, s2), s3), b.add(s0, s4))
        return self.build([c0, c1, c2])

    def inverse(self, x):
        # e6.go Inverse (Grewal et al. / standard cubic inversion)
        b = self.base
        a0, a1, a2 = (self.coeff(x, i) for i in range(3))
        t0, t1, t2 = b.square(a0), b.square(a1), b.square(a2)
        t3, t4, t5 = b.mul(a0, a1), b.mul(a0, a2), b.mul(a1, a2)
        c0 = b.sub(t0, self.mul_by_nr(t5))
        c1 = b.sub(self.mul_by_nr(t2), t3)
        c2 = b.sub(t1, t4)
        t6 = b.add(b.mul(a0, c0),
                   self.mul_by_nr(b.add(b.mul(a2, c1), b.mul(a1, c2))))
        f = b.inverse(t6)
        return self.build([b.mul(c0, f), b.mul(c1, f), b.mul(c2, f)])

    def mul_by_v(self, x):
        """x * v: coefficient rotation with one nr-mul (free shift on TPU)."""
        a0, a1, a2 = (self.coeff(x, i) for i in range(3))
        return self.build([self.mul_by_nr(a2), a0, a1])
