"""Short-Weierstrass group law in Jacobian coordinates, batched over lanes.

TPU-native counterpart of the reference's generated ``ecc/<curve>/g1.go``:
same EFD formulas (add-2007-bl / madd-2007-bl / dbl-2009-l — the reference
cites them at ``g1.go:332,428,519``), but every data-dependent branch
(infinity, P==Q, P==-Q) is a masked select so one fused program handles a
whole batch of points. Infinity: Z == 0 (Jacobian), (0,0) (affine) — matching
the reference's conventions.

All coordinates are field-engine arrays; a "point" is a NamedTuple pytree, so
points flow through jit/scan/vmap natively.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gnark_crypto_tpu.field.api import FieldEngine, for_spec
from gnark_crypto_tpu.specs.curve import CurveSpec


class Affine(NamedTuple):
    x: jax.Array
    y: jax.Array


class Jac(NamedTuple):
    x: jax.Array
    y: jax.Array
    z: jax.Array


class Curve:
    """Binds a CurveSpec to its fp/fr engines and exposes the group ops.

    ``fp_eng`` may be an extension engine (towers.engine) — that is how G2
    (curve over Fp2) reuses this exact code, with tuple-valued a/b/gx/gy in
    the spec.
    """

    def __init__(self, spec: CurveSpec, fp_eng=None):
        self.spec = spec
        self.fp = fp_eng if fp_eng is not None else for_spec(spec.fp)
        self.fr: FieldEngine = for_spec(spec.fr)
        def _flat(v):
            if isinstance(v, tuple):
                for c in v:
                    yield from _flat(c)
            else:
                yield v

        self.a_is_zero = all(c == 0 for c in _flat(spec.a))
        # fused Pallas point kernels are available for curves over base
        # prime fields (limb layout); quadratic towers (G2 over Fp2) get
        # the stacked-tile kernels of field/pallas/point_add2.py
        self._pallas_ok = (isinstance(self.fp, FieldEngine)
                           and self.fp.elem_dims == 1
                           and isinstance(spec.a, int))
        base = getattr(self.fp, "base", None)
        nr = getattr(self.fp, "nr", None)
        self._pallas2_ok = (not self._pallas_ok
                            and getattr(self.fp, "degree", 0) == 2
                            and isinstance(base, FieldEngine)
                            and base.elem_dims == 1
                            and isinstance(nr, int)
                            and nr != 0 and -16 <= nr <= 16
                            and self.a_is_zero)

    def _use_pallas_point(self, *coords) -> bool:
        """Route big batches to the fused Pallas add/double kernels
        (field/pallas/point_add.py): one kernel launch instead of ~16
        separate Montgomery-mul dispatches with relayouts between each.
        GNARK_TPU_NO_PALLAS_POINT=1 forces the XLA path (escape hatch for
        Mosaic regressions on new hardware)."""
        import os
        if os.environ.get("GNARK_TPU_NO_PALLAS_POINT"):
            return False
        if not self._pallas_ok or jax.default_backend() != "tpu":
            return False
        shapes = {getattr(c, "shape", None) for c in coords}
        if len(shapes) != 1:
            return False
        sh = shapes.pop()
        return sh is not None and len(sh) == 2 and sh[0] >= 512

    # -- constructors -------------------------------------------------------
    def const_affine(self, x: int, y: int) -> Affine:
        return Affine(self.fp.from_int(x), self.fp.from_int(y))

    def generator_affine(self) -> Affine:
        return self.const_affine(self.spec.gx, self.spec.gy)

    def generator_jac(self) -> Jac:
        g = self.generator_affine()
        return self.from_affine(g)

    def inf_jac(self, shape=()) -> Jac:
        z = self.fp.zeros(shape)
        return Jac(z, z, z)

    def inf_affine(self, shape=()) -> Affine:
        z = self.fp.zeros(shape)
        return Affine(z, z)

    # -- predicates ---------------------------------------------------------
    def is_inf_jac(self, p: Jac):
        return self.fp.is_zero(p.z)

    def is_inf_affine(self, p: Affine):
        return self.fp.is_zero(p.x) & self.fp.is_zero(p.y)

    def on_curve_affine(self, p: Affine):
        """y^2 == x^3 + ax + b, or infinity (g1.go IsOnCurve)."""
        f = self.fp
        y2 = f.square(p.y)
        x3 = f.mul(f.square(p.x), p.x)
        rhs = f.add(x3, f.from_int(self.spec.b))
        if not self.a_is_zero:
            rhs = f.add(rhs, f.mul(p.x, f.from_int(self.spec.a)))
        return f.equal(y2, rhs) | self.is_inf_affine(p)

    def eq_jac(self, p: Jac, q: Jac):
        """Projective equality via cross-multiplication."""
        f = self.fp
        pz2, qz2 = f.square(p.z), f.square(q.z)
        x_eq = f.equal(f.mul(p.x, qz2), f.mul(q.x, pz2))
        y_eq = f.equal(f.mul(p.y, f.mul(q.z, qz2)),
                       f.mul(q.y, f.mul(p.z, pz2)))
        both_inf = self.is_inf_jac(p) & self.is_inf_jac(q)
        one_inf = self.is_inf_jac(p) ^ self.is_inf_jac(q)
        return (x_eq & y_eq & ~one_inf) | both_inf

    # -- conversions --------------------------------------------------------
    def from_affine(self, p: Affine) -> Jac:
        f = self.fp
        inf = self.is_inf_affine(p)
        one = f.broadcast_to(f.ones(), self.fp.eshape(p.x))
        z = f.where(inf, f.zeros(self.fp.eshape(p.x)), one)
        return Jac(p.x, p.y, z)

    def to_affine(self, p: Jac) -> Affine:
        """Batch Jacobian->affine with one shared inversion chain
        (reference ``BatchJacobianToAffineG1`` g1.go:1266)."""
        f = self.fp
        lead = f.eshape(p.z)
        if len(lead) == 0:
            zinv = f.inverse(p.z)
        else:
            zinv = f.batch_inverse(p.z.reshape((-1, *p.z.shape[len(lead):]))
                                   ).reshape(p.z.shape)
        zinv2 = f.square(zinv)
        x = f.mul(p.x, zinv2)
        y = f.mul(p.y, f.mul(zinv, zinv2))
        inf = self.is_inf_jac(p)
        return Affine(f.where(inf, f.zeros(lead), x),
                      f.where(inf, f.zeros(lead), y))

    # -- group law ----------------------------------------------------------
    def neg_jac(self, p: Jac) -> Jac:
        return Jac(p.x, self.fp.neg(p.y), p.z)

    def neg_affine(self, p: Affine) -> Affine:
        return Affine(p.x, self.fp.neg(p.y))

    def double(self, p: Jac) -> Jac:
        """dbl-2009-l (a=0) / dbl-2007-bl (general a); handles infinity freely
        (Z3 = 2*Y*Z = 0 when Z = 0). Reference: g1.go:397-424 DoubleAssign."""
        if self._use_pallas_point(*p):
            from gnark_crypto_tpu.field.pallas.point_add import jac_double
            return Jac(*jac_double(self.spec.fp, self.spec.a, *p))
        f = self.fp
        A = f.square(p.x)
        B = f.square(p.y)
        C = f.square(B)
        t = f.square(f.add(p.x, B))
        D = f.double(f.sub(f.sub(t, A), C))
        E = f.add(f.double(A), A)  # 3A
        if not self.a_is_zero:
            z2 = f.square(p.z)
            E = f.add(E, f.mul(f.square(z2), f.from_int(self.spec.a)))
        F = f.square(E)
        x3 = f.sub(F, f.double(D))
        eight_c = f.double(f.double(f.double(C)))
        y3 = f.sub(f.mul(E, f.sub(D, x3)), eight_c)
        z3 = f.double(f.mul(p.y, p.z))
        return Jac(x3, y3, z3)

    def add(self, p: Jac, q: Jac) -> Jac:
        """Complete (masked) add-2007-bl. Reference: g1.go:332 AddAssign."""
        if self._use_pallas_point(*p, *q):
            from gnark_crypto_tpu.field.pallas.point_add import jac_add
            return Jac(*jac_add(self.spec.fp, self.spec.a, *p, *q))
        f = self.fp
        z1z1 = f.square(p.z)
        z2z2 = f.square(q.z)
        u1 = f.mul(p.x, z2z2)
        u2 = f.mul(q.x, z1z1)
        s1 = f.mul(f.mul(p.y, q.z), z2z2)
        s2 = f.mul(f.mul(q.y, p.z), z1z1)
        h = f.sub(u2, u1)
        i = f.square(f.double(h))
        j = f.mul(h, i)
        rr = f.double(f.sub(s2, s1))
        v = f.mul(u1, i)
        x3 = f.sub(f.sub(f.square(rr), j), f.double(v))
        y3 = f.sub(f.mul(rr, f.sub(v, x3)), f.double(f.mul(s1, j)))
        z3 = f.mul(f.sub(f.sub(f.square(f.add(p.z, q.z)), z1z1), z2z2), h)
        out = Jac(x3, y3, z3)

        h0 = f.is_zero(h)
        r0 = f.is_zero(rr)
        p_inf = self.is_inf_jac(p)
        q_inf = self.is_inf_jac(q)
        dbl = self.double(p)
        out = _sel(f, h0 & r0, dbl, out)           # P == Q -> double
        out = _sel(f, h0 & ~r0 & ~p_inf & ~q_inf,  # P == -Q -> infinity
                   self.inf_jac(f.eshape(x3)), out)
        out = _sel(f, p_inf, q, out)
        out = _sel(f, q_inf, p, out)
        return out

    def add_mixed(self, p: Jac, q: Affine) -> Jac:
        """Complete (masked) madd-2007-bl. Reference: g1.go:428 AddMixed."""
        f = self.fp
        z1z1 = f.square(p.z)
        u2 = f.mul(q.x, z1z1)
        s2 = f.mul(f.mul(q.y, p.z), z1z1)
        h = f.sub(u2, p.x)
        hh = f.square(h)
        i = f.double(f.double(hh))
        j = f.mul(h, i)
        rr = f.double(f.sub(s2, p.y))
        v = f.mul(p.x, i)
        x3 = f.sub(f.sub(f.square(rr), j), f.double(v))
        y3 = f.sub(f.mul(rr, f.sub(v, x3)), f.double(f.mul(p.y, j)))
        z3 = f.sub(f.sub(f.square(f.add(p.z, h)), z1z1), hh)
        out = Jac(x3, y3, z3)

        h0 = f.is_zero(h)
        r0 = f.is_zero(rr)
        p_inf = self.is_inf_jac(p)
        q_inf = self.is_inf_affine(q)
        dbl = self.double(p)
        out = _sel(f, h0 & r0 & ~p_inf, dbl, out)
        out = _sel(f, h0 & ~r0 & ~p_inf,
                   self.inf_jac(f.eshape(x3)), out)
        out = _sel(f, p_inf, self.from_affine(q), out)
        out = _sel(f, q_inf, p, out)
        return out

    # -- scalar multiplication ---------------------------------------------
    def scalar_bits(self, k, nbits: int | None = None):
        """fr limb array (..., Lr) -> bit matrix (nbits, ...), MSB first.

        Scalars must be plain (non-Montgomery) fr values.
        """
        fr = self.fr
        b = fr.spec.limb_bits if fr.elem_dims else 32
        nbits = nbits or fr.spec.modulus.bit_length()
        if fr.elem_dims:  # limb representation
            cols = []
            for bit in range(nbits):
                limb, off = divmod(bit, b)
                cols.append((k[..., limb] >> off) & 1)
            bits = jnp.stack(cols, axis=0)
        else:
            bits = jnp.stack(
                [(k >> jnp.uint32(i)) & 1 for i in range(nbits)], axis=0
            ).astype(jnp.int32)
        return bits[::-1]  # MSB first

    def scalar_mul(self, p: Jac, k, nbits: int | None = None) -> Jac:
        """[k]P by double-and-add over a lax.scan of the scalar bits.

        The reference uses GLV + windowed NAF (``g1.go:796 mulGLV``); this is
        the portable ladder — GLV split lands with the MSM stack. k is a
        plain-int fr array (not Montgomery).
        """
        f = self.fp
        bits = self.scalar_bits(k, nbits)
        acc0 = self.inf_jac(f.eshape(p.x))

        from gnark_crypto_tpu.utils import hostloop
        if not hostloop.is_tracing(p, k):
            # eager: the bit matrix is concrete — dispatch two small jitted
            # kernels per bit row instead of compiling one giant fused scan
            # (XLA:CPU segfaults on very large scan bodies, hostloop.py)
            import numpy as np

            dbl, dbl_add = _ladder_ops(self)
            rows = np.asarray(bits)
            acc = acc0
            for row in rows:
                if row.max() == 0:
                    acc = dbl(acc)
                else:
                    acc = dbl_add(acc, p, jnp.asarray(row))
            return acc

        def body(acc, bit):
            acc = self.double(acc)
            added = self.add(acc, p)
            return _sel(f, bit == 1, added, acc), None

        acc, _ = jax.lax.scan(body, acc0, bits)
        return acc

    def joint_scalar_mul(self, p: Jac, q: Jac, k1, k2,
                         nbits: int | None = None) -> Jac:
        """[k1]P + [k2]Q with one shared doubling chain (Strauss-Shamir,
        reference g1.go:873 JointScalarMultiplication) — ~nbits doublings
        instead of 2*nbits for two separate ladders. The reference's 2-bit
        table lookup becomes two masked adds per step (the p+q combination
        is covered by both masks firing)."""
        f = self.fp
        bits1 = self.scalar_bits(k1, nbits)
        bits2 = self.scalar_bits(k2, nbits)
        acc0 = self.inf_jac(f.eshape(p.x))

        from gnark_crypto_tpu.utils import hostloop
        if not hostloop.is_tracing(p, q, k1, k2):
            import numpy as np

            dbl, dbl_add2 = _joint_ladder_ops(self)
            r1, r2 = np.asarray(bits1), np.asarray(bits2)
            acc = acc0
            for b1, b2 in zip(r1, r2):
                if b1.max() == 0 and b2.max() == 0:
                    acc = dbl(acc)
                else:
                    acc = dbl_add2(acc, p, q, jnp.asarray(b1),
                                   jnp.asarray(b2))
            return acc

        def body(acc, bb):
            b1, b2 = bb
            acc = self.double(acc)
            acc = _sel(f, b1 == 1, self.add(acc, p), acc)
            acc = _sel(f, b2 == 1, self.add(acc, q), acc)
            return acc, None

        acc, _ = jax.lax.scan(body, acc0, (bits1, bits2))
        return acc


def _sel(f: FieldEngine, cond, a, b):
    return type(a)(*(f.where(cond, xa, xb) for xa, xb in zip(a, b)))


@functools.lru_cache(maxsize=None)
def _ladder_ops(curve: "Curve"):
    """Jitted (double, double-then-masked-add) kernels for eager ladders."""
    dbl = jax.jit(curve.double)

    def _dbl_add(acc, p, bit_row):
        acc = curve.double(acc)
        return _sel(curve.fp, bit_row == 1, curve.add(acc, p), acc)

    return dbl, jax.jit(_dbl_add)


@functools.lru_cache(maxsize=None)
def _joint_ladder_ops(curve: "Curve"):
    """Jitted kernels for the eager joint (Strauss-Shamir) ladder."""
    dbl = jax.jit(curve.double)

    def _dbl_add2(acc, p, q, b1, b2):
        acc = curve.double(acc)
        acc = _sel(curve.fp, b1 == 1, curve.add(acc, p), acc)
        return _sel(curve.fp, b2 == 1, curve.add(acc, q), acc)

    return dbl, jax.jit(_dbl_add2)


@functools.lru_cache(maxsize=None)
def curve_ops(spec: CurveSpec) -> Curve:
    return Curve(spec)
