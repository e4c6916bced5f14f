"""GLV endomorphism-accelerated scalar multiplication.

Counterpart of the reference's GLV machinery (``ecc/utils.go:243
SplitScalar``, ``ecc/bn254/g1.go:796 mulGLV``): decompose k = k1 + k2*lambda
with |k1|, |k2| ~ sqrt(r) using the precomputed 2D lattice
(specs/curve.py glv_basis), then evaluate [k1]P + [k2]phi(P) with a joint
Straus-Shamir ladder — half the doublings of the plain ladder.

phi(x, y) = (thirdRootOne * x, y) satisfies phi(P) = [lambda]P.
Decomposition is exact host-side integer math (Babai rounding); the ladder
is batched on device.
"""

from __future__ import annotations

import jax.numpy as jnp

from gnark_crypto_tpu.curve.jacobian import Affine, Curve, Jac, _sel
from gnark_crypto_tpu.specs.curve import CurveSpec


def split_scalar(k: int, lam: int, basis, r: int):
    """k -> (k1, k2) with k = k1 + k2*lam (mod r), both ~ sqrt(r).

    Babai rounding against a Gauss-reduced lattice basis (ecc/utils.go:243
    SplitScalar semantics; signs carried in the values). Shared by the
    curve GLV ladder, the GT Frobenius-GLV exponentiation, and the
    bandersnatch Edwards endomorphism."""
    (a1, b1), (a2, b2) = basis
    det = a1 * b2 - a2 * b1  # = +-r
    # solve (k, 0) = c1*(a1,b1) + c2*(a2,b2) over Q, then round
    c1 = _round_div(b2 * k, det)
    c2 = _round_div(-b1 * k, det)
    k1 = k - c1 * a1 - c2 * a2
    k2 = -(c1 * b1 + c2 * b2)
    assert (k1 + k2 * lam - k) % r == 0
    return k1, k2


def decompose_scalar(spec: CurveSpec, k: int):
    """Curve-spec flavor of :func:`split_scalar`."""
    return split_scalar(k, spec.glv_lambda, spec.glv_basis, spec.fr.modulus)


def _round_div(num: int, den: int) -> int:
    """round(num/den) with exact integer arithmetic."""
    if den < 0:
        num, den = -num, -den
    q, rem = divmod(num, den)
    return q + (1 if 2 * rem >= den else 0)


def phi(curve: Curve, p: Jac) -> Jac:
    """The GLV endomorphism [lambda]P = (beta*x, y) (g1.go:787 phi)."""
    f = curve.fp
    beta = f.broadcast_to(f.from_int(curve.spec.glv_third_root),
                          f.eshape(p.x))
    return Jac(f.mul(p.x, beta), p.y, p.z)


def scalar_mul_glv(curve: Curve, p: Jac, ks: list[int]) -> Jac:
    """Batched [k]P via GLV split + joint double-and-add.

    ks: host ints (one per lane of p). ~r.bit_length()/2 doublings.
    """
    spec = curve.spec
    assert spec.glv_lambda is not None, "curve has no GLV endomorphism"
    f = curve.fp
    n = len(ks)

    k1s, k2s = [], []
    for k in ks:
        k1, k2 = decompose_scalar(spec, k % spec.fr.modulus)
        k1s.append(k1)
        k2s.append(k2)
    # fold signs into the base points
    p1 = _sel(f, jnp.asarray([k < 0 for k in k1s]), curve.neg_jac(p), p)
    pphi = phi(curve, p)
    p2 = _sel(f, jnp.asarray([k < 0 for k in k2s]), curve.neg_jac(pphi), pphi)
    m1 = [abs(k) for k in k1s]
    m2 = [abs(k) for k in k2s]
    nbits = max(max(m1).bit_length(), max(m2).bit_length(), 1)

    bits1 = jnp.asarray(
        [[(m >> (nbits - 1 - i)) & 1 for m in m1] for i in range(nbits)],
        jnp.int32)
    bits2 = jnp.asarray(
        [[(m >> (nbits - 1 - i)) & 1 for m in m2] for i in range(nbits)],
        jnp.int32)

    import jax

    acc0 = curve.inf_jac(f.eshape(p.x))

    def body(acc, bb):
        b1, b2 = bb
        acc = curve.double(acc)
        a1 = curve.add(acc, p1)
        acc = _sel(f, b1 == 1, a1, acc)
        a2 = curve.add(acc, p2)
        acc = _sel(f, b2 == 1, a2, acc)
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, (bits1, bits2))
    return acc
