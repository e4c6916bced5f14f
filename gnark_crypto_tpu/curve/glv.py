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


def _lll4(rows, delta=(99, 100)):
    """Exact integer LLL for tiny (4x4) lattices (Fraction arithmetic).

    Replaces the reference's per-curve hardcoded reduced bases
    (e.g. bn254.go:160 initGLSBasis): we reduce the canonical kernel basis
    at runtime instead of transcribing generated seed polynomials."""
    from fractions import Fraction

    b = [list(map(int, r)) for r in rows]
    n = len(b)
    dl = Fraction(*delta)

    def gram():
        bs = []
        mu = [[Fraction(0)] * n for _ in range(n)]
        norms = []
        for i in range(n):
            v = [Fraction(x) for x in b[i]]
            for j in range(i):
                num = sum(Fraction(b[i][k]) * bs[j][k] for k in range(n))
                mu[i][j] = num / norms[j]
                v = [v[k] - mu[i][j] * bs[j][k] for k in range(n)]
            bs.append(v)
            norms.append(sum(x * x for x in v))
        return mu, norms

    k = 1
    while k < n:
        mu, norms = gram()
        for j in range(k - 1, -1, -1):
            q = round(mu[k][j])
            if q:
                b[k] = [b[k][i] - q * b[j][i] for i in range(n)]
                mu, norms = gram()
        if norms[k] >= (dl - mu[k][k - 1] ** 2) * norms[k - 1]:
            k += 1
        else:
            b[k], b[k - 1] = b[k - 1], b[k]
            k = max(k - 1, 1)
    return b


def split_scalar_four(s: int, lam1: int, lam2: int, r: int):
    """k0..k3 with k0 + k1*lam1 + k2*lam2 + k3*lam1*lam2 = s (mod r), each
    |ki| ~ r^(1/4) (ecc/utils.go:263 SplitScalarFour): Babai closest-vector
    rounding against the LLL-reduced kernel basis of
    (a,b,c,d) -> a + b*lam1 + c*lam2 + d*lam1*lam2 (mod r)."""
    import functools as _ft

    basis = _gls_basis(lam1, lam2, r)
    # exact Cramer solve of (s,0,0,0) = sum c_i v_i, then round
    from fractions import Fraction

    def det4(m):
        from itertools import permutations
        total = 0
        for perm in permutations(range(4)):
            sgn = 1
            pl = list(perm)
            for i in range(4):
                for j in range(i + 1, 4):
                    if pl[i] > pl[j]:
                        sgn = -sgn
            prod = 1
            for i in range(4):
                prod *= m[i][perm[i]]
            total += sgn * prod
        return total

    mt = [list(col) for col in zip(*basis)]  # columns = v_i
    d = det4(mt)
    cs = []
    target = [s, 0, 0, 0]
    for i in range(4):
        mi = [row[:] for row in mt]
        for rr in range(4):
            mi[rr][i] = target[rr]
        cs.append(_round_div(det4(mi), d))
    res = [sum(cs[i] * basis[i][j] for i in range(4)) for j in range(4)]
    k = [s - res[0], -res[1], -res[2], -res[3]]
    assert (k[0] + k[1] * lam1 + k[2] * lam2 + k[3] * lam1 * lam2
            - s) % r == 0
    return k


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _gls_basis(lam1: int, lam2: int, r: int):
    rows = [[r, 0, 0, 0],
            [-lam1, 1, 0, 0],
            [-lam2, 0, 1, 0],
            [lam1 * lam2 % r, -lam2, -lam1, 1]]
    red = _lll4(rows)
    for row in red:  # every row must stay in the kernel
        assert (row[0] + row[1] * lam1 + row[2] * lam2
                + row[3] * lam1 * lam2) % r == 0
    return tuple(tuple(row) for row in red)


def phi(curve: Curve, p: Jac) -> Jac:
    """The GLV endomorphism [lambda]P = (beta*x, y) (g1.go:787 phi)."""
    f = curve.fp
    beta = f.broadcast_to(f.from_int(curve.spec.glv_third_root),
                          f.eshape(p.x))
    return Jac(f.mul(p.x, beta), p.y, p.z)


# -- 4-dim GLV-GLS on G2 (phi x psi endomorphisms) ---------------------------

# curve seed x0 and psi eigenvalue = t - 1 mod r (t = trace of Frobenius:
# 6x^2 + 1 for BN, x + 1 for BLS12)
_GLS_SEED = {
    "bn254": 4965661367192848881,
    "bls12_381": -15132376222941642752,
    "bls12_377": 9586122913090633729,
    "bls24_315": -3218079743,
    "bls24_317": 3640754176,
}


def _gls_lambdas(family: str, r: int, lam_g1: int):
    """(lam1, lam2): eigenvalues of phi and psi on G2.

    phi on G2 scales x by thirdRootOneG2 = beta^2 (bn254.go:114) and acts
    as [lam_g1] (probed: on G1, beta pairs with lam^2, so beta^2 pairs
    with lam — matching the reference basis row [-lambdaGLV, 1, 0, 0]).
    psi acts as [t - 1] = [6x^2] (BN) / [x] (BLS12)."""
    x = _GLS_SEED[family]
    lam2 = (6 * x * x if family == "bn254" else x) % r
    return lam_g1 % r, lam2


def scalar_mul_gls(family: str, q: Jac, ks: list[int]) -> Jac:
    """Batched [k]Q on G2 via the 4-dim GLV-GLS split (bn254/g2.go:934
    mulGLS): bases Q, phi(Q), psi(Q), psi(phi(Q)); sub-scalars ~r^(1/4)
    bits, so ~4x fewer doublings than the plain ladder."""
    import jax

    from gnark_crypto_tpu.curve.g2 import g2_curve
    from gnark_crypto_tpu.curve.subgroup import _psi_jac
    from gnark_crypto_tpu.specs.curve import get_curve

    g2 = g2_curve(family)
    g1spec = get_curve(f"{family}_g1")
    r = g1spec.fr.modulus
    lam1, lam2 = _gls_lambdas(family, r, g1spec.glv_lambda)
    f = g2.fp  # E2 engine
    p_mod = g1spec.fp.modulus
    w2 = g1spec.glv_third_root * g1spec.glv_third_root % p_mod

    def phi2(t: Jac) -> Jac:  # x *= thirdRootOneG2 (bn254.go:114, g2.go:848)
        # degree-0 embed works for E2 and E4 coordinate engines alike
        c = f.broadcast_to(f.from_int(w2), f.eshape(t.x))
        return Jac(f.mul(t.x, c), t.y, t.z)

    bases = [q, phi2(q)]
    bases.append(_psi_jac(g2, family, bases[0]))
    bases.append(_psi_jac(g2, family, bases[1]))
    splits = [split_scalar_four(k % r, lam1, lam2, r) for k in ks]
    basev, mags = [], []
    for i in range(4):
        neg = jnp.asarray([s[i] < 0 for s in splits])
        basev.append(_sel(f, neg, g2.neg_jac(bases[i]), bases[i]))
        mags.append([abs(s[i]) for s in splits])
    nbits = max(max(max(m) for m in mags).bit_length(), 1)
    bits = jnp.asarray(
        [[[(m >> (nbits - 1 - t)) & 1 for m in mags[i]] for i in range(4)]
         for t in range(nbits)], jnp.int32)

    acc0 = g2.inf_jac(f.eshape(q.x))

    from gnark_crypto_tpu.utils import hostloop
    if not hostloop.is_tracing(q):
        # eager: dispatch one small jitted (double + 4 masked adds) kernel
        # per bit row — the fused 4-add scan body over tower coordinates is
        # exactly the giant-program shape XLA:CPU chokes on (hostloop.py)
        import numpy as np

        step = _gls_ladder_ops(g2)
        rows = np.asarray(bits)
        acc = acc0
        for t in range(nbits):
            acc = step(acc, tuple(basev), jnp.asarray(rows[t]))
        return acc

    def body(acc, bb):
        acc = g2.double(acc)
        for i in range(4):
            acc = _sel(f, bb[i] == 1, g2.add(acc, basev[i]), acc)
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, bits)
    return acc


def g2_scalar_mul_fast(family: str, q: Jac, ks: list[int]) -> Jac:
    """Best endomorphism-accelerated [k]Q on G2 for host-int scalars:
    4-dim GLV-GLS on the tower families, 2-dim GLV on BW6 (whose G2 is a
    plain Fp curve with thirdRootOneG2, bw6-761.go:128), plain ladder
    otherwise. Used by KZG SRS setup and the mpcsetup G2 updates — the
    reference reaches these through mulGLV/mulGLS inside
    ScalarMultiplication (g2.go:591)."""
    from gnark_crypto_tpu.curve.g2 import g2_curve

    g2 = g2_curve(family)
    if family in _GLS_SEED:
        return scalar_mul_gls(family, q, ks)
    if g2.spec.glv_lambda is not None:
        return scalar_mul_glv(g2, q, ks)
    r = g2.spec.fr.modulus
    return g2.scalar_mul(q, g2.fr.from_int([k % r for k in ks], mont=False))


@_functools.lru_cache(maxsize=None)
def _gls_ladder_ops(g2):
    """Jitted one-step kernel for the eager 4-base GLS ladder."""
    import jax

    def _step(acc, bases, bit_rows):
        acc = g2.double(acc)
        for i in range(4):
            acc = _sel(g2.fp, bit_rows[i] == 1, g2.add(acc, bases[i]), acc)
        return acc

    return jax.jit(_step)


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
