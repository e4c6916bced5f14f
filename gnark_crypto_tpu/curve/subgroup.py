"""Fast r-torsion membership checks (endomorphism-based).

TPU-native counterpart of the reference's per-curve ``IsInSubGroup``
(``ecc/<curve>/g1.go:635`` / ``g2.go``): instead of the naive [r]P == inf
ladder (~2*256 group ops), each family uses its GLV/untwist-Frobenius
endomorphism so the dominant cost is one or a few multiplications by the
curve seed (~32-64 bits). Formulas are transcribed per curve from the
reference (citations inline); everything is batched and runs under one jit
per (curve, batch-shape).

Eigenvalue facts used (El Housni-Guillevic families):
  * BLS12 G1:  phi(P) = [-x^2]P on the r-torsion  (bls12-381/g1.go:207)
  * BLS24 G1:  [x^4]phi(P) + P = inf              (bls24-315/g1.go)
  * BLS G2:    psi(P) = [x]P                      (bls12-381/g2.go)
  * BN254 G2:  2psi^3([x]P) = psi^2([x]P) + psi([x]P) + [x+1]P (bn254/g2.go)
  * BW6 G1/G2: seed-polynomial identities in phi   (bw6-761/g1.go, g2.go)
Curves with prime-order groups (bn254 G1, grumpkin, secp256k1/r1, stark)
are in-subgroup iff on-curve (bn254/g1.go:635-640).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from gnark_crypto_tpu.curve.jacobian import Affine, Curve, Jac, _sel

# family -> |seed| (matches the pairing contexts; signs are explicit in the
# per-curve formulas, exactly like the reference's mulBySeed addchains which
# multiply by the absolute seed)
_SEED_ABS = {
    "bn254": 4965661367192848881,
    "bls12_381": 15132376222941642752,
    "bls12_377": 9586122913090633729,
    "bls24_315": 3218079743,
    "bls24_317": 3640754176,
    "bw6_761": 9586122913090633729,
    "bw6_633": 3218079743,
}

# G1 curves of prime order: subgroup == curve (reference returns IsOnCurve)
_PRIME_ORDER = {"bn254_g1", "grumpkin_g1", "secp256k1_g1", "secp256r1_g1",
                "stark_g1"}


def mul_by_seed(curve: Curve, p: Jac, family: str) -> Jac:
    """[|seed|]P via a bit scan (reference mulBySeed addchains, g1.go)."""
    return mul_by_const(curve, p, _SEED_ABS[family])


def mul_by_const(curve: Curve, p: Jac, k: int) -> Jac:
    """[k]P for a static non-negative integer k (lax.scan ladder)."""
    if k == 0:
        return curve.inf_jac(curve.fp.eshape(p.x))
    bits = jnp.asarray([int(b) for b in bin(k)[2:]], jnp.int32)

    def body(acc, bit):
        acc = curve.double(acc)
        return _sel(curve.fp, bit == 1, curve.add(acc, p), acc), None

    acc0 = curve.inf_jac(curve.fp.eshape(p.x))
    acc, _ = lax.scan(body, acc0, bits)
    return acc


def _phi(curve: Curve, p: Jac, beta_int) -> Jac:
    """GLV endomorphism (beta*x, y) with an explicit cube root (g1.go phi)."""
    f = curve.fp
    beta = f.broadcast_to(f.from_int(beta_int), f.eshape(p.x))
    return Jac(f.mul(p.x, beta), p.y, p.z)


def _g1_bls12(curve: Curve, p: Jac, family: str):
    """-[x^2]phi(P) == P (bls12-381/g1.go IsInSubGroup; same for -377)."""
    res = _phi(curve, p, curve.spec.glv_third_root)
    res = mul_by_seed(curve, res, family)
    res = mul_by_seed(curve, res, family)
    return curve.eq_jac(curve.neg_jac(res), p)


def _g1_bls24(curve: Curve, p: Jac, family: str):
    """[x^4]phi(P) + P == inf (bls24-315/g1.go IsInSubGroup)."""
    res = _phi(curve, p, curve.spec.glv_third_root)
    for _ in range(4):
        res = mul_by_seed(curve, res, family)
    return curve.is_inf_jac(curve.add(res, p))


def _bw6_761(curve: Curve, p: Jac, beta_int, family: str):
    """bw6-761/g1.go IsInSubGroup (same formula for G2 with beta^2):
    [u]([u]([u]phi(P) - phi(P))) + phi(P) == -([u]P + P)."""
    phip = _phi(curve, p, beta_int)
    res = mul_by_seed(curve, phip, family)
    res = curve.add(res, curve.neg_jac(phip))
    res = mul_by_seed(curve, res, family)
    res = mul_by_seed(curve, res, family)
    res = curve.add(res, phip)
    rhs = curve.neg_jac(curve.add(mul_by_seed(curve, p, family), p))
    return curve.eq_jac(res, rhs)


def _bw6_633(curve: Curve, p: Jac, beta_int, family: str):
    """bw6-633/g1.go IsInSubGroup:
    phi(P - [u]P) - [u]P + [u^4]P + [u^5]P == inf."""
    up = mul_by_seed(curve, p, family)
    u4p = mul_by_seed(
        curve, mul_by_seed(curve, mul_by_seed(curve, up, family), family),
        family)
    u5p = mul_by_seed(curve, u4p, family)
    q = curve.add(p, curve.neg_jac(up))
    r = _phi(curve, q, beta_int)
    r = curve.add(r, curve.neg_jac(up))
    r = curve.add(r, u4p)
    r = curve.add(r, u5p)
    return curve.is_inf_jac(r)


def _psi_jac(curve: Curve, family: str, p: Jac) -> Jac:
    """psi on a Jacobian batch. BLS24 (E4 coords) has a dedicated map that
    acts on Jacobian coordinates directly; Fp2 families go through the
    affine untwist-Frobenius coordinates (pairing12.psi_coords)."""
    if family.startswith("bls24"):
        from gnark_crypto_tpu.hashes.sswu import _psi_bls24
        return _psi_bls24(family, curve, p)
    from gnark_crypto_tpu.pairing.pairing12 import get_ctx
    ctx = get_ctx(family)
    aff = curve.to_affine(p)
    x, y = ctx.psi_coords(aff.x, aff.y)
    out = curve.from_affine(Affine(x, y))
    # psi of the (0,0) infinity encoding is (0,0) again (psi_coords scales
    # by constants), so from_affine keeps infinity at z=0 for free
    return out


def _g2_bls(curve: Curve, p: Jac, family: str, seed_neg: bool):
    """psi(P) == [x]P  (bls12-381/g2.go, bls12-377/g2.go, bls24 variants)."""
    img = _psi_jac(curve, family, p)
    res = mul_by_seed(curve, p, family)
    if seed_neg:
        res = curve.neg_jac(res)
    return curve.eq_jac(res, img)


def _g2_bn254(curve: Curve, p: Jac):
    """2*psi^3([x]P) == psi^2([x]P) + psi([x]P) + [x]P + P (bn254/g2.go)."""
    fam = "bn254"
    a = mul_by_seed(curve, p, fam)           # [x]P
    b = _psi_jac(curve, fam, a)              # psi([x]P)
    c = _psi_jac(curve, fam, b)              # psi^2([x]P)
    d = _psi_jac(curve, fam, c)              # psi^3([x]P)
    lhs = curve.double(d)
    rhs = curve.add(curve.add(c, b), curve.add(a, p))
    return curve.eq_jac(lhs, rhs)


def _check_fn(curve: Curve):
    """The family dispatch. Returns None when no fast path exists."""
    name = curve.spec.name
    if name in _PRIME_ORDER:
        return "on_curve"
    fam, _, grp = name.rpartition("_")
    if grp == "g1":
        if fam in ("bls12_381", "bls12_377"):
            return lambda p: _g1_bls12(curve, p, fam)
        if fam in ("bls24_315", "bls24_317"):
            return lambda p: _g1_bls24(curve, p, fam)
        if fam == "bw6_761":
            return lambda p: _bw6_761(curve, p, curve.spec.glv_third_root,
                                      fam)
        if fam == "bw6_633":
            return lambda p: _bw6_633(curve, p, curve.spec.glv_third_root,
                                      fam)
    if grp == "g2":
        if fam == "bn254":
            return lambda p: _g2_bn254(curve, p)
        if fam in ("bls12_381", "bls24_315"):
            return lambda p: _g2_bls(curve, p, fam, seed_neg=True)
        if fam in ("bls12_377", "bls24_317"):
            return lambda p: _g2_bls(curve, p, fam, seed_neg=False)
        if fam in ("bw6_761", "bw6_633"):
            from gnark_crypto_tpu.specs.curve import get_curve
            p_mod = curve.spec.fp.modulus
            beta1 = get_curve(f"{fam}_g1").glv_third_root
            beta2 = beta1 * beta1 % p_mod  # thirdRootOneG2 = G1's^2
            check = _bw6_761 if fam == "bw6_761" else _bw6_633
            return lambda p: check(curve, p, beta2, fam)
    return None


@functools.lru_cache(maxsize=None)
def _jitted(curve: Curve):
    fn = _check_fn(curve)
    if fn is None:
        return None

    def run(px, py):
        pts = Affine(px, py)
        if fn == "on_curve":
            # prime-order group: membership == curve membership
            return curve.on_curve_affine(pts)
        mask = fn(curve.from_affine(pts))
        # the identity is a member by convention (matches [r]inf == inf)
        return mask | curve.is_inf_affine(pts)

    return jax.jit(run)


def has_fast_check(curve: Curve) -> bool:
    return _check_fn(curve) is not None


def is_in_subgroup_batch(curve: Curve, pts: Affine,
                         rand_bytes=None) -> bool:
    """All-points membership for a batch (g1.go:215 IsInSubGroupBatchG1).

    n < 80: deterministic per-point checks. Otherwise the probabilistic
    method (g1.go:243 isInSubGroupBatchG1Prob): 64 random {0,1}-subset sums
    S_j = sum_i s_ij P_i, each checked with the per-curve fast path — error
    probability < 2^-64. Coefficients are drawn with fresh crypto randomness
    at CHECK time (os.urandom); ``rand_bytes`` only overrides for tests.
    """
    import numpy as np

    n = curve.fp.eshape(pts.x)[0]
    if n < 80:
        return bool(np.asarray(is_in_subgroup(curve, pts)).all())
    import os
    rb = (rand_bytes or os.urandom)(8 * n)
    bits = np.unpackbits(
        np.frombuffer(rb, np.uint8).reshape(n, 8), axis=1)[:, :64]
    sums = _subset_sums(curve)(pts.x, pts.y, jnp.asarray(bits.T, jnp.int32))
    mask = is_in_subgroup(curve, curve.to_affine(Jac(*sums)))
    return bool(np.asarray(mask).all())


@functools.lru_cache(maxsize=None)
def _subset_sums(curve: Curve):
    """jit: (px, py, bits (64, N)) -> 64 masked tree-sums of the batch."""

    def run(px, py, bits):
        f = curve.fp
        pj = curve.from_affine(Affine(px, py))
        inf = curve.inf_jac(f.eshape(px))

        def one(carry, row):
            masked = _sel(f, row == 1, pj, inf)
            s = _tree_sum_jac(curve, masked)
            return carry, tuple(jax.tree.map(lambda a: a[0], tuple(s)))

        _, sums = lax.scan(one, 0, bits)
        return sums

    return jax.jit(run)


def _tree_sum_jac(curve: Curve, p: Jac) -> Jac:
    """Log-depth pairwise sum along the leading element axis."""
    f = curve.fp
    n = f.eshape(p.x)[0]
    while n > 1:
        if n % 2:
            pad = curve.inf_jac((1,))
            p = Jac(*jax.tree.map(
                lambda z, a: jnp.concatenate([a, z], axis=0), tuple(pad),
                tuple(p)))
            n += 1
        p = curve.add(Jac(*jax.tree.map(lambda a: a[: n // 2], tuple(p))),
                      Jac(*jax.tree.map(lambda a: a[n // 2 : n], tuple(p))))
        n //= 2
    return p


def is_in_subgroup(curve: Curve, pts: Affine):
    """Batched r-torsion mask for affine points (assumed on-curve).

    Uses the endomorphism fast path where one exists, else the [r]P == inf
    ladder (exact fallback for curves without registered endomorphisms).
    """
    fn = _jitted(curve)
    if fn is not None:
        return fn(pts.x, pts.y)
    r = curve.spec.fr.modulus
    n = curve.fp.eshape(pts.x)[0]
    k = curve.fr.from_int([r] * n, mont=False, reduce=False)
    res = curve.scalar_mul(curve.from_affine(pts), k,
                           nbits=r.bit_length() + 1)
    return curve.is_inf_jac(res)
