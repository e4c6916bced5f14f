"""Curve-dispatching pairing facade.

Protocols (KZG, Pedersen, MPC setup, Shplonk, ...) call pairings through
this module so every registered pairing family works: BN/BLS12/BLS24 via
the even-tower engine (pairing12) and BW6 via the direct sextic engine
(pairing6). Mirrors the reference's per-curve ``Pair``/``PairingCheck``
entry points (``ecc/<curve>/pairing.go``).
"""

from __future__ import annotations

from gnark_crypto_tpu.curve.jacobian import Affine
from gnark_crypto_tpu.pairing import pairing6, pairing12

_BW6 = ("bw6_761", "bw6_633")


def pair(name: str, P: Affine, QX, QY):
    if name in _BW6:
        return pairing6.pair(name, P, QX, QY)
    return pairing12.pair(name, P, QX, QY)


def pairing_check(name: str, P: Affine, QX, QY) -> bool:
    if name in _BW6:
        return pairing6.pairing_check(name, P, QX, QY)
    return pairing12.pairing_check(name, P, QX, QY)


def gt_engine(name: str):
    """The target-group (GT) extension engine for a curve."""
    if name in _BW6:
        return pairing6.get_ctx6(name).tower.e6
    return pairing12.get_ctx(name).tower.e12


def gt_exp(name: str, z, e: int):
    """z^e for z in GT (reference E12.CyclotomicExp / ExpGLV — the GLV
    variant halves squarings using the Frobenius endomorphism and is used
    when |e| is full scalar width)."""
    if name in _BW6:
        eng = pairing6.get_ctx6(name).tower.e6
        if e < 0:
            # unitary inverse in the cyclotomic subgroup == conjugate
            return eng.conjugate(eng.exp_const(z, -e))
        return eng.exp_const(z, e)
    tw = pairing12.get_ctx(name).tower
    if abs(e) >= 1 << 129:
        return tw.gt_exp_glv(z, e)
    return tw.gt_exp(z, e)


def gt_is_in_subgroup(name: str, z):
    """GT membership: z in the order-r subgroup of E12/E24/E6*
    (reference E12.IsInSubGroup, e12.go:729). Batched mask."""
    if name in _BW6:
        # no dedicated fast check in the reference for BW6 GT; use z^r == 1
        eng = pairing6.get_ctx6(name).tower.e6
        from gnark_crypto_tpu.specs.curve import get_curve
        r = get_curve(f"{name}_g1").fr.modulus
        one = eng.broadcast_to(eng.ones(), eng.eshape(z))
        return eng.equal(eng.exp_const(z, r), one)
    ctx = pairing12.get_ctx(name)
    tw = ctx.tower
    e12 = tw.e12

    def expt(x):
        r = tw.exp_cyclotomic(x, ctx.seed)
        return tw.conjugate(r) if ctx.seed_neg else r

    if ctx.family == "bn":
        # Frobenius(z) == z^(6x^2) == t-1 (bn254 e12.go:729)
        a = tw.frobenius(z)
        b = tw.cyclotomic_square(expt(expt(z)))    # z^(2x^2)
        b = e12.mul(b, tw.cyclotomic_square(b))    # z^(6x^2)
        return e12.equal(a, b)
    # BLS12/BLS24: z^(phi_k(p)) == 1 and z^(p+1-t) == 1, i.e.
    # FrobeniusSquare(z) == FrobeniusSquare(FrobeniusSquare(z))*z (k=12)
    # and Frobenius(z) == z^x (bls12-381 e12.go IsInSubGroup)
    if ctx.family == "bls24":
        fr2 = tw.frobenius_quad
    else:
        fr2 = tw.frobenius_square
    a = fr2(z)
    b = e12.mul(fr2(a), z)
    cyc = e12.equal(a, b)
    tor = e12.equal(tw.frobenius(z), expt(z))
    return cyc & tor
