"""MPC trusted-setup (powers-of-tau) ceremony primitives.

Counterpart of ``ecc/<curve>/mpcsetup/mpcsetup.go`` + ``kzg/mpcsetup.go``:
  * UpdateValues: scale G1/G2 monomial chains by a secret contribution x,
    emit (xG1, x*pokBase) where pokBase = HashToG2(xG1 || challenge, dst)
    (mpcsetup.go:25 pokBase, :48 UpdateValues)
  * Verify: PoK same-ratio check + random-linear-combination consistency of
    the updated chains (mpcsetup.go:93)
  * SameRatioMany: monomial-chain well-formedness via one folded pairing
    check (mpcsetup.go:276)
  * KZG ceremony: InitializeSetup / Contribute / Verify / Seal
    (kzg/mpcsetup.go:27-141)

Adversarial fault detection is the reference's only "failure detection"
subsystem (SURVEY §5): every contribution is verified before acceptance.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os

import jax
import jax.numpy as jnp
import numpy as np

from gnark_crypto_tpu.curve.g2 import g2_curve
from gnark_crypto_tpu.curve.jacobian import Affine, Jac, curve_ops
from gnark_crypto_tpu.hashes.hash_to_curve import hash_to_g2
from gnark_crypto_tpu.io.marshal import PointCodec
from gnark_crypto_tpu.msm.pippenger import msm
from gnark_crypto_tpu.pairing import api as pairing_api
from gnark_crypto_tpu.specs import curve as cs


@dataclasses.dataclass
class UpdateProof:
    commitment: Affine  # [x]G1
    pok: Affine         # [x] * pokBase (G2)


def _g1(name):
    return curve_ops(cs.get_curve(f"{name}_g1"))


def _pok_base(name: str, x_g1: Affine, challenge: bytes, dst: int) -> Affine:
    """HashToG2(xG1.RawBytes || challenge, [dst]) (mpcsetup.go:25)."""
    g1c = _g1(name)
    codec = PointCodec(g1c)
    buf = codec.to_bytes(x_g1, raw=True)[0] + challenge
    return hash_to_g2(name, buf, bytes([dst]))


def _scale_g1(name, pts: Affine, k: int) -> Affine:
    g1c = _g1(name)
    n = pts.x.shape[0]
    ks = g1c.fr.from_int([k] * n, mont=False)
    return g1c.to_affine(g1c.scalar_mul(g1c.from_affine(pts), ks))


def _scale_g2(name, pts: Affine, k: int) -> Affine:
    from gnark_crypto_tpu.curve.glv import g2_scalar_mul_fast

    g2c = g2_curve(name)
    n = pts.x.shape[0]
    return g2c.to_affine(
        g2_scalar_mul_fast(name, g2c.from_affine(pts), [k] * n))


def update_monomials_g1(name: str, pts: Affine, x: int) -> Affine:
    """A_i <- x^(i+1) A_i (mpcsetup.go:367 UpdateMonomialsG1)."""
    g1c = _g1(name)
    r = g1c.spec.fr.modulus
    n = pts.x.shape[0]
    ks = g1c.fr.from_int([pow(x, i + 1, r) for i in range(n)], mont=False)
    return g1c.to_affine(g1c.scalar_mul(g1c.from_affine(pts), ks))


def update_values(name: str, x: int, challenge: bytes, dst: int,
                  g1_reprs: list[Affine], g2_reprs: list[Affine]):
    """Scale representations by x + produce the update proof
    (mpcsetup.go:48). Returns (proof, new_g1_reprs, new_g2_reprs)."""
    g1c = _g1(name)
    g = g1c.generator_affine()
    gb = Affine(g1c.fp.broadcast_to(g.x, (1,)),
                g1c.fp.broadcast_to(g.y, (1,)))
    commitment = _scale_g1(name, gb, x)
    new_g1 = [_scale_g1(name, p, x) for p in g1_reprs]
    new_g2 = [_scale_g2(name, p, x) for p in g2_reprs]
    base = _pok_base(name, commitment, challenge, dst)
    pok = _scale_g2(name, base, x)
    return UpdateProof(commitment, pok), new_g1, new_g2


def _same_ratio(name, n1: Affine, d1: Affine, n2: Affine, d2: Affine) -> bool:
    """e(n1, d2) == e(d1, n2) (mpcsetup.go:237 sameRatio)."""
    g1c = _g1(name)
    nd1 = Affine(d1.x, g1c.fp.neg(d1.y))
    px = jnp.concatenate([n1.x, nd1.x], axis=0)
    py = jnp.concatenate([n1.y, nd1.y], axis=0)
    qx = jnp.concatenate([d2.x, n2.x], axis=0)
    qy = jnp.concatenate([d2.y, n2.y], axis=0)
    return bool(np.asarray(pairing_api.pairing_check(
        name, Affine(px, py), qx, qy)))


def _lincomb_g1(name, pts: Affine, coeffs: list[int]) -> Affine:
    g1c = _g1(name)
    ks = g1c.fr.from_int(coeffs, mont=False)
    res = msm(cs.get_curve(f"{name}_g1"), pts, ks, c=4)
    return g1c.to_affine(Jac(*(c[None] for c in res)))


def _lincomb_g2(name, pts: Affine, coeffs: list[int]) -> Affine:
    from gnark_crypto_tpu.curve.glv import g2_scalar_mul_fast

    g2c = g2_curve(name)
    # one batched endomorphism-ladder over all lanes, then fold the lanes
    terms = g2_scalar_mul_fast(name, g2c.from_affine(pts), list(coeffs))
    acc = jax.tree.map(lambda a: a[0:1], terms)
    for i in range(1, len(coeffs)):
        acc = g2c.add(acc, jax.tree.map(lambda a: a[i : i + 1], terms))
    return g2c.to_affine(acc)


def _fresh_fold_coeff(r: int, rng) -> int:
    """Sample the random fold coefficient at verification time, as the
    reference does (powersOfRandom -> SetRandom, mpcsetup.go:276).

    It MUST be unpredictable to the contributor: a coefficient derived
    from transcript data the contributor saw before contributing lets a
    malicious update satisfy the single folded same-ratio check without
    being a well-formed chain.  `rng` is a CSPRNG callable
    ``nbytes -> bytes`` (defaults to os.urandom)."""
    while True:
        a = int.from_bytes(rng(48), "big") % r
        if a != 0:
            return a


def verify_update(name: str, proof: UpdateProof, challenge: bytes, dst: int,
                  g1_prev: Affine | None, g1_next: Affine | None,
                  g2_prev: Affine | None = None, g2_next: Affine | None = None,
                  rng=os.urandom) -> bool:
    """mpcsetup.go:93 Verify: PoK + folded same-ratio consistency checks.

    The random fold coefficients are sampled fresh (CSPRNG) at
    verification time — never derived from transcript data."""
    g1c = _g1(name)
    r = g1c.spec.fr.modulus
    base = _pok_base(name, proof.commitment, challenge, dst)
    g = g1c.generator_affine()
    gb = Affine(g1c.fp.broadcast_to(g.x, (1,)),
                g1c.fp.broadcast_to(g.y, (1,)))
    if not _same_ratio(name, proof.commitment, gb, proof.pok, base):
        return False
    n_fold = max(g1_prev.x.shape[0] if g1_prev is not None else 0,
                 g2_prev.x.shape[0] if g2_prev is not None else 0)
    a = _fresh_fold_coeff(r, rng)
    powers = [pow(a, i, r) for i in range(n_fold)]
    if g1_prev is not None:
        prev = _lincomb_g1(name, g1_prev, powers[: g1_prev.x.shape[0]])
        nxt = _lincomb_g1(name, g1_next, powers[: g1_next.x.shape[0]])
        if not _same_ratio(name, nxt, prev, proof.pok, base):
            return False
    if g2_prev is not None:
        prev2 = _lincomb_g2(name, g2_prev, powers[: g2_prev.x.shape[0]])
        nxt2 = _lincomb_g2(name, g2_next, powers[: g2_next.x.shape[0]])
        if not _same_ratio(name, proof.commitment, gb, nxt2, prev2):
            return False
    return True


def beacon_contributions(name: str, hash_: bytes, dst: bytes,
                         beacon_challenge: bytes, n: int) -> list[int]:
    """mpcsetup.go:188 BeaconContributions (hash-to-field chain)."""
    from gnark_crypto_tpu.hashes.hash_to_curve import hash_to_field

    g1c = _g1(name)
    buf = hash_ + beacon_challenge
    while True:
        res = hash_to_field(g1c.spec.fr, buf, dst, n)
        if all(v != 0 for v in res):
            return res
        buf += b"="


# ---------------------------------------------------------------------------
# KZG ceremony (kzg/mpcsetup.go)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class KzgMpcSetup:
    name: str
    g1_powers: Affine        # [tau^i]G1, i = 0..N-1
    g2_tau: Affine           # [tau]G2
    proof: UpdateProof | None = None
    challenge: bytes = b""


def initialize_setup(name: str, n: int) -> KzgMpcSetup:
    """kzg/mpcsetup.go:27: start from tau = 1."""
    g1c = _g1(name)
    g2c = g2_curve(name)
    g = g1c.generator_affine()
    g2g = g2c.generator_affine()
    return KzgMpcSetup(
        name=name,
        g1_powers=Affine(g1c.fp.broadcast_to(g.x, (n,)),
                         g1c.fp.broadcast_to(g.y, (n,))),
        g2_tau=Affine(g2c.fp.broadcast_to(g2g.x, (1,)),
                      g2c.fp.broadcast_to(g2g.y, (1,))),
    )


def _setup_hash(s: KzgMpcSetup) -> bytes:
    g1c = _g1(s.name)
    g2c = g2_curve(s.name)
    h = hashlib.sha256()
    for b in PointCodec(g1c).to_bytes(s.g1_powers):
        h.update(b)
    h.update(PointCodec(g2c).to_bytes(s.g2_tau)[0])
    h.update(s.challenge)
    return h.digest()


def contribute(s: KzgMpcSetup, tau: int) -> KzgMpcSetup:
    """kzg/mpcsetup.go:104 Contribute: powers update + proof."""
    s = dataclasses.replace(s)
    s.challenge = _setup_hash(s)
    g1_new = update_monomials_g1(s.name, Affine(s.g1_powers.x[1:],
                                                s.g1_powers.y[1:]), tau)
    proof, _, g2_new = update_values(s.name, tau, s.challenge, 1, [],
                                    [s.g2_tau])
    g1c = _g1(s.name)
    s.g1_powers = Affine(
        jnp.concatenate([s.g1_powers.x[:1], g1_new.x], axis=0),
        jnp.concatenate([s.g1_powers.y[:1], g1_new.y], axis=0))
    s.g2_tau = g2_new[0]
    s.proof = proof
    return s


def verify_setup(prev: KzgMpcSetup, new: KzgMpcSetup, rng=os.urandom) -> bool:
    """kzg/mpcsetup.go Verify: PoK + monomial-chain well-formedness.

    Checks (a) the contribution PoK against tau1*G2 (the first updated
    power pair), (b) the G1 chain is geometric via the shifted
    random-linear-combination same-ratio trick (SameRatioMany /
    linearCombinationsG1, mpcsetup.go:276,397).
    """
    name = new.name
    g1c = _g1(name)
    r = g1c.spec.fr.modulus
    challenge = _setup_hash(prev)
    # PoK: commitment == g1_powers[1]/prev... verify against prev G2 tau
    if new.proof is None:
        return False
    base = _pok_base(name, new.proof.commitment, challenge, 1)
    g = g1c.generator_affine()
    gb = Affine(g1c.fp.broadcast_to(g.x, (1,)),
                g1c.fp.broadcast_to(g.y, (1,)))
    if not _same_ratio(name, new.proof.commitment, gb, new.proof.pok, base):
        return False
    # g2 consistency: e(x G1, prev_tau G2) == e(G1, new_tau G2)
    if not _same_ratio(name, new.proof.commitment, gb, new.g2_tau,
                       prev.g2_tau):
        return False
    # chain well-formedness: fold A[:-1] and A[1:] with random powers and
    # check sameRatio(shifted, truncated, tau G2, G2)
    n = new.g1_powers.x.shape[0]
    a = _fresh_fold_coeff(r, rng)
    powers = [pow(a, i, r) for i in range(n - 1)]
    truncated = _lincomb_g1(
        name, Affine(new.g1_powers.x[:-1], new.g1_powers.y[:-1]), powers)
    shifted = _lincomb_g1(
        name, Affine(new.g1_powers.x[1:], new.g1_powers.y[1:]), powers)
    g2c = g2_curve(name)
    g2g = g2c.generator_affine()
    g2b = Affine(g2c.fp.broadcast_to(g2g.x, (1,)),
                 g2c.fp.broadcast_to(g2g.y, (1,)))
    return _same_ratio(name, shifted, truncated, new.g2_tau, g2b)


def seal(s: KzgMpcSetup, beacon_challenge: bytes) -> KzgMpcSetup:
    """kzg/mpcsetup.go Seal: final beacon contribution."""
    tau = beacon_contributions(s.name, _setup_hash(s), b"KZG-beacon",
                              beacon_challenge, 1)[0]
    return contribute(s, tau)
