"""KZG polynomial commitment (commit / open / verify / batch).

TPU-native counterpart of ``ecc/bn254/kzg/kzg.go``:
  * Commit = G1 MSM over the SRS (kzg.go:160)
  * Open: claimed value + quotient (p(X)-p(a))/(X-a). The reference's
    synthetic division (``dividePolyByXminusA`` kzg.go:595) is a serial
    recurrence; here the quotient is computed in parallel as
    q_i = (P(a) - s_i) * a^-(i+1), with s_i the prefix sums of p_j a^j —
    two log-depth scans instead of an O(n) chain.
  * Verify: 2-pairing check e(yG1 - aH - C, G2) * e(H, alphaG2) == 1
    (kzg.go:208).
  * BatchOpenSinglePoint / FoldProof / BatchVerifyMultiPoints with the same
    Fiat-Shamir gamma derivation (kzg.go:255,350,423,559).

Works for any registered pairing curve (bn254, bls12_381, bls12_377).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from gnark_crypto_tpu.curve.g2 import g2_curve
from gnark_crypto_tpu.curve.jacobian import Affine, Jac, curve_ops
from gnark_crypto_tpu.hashes.fiat_shamir import Transcript
from gnark_crypto_tpu.msm.pippenger import msm
from gnark_crypto_tpu.pairing import api as pairing_api
from gnark_crypto_tpu.specs import curve as cs
from gnark_crypto_tpu.utils.scans import exp_table, prefix_sum


@dataclasses.dataclass
class ProvingKey:
    g1: Affine  # [alpha^i]G1, batch (size,)


@dataclasses.dataclass
class VerifyingKey:
    g2: Affine       # [1]G2 (E2 coords), batch (1,)
    alpha_g2: Affine  # [alpha]G2
    g1: Affine       # [1]G1
    # precomputed pairing lines for [g2, alpha_g2] (reference kzg.go:45
    # Lines field); None falls back to the full Miller loop
    lines: object = None

    def with_lines(self, name: str) -> "VerifyingKey":
        """Attach fixed-Q line tables (reference kzg.go:114-123)."""
        from gnark_crypto_tpu.pairing.lines import precompute_lines

        qx = jnp.concatenate([self.g2.x, self.alpha_g2.x], axis=0)
        qy = jnp.concatenate([self.g2.y, self.alpha_g2.y], axis=0)
        return dataclasses.replace(
            self, lines=precompute_lines(name, qx, qy))


@dataclasses.dataclass
class SRS:
    pk: ProvingKey
    vk: VerifyingKey


@dataclasses.dataclass
class OpeningProof:
    h: Affine              # quotient commitment (1,)
    claimed_value: jax.Array  # fr element (plain, (1,))


def _g1(name):
    return curve_ops(cs.get_curve(f"{name}_g1"))


def new_srs(name: str, size: int, alpha: int) -> SRS:
    """SRS from secret alpha (kzg.go:73 NewSRS). Test/bench use only —
    production SRS comes from the MPC ceremony (mpcsetup)."""
    from gnark_crypto_tpu.msm.pippenger import batch_scalar_mul

    g1c = _g1(name)
    g2c = g2_curve(name)
    r = g1c.spec.fr.modulus
    powers = [pow(alpha, i, r) for i in range(size)]
    k = g1c.fr.from_int(powers, mont=False)
    g = g1c.generator_affine()
    # one-base batch mul: shared window table, nbits/c adds per power
    # (the reference's BatchScalarMultiplicationG1 call in kzg.go:73)
    pk_g1 = g1c.to_affine(batch_scalar_mul(g1c.spec, g, k))

    g2gen = g2c.generator_affine()
    g2b = Jac(*(g2c.fp.broadcast_to(c, (1,)) for c in g2c.from_affine(g2gen)))
    from gnark_crypto_tpu.curve.glv import g2_scalar_mul_fast
    alpha_g2 = g2c.to_affine(g2_scalar_mul_fast(name, g2b, [alpha % r]))
    g2_aff = Affine(g2c.fp.broadcast_to(g2gen.x, (1,)),
                    g2c.fp.broadcast_to(g2gen.y, (1,)))
    g1_aff = Affine(g1c.fp.broadcast_to(g.x, (1,)),
                    g1c.fp.broadcast_to(g.y, (1,)))
    return SRS(ProvingKey(pk_g1), VerifyingKey(g2_aff, alpha_g2, g1_aff))


def commit(name: str, pk: ProvingKey, poly) -> Affine:
    """Commit = MSM(SRS, coeffs) (kzg.go:160). poly: plain fr array (n,)."""
    g1c = _g1(name)
    n = poly.shape[0]
    pts = Affine(pk.g1.x[:n], pk.g1.y[:n])
    return g1c.to_affine(_as_batch(msm(cs.get_curve(f"{name}_g1"), pts, poly)))


def _as_batch(p: Jac) -> Jac:
    return Jac(*(c[None] for c in p))


def eval_poly(name: str, poly, point):
    """P(a) on device: <coeffs, powers(a)> (kzg.go:56 eval)."""
    g1c = _g1(name)
    fr = g1c.fr
    n = poly.shape[0]
    pows = exp_table(fr, _to_mont_scalar(fr, point), n)
    pm = fr.to_mont(poly)
    return fr.from_mont(fr.inner_product(pm, pows))[None]


def _to_mont_scalar(fr, point):
    """plain fr scalar (1,) -> Montgomery (1,)."""
    return fr.to_mont(point)


@functools.lru_cache(maxsize=None)
def _open_div_fn(name: str):
    """Jitted synthetic-division core: eagerly its ~120 small ops are
    dispatch-latency-bound through the device tunnel (~0.9 s at 2^16 vs
    ~15 ms of compute)."""
    g1c = _g1(name)
    fr = g1c.fr

    @jax.jit
    def div(poly, point):
        n = poly.shape[0]
        a_m = _to_mont_scalar(fr, point)           # (1,) montgomery
        pows = exp_table(fr, a_m, n)               # a^i (n,)
        pm = fr.to_mont(poly)
        terms = fr.mul(pm, pows)                   # p_i a^i
        s = prefix_sum(fr, terms)                  # s_i
        total = s[n - 1][None]
        a_inv = fr.inverse(a_m)
        inv_pows = exp_table(fr, a_inv, n + 1)     # a^-i
        # q_i = (total - s_i) * a^-(i+1), i in [0, n-1); generic path
        q_gen = fr.mul(fr.sub(fr.broadcast_to(total[0], (n,)), s),
                       inv_pows[1:])
        # a == 0 path: q_i = p_{i+1} (shift), claimed = p_0
        q_zero = jnp.concatenate([pm[1:], fr.zeros((1,))], axis=0)
        is_zero_pt = (fr.is_zero(a_m)[0] if a_m.ndim > fr.elem_dims
                      else fr.is_zero(a_m))
        q = fr.where(jnp.broadcast_to(is_zero_pt, (n,)), q_zero, q_gen)
        q = fr.from_mont(q)[: n - 1] if n > 1 else fr.zeros((1,))
        # s_{n-1} = P(a) covers a = 0 too (only the p_0 term survives)
        return q, fr.from_mont(total)

    return div


def open_poly(name: str, pk: ProvingKey, poly, point) -> OpeningProof:
    """Opening proof at `point` (kzg.go:181 Open).

    Quotient q_i = (s_{n-1} - s_i) * a^-(i+1) where s_i = prefix of p_j a^j;
    for a = 0 the quotient is simply the shifted coefficients.
    """
    g1c = _g1(name)
    n = poly.shape[0]
    q, claimed = _open_div_fn(name)(poly, point)
    h = commit(name, pk, q) if n > 1 else _inf_aff(g1c)
    return OpeningProof(h=h, claimed_value=claimed)


def _inf_aff(g1c):
    return Affine(g1c.fp.zeros((1,)), g1c.fp.zeros((1,)))


@functools.lru_cache(maxsize=None)
def _verify_total_fn(name: str):
    """Jitted [y]G1 + [-a]H - C: the two eager 254-step scalar-mul
    ladders are ~500 tunnel dispatches (~4 s) for ~2 ms of compute."""
    g1c = _g1(name)

    @jax.jit
    def total_g1(gx, gy, hx, hy, cx, cy, y, neg_a):
        gj = Jac(*(c for c in g1c.from_affine(Affine(gx, gy))))
        hj = Jac(*(c for c in g1c.from_affine(Affine(hx, hy))))
        # one shared doubling chain for [y]G1 + [-a]H (Strauss-Shamir,
        # g1.go:873) — halves the sequential depth of the check
        t = g1c.joint_scalar_mul(gj, hj, y, neg_a)
        total = g1c.add(t, g1c.neg_jac(
            g1c.from_affine(Affine(cx, cy))))
        return g1c.to_affine(total)

    return total_g1


def verify(name: str, commitment: Affine, proof: OpeningProof, point,
           vk: VerifyingKey) -> jax.Array:
    """Single-point verification (kzg.go:208): checks
    e([y]G1 - [a]H - C, G2) * e(H, [alpha]G2) == 1."""
    g1c = _g1(name)
    g2c = g2_curve(name)
    fr = g1c.fr
    # totalG1 = [y]G1 + [-a]H - C
    y = proof.claimed_value
    neg_a = _fr_neg_plain(fr, point)
    total_aff = _verify_total_fn(name)(
        vk.g1.x, vk.g1.y, proof.h.x, proof.h.y,
        commitment.x, commitment.y, y, neg_a)
    px = jnp.concatenate([total_aff.x, proof.h.x], axis=0)
    py = jnp.concatenate([total_aff.y, proof.h.y], axis=0)
    if vk.lines is not None:
        # fixed-Q fast path: only E12 squares + sparse line muls per bit
        # (reference verify always runs PairingCheckFixedQ, kzg.go:240-250)
        from gnark_crypto_tpu.pairing.lines import pairing_check_fixed_q

        return pairing_check_fixed_q(name, Affine(px, py), vk.lines)
    qx = jnp.concatenate([vk.g2.x, vk.alpha_g2.x], axis=0)
    qy = jnp.concatenate([vk.g2.y, vk.alpha_g2.y], axis=0)
    return pairing_api.pairing_check(name, Affine(px, py), qx, qy)


def _fr_neg_plain(fr, k):
    """negate a plain (non-Montgomery) scalar array mod r."""
    return fr.from_mont(fr.neg(fr.to_mont(k)))


# ---------------------------------------------------------------------------
# batch opening at a single point (Fiat-Shamir folding)
# ---------------------------------------------------------------------------

def _derive_gamma(name, point, digests, claimed_values, data_transcript=b""):
    """deriveGamma (kzg.go:559): sha256 transcript binding point, digests,
    claimed values; returns a plain fr scalar."""
    g1c = _g1(name)
    fr = g1c.fr
    t = Transcript(challenge_ids=["gamma"])
    t.bind("gamma", _fr_bytes(fr, point))
    for d in digests:
        t.bind("gamma", _g1_bytes(g1c, d))
    for v in claimed_values:
        t.bind("gamma", _fr_bytes(fr, v))
    if data_transcript:
        t.bind("gamma", data_transcript)
    b = t.compute_challenge("gamma")
    return int.from_bytes(b, "big") % fr.spec.modulus


def _fr_bytes(fr, v) -> bytes:
    return fr.to_bytes_host(v, mont=False)[0]


def _g1_bytes(g1c, p: Affine) -> bytes:
    """Compressed point bytes — gnark's ``digest.Marshal()`` == ``Bytes()``
    is the COMPRESSED encoding (kzg.go:566 binds these into the gamma
    transcript), so byte parity requires the real marshal codec here."""
    from gnark_crypto_tpu.io.marshal import PointCodec

    return PointCodec(g1c).to_bytes(p)[0]


@dataclasses.dataclass
class BatchOpeningProof:
    h: Affine
    claimed_values: jax.Array  # (k, ...) plain fr


def batch_open_single_point(name: str, pk: ProvingKey, polys, point,
                            digests=None) -> BatchOpeningProof:
    """BatchOpenSinglePoint (kzg.go:255): fold polynomials with gamma powers,
    open the folded polynomial."""
    g1c = _g1(name)
    fr = g1c.fr
    k, n = polys.shape[0], polys.shape[1]
    if digests is None:
        digests = [commit(name, pk, polys[i]) for i in range(k)]
    claimed = [eval_poly(name, polys[i], point) for i in range(k)]
    gamma = _derive_gamma(name, point, digests, claimed)
    gammas = [pow(gamma, i, fr.spec.modulus) for i in range(k)]
    g_dev = fr.to_mont(fr.from_int(gammas, mont=False))
    pm = fr.to_mont(polys)
    folded_m = fr.sum_reduce(fr.mul(pm, g_dev[:, None]))
    folded = fr.from_mont(folded_m)
    proof = open_poly(name, pk, folded, point)
    return BatchOpeningProof(
        h=proof.h, claimed_values=jnp.stack([c[0] for c in claimed]))


def batch_verify_single_point(name: str, digests, batch_proof, point,
                              vk: VerifyingKey) -> jax.Array:
    """FoldProofs + Verify (kzg.go:350 FoldProof + :208)."""
    g1c = _g1(name)
    fr = g1c.fr
    k = len(digests)
    claimed = [batch_proof.claimed_values[i][None]
               for i in range(k)]
    gamma = _derive_gamma(name, point, digests, claimed)
    gammas = [pow(gamma, i, fr.spec.modulus) for i in range(k)]
    g_dev = fr.from_int(gammas, mont=False)
    # folded digest = sum gamma^i * D_i (MSM over digests)
    dx = jnp.concatenate([d.x for d in digests], axis=0)
    dy = jnp.concatenate([d.y for d in digests], axis=0)
    folded_digest = g1c.to_affine(_as_batch(
        msm(cs.get_curve(f"{name}_g1"), Affine(dx, dy), g_dev, c=4)))
    gm = fr.to_mont(g_dev)
    cm = fr.to_mont(batch_proof.claimed_values)
    folded_claimed = fr.from_mont(fr.sum_reduce(fr.mul(cm, gm)))[None]
    proof = OpeningProof(h=batch_proof.h, claimed_value=folded_claimed)
    return verify(name, folded_digest, proof, point, vk)


# ---------------------------------------------------------------------------
# batch verification of openings at DISTINCT points (one pairing total)
# ---------------------------------------------------------------------------

def batch_verify_multi_points(name: str, digests, proofs, points,
                              vk: VerifyingKey, lambdas=None) -> jax.Array:
    """BatchVerifyMultiPoints (kzg.go:423): verify k opening proofs at k
    distinct points with ONE pairing check via a random linear combination.

    With verifier randomness lambda_i (lambda_0 = 1), checks
      e(sum_i l_i([f_i(a)]G1 - [y_i]G1 + [p_i][H_i]), G2)
      * e(-sum_i l_i [H_i], [alpha]G2) == 1.

    digests: list of k Affine (1,) commitments; proofs: list of k
    OpeningProof; points: list of k plain fr scalars ((1,) arrays or ints).
    lambdas: optional k host ints (lambda_0 forced to 1); defaults to
    os.urandom sampling — the reference samples from crypto/rand too.
    """
    g1c = _g1(name)
    fr = g1c.fr
    r = fr.spec.modulus
    k = len(digests)
    if len(proofs) != k or len(points) != k:
        raise ValueError("digests/proofs/points length mismatch")
    if k == 0:
        raise ValueError("zero digests")
    if k == 1:
        return verify(name, digests[0], proofs[0], _as_fr(fr, points[0]), vk)

    if lambdas is None:
        import os
        lambdas = [1] + [int.from_bytes(os.urandom(31), "big") % r
                         for _ in range(k - 1)]
    lambdas = [1] + [int(v) % r for v in lambdas[1:]]

    curve = cs.get_curve(f"{name}_g1")
    qx_pts = Affine(jnp.concatenate([p.h.x for p in proofs], axis=0),
                    jnp.concatenate([p.h.y for p in proofs], axis=0))
    lam_dev = fr.from_int(lambdas, mont=False)
    # sum_i l_i [H_i]
    folded_quotients = msm(curve, qx_pts, lam_dev, c=4)

    # sum_i l_i D_i
    dx = jnp.concatenate([d.x for d in digests], axis=0)
    dy = jnp.concatenate([d.y for d in digests], axis=0)
    folded_digests = msm(curve, Affine(dx, dy), lam_dev, c=4)

    # sum_i l_i y_i and the l_i * p_i scalars (host fold of tiny values)
    pts_int = [_point_int(fr, p) for p in points]
    lam_m = fr.to_mont(lam_dev)
    evals = jnp.concatenate(
        [jnp.atleast_1d(p.claimed_value)[:1] for p in proofs], axis=0)
    folded_evals = fr.from_mont(
        fr.sum_reduce(fr.mul(fr.to_mont(evals), lam_m)))[None]
    lam_pts = fr.from_int(
        [(lambdas[i] * pts_int[i]) % r for i in range(k)], mont=False)

    # [sum l_i y_i] G1 (vk.g1 is a batch of 1; strip to match the msm
    # results, which are unbatched single points)
    evals_commit = Jac(*(c[0] for c in g1c.scalar_mul(
        g1c.from_affine(vk.g1), folded_evals)))
    # sum_i l_i p_i [H_i]
    folded_pts_quotients = msm(curve, qx_pts, lam_pts, c=4)

    total = g1c.add(folded_digests, g1c.neg_jac(evals_commit))
    total = g1c.add(total, folded_pts_quotients)
    total_aff = g1c.to_affine(_as_batch(total))
    neg_q_aff = g1c.to_affine(_as_batch(g1c.neg_jac(folded_quotients)))

    px = jnp.concatenate([total_aff.x, neg_q_aff.x], axis=0)
    py = jnp.concatenate([total_aff.y, neg_q_aff.y], axis=0)
    if vk.lines is not None:
        from gnark_crypto_tpu.pairing.lines import pairing_check_fixed_q

        return pairing_check_fixed_q(name, Affine(px, py), vk.lines)
    qx = jnp.concatenate([vk.g2.x, vk.alpha_g2.x], axis=0)
    qy = jnp.concatenate([vk.g2.y, vk.alpha_g2.y], axis=0)
    return pairing_api.pairing_check(name, Affine(px, py), qx, qy)


def _as_fr(fr, point):
    """int or (1,) plain fr array -> (1,) plain fr array."""
    if isinstance(point, int):
        return fr.from_int([point % fr.spec.modulus], mont=False)
    return point


def _point_int(fr, point) -> int:
    if isinstance(point, int):
        return point % fr.spec.modulus
    v = fr.to_int(point, mont=False)
    return v[0] if isinstance(v, list) else v
