"""Permutation proof: t2 is a permutation of t1 (PLONK-style grand product
over KZG). Counterpart of ``ecc/<curve>/fr/permutation/permutation.go``.

Protocol (permutation.go:131 Prove / :257 Verify):
  Z(w^0)=1, Z(w^{i+1}) = Z(w^i) * (eps - t1_i)/(eps - t2_i)
  identity on the coset:  Z(gx)(eps - t2) - Z(x)(eps - t1)
                          + omega * L0(x)(Z(x) - 1) = q(x) (X^n - 1)
  openings of t1,t2,Z,q at eta (batched) + Z at g*eta.
Vectorized: the accumulator is a batched prefix product + one batch
inversion (the reference builds it serially with BatchInvert).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from gnark_crypto_tpu.curve.jacobian import Affine, curve_ops
from gnark_crypto_tpu.hashes.fiat_shamir import Transcript
from gnark_crypto_tpu.ntt import fft as fftm
from gnark_crypto_tpu.ntt.domain import Domain
from gnark_crypto_tpu.protocols import kzg
from gnark_crypto_tpu.protocols.iop import _domain
from gnark_crypto_tpu.specs import curve as cs


@dataclasses.dataclass
class Proof:
    size: int
    t1: Affine
    t2: Affine
    z: Affine
    q: Affine
    batched: kzg.BatchOpeningProof
    shifted: kzg.OpeningProof


def _g1(name):
    return curve_ops(cs.get_curve(f"{name}_g1"))


def _derive(name, t, cid, digests, g1c):
    from gnark_crypto_tpu.io.marshal import PointCodec

    codec = PointCodec(g1c)
    for d in digests:
        t.bind(cid, codec.to_bytes(d, raw=True)[0])
    b = t.compute_challenge(cid)
    return int.from_bytes(b, "big") % g1c.spec.fr.modulus


def _ifft_natural(dom, eng, vals_plain):
    """Lagrange (natural) -> canonical (natural) coefficients."""
    m = eng.to_mont(vals_plain)
    out = fftm.fft_inverse(dom, fftm.bit_reverse(m), fftm.DIT)
    return eng.from_mont(out)


def _coset_evals(dom, eng, coeffs_plain):
    """canonical (natural) -> coset Lagrange (natural)."""
    m = eng.to_mont(coeffs_plain)
    return eng.from_mont(fftm.bit_reverse(fftm.fft(dom, m, fftm.DIF,
                                                   coset=True)))


def prove(name: str, pk: kzg.ProvingKey, t1, t2) -> Proof:
    g1c = _g1(name)
    eng = g1c.fr
    spec = g1c.spec.fr
    r = spec.modulus
    s = t1.shape[0]
    dom = _domain(spec, s)
    fs = Transcript(challenge_ids=["epsilon", "omega", "eta"])

    ct1 = _ifft_natural(dom, eng, t1)
    ct2 = _ifft_natural(dom, eng, t2)
    com_t1 = kzg.commit(name, pk, ct1)
    com_t2 = kzg.commit(name, pk, ct2)
    epsilon = _derive(name, fs, "epsilon", [com_t1, com_t2], g1c)

    # grand product Z (natural Lagrange order)
    eps_m = eng.to_mont(eng.from_int([epsilon] * s, mont=False))
    t1m, t2m = eng.to_mont(t1), eng.to_mont(t2)
    num = eng.sub(eps_m, t1m)
    den = eng.sub(eps_m, t2m)
    ratio = eng.mul(num, eng.batch_inverse(den))
    # exclusive prefix product (Z_0 = 1, Z_{i+1} = prod_{j<=i} ratio_j)
    zacc = ratio
    d = 1
    while d < s:
        zacc = jnp.concatenate(
            [zacc[:d], eng.mul(zacc[d:], zacc[:-d])], axis=0)
        d *= 2
    one_m = eng.to_mont(eng.from_int([1], mont=False))
    lz_m = jnp.concatenate([one_m, zacc[:-1]], axis=0)
    cz = _ifft_natural(dom, eng, eng.from_mont(lz_m))
    com_z = kzg.commit(name, pk, cz)
    omega = _derive(name, fs, "omega", [com_z], g1c)

    # coset evaluations
    lt1 = eng.to_mont(_coset_evals(dom, eng, ct1))
    lt2 = eng.to_mont(_coset_evals(dom, eng, ct2))
    lz = eng.to_mont(_coset_evals(dom, eng, cz))
    lz_shift = jnp.concatenate([lz[1:], lz[:1]], axis=0)
    eps_v = eng.to_mont(eng.from_int([epsilon] * s, mont=False))
    part1 = eng.sub(eng.mul(lz_shift, eng.sub(eps_v, lt2)),
                    eng.mul(lz, eng.sub(eps_v, lt1)))
    # part2 = L0-ish term: (z - 1) * (u^n - 1) / (x_i - 1) on the coset
    u = dom.shift_int
    g = dom.generator_int
    tn = (pow(u, s, r) - 1) % r
    xs_minus_1_inv = [pow((u * pow(g, i, r) - 1) % r, -1, r)
                      for i in range(s)]
    scale = eng.to_mont(eng.from_int(
        [tn * v % r for v in xs_minus_1_inv], mont=False))
    ones_v = eng.to_mont(eng.from_int([1] * s, mont=False))
    part2 = eng.mul(eng.sub(lz, ones_v), scale)

    om_m = eng.to_mont(eng.from_int([omega] * s, mont=False))
    tn_inv = eng.to_mont(eng.from_int([pow(tn, -1, r)] * s, mont=False))
    lsnum = eng.mul(eng.add(eng.mul(om_m, part2), part1), tn_inv)
    # back to canonical: coset Lagrange natural -> canonical
    q_coeffs = eng.from_mont(fftm.fft_inverse(
        dom, fftm.bit_reverse(lsnum), fftm.DIT, coset=True))
    com_q = kzg.commit(name, pk, q_coeffs)
    eta = _derive(name, fs, "eta", [com_q], g1c)

    eta_dev = eng.from_int([eta], mont=False)
    polys = jnp.stack([ct1, ct2, cz, q_coeffs])
    batched = kzg.batch_open_single_point(
        name, pk, polys, eta_dev,
        digests=[com_t1, com_t2, com_z, com_q])
    shifted_pt = eng.from_int([eta * dom.generator_int % r], mont=False)
    shifted = kzg.open_poly(name, pk, cz, shifted_pt)
    return Proof(size=s, t1=com_t1, t2=com_t2, z=com_z, q=com_q,
                 batched=batched, shifted=shifted)


def verify(name: str, vk: kzg.VerifyingKey, proof: Proof) -> bool:
    g1c = _g1(name)
    eng = g1c.fr
    spec = g1c.spec.fr
    r = spec.modulus
    s = proof.size
    dom = _domain(spec, s)
    fs = Transcript(challenge_ids=["epsilon", "omega", "eta"])
    epsilon = _derive(name, fs, "epsilon", [proof.t1, proof.t2], g1c)
    omega = _derive(name, fs, "omega", [proof.z], g1c)
    eta = _derive(name, fs, "eta", [proof.q], g1c)

    cv = [int(v) for v in
          [eng.to_int(proof.batched.claimed_values[i][None], mont=False)[0]
           for i in range(4)]]
    z_shift = eng.to_int(proof.shifted.claimed_value, mont=False)[0]
    # relation: (eps - t2(eta)) z(g eta) - (eps - t1(eta)) z(eta)
    #           + omega * L0(eta) (z(eta)-1) == q(eta) (eta^n - 1)
    rhs = (pow(eta, s, r) - 1) % r
    l0 = rhs * pow((eta - 1) % r, -1, r) % r
    rhs = rhs * cv[3] % r
    lhs = ((epsilon - cv[1]) * z_shift - (epsilon - cv[0]) * cv[2]) % r
    lhs = (lhs + omega * l0 % r * ((cv[2] - 1) % r)) % r
    if lhs != rhs:
        return False

    eta_dev = eng.from_int([eta], mont=False)
    ok1 = kzg.batch_verify_single_point(
        name, [proof.t1, proof.t2, proof.z, proof.q], proof.batched,
        eta_dev, vk)
    shifted_pt = eng.from_int([eta * dom.generator_int % r], mont=False)
    ok2 = kzg.verify(name, proof.z, proof.shifted, shifted_pt, vk)
    return bool(np.asarray(ok1)) and bool(np.asarray(ok2))
