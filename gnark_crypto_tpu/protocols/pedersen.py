"""Pedersen vector commitment with proof of knowledge (sigma-G2 trapdoor).

Counterpart of ``ecc/<curve>/fr/pedersen/pedersen.go``:
  Setup: trapdoor sigma; pk = (basis, basis^sigma); vk = (G2, G2^-sigma)
  Commit = MSM(basis, values); ProveKnowledge = MSM(basis^sigma, values)
  Verify: e(commitment, G2^-sigma) * e(pok, G2) == 1  (pedersen.go:198)
  BatchProve / fold with combination coefficient powers (pedersen.go:145).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gnark_crypto_tpu.curve.g2 import g2_curve
from gnark_crypto_tpu.curve.jacobian import Affine, Jac, curve_ops
from gnark_crypto_tpu.msm.pippenger import msm
from gnark_crypto_tpu.pairing import api as pairing_api
from gnark_crypto_tpu.specs import curve as cs


@dataclasses.dataclass
class ProvingKey:
    basis: Affine
    basis_exp_sigma: Affine


@dataclasses.dataclass
class VerifyingKey:
    g: Affine            # G2 point (batch-of-1)
    g_sigma_neg: Affine  # [-sigma] G2


def _g1(name):
    return curve_ops(cs.get_curve(f"{name}_g1"))


def setup(name: str, bases: list[Affine], sigma: int, g2_scalar: int = 1):
    """Trusted setup (pedersen.go:65). sigma/g2_scalar supplied by the caller
    (the reference samples them from crypto/rand; randomness is a host
    concern, not a kernel one)."""
    g1c = _g1(name)
    g2c = g2_curve(name)
    r = g1c.spec.fr.modulus
    sigma = sigma % r
    g2g = g2c.generator_affine()
    g2b = Jac(*(g2c.fp.broadcast_to(c, (1,))
                for c in g2c.from_affine(g2g)))
    g = g2c.to_affine(g2c.scalar_mul(
        g2b, g2c.fr.from_int([g2_scalar % r], mont=False)))
    g_sigma_neg = g2c.to_affine(g2c.scalar_mul(
        g2c.from_affine(g), g2c.fr.from_int([(-sigma) % r], mont=False)))

    pks = []
    for basis in bases:
        n = basis.x.shape[0]
        k = g1c.fr.from_int([sigma] * n, mont=False)
        exp_sigma = g1c.to_affine(
            g1c.scalar_mul(g1c.from_affine(basis), k))
        pks.append(ProvingKey(basis, exp_sigma))
    return pks, VerifyingKey(g, g_sigma_neg)


def commit(name: str, pk: ProvingKey, values) -> Affine:
    g1c = _g1(name)
    res = msm(cs.get_curve(f"{name}_g1"), pk.basis, values)
    return g1c.to_affine(Jac(*(c[None] for c in res)))


def prove_knowledge(name: str, pk: ProvingKey, values) -> Affine:
    g1c = _g1(name)
    res = msm(cs.get_curve(f"{name}_g1"), pk.basis_exp_sigma, values)
    return g1c.to_affine(Jac(*(c[None] for c in res)))


def verify(name: str, vk: VerifyingKey, commitment: Affine, pok: Affine):
    """e(commitment, -sigma G2) * e(pok, G2) == 1 (pedersen.go:204)."""
    px = jnp.concatenate([commitment.x, pok.x], axis=0)
    py = jnp.concatenate([commitment.y, pok.y], axis=0)
    qx = jnp.concatenate([vk.g_sigma_neg.x, vk.g.x], axis=0)
    qy = jnp.concatenate([vk.g_sigma_neg.y, vk.g.y], axis=0)
    return pairing_api.pairing_check(name, Affine(px, py), qx, qy)


def fold_commitments(name: str, commitments: list[Affine], coeff: int):
    """sum coeff^i * C_i (curve.Fold semantics used by BatchProve)."""
    g1c = _g1(name)
    r = g1c.spec.fr.modulus
    k = len(commitments)
    xs = jnp.concatenate([c.x for c in commitments], axis=0)
    ys = jnp.concatenate([c.y for c in commitments], axis=0)
    scalars = g1c.fr.from_int([pow(coeff, i, r) for i in range(k)],
                              mont=False)
    res = msm(cs.get_curve(f"{name}_g1"), Affine(xs, ys), scalars, c=4)
    return g1c.to_affine(Jac(*(c[None] for c in res)))


def batch_verify_multi_vk(name: str, vks: list[VerifyingKey],
                          commitments: list[Affine], poks: list[Affine],
                          coeff: int):
    """Verify multiple separate PoKs with n+1 pairings instead of 2n
    (pedersen.go:227 BatchVerifyMultiVk).

    The vks may come from different ceremonies but must share the G2 point
    (the reference enforces vk[i].G == vk[0].G). ``poks`` is either one
    proof per vk, or a single already-folded proof. ``coeff`` is the
    verifier's random combination coefficient: the check is
    e(C_0, -s_0 G2) * prod_i e([coeff^i]C_i, -s_i G2) * e(fold(poks), G2).
    """
    g1c = _g1(name)
    r = g1c.spec.fr.modulus
    k = len(vks)
    if len(commitments) != k:
        raise ValueError("commitments length mismatch")
    if len(poks) not in (k, 1):
        raise ValueError("pok length mismatch")

    g1s = [commitments[0]]
    for i in range(1, k):
        s = g1c.fr.from_int([pow(coeff, i, r)], mont=False)
        g1s.append(g1c.to_affine(
            g1c.scalar_mul(g1c.from_affine(commitments[i]), s)))
    folded_pok = poks[0] if len(poks) == 1 else \
        fold_commitments(name, poks, coeff)

    px = jnp.concatenate([p.x for p in g1s] + [folded_pok.x], axis=0)
    py = jnp.concatenate([p.y for p in g1s] + [folded_pok.y], axis=0)
    qx = jnp.concatenate([vk.g_sigma_neg.x for vk in vks] + [vks[0].g.x],
                         axis=0)
    qy = jnp.concatenate([vk.g_sigma_neg.y for vk in vks] + [vks[0].g.y],
                         axis=0)
    return pairing_api.pairing_check(name, Affine(px, py), qx, qy)


def batch_prove(name: str, pks: list[ProvingKey], values: list, coeff: int
                ) -> Affine:
    """Single PoK for multiple commitments (pedersen.go:145): fold values
    with coeff powers per basis, one MSM over the concatenated sigma-bases."""
    g1c = _g1(name)
    fr = g1c.fr
    r = g1c.spec.fr.modulus
    folded_vals = []
    for i, (pk, v) in enumerate(zip(pks, values)):
        c = pow(coeff, i, r)
        cm = fr.to_mont(fr.from_int([c] * v.shape[0], mont=False))
        folded_vals.append(fr.from_mont(fr.mul(fr.to_mont(v), cm)))
    all_vals = jnp.concatenate(folded_vals, axis=0)
    bx = jnp.concatenate([pk.basis_exp_sigma.x for pk in pks], axis=0)
    by = jnp.concatenate([pk.basis_exp_sigma.y for pk in pks], axis=0)
    res = msm(cs.get_curve(f"{name}_g1"), Affine(bx, by), all_vals)
    return g1c.to_affine(Jac(*(c[None] for c in res)))
