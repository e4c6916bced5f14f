"""KZG commit/open/verify tests (reference: ecc/bn254/kzg/kzg_test.go)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from gnark_crypto_tpu.curve.jacobian import Affine, curve_ops
from gnark_crypto_tpu.protocols import kzg
from gnark_crypto_tpu.specs import curve as cs

NAME = "bn254"
SIZE = 16
ALPHA = 0xDEADBEEF


@pytest.fixture(scope="module")
def srs():
    return kzg.new_srs(NAME, SIZE, ALPHA)


def frs(vals):
    return curve_ops(cs.get_curve(f"{NAME}_g1")).fr.from_int(vals, mont=False)


def test_srs_structure(srs):
    g1c = curve_ops(cs.get_curve(f"{NAME}_g1"))
    # pk.G1[i] == [alpha^i] G1: check i = 0,1 against direct scalar mul
    g = g1c.generator_affine()
    assert g1c.fp.to_int(srs.pk.g1.x[0]) == g1c.fp.to_int(g.x)
    r = g1c.spec.fr.modulus
    a2 = pow(ALPHA, 2, r)
    p2 = g1c.to_affine(g1c.scalar_mul(
        g1c.from_affine(Affine(g.x[None] if g.x.ndim == 1 else g.x, g.y[None])),
        frs([a2])))
    assert g1c.fp.to_int(srs.pk.g1.x[2]) == g1c.fp.to_int(p2.x[0])


def test_eval_poly(srs):
    r = cs.get_curve(f"{NAME}_g1").fr.modulus
    rng = random.Random(1)
    coeffs = [rng.randrange(r) for _ in range(SIZE)]
    a = rng.randrange(r)
    got = kzg.eval_poly(NAME, frs(coeffs), frs([a]))
    g1c = curve_ops(cs.get_curve(f"{NAME}_g1"))
    expect = 0
    for c in reversed(coeffs):
        expect = (expect * a + c) % r
    assert g1c.fr.to_int(got, mont=False)[0] == expect


def test_open_verify_roundtrip(srs):
    r = cs.get_curve(f"{NAME}_g1").fr.modulus
    rng = random.Random(2)
    coeffs = [rng.randrange(r) for _ in range(SIZE)]
    poly = frs(coeffs)
    point = frs([rng.randrange(r)])
    com = kzg.commit(NAME, srs.pk, poly)
    proof = kzg.open_poly(NAME, srs.pk, poly, point)
    ok = kzg.verify(NAME, com, proof, point, srs.vk)
    assert bool(np.asarray(ok))

    # tampered claimed value must fail
    g1c = curve_ops(cs.get_curve(f"{NAME}_g1"))
    bad = kzg.OpeningProof(
        h=proof.h,
        claimed_value=g1c.fr.from_int(
            [(g1c.fr.to_int(proof.claimed_value, mont=False)[0] + 1) % r],
            mont=False))
    assert not bool(np.asarray(kzg.verify(NAME, com, bad, point, srs.vk)))


def test_batch_open_verify(srs):
    r = cs.get_curve(f"{NAME}_g1").fr.modulus
    rng = random.Random(3)
    k = 3
    polys = frs([rng.randrange(r) for _ in range(k * SIZE)]).reshape(
        k, SIZE, -1)
    point = frs([rng.randrange(r)])
    digests = [kzg.commit(NAME, srs.pk, polys[i]) for i in range(k)]
    bp = kzg.batch_open_single_point(NAME, srs.pk, polys, point,
                                     digests=digests)
    ok = kzg.batch_verify_single_point(NAME, digests, bp, point, srs.vk)
    assert bool(np.asarray(ok))


def test_batch_verify_multi_points(srs):
    """BatchVerifyMultiPoints (kzg.go:423): k proofs at DISTINCT points,
    one pairing; each proof also passes the per-proof verify oracle."""
    r = cs.get_curve(f"{NAME}_g1").fr.modulus
    rng = random.Random(4)
    k = 3
    digests, proofs, points = [], [], []
    for i in range(k):
        poly = frs([rng.randrange(r) for _ in range(SIZE)])
        pt = frs([rng.randrange(r)])
        digests.append(kzg.commit(NAME, srs.pk, poly))
        proofs.append(kzg.open_poly(NAME, srs.pk, poly, pt))
        points.append(pt)
        assert bool(np.asarray(
            kzg.verify(NAME, digests[-1], proofs[-1], pt, srs.vk)))

    lambdas = [1] + [rng.randrange(1, r) for _ in range(k - 1)]
    ok = kzg.batch_verify_multi_points(NAME, digests, proofs, points,
                                       srs.vk, lambdas=lambdas)
    assert bool(np.asarray(ok))

    # single-proof path delegates to verify
    ok1 = kzg.batch_verify_multi_points(NAME, digests[:1], proofs[:1],
                                        points[:1], srs.vk)
    assert bool(np.asarray(ok1))

    # tampered claimed value in one proof must fail the batch
    g1c = curve_ops(cs.get_curve(f"{NAME}_g1"))
    bad = kzg.OpeningProof(
        h=proofs[1].h,
        claimed_value=g1c.fr.from_int(
            [(g1c.fr.to_int(proofs[1].claimed_value, mont=False)[0] + 1) % r],
            mont=False))
    bad_proofs = [proofs[0], bad, proofs[2]]
    assert not bool(np.asarray(kzg.batch_verify_multi_points(
        NAME, digests, bad_proofs, points, srs.vk, lambdas=lambdas)))
