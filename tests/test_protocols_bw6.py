"""Protocol suite on a SECOND pairing family (bw6-761, the structurally
different one: direct sextic tower, single-field G2) — the reference tests
every protocol per-curve (e.g. ecc/bw6-761/shplonk/shplonk_test.go,
ecc/bw6-761/kzg/kzg_test.go); this module proves the generic protocol layer
really is family-agnostic, with a rejection case per protocol.
"""

import random

import numpy as np
import pytest

from gnark_crypto_tpu.curve.jacobian import curve_ops
from gnark_crypto_tpu.protocols import fflonk, kzg, shplonk
from gnark_crypto_tpu.specs import curve as cs

NAME = "bw6_761"
SIZE = 8


@pytest.fixture(scope="module")
def srs():
    return kzg.new_srs(NAME, SIZE * 4, 0xB0BA)


@pytest.fixture(scope="module")
def g1c():
    return curve_ops(cs.get_curve(f"{NAME}_g1"))


def test_kzg_roundtrip(srs, g1c):
    r = g1c.spec.fr.modulus
    rng = random.Random(3)
    poly = g1c.fr.from_int([rng.randrange(r) for _ in range(SIZE)],
                           mont=False)
    point = g1c.fr.from_int([rng.randrange(r)], mont=False)
    com = kzg.commit(NAME, srs.pk, poly)
    proof = kzg.open_poly(NAME, srs.pk, poly, point)
    assert bool(np.asarray(kzg.verify(NAME, com, proof, point, srs.vk)))
    # wrong claimed value rejected
    bad = kzg.OpeningProof(
        h=proof.h,
        claimed_value=g1c.fr.from_int(
            [(g1c.fr.to_int(proof.claimed_value, mont=False)[0] + 1) % r],
            mont=False))
    assert not bool(np.asarray(kzg.verify(NAME, com, bad, point, srs.vk)))


def test_shplonk_roundtrip(srs, g1c):
    r = g1c.spec.fr.modulus
    rng = random.Random(4)
    polys = [[rng.randrange(r) for _ in range(SIZE)] for _ in range(2)]
    points = [[rng.randrange(r)], [rng.randrange(r)]]
    digests = [shplonk._commit_host(NAME, srs.pk, p, r, g1c) for p in polys]
    proof = shplonk.batch_open(NAME, srs.pk, polys, digests, points)
    assert bool(np.asarray(shplonk.batch_verify(
        NAME, proof, digests, points, srs.vk)))
    bad = shplonk.OpeningProof(
        w=proof.w, w_prime=proof.w_prime,
        claimed_values=[[(v + 1) % r for v in cv]
                        for cv in proof.claimed_values])
    assert not bool(np.asarray(shplonk.batch_verify(
        NAME, bad, digests, points, srs.vk)))


def test_fflonk_roundtrip(srs, g1c):
    r = g1c.spec.fr.modulus
    rng = random.Random(5)
    packs = [[[rng.randrange(r) for _ in range(SIZE)] for _ in range(2)]]
    points = [[rng.randrange(r)]]
    digests = [fflonk.fold_and_commit(NAME, srs.pk, pk_) for pk_ in packs]
    proof = fflonk.batch_open(NAME, srs.pk, packs, digests, points)
    assert fflonk.batch_verify(NAME, proof, digests, points, srs.vk)
    proof.claimed_values[0][0][0] = (proof.claimed_values[0][0][0] + 1) % r
    assert not fflonk.batch_verify(NAME, proof, digests, points, srs.vk)


def test_permutation_proof(srs, g1c):
    from gnark_crypto_tpu.protocols import permutation

    r = g1c.spec.fr.modulus
    rng = random.Random(6)
    vals = [rng.randrange(r) for _ in range(SIZE)]
    perm = list(range(SIZE))
    rng.shuffle(perm)
    t1 = g1c.fr.from_int(vals, mont=False)
    t2 = g1c.fr.from_int([vals[p] for p in perm], mont=False)
    proof = permutation.prove(NAME, srs.pk, t1, t2)
    assert permutation.verify(NAME, srs.vk, proof)
    bad_vals = list(vals)
    bad_vals[0] = (bad_vals[0] + 1) % r
    proof_bad = permutation.prove(
        NAME, srs.pk, t1, g1c.fr.from_int(bad_vals, mont=False))
    assert not permutation.verify(NAME, srs.vk, proof_bad)


def test_mpc_ceremony(g1c):
    from gnark_crypto_tpu.protocols import mpcsetup

    s0 = mpcsetup.initialize_setup(NAME, 4)
    s1 = mpcsetup.contribute(s0, tau=0xABCDEF)
    assert mpcsetup.verify_setup(s0, s1)
    # tampered powers chain rejected
    import jax.numpy as jnp
    from gnark_crypto_tpu.curve.jacobian import Affine

    bad = mpcsetup.KzgMpcSetup(
        name=NAME,
        g1_powers=Affine(
            jnp.concatenate([s1.g1_powers.x[:2], s1.g1_powers.x[1:3]]),
            jnp.concatenate([s1.g1_powers.y[:2], s1.g1_powers.y[1:3]])),
        g2_tau=s1.g2_tau, proof=s1.proof, challenge=s1.challenge)
    assert not mpcsetup.verify_setup(s0, bad)
