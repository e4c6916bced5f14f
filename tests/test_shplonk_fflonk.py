"""Shplonk + Fflonk batch opening tests (reference example_test.go flows)."""

import random

import numpy as np
import pytest

from gnark_crypto_tpu.protocols import fflonk, kzg, shplonk

NAME = "bn254"
SIZE = 16


@pytest.fixture(scope="module")
def srs():
    return kzg.new_srs(NAME, SIZE * 4, 0x1CEB00DA)


def test_shplonk_roundtrip(srs):
    from gnark_crypto_tpu.curve.jacobian import curve_ops
    from gnark_crypto_tpu.specs import curve as cs

    g1c = curve_ops(cs.get_curve(f"{NAME}_g1"))
    r = g1c.spec.fr.modulus
    rng = random.Random(1)
    polys = [[rng.randrange(r) for _ in range(SIZE)] for _ in range(2)]
    points = [[rng.randrange(r) for _ in range(2)],
              [rng.randrange(r)]]
    digests = [shplonk._commit_host(NAME, srs.pk, p, r, g1c) for p in polys]
    proof = shplonk.batch_open(NAME, srs.pk, polys, digests, points)
    # claimed values match direct evaluation
    for i, (p, si) in enumerate(zip(polys, points)):
        for j, x in enumerate(si):
            assert proof.claimed_values[i][j] == shplonk._peval(p, x, r)
    assert bool(np.asarray(shplonk.batch_verify(
        NAME, proof, digests, points, srs.vk)))
    # tampered claimed value fails
    bad = shplonk.OpeningProof(
        w=proof.w, w_prime=proof.w_prime,
        claimed_values=[[(v + 1) % r for v in cv]
                        for cv in proof.claimed_values])
    assert not bool(np.asarray(shplonk.batch_verify(
        NAME, bad, digests, points, srs.vk)))


def test_fflonk_roundtrip(srs):
    from gnark_crypto_tpu.curve.jacobian import curve_ops
    from gnark_crypto_tpu.specs import curve as cs

    g1c = curve_ops(cs.get_curve(f"{NAME}_g1"))
    r = g1c.spec.fr.modulus
    rng = random.Random(2)
    packs = [
        [[rng.randrange(r) for _ in range(8)] for _ in range(2)],
        [[rng.randrange(r) for _ in range(8)] for _ in range(3)],
    ]
    points = [[rng.randrange(r)], [rng.randrange(r)]]
    digests = [fflonk.fold_and_commit(NAME, srs.pk, pk_) for pk_ in packs]
    proof = fflonk.batch_open(NAME, srs.pk, packs, digests, points)
    assert fflonk.batch_verify(NAME, proof, digests, points, srs.vk)
    # tamper
    proof.claimed_values[0][0][0] = (proof.claimed_values[0][0][0] + 1) % r
    assert not fflonk.batch_verify(NAME, proof, digests, points, srs.vk)


def test_permutation_proof(srs):
    import random as _random

    from gnark_crypto_tpu.curve.jacobian import curve_ops
    from gnark_crypto_tpu.protocols import permutation
    from gnark_crypto_tpu.specs import curve as cs

    g1c = curve_ops(cs.get_curve("bn254_g1"))
    r = g1c.spec.fr.modulus
    rng = _random.Random(7)
    vals = [rng.randrange(r) for _ in range(SIZE)]
    perm = list(range(SIZE))
    rng.shuffle(perm)
    t1 = g1c.fr.from_int(vals, mont=False)
    t2 = g1c.fr.from_int([vals[p] for p in perm], mont=False)
    proof = permutation.prove(NAME, srs.pk, t1, t2)
    assert permutation.verify(NAME, srs.vk, proof)
    # non-permutation must fail
    bad_vals = list(vals)
    bad_vals[0] = (bad_vals[0] + 1) % r
    t2_bad = g1c.fr.from_int(bad_vals, mont=False)
    proof_bad = permutation.prove(NAME, srs.pk, t1, t2_bad)
    assert not permutation.verify(NAME, srs.vk, proof_bad)
