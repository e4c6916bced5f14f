"""IOP polynomial layer + Pedersen commitment tests."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from gnark_crypto_tpu.curve.jacobian import Affine, curve_ops
from gnark_crypto_tpu.protocols import iop, pedersen
from gnark_crypto_tpu.specs import curve as cs
from gnark_crypto_tpu.specs import field as fs


SPEC = fs.BN254_FR


def rand_poly(n, seed):
    rng = random.Random(seed)
    eng = iop.for_spec(SPEC)
    return iop.from_canonical(
        SPEC, eng.from_int([rng.randrange(SPEC.modulus) for _ in range(n)],
                           mont=False))


def test_basis_roundtrips():
    p = rand_poly(32, 1)
    q = p.to_lagrange().to_canonical().to_regular()
    assert np.array_equal(np.asarray(q.values), np.asarray(p.values))
    q2 = p.to_lagrange_coset().to_canonical().to_regular()
    assert np.array_equal(np.asarray(q2.values), np.asarray(p.values))
    # lagrange values = evaluations at g^i
    lag = p.to_lagrange().to_regular()
    dom = iop._domain(SPEC, 32)
    x0 = p.eng.from_int([1], mont=False)
    assert p.eng.to_int(lag.values, mont=False)[0] == \
        p.eng.to_int(p.evaluate(x0), mont=False)[0]


def test_evaluate_matches_horner():
    p = rand_poly(16, 2)
    eng = p.eng
    a = 12345
    got = eng.to_int(p.evaluate(eng.from_int([a], mont=False)), mont=False)[0]
    coeffs = eng.to_int(p.values, mont=False)
    expect = 0
    for c in reversed(coeffs):
        expect = (expect * a + c) % SPEC.modulus
    assert got == expect


def test_quotient_by_vanishing():
    """p = (X^n - 1) * h  ==>  divide_by_x_minus_one(p) == h (padded)."""
    n = 8
    rng = random.Random(4)
    eng = iop.for_spec(SPEC)
    q = SPEC.modulus
    h = [rng.randrange(q) for _ in range(n)]
    p_coeffs = [(-c) % q for c in h] + h  # (X^n - 1) * h, size 2n
    p = iop.Polynomial(SPEC, eng.from_int(p_coeffs, mont=False),
                       iop.Basis.CANONICAL, iop.Layout.REGULAR)
    quot = iop.divide_by_x_minus_one(p)
    got = eng.to_int(quot.values, mont=False)
    assert got[:n] == h
    assert all(v == 0 for v in got[n:])


def test_pedersen_commit_prove_verify():
    name = "bn254"
    g1c = curve_ops(cs.get_curve("bn254_g1"))
    rng = random.Random(5)
    n = 8
    # basis: random multiples of G
    from tests.test_curve_g1 import pts_to_device, rand_points

    basis = pts_to_device(g1c, rand_points(g1c, n, seed=31))
    pks, vk = pedersen.setup(name, [basis], sigma=0xABCDEF, g2_scalar=3)
    values = g1c.fr.from_int(
        [rng.randrange(g1c.spec.fr.modulus) for _ in range(n)], mont=False)
    com = pedersen.commit(name, pks[0], values)
    pok = pedersen.prove_knowledge(name, pks[0], values)
    assert bool(np.asarray(pedersen.verify(name, vk, com, pok)))
    # tampered proof fails
    bad = Affine(pok.x, g1c.fp.neg(pok.y))
    assert not bool(np.asarray(pedersen.verify(name, vk, com, bad)))


def test_pedersen_batch_verify_multi_vk():
    """BatchVerifyMultiVk (pedersen.go:227): n PoKs from different
    ceremonies (same G2 point) verified with n+1 pairings."""
    name = "bn254"
    g1c = curve_ops(cs.get_curve("bn254_g1"))
    rng = random.Random(6)
    n, k = 6, 2
    from tests.test_curve_g1 import pts_to_device, rand_points

    vks, coms, poks = [], [], []
    for i in range(k):
        basis = pts_to_device(g1c, rand_points(g1c, n, seed=40 + i))
        pks, vk = pedersen.setup(name, [basis], sigma=0x1111 + i,
                                 g2_scalar=3)
        values = g1c.fr.from_int(
            [rng.randrange(g1c.spec.fr.modulus) for _ in range(n)],
            mont=False)
        vks.append(vk)
        coms.append(pedersen.commit(name, pks[0], values))
        poks.append(pedersen.prove_knowledge(name, pks[0], values))

    coeff = rng.randrange(1, g1c.spec.fr.modulus)
    ok = pedersen.batch_verify_multi_vk(name, vks, coms, poks, coeff)
    assert bool(np.asarray(ok))

    # pre-folded single pok also accepted
    folded = pedersen.fold_commitments(name, poks, coeff)
    ok2 = pedersen.batch_verify_multi_vk(name, vks, coms, [folded], coeff)
    assert bool(np.asarray(ok2))

    # one tampered pok fails
    bad = [poks[0], Affine(poks[1].x, g1c.fp.neg(poks[1].y))]
    assert not bool(np.asarray(
        pedersen.batch_verify_multi_vk(name, vks, coms, bad, coeff)))


def test_evaluate_expression_batched():
    """evaluate_expression (iop/expressions.go:17) over mixed-basis inputs:
    result == pointwise oracle on evaluations at g^i."""
    n = 16
    q = SPEC.modulus
    eng = iop.for_spec(SPEC)
    p1 = rand_poly(n, 21)                         # canonical / regular
    p2 = rand_poly(n, 22).to_lagrange()           # lagrange / bit-reverse
    p3 = rand_poly(n, 23).to_canonical().to_bit_reverse()  # canon / bitrev

    out = iop.evaluate_expression(
        SPEC, lambda e, a, b, c: e.add(e.mul(a, b), c), p1, p2, p3)
    assert out.basis == iop.Basis.LAGRANGE
    assert out.layout == iop.Layout.REGULAR

    dom = iop._domain(SPEC, n)
    g = dom.generator_int
    c1 = eng.to_int(p1.values, mont=False)
    c2 = eng.to_int(rand_poly(n, 22).values, mont=False)
    c3 = eng.to_int(p3.to_regular().values, mont=False)
    got = eng.to_int(out.values, mont=False)
    for i in range(n):
        x = pow(g, i, q)
        e1 = sum(c * pow(x, k, q) for k, c in enumerate(c1)) % q
        e2 = sum(c * pow(x, k, q) for k, c in enumerate(c2)) % q
        e3 = sum(c * pow(x, k, q) for k, c in enumerate(c3)) % q
        assert got[i] == (e1 * e2 + e3) % q, i


def test_to_lagrange_batch_matches_per_poly():
    n = 32
    polys = [rand_poly(n, 31 + i) for i in range(5)]
    polys[3] = polys[3].to_bit_reverse()
    polys[4] = polys[4].to_lagrange()
    for coset in (False, True):
        batched = iop.to_lagrange_batch(list(polys), coset=coset)
        for b, p in zip(batched, polys):
            single = p.to_lagrange(coset).to_regular()
            assert b.layout == iop.Layout.REGULAR
            assert np.array_equal(np.asarray(b.values),
                                  np.asarray(single.values)), coset
