"""Pairing tests: bilinearity, non-degeneracy, G2 group law
(reference: ecc/bn254/pairing_test.go properties)."""

import numpy as np
import pytest

from gnark_crypto_tpu.curve.g2 import g2_curve
from gnark_crypto_tpu.curve.jacobian import Affine, curve_ops
from gnark_crypto_tpu.pairing import pairing12
from gnark_crypto_tpu.specs import curve as cs

CURVES = ["bn254", "bls12_381", "bls12_377"]


def g1_curve(name):
    return curve_ops(cs.get_curve(f"{name}_g1"))


def scaled_gen(curve, k):
    """[k]G as a batch-of-1 affine point."""
    g = curve.generator_affine()
    g = Affine(curve.fp.broadcast_to(g.x, (1,)), curve.fp.broadcast_to(g.y, (1,)))
    kk = curve.fr.from_int([k], mont=False)
    return curve.to_affine(curve.scalar_mul(curve.from_affine(g), kk))


@pytest.mark.parametrize("name", CURVES)
def test_g2_group_law(name):
    g2 = g2_curve(name)
    e2 = g2.fp
    g = g2.generator_affine()
    assert bool(np.asarray(g2.on_curve_affine(g))), "G2 generator on twist"
    # [r]G2 == infinity
    gb = Affine(e2.broadcast_to(g.x, (1,)), e2.broadcast_to(g.y, (1,)))
    r = g2.spec.fr.modulus
    k = g2.fr.from_int([r], mont=False, reduce=False)
    res = g2.scalar_mul(g2.from_affine(gb), k, nbits=r.bit_length() + 1)
    assert bool(np.asarray(g2.is_inf_jac(res))[0])


@pytest.mark.parametrize("name", CURVES)
def test_pairing_bilinear(name):
    g1 = g1_curve(name)
    g2 = g2_curve(name)
    ctx = pairing12.get_ctx(name)
    e12 = ctx.tower.e12

    a, b = 13, 29
    P = scaled_gen(g1, 1)
    Q = scaled_gen(g2, 1)
    Pa = scaled_gen(g1, a)
    Qb = scaled_gen(g2, b)

    base = pairing12.pair(name, P, Q.x, Q.y)
    lhs = pairing12.pair(name, Pa, Qb.x, Qb.y)
    rhs = e12.exp_const(base, a * b)
    assert np.array_equal(np.asarray(lhs), np.asarray(rhs)), "bilinearity"

    # non-degeneracy
    one = e12.ones()
    assert not bool(np.asarray(e12.equal(base, one)))
    # e(P,Q)^r == 1
    r = g1.spec.fr.modulus
    assert bool(np.asarray(e12.equal(e12.exp_const(base, r), one)))


def test_pairing_check_and_infinity():
    name = "bn254"
    g1 = g1_curve(name)
    g2 = g2_curve(name)
    P = scaled_gen(g1, 5)
    Pneg = g1.neg_affine(P)
    Q = scaled_gen(g2, 7)
    import jax.numpy as jnp

    # e(P,Q) * e(-P,Q) == 1
    PX = jnp.concatenate([P.x, Pneg.x])
    PY = jnp.concatenate([P.y, Pneg.y])
    QX = jnp.concatenate([Q.x, Q.x])
    QY = jnp.concatenate([Q.y, Q.y])
    assert bool(np.asarray(
        pairing12.pairing_check(name, Affine(PX, PY), QX, QY)))

    # infinity pairs contribute 1 (reference filters them, pairing.go:118)
    ctx = pairing12.get_ctx(name)
    e12 = ctx.tower.e12
    inf = g1.inf_affine((1,))
    lhs = pairing12.pair(name, inf, Q.x, Q.y)
    assert bool(np.asarray(e12.equal(lhs, e12.ones())))


@pytest.mark.parametrize("name", ["bls24_315", "bls24_317"])
def test_bls24_pairing_bilinear(name):
    g1 = g1_curve(name)
    g2 = g2_curve(name)
    ctx = pairing12.get_ctx(name)
    e24 = ctx.tower.e12
    assert bool(np.asarray(g2.on_curve_affine(g2.generator_affine())))

    a, b = 11, 23
    P = scaled_gen(g1, 1)
    Q = scaled_gen(g2, 1)
    Pa = scaled_gen(g1, a)
    Qb = scaled_gen(g2, b)
    base = pairing12.pair(name, P, Q.x, Q.y)
    lhs = pairing12.pair(name, Pa, Qb.x, Qb.y)
    rhs = e24.exp_const(base, a * b)
    assert np.array_equal(np.asarray(lhs), np.asarray(rhs))
    one = e24.ones()
    assert not bool(np.asarray(e24.equal(base, one)))
    r = g1.spec.fr.modulus
    assert bool(np.asarray(e24.equal(e24.exp_const(base, r), one)))


@pytest.mark.parametrize(
    "name",
    CURVES + [pytest.param("bls24_315", marks=pytest.mark.slow)])
def test_pair_fixed_q_matches_pair(name):
    """PairFixedQ == Pair on the same pairs (reference pairing_test.go
    TestMillerLoopFixedQ analogue), batch of 2 with distinct Qs.
    bls24_315 covers the E4-level sparse consumption (e24_pairing.go);
    slow-marked: its eager+fixed-Q compile chain is ~40 min of XLA:CPU
    work (run with -m slow)."""
    from gnark_crypto_tpu.pairing import lines as ln

    g1 = g1_curve(name)
    g2 = g2_curve(name)
    ctx = pairing12.get_ctx(name)
    e2 = g2.fp

    P = scaled_gen(g1, 5)
    P2 = scaled_gen(g1, 11)
    Q = scaled_gen(g2, 7)
    Q2 = scaled_gen(g2, 3)
    Pb = Affine(*(np.concatenate([np.asarray(a), np.asarray(b)])
                  for a, b in zip(P, P2)))
    QX = np.concatenate([np.asarray(Q.x), np.asarray(Q2.x)])
    QY = np.concatenate([np.asarray(Q.y), np.asarray(Q2.y)])

    want = pairing12.pair(name, Pb, QX, QY)
    tabs = ln.precompute_lines(name, QX, QY)
    got = ln.pair_fixed_q(name, Pb, tabs)
    assert np.array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("name", ["bn254"])
def test_pair_fixed_q_infinity_pair(name):
    """An infinity pair contributes 1 (reference comment pairing.go:879)."""
    from gnark_crypto_tpu.pairing import lines as ln

    g1 = g1_curve(name)
    g2 = g2_curve(name)
    e2 = g2.fp

    P = scaled_gen(g1, 5)
    Q = scaled_gen(g2, 7)
    # second pair: P at infinity (0,0)
    zero1 = np.zeros_like(np.asarray(P.x))
    Pb = Affine(np.concatenate([np.asarray(P.x), zero1]),
                np.concatenate([np.asarray(P.y), zero1]))
    QX = np.concatenate([np.asarray(Q.x)] * 2)
    QY = np.concatenate([np.asarray(Q.y)] * 2)

    want = pairing12.pair(name, P, Q.x, Q.y)
    tabs = ln.precompute_lines(name, QX, QY)
    got = ln.pair_fixed_q(name, Pb, tabs)
    assert np.array_equal(np.asarray(got), np.asarray(want))
