"""BLS24 tower algebra: field laws, Frobenius maps, cyclotomic ops."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from gnark_crypto_tpu.towers.tower24 import get_tower24


def rand_e24(tw, n, seed):
    rng = random.Random(seed)
    p = tw.p

    def re4():
        return ((rng.randrange(p), rng.randrange(p)),
                (rng.randrange(p), rng.randrange(p)))

    vals = [tuple(tuple(re4() for _ in range(3)) for _ in range(2))
            for _ in range(n)]
    return jnp.stack([tw.e12.from_int(v) for v in vals])


@pytest.mark.parametrize("name", ["bls24_315", "bls24_317"])
def test_e24_field_laws(name):
    tw = get_tower24(name)
    e24 = tw.e12
    x = rand_e24(tw, 2, 1)
    y = rand_e24(tw, 2, 2)
    z = rand_e24(tw, 2, 3)
    assert np.array_equal(np.asarray(e24.mul(x, e24.mul(y, z))),
                          np.asarray(e24.mul(e24.mul(x, y), z)))
    one = e24.broadcast_to(e24.ones(), (2,))
    assert np.array_equal(np.asarray(e24.mul(x, e24.inverse(x))),
                          np.asarray(one))


@pytest.mark.parametrize("name", ["bls24_315", "bls24_317"])
def test_e24_frobenius(name):
    tw = get_tower24(name)
    e24 = tw.e12
    x = rand_e24(tw, 1, 4)
    fr1 = tw.frobenius(x)
    assert np.array_equal(np.asarray(fr1), np.asarray(e24.exp_const(x, tw.p)))
    assert np.array_equal(np.asarray(tw.frobenius_square(x)),
                          np.asarray(tw.frobenius(fr1)))
    fr4 = tw.frobenius_quad(x)
    assert np.array_equal(
        np.asarray(fr4),
        np.asarray(tw.frobenius_square(tw.frobenius_square(x))))


def test_e24_cyclotomic():
    tw = get_tower24("bls24_315")
    e24 = tw.e12
    x = rand_e24(tw, 1, 5)
    # project into the cyclotomic subgroup: y = x^((p^12-1)(p^4+1))
    y = e24.mul(tw.conjugate(x), e24.inverse(x))
    y = e24.mul(tw.frobenius_quad(y), y)
    assert np.array_equal(np.asarray(tw.cyclotomic_square(y)),
                          np.asarray(e24.square(y)))
    one = e24.broadcast_to(e24.ones(), (1,))
    assert np.array_equal(
        np.asarray(e24.mul(y, tw.inverse_cyclotomic(y))), np.asarray(one))


@pytest.mark.parametrize("name", ["bls24_315", "bls24_317"])
def test_bls24_pair_fixed_q_matches_pair(name):
    """PrecomputeLines + PairFixedQ == Pair for the BLS24 family
    (reference bls24-315 pairing.go:394 PrecomputeLines; dense E24 line
    products, bit-identical to MulBy34/MulBy01)."""
    from gnark_crypto_tpu.curve.g2 import g2_curve
    from gnark_crypto_tpu.curve.jacobian import Affine, curve_ops
    from gnark_crypto_tpu.pairing import lines as ln
    from gnark_crypto_tpu.pairing import pairing12
    from gnark_crypto_tpu.specs import curve as cs

    g1 = curve_ops(cs.get_curve(f"{name}_g1"))
    g2 = g2_curve(name)

    def sg(curve, k):
        g = curve.generator_affine()
        g = Affine(curve.fp.broadcast_to(g.x, (1,)),
                   curve.fp.broadcast_to(g.y, (1,)))
        kk = curve.fr.from_int([k], mont=False)
        return curve.to_affine(curve.scalar_mul(curve.from_affine(g), kk,
                                                nbits=8))

    P, P2 = sg(g1, 5), sg(g1, 11)
    Q, Q2 = sg(g2, 7), sg(g2, 3)
    Pb = Affine(*(np.concatenate([np.asarray(a), np.asarray(b)])
                  for a, b in zip(P, P2)))
    QX = np.concatenate([np.asarray(Q.x), np.asarray(Q2.x)])
    QY = np.concatenate([np.asarray(Q.y), np.asarray(Q2.y)])

    want = pairing12.pair(name, Pb, QX, QY)
    tabs = ln.precompute_lines(name, QX, QY)
    got = ln.pair_fixed_q(name, Pb, tabs)
    assert np.array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("name", ["bls24_315", "bls24_317"])
def test_e24_sparse_line_muls(name):
    """SparseLineMixin at the E4 level == dense E24 products
    (e24_pairing.go:35 MulBy034, :88 Mul034By034, :155 MulBy01234;
    the M-twist family exercises MulBy014/Mul01By01/MulBy01245).
    These are exactly the ops the bls24 fixed-Q/eager/VM Miller loops
    consume lines with."""
    tw = get_tower24(name)
    e4, e24 = tw.e2, tw.e12
    rng = random.Random(11)
    p = tw.p

    def re4(n):
        return e4.from_int([((rng.randrange(p), rng.randrange(p)),
                             (rng.randrange(p), rng.randrange(p)))
                            for _ in range(n)])

    n = 2
    z = rand_e24(tw, n, 13)
    a, b, c, d = re4(n), re4(n), re4(n), re4(n)
    zero = e4.zeros(e4.eshape(a))
    one = e4.broadcast_to(e4.ones(), e4.eshape(a))

    def dense(coeffs):
        return tw.from_coeffs6(coeffs)

    # D-twist shapes: (1,0,0,a,b,0) and (c,0,0,a,b,0)
    want = e24.mul(z, dense([one, zero, zero, a, b, zero]))
    got = tw.mul_by_34(z, a, b)
    assert np.array_equal(np.asarray(got), np.asarray(want))

    want = e24.mul(z, dense([c, zero, zero, a, b, zero]))
    got = tw.mul_by_034(z, c, a, b)
    assert np.array_equal(np.asarray(got), np.asarray(want))

    xs = tw.mul_34_by_34(a, b, c, d)
    want = e24.mul(dense([one, zero, zero, a, b, zero]),
                   dense([one, zero, zero, c, d, zero]))
    got = dense([xs[0], xs[1], xs[2], xs[3], xs[4], zero])
    assert np.array_equal(np.asarray(got), np.asarray(want))

    want = e24.mul(z, dense([xs[0], xs[1], xs[2], xs[3], xs[4], zero]))
    got = tw.mul_by_01234(z, xs)
    assert np.array_equal(np.asarray(got), np.asarray(want))

    # M-twist shapes: (a,b,0,0,1,0) and products
    want = e24.mul(z, dense([a, b, zero, zero, one, zero]))
    got = tw.mul_by_01(z, a, b)
    assert np.array_equal(np.asarray(got), np.asarray(want))

    want = e24.mul(z, dense([c, a, zero, zero, b, zero]))
    got = tw.mul_by_014(z, c, a, b)
    assert np.array_equal(np.asarray(got), np.asarray(want))

    ys = tw.mul_01_by_01(a, b, c, d)
    want = e24.mul(dense([a, b, zero, zero, one, zero]),
                   dense([c, d, zero, zero, one, zero]))
    got = dense([ys[0], ys[1], ys[2], zero, ys[3], ys[4]])
    assert np.array_equal(np.asarray(got), np.asarray(want))

    want = e24.mul(z, dense([ys[0], ys[1], ys[2], zero, ys[3], ys[4]]))
    got = tw.mul_by_01245(z, ys)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_e24_gt_exp():
    """gt_exp (NAF CyclotomicExp) and gt_exp_glv (ExpGLV over the
    Frobenius endomorphism) on E24, vs the generic square-multiply
    ladder (reference e24.go CyclotomicExp / ExpGLV)."""
    tw = get_tower24("bls24_315")
    e24 = tw.e12
    x = rand_e24(tw, 1, 11)
    # cyclotomic projection: y = x^((p^12-1)(p^4+1))
    y = e24.mul(tw.conjugate(x), e24.inverse(x))
    y = e24.mul(tw.frobenius_quad(y), y)
    e = 0xDEADBEEFCAFEBABE1234
    assert np.array_equal(np.asarray(tw.gt_exp(y, e)),
                          np.asarray(e24.exp_const(y, e)))
    # x^-e * x^e == 1
    one = e24.broadcast_to(e24.ones(), (1,))
    prod = e24.mul(tw.gt_exp(y, -e), tw.gt_exp(y, e))
    assert np.array_equal(np.asarray(prod), np.asarray(one))
    # GLV path needs a true order-r GT element: project by phi_24(p)/r
    from gnark_crypto_tpu.specs.curve import get_curve
    p, r = tw.p, get_curve("bls24_315_g1").fr.modulus
    cof = (p**8 - p**4 + 1) // r
    z = e24.exp_const(y, cof)
    big = r - 12345
    assert np.array_equal(np.asarray(tw.gt_exp_glv(z, big)),
                          np.asarray(e24.exp_const(z, big)))
