"""G1 Jacobian group law vs an affine Python-int oracle (bn254, grumpkin)."""

import random

import numpy as np
import pytest

from gnark_crypto_tpu.curve.jacobian import Affine, Jac, curve_ops
from gnark_crypto_tpu.field import mont
from gnark_crypto_tpu.specs import curve as cs


def oracle_add(P, Q, p, a):
    """Affine group law with Python ints. None = infinity."""
    if P is None:
        return Q
    if Q is None:
        return P
    (x1, y1), (x2, y2) = P, Q
    if x1 == x2 and (y1 + y2) % p == 0:
        return None
    if P == Q:
        lam = (3 * x1 * x1 + a) * pow(2 * y1, -1, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
    x3 = (lam * lam - x1 - x2) % p
    y3 = (lam * (x1 - x3) - y1) % p
    return (x3, y3)


def oracle_mul(P, k, p, a):
    acc = None
    while k:
        if k & 1:
            acc = oracle_add(acc, P, p, a)
        P = oracle_add(P, P, p, a)
        k >>= 1
    return acc


def rand_points(curve, n, seed):
    """n random curve points as python int pairs (multiples of the generator)."""
    p = curve.spec.fp.modulus
    a = curve.spec.a % p
    g = (curve.spec.gx % p, curve.spec.gy % p)
    rng = random.Random(seed)
    return [oracle_mul(g, rng.randrange(1, 2**64), p, a) for _ in range(n)]


def pts_to_device(curve, pts):
    f = curve.fp
    xs = f.from_int([0 if p is None else p[0] for p in pts])
    ys = f.from_int([0 if p is None else p[1] for p in pts])
    return Affine(xs, ys)


def affine_to_ints(curve, aff):
    f = curve.fp
    xs = f.to_int(aff.x)
    ys = f.to_int(aff.y)
    return [None if x == 0 and y == 0 else (x, y) for x, y in zip(xs, ys)]


@pytest.mark.parametrize("name", ["bn254_g1", "grumpkin_g1"])
def test_add_double_vs_oracle(name):
    curve = curve_ops(cs.get_curve(name))
    p = curve.spec.fp.modulus
    a = curve.spec.a % p
    pts1 = rand_points(curve, 6, 1)
    pts2 = rand_points(curve, 6, 2)
    # splice in edge cases: P+P, P+(-P), P+inf, inf+Q, inf+inf
    pts1 += [pts1[0], pts1[1], pts1[2], None, None]
    pts2 += [pts1[0], (pts1[1][0], (-pts1[1][1]) % p), None, pts2[2], None]

    P = curve.from_affine(pts_to_device(curve, pts1))
    Q = curve.from_affine(pts_to_device(curve, pts2))
    got = affine_to_ints(curve, curve.to_affine(curve.add(P, Q)))
    expect = [oracle_add(u, v, p, a) for u, v in zip(pts1, pts2)]
    assert got == expect

    got_mixed = affine_to_ints(
        curve, curve.to_affine(curve.add_mixed(P, pts_to_device(curve, pts2))))
    assert got_mixed == expect

    got_dbl = affine_to_ints(curve, curve.to_affine(curve.double(P)))
    assert got_dbl == [oracle_add(u, u, p, a) for u in pts1]


def test_on_curve_and_generator():
    curve = curve_ops(cs.get_curve("bn254_g1"))
    g = curve.generator_affine()
    assert bool(np.asarray(curve.on_curve_affine(g)))
    bad = Affine(g.x, curve.fp.add(g.y, curve.fp.ones()))
    assert not bool(np.asarray(curve.on_curve_affine(bad)))


def test_scalar_mul_vs_oracle():
    curve = curve_ops(cs.get_curve("bn254_g1"))
    p = curve.spec.fp.modulus
    a = curve.spec.a % p
    g = (curve.spec.gx, curve.spec.gy)
    rng = random.Random(3)
    ks = [0, 1, 2, rng.randrange(curve.spec.fr.modulus),
          curve.spec.fr.modulus - 1]
    P = curve.from_affine(pts_to_device(curve, [g] * len(ks)))
    k_dev = curve.fr.from_int(ks, mont=False)
    got = affine_to_ints(curve, curve.to_affine(curve.scalar_mul(P, k_dev)))
    expect = [oracle_mul(g, k, p, a) for k in ks]
    assert got == expect
    # order * G == infinity
    k_ord = curve.fr.from_int([curve.spec.fr.modulus], mont=False)
    one = curve.from_affine(pts_to_device(curve, [g]))
    res = curve.scalar_mul(one, k_ord, nbits=curve.spec.fr.modulus.bit_length() + 1)
    assert bool(np.asarray(curve.is_inf_jac(res))[0])


@pytest.mark.parametrize("name", ["bls24_315_g1", "bls24_317_g1",
                                  "bw6_761_g1", "bw6_633_g1"])
def test_new_curves_generator_and_order(name):
    curve = curve_ops(cs.get_curve(name))
    g = curve.generator_affine()
    assert bool(np.asarray(curve.on_curve_affine(g)))
    gb = Affine(curve.fp.broadcast_to(g.x, (1,)),
                curve.fp.broadcast_to(g.y, (1,)))
    r = curve.spec.fr.modulus
    res = curve.scalar_mul(curve.from_affine(gb),
                           curve.fr.from_int([r], mont=False, reduce=False),
                           nbits=r.bit_length() + 1)
    assert bool(np.asarray(curve.is_inf_jac(res))[0])
