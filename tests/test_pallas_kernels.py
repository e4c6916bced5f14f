"""Pallas kernel differential tests (interpreter mode on CPU) — the
analogue of the reference's asm-vs-purego differential testing (SURVEY §4.4)."""

import random

import numpy as np
import pytest

from gnark_crypto_tpu.field import mont
from gnark_crypto_tpu.field.pallas.mont_mul import mont_mul
from gnark_crypto_tpu.specs import field as fs


@pytest.mark.parametrize("name", ["bn254_g1", "secp256r1_g1"])
def test_pallas_jac_add_double_matches_engine(name):
    """Fused point kernels vs the XLA group law, incl. the complete-add
    edge cases (P==Q, P==-Q, infinities)."""
    from gnark_crypto_tpu.curve.jacobian import Jac, curve_ops
    from gnark_crypto_tpu.field.pallas.point_add import jac_add, jac_double
    from gnark_crypto_tpu.specs import curve as cs
    from tests.test_curve_g1 import pts_to_device, rand_points

    curve = curve_ops(cs.get_curve(name))
    p = curve.spec.fp.modulus
    pts1 = rand_points(curve, 4, 11)
    pts2 = rand_points(curve, 4, 12)
    pts1 += [pts1[0], pts1[1], pts1[2], None, None]
    pts2 += [pts1[0], (pts1[1][0], (-pts1[1][1]) % p), None, pts2[2], None]

    P = curve.from_affine(pts_to_device(curve, pts1))
    Q = curve.from_affine(pts_to_device(curve, pts2))
    expect = curve.add(P, Q)
    got = Jac(*jac_add(curve.spec.fp, curve.spec.a, *P, *Q,
                       interpret=True))
    assert bool(np.asarray(curve.eq_jac(got, expect)).all())
    # infinity stays canonically encoded (all-zero limbs)
    inf = np.asarray(curve.is_inf_jac(expect))
    assert np.asarray(got.z)[inf].max(initial=0) == 0

    expect_d = curve.double(P)
    got_d = Jac(*jac_double(curve.spec.fp, curve.spec.a, *P,
                            interpret=True))
    assert bool(np.asarray(curve.eq_jac(got_d, expect_d)).all())


def test_pallas_exp_matches_engine():
    """In-kernel square-and-multiply ladder (field/pallas/exp.py) vs the
    engine's bit-scan Fermat — incl. 0 -> 0 and the q-2 inverse path."""
    from gnark_crypto_tpu.field.pallas.exp import exp_const_pallas

    spec = fs.BN254_FR
    rng = random.Random(7)
    q = spec.modulus
    vals = [0, 1, q - 1] + [rng.randrange(q) for _ in range(5)]
    x = mont.from_int(spec, vals)
    for e in (q - 2, 3, (q - 1) // 2):
        got = exp_const_pallas(spec, x, e, interpret=True)
        expect = mont.exp_const(spec, x, e)
        assert np.array_equal(np.asarray(got), np.asarray(expect)), hex(e)


def test_pallas_fold_windows_matches_scan():
    """In-kernel Horner window fold vs the lax.scan fold (incl. infinity
    windows from group padding)."""
    import jax.numpy as jnp

    from gnark_crypto_tpu.curve.jacobian import Jac, curve_ops
    from gnark_crypto_tpu.field.pallas.point_add import jac_fold_windows
    from gnark_crypto_tpu.msm.pippenger import _fold_windows
    from gnark_crypto_tpu.specs import curve as cs
    from tests.test_curve_g1 import pts_to_device, rand_points

    curve = curve_ops(cs.get_curve("bn254_g1"))
    pts = rand_points(curve, 6, 21) + [None, None]  # inf totals too
    random.Random(3).shuffle(pts)
    T = curve.from_affine(pts_to_device(curve, pts))
    c = 4
    expect = _fold_windows(curve, T, c)
    ox, oy, oz = jac_fold_windows(curve.spec.fp, curve.spec.a,
                                  T.x, T.y, T.z, c, interpret=True)
    got = Jac(ox[0], oy[0], oz[0])
    assert bool(np.asarray(curve.eq_jac(got, expect)).all())


@pytest.mark.parametrize("spec", [fs.BN254_FR, fs.BLS12_381_FP],
                         ids=lambda s: s.name)
def test_pallas_mont_mul_matches_engine(spec):
    rng = random.Random(1)
    q = spec.modulus
    vals_a = [0, 1, q - 1] + [rng.randrange(q) for _ in range(13)]
    vals_b = [q - 1, 0, q - 2] + [rng.randrange(q) for _ in range(13)]
    x = mont.from_int(spec, vals_a)
    y = mont.from_int(spec, vals_b)
    got = mont_mul(spec, x, y, interpret=True)
    expect = mont.mul(spec, x, y)
    assert np.array_equal(np.asarray(got), np.asarray(expect))
    assert mont.to_int(spec, got) == [a * b % q for a, b in
                                      zip(vals_a, vals_b)]


def test_pallas_fp2_jac_add_double_fold_match_engine():
    """Fp2 Jacobian add/double + window fold kernels (interpret) vs the
    tower-engine curve ops on G2 points incl. infinity/double lanes."""
    import jax.numpy as jnp

    from gnark_crypto_tpu.curve.g2 import g2_curve
    from gnark_crypto_tpu.curve.jacobian import Affine, Jac
    from gnark_crypto_tpu.field.pallas.point_add2 import (jac_add2,
                                                          jac_double2,
                                                          jac_fold_windows2)
    from gnark_crypto_tpu.msm.pippenger import _fold_windows

    g2 = g2_curve("bn254")
    f = g2.fp
    g = g2.generator_affine()
    gb = Affine(f.broadcast_to(g.x, (1,)), f.broadcast_to(g.y, (1,)))

    def kmul(k):
        return g2.scalar_mul(g2.from_affine(gb),
                             g2.fr.from_int([k], mont=False), nbits=5)

    pts = [kmul(k) for k in (1, 2, 3, 5, 7, 11)]
    inf = g2.inf_jac((1,))
    A = [pts[0], pts[1], pts[2], inf, pts[3], inf]
    B = [pts[2], pts[1], g2.neg_jac(pts[2]), pts[4], inf, inf]

    def batch(ps):
        return Jac(*(jnp.concatenate([getattr(p, fld) for p in ps], axis=0)
                     for fld in ("x", "y", "z")))

    a, b = batch(A), batch(B)
    exp_add = g2.add(a, b)
    got = Jac(*jac_add2(g2.spec.fp, f.nr, a.x, a.y, a.z, b.x, b.y, b.z,
                        interpret=True))
    assert bool(np.asarray(g2.eq_jac(got, exp_add)).all())

    exp_dbl = g2.double(a)
    gotd = Jac(*jac_double2(g2.spec.fp, f.nr, a.x, a.y, a.z,
                            interpret=True))
    # infinity encodes as z == 0 in both; compare projectively where z != 0
    zmask = np.asarray(f.is_zero(exp_dbl.z))
    eq = np.asarray(g2.eq_jac(gotd, exp_dbl))
    assert bool((eq | zmask).all())
    assert np.array_equal(np.asarray(f.is_zero(gotd.z)), zmask)

    # fold: 6 windows incl. an infinity total
    T = batch([pts[4], inf, pts[0], pts[2], pts[1], pts[3]])
    c = 4
    expect = _fold_windows(g2, T, c)
    ox, oy, oz = jac_fold_windows2(g2.spec.fp, f.nr, T.x, T.y, T.z, c,
                                   interpret=True)
    gotf = Jac(ox[0], oy[0], oz[0])
    assert bool(np.asarray(g2.eq_jac(gotf, expect)).all())
