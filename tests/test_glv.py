"""GLV decomposition + endomorphism scalar mul vs the plain ladder."""

import random

import numpy as np
import pytest

from gnark_crypto_tpu.curve import glv
from gnark_crypto_tpu.curve.jacobian import curve_ops
from gnark_crypto_tpu.specs import curve as cs
from tests.test_curve_g1 import affine_to_ints, pts_to_device, rand_points


@pytest.mark.parametrize("name", ["bn254_g1", "secp256k1_g1", "bls12_381_g1"])
def test_decompose(name):
    spec = cs.get_curve(name)
    r = spec.fr.modulus
    lam = spec.glv_lambda
    rng = random.Random(1)
    bound = 4 * (1 << ((r.bit_length() + 1) // 2))  # ~sqrt(r) with slack
    for k in [0, 1, r - 1] + [rng.randrange(r) for _ in range(10)]:
        k1, k2 = glv.decompose_scalar(spec, k)
        assert (k1 + k2 * lam - k) % r == 0
        assert abs(k1) < bound and abs(k2) < bound


def test_glv_scalar_mul_matches_ladder():
    name = "bn254_g1"
    curve = curve_ops(cs.get_curve(name))
    r = curve.spec.fr.modulus
    rng = random.Random(2)
    pts = rand_points(curve, 4, seed=41)
    ks = [0, 1, r - 1, rng.randrange(r)]
    P = curve.from_affine(pts_to_device(curve, pts))
    got = affine_to_ints(curve, curve.to_affine(glv.scalar_mul_glv(curve, P, ks)))
    expect = affine_to_ints(curve, curve.to_affine(curve.scalar_mul(
        P, curve.fr.from_int(ks, mont=False))))
    assert got == expect


def test_bw6_g2_glv_scalar_mul():
    """BW6 G2 is a plain Fp curve with the same 2-dim GLV as G1
    (thirdRootOneG2 = thirdRootOneG1^2, bw6-761.go:128)."""
    from gnark_crypto_tpu.curve.g2 import g2_curve

    g2 = g2_curve("bw6_761")
    spec = g2.spec
    r = spec.fr.modulus
    # eigenvalue sanity: lambda^2 + lambda + 1 = 0 mod r (cube-root action)
    assert (spec.glv_lambda ** 2 + spec.glv_lambda + 1) % r == 0
    p = spec.fp.modulus
    assert pow(spec.glv_third_root, 3, p) == 1 and spec.glv_third_root != 1
    rng = random.Random(7)
    ks = [1, r - 1, rng.randrange(r)]
    g = g2.generator_affine()
    f = g2.fp
    gb = type(g)(f.broadcast_to(g.x, (len(ks),)),
                 f.broadcast_to(g.y, (len(ks),)))
    q = g2.from_affine(gb)
    got = affine_to_ints(g2, g2.to_affine(glv.scalar_mul_glv(g2, q, ks)))
    expect = affine_to_ints(g2, g2.to_affine(g2.scalar_mul(
        q, g2.fr.from_int(ks, mont=False))))
    assert got == expect


def test_bandersnatch_phi_eigenvalue():
    """phi(P) == [lambda]P on the prime subgroup
    (bandersnatch/endomorpism.go:11, curve.go:70)."""
    from gnark_crypto_tpu.curve.twistededwards import ted_curve

    c = ted_curve("bandersnatch")
    lam = c.spec.glv_lambda
    assert (lam * lam + 2) % c.spec.order == 0  # lambda^2 = -2 mod order
    g = c.from_affine(c.generator_affine((2,)))
    got = np.asarray(c.to_affine(c.phi(g)))
    expect = np.asarray(c.to_affine(c.scalar_mul_int(g, lam)))
    assert np.array_equal(got, expect)


def test_bandersnatch_glv_scalar_mul():
    """scalar_mul_glv vs the plain ladder (scalarMulGLV parity)."""
    from gnark_crypto_tpu.curve.twistededwards import ted_curve

    c = ted_curve("bandersnatch")
    r = c.spec.order
    rng = random.Random(3)
    ks = [0, 1, r - 1, rng.randrange(r)]
    g = c.from_affine(c.generator_affine((len(ks),)))
    got = np.asarray(c.to_affine(c.scalar_mul_glv(g, ks)))
    expect = np.asarray(c.to_affine(c.scalar_mul_int(g, ks)))
    assert np.array_equal(got, expect)


_SLOW = pytest.mark.skipif(
    not __import__("os").environ.get("GNARK_SLOW_TESTS"),
    reason="bls24 E4 kernels compile for ~30min on XLA:CPU; passed "
           "2026-08-18 (set GNARK_SLOW_TESTS=1 to run)")


@pytest.mark.parametrize("family", [
    "bn254", "bls12_381", "bls12_377",
    pytest.param("bls24_315", marks=_SLOW),
    pytest.param("bls24_317", marks=_SLOW)])
def test_g2_gls_scalar_mul(family):
    """4-dim GLV-GLS G2 mul vs the plain ladder (g2.go:934 mulGLS)."""
    from gnark_crypto_tpu.curve.g2 import g2_curve
    from gnark_crypto_tpu.curve.glv import scalar_mul_gls

    g2 = g2_curve(family)
    f = g2.fp
    r = g2.spec.fr.modulus
    rng = random.Random(6)
    ks = [1, r - 1, rng.randrange(r)]
    g = g2.generator_affine()
    gb = type(g)(f.broadcast_to(g.x, (len(ks),)),
                 f.broadcast_to(g.y, (len(ks),)))
    q = g2.from_affine(gb)
    got = np.asarray(g2.to_affine(scalar_mul_gls(family, q, ks)))
    expect = np.asarray(g2.to_affine(g2.scalar_mul(
        q, g2.fr.from_int(ks, mont=False))))
    assert np.array_equal(got, expect)
