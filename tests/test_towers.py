"""Tower algebra tests: field laws, Frobenius, cyclotomic ops (fptower parity)."""

import random

import numpy as np
import pytest

from gnark_crypto_tpu.towers.tower12 import get_tower

TOWERS = ["bn254", "bls12_377"]


def rand_e12(tw, n, seed):
    rng = random.Random(seed)
    p = tw.p

    def re2():
        return (rng.randrange(p), rng.randrange(p))

    vals = [tuple(tuple(re2() for _ in range(3)) for _ in range(2))
            for _ in range(n)]
    import jax.numpy as jnp
    return jnp.stack([tw.e12.from_int(v) for v in vals]), vals


@pytest.mark.parametrize("name", TOWERS)
def test_field_laws(name):
    tw = get_tower(name)
    e12 = tw.e12
    x, _ = rand_e12(tw, 4, 1)
    y, _ = rand_e12(tw, 4, 2)
    z, _ = rand_e12(tw, 4, 3)
    lhs = e12.mul(x, e12.mul(y, z))
    rhs = e12.mul(e12.mul(x, y), z)
    assert np.array_equal(np.asarray(lhs), np.asarray(rhs))
    # distributivity
    lhs = e12.mul(x, e12.add(y, z))
    rhs = e12.add(e12.mul(x, y), e12.mul(x, z))
    assert np.array_equal(np.asarray(lhs), np.asarray(rhs))
    # square == mul
    assert np.array_equal(np.asarray(e12.square(x)), np.asarray(e12.mul(x, x)))
    # inverse
    one = e12.broadcast_to(e12.ones(), (4,))
    assert np.array_equal(np.asarray(e12.mul(x, e12.inverse(x))),
                          np.asarray(one))


@pytest.mark.parametrize("name", TOWERS)
def test_frobenius(name):
    tw = get_tower(name)
    e12 = tw.e12
    x, _ = rand_e12(tw, 2, 4)
    fr1 = tw.frobenius(x)
    assert np.array_equal(np.asarray(fr1), np.asarray(e12.exp_const(x, tw.p)))
    fr2 = tw.frobenius_square(x)
    assert np.array_equal(np.asarray(fr2), np.asarray(tw.frobenius(fr1)))
    fr3 = tw.frobenius_cube(x)
    assert np.array_equal(np.asarray(fr3), np.asarray(tw.frobenius(fr2)))


@pytest.mark.parametrize("name", TOWERS)
def test_cyclotomic(name):
    tw = get_tower(name)
    e12 = tw.e12
    x, _ = rand_e12(tw, 2, 5)
    # project into the cyclotomic subgroup: y = x^(p^6-1)(p^2+1)
    y = e12.mul(tw.conjugate(x), e12.inverse(x))     # x^(p^6-1)
    y = e12.mul(tw.frobenius_square(y), y)           # ^(p^2+1)
    got = tw.cyclotomic_square(y)
    expect = e12.square(y)
    assert np.array_equal(np.asarray(got), np.asarray(expect))
    # cyclotomic inverse == conjugate
    assert np.array_equal(
        np.asarray(e12.mul(y, tw.inverse_cyclotomic(y))),
        np.asarray(e12.broadcast_to(e12.ones(), (2,))))
    # exp ladder
    assert np.array_equal(np.asarray(tw.exp_cyclotomic(y, 13)),
                          np.asarray(e12.exp_const(y, 13)))


def _cyclotomic(tw, n, seed):
    e12 = tw.e12
    x, _ = rand_e12(tw, n, seed)
    y = e12.mul(tw.conjugate(x), e12.inverse(x))     # x^(p^6-1)
    return e12.mul(tw.frobenius_square(y), y)        # ^(p^2+1)


@pytest.mark.parametrize("name", TOWERS)
def test_karabina_compressed_square(name):
    """Compressed squaring chain + decompress == plain cyclotomic squares
    (e12.go:142/:226 parity)."""
    tw = get_tower(name)
    e12 = tw.e12
    y = _cyclotomic(tw, 3, 7)
    # one compressed square
    got = tw.decompress_karabina(tw.cyclotomic_square_compressed(y))
    expect = tw.cyclotomic_square(y)
    assert np.array_equal(np.asarray(got), np.asarray(expect))
    # chained compressed squares, single decompression at the end
    z = y
    for _ in range(4):
        z = tw.cyclotomic_square_compressed(z)
    got4 = tw.decompress_karabina(z)
    expect4 = y
    for _ in range(4):
        expect4 = tw.cyclotomic_square(expect4)
    assert np.array_equal(np.asarray(got4), np.asarray(expect4))


@pytest.mark.parametrize("name", TOWERS)
def test_karabina_decompress_identity(name):
    """x == 1 (g2 == g3 == 0) decompresses to 1 (e12.go:232 edge case)."""
    tw = get_tower(name)
    e12 = tw.e12
    one = e12.broadcast_to(e12.ones(), (2,))
    got = tw.decompress_karabina(tw.cyclotomic_square_compressed(one))
    assert np.array_equal(np.asarray(got), np.asarray(one))


@pytest.mark.parametrize("name", TOWERS)
def test_torus_roundtrip(name):
    """decompress(compress(z)) == z for norm-1 elements (e12.go:748/:798)."""
    tw = get_tower(name)
    z = _cyclotomic(tw, 3, 8)
    got = tw.decompress_torus(tw.compress_torus(z))
    assert np.array_equal(np.asarray(got), np.asarray(z))


@pytest.mark.parametrize("name", TOWERS)
def test_gt_exp(name):
    """gt_exp (NAF CyclotomicExp e12.go:512) and gt_exp_glv (ExpGLV
    e12.go:552) vs the generic ladder."""
    tw = get_tower(name)
    e12 = tw.e12
    y = _cyclotomic(tw, 2, 9)
    e = 0xDEADBEEFCAFEBABE1234
    expect = np.asarray(e12.exp_const(y, e))
    assert np.array_equal(np.asarray(tw.gt_exp(y, e)), expect)
    # negative exponent: x^-e == conjugate(x)^e in the cyclotomic subgroup
    inv = np.asarray(tw.gt_exp(y, -e))
    prod = e12.mul(tw.gt_exp(y, e), np.asarray(inv))
    one = e12.broadcast_to(e12.ones(), (2,))
    assert np.array_equal(np.asarray(prod), np.asarray(one))
    # GLV path needs a true GT element (order r: frobenius == ^p mod r);
    # project from the cyclotomic subgroup by the cofactor phi_12(p)/r
    from gnark_crypto_tpu.specs.curve import get_curve
    p, r = tw.p, get_curve(f"{name}_g1").fr.modulus
    cof = (p**4 - p**2 + 1) // r
    z = e12.exp_const(y, cof)
    big = 0x30644E72E131A029B85045B68181585D2833E84879B9709143E1F593EFFFFF
    assert np.array_equal(np.asarray(tw.gt_exp_glv(z, big)),
                          np.asarray(e12.exp_const(z, big)))
