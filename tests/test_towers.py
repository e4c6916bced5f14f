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
