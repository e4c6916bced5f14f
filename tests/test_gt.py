"""GT (target group) ops: membership check + exponentiation facade
(reference E12.IsInSubGroup e12.go:729, CyclotomicExp:512, ExpGLV:552)."""

import random

import numpy as np
import pytest

from gnark_crypto_tpu.pairing import api
from gnark_crypto_tpu.pairing.pairing12 import get_ctx
from gnark_crypto_tpu.specs.curve import get_curve


def _gt_elements(name, n, seed):
    """(cyclotomic-but-not-GT, GT) element batches for a pairing family."""
    tw = get_ctx(name).tower
    e12 = tw.e12
    rng = random.Random(seed)
    p = tw.p

    def r2():
        return (rng.randrange(p), rng.randrange(p))

    import jax.numpy as jnp
    vals = [tuple(tuple(r2() for _ in range(3)) for _ in range(2))
            for _ in range(n)]
    x = jnp.stack([e12.from_int(v) for v in vals])
    y = e12.mul(tw.conjugate(x), e12.inverse(x))     # ^(p^6-1)
    y = e12.mul(tw.frobenius_square(y), y)           # ^(p^2+1): cyclotomic
    r = get_curve(f"{name}_g1").fr.modulus
    cof = (p**4 - p**2 + 1) // r
    z = e12.exp_const(y, cof)                        # order r: GT proper
    return x, y, z


@pytest.mark.parametrize("name", ["bn254", "bls12_377"])
def test_gt_is_in_subgroup(name):
    x, y, z = _gt_elements(name, 2, 3)
    assert np.asarray(api.gt_is_in_subgroup(name, z)).all()
    # cyclotomic but wrong order -> rejected
    assert not np.asarray(api.gt_is_in_subgroup(name, y)).any()
    # not even cyclotomic -> rejected
    assert not np.asarray(api.gt_is_in_subgroup(name, x)).any()


@pytest.mark.parametrize("name", ["bn254"])
def test_gt_exp_facade(name):
    tw = get_ctx(name).tower
    e12 = tw.e12
    _, _, z = _gt_elements(name, 2, 4)
    e_small = 0xABCDEF0123456789
    assert np.array_equal(np.asarray(api.gt_exp(name, z, e_small)),
                          np.asarray(e12.exp_const(z, e_small)))
    e_big = get_curve(f"{name}_g1").fr.modulus - 12345  # GLV route
    assert np.array_equal(np.asarray(api.gt_exp(name, z, e_big)),
                          np.asarray(e12.exp_const(z, e_big)))
