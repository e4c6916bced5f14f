"""Pallas kernel differential tests (interpreter mode on CPU) — the
analogue of the reference's asm-vs-purego differential testing (SURVEY §4.4)."""

import random

import numpy as np
import pytest

from gnark_crypto_tpu.field import mont
from gnark_crypto_tpu.field.pallas.mont_mul import mont_mul
from gnark_crypto_tpu.specs import field as fs


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
