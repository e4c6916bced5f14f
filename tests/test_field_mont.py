"""Differential tests: generic Montgomery limb engine vs Python-int oracle.

Plays the role of the reference's gopter property tests with math/big as
oracle (/root/reference/ecc/bn254/fr/element_test.go).
"""

import random

import numpy as np
import pytest

from gnark_crypto_tpu.field import mont
from gnark_crypto_tpu.specs import field as fs

# one small, one medium, one wide field to cover limb configurations
# (goldilocks moved to the dedicated f64 engine — tests/test_field_f64.py)
SPECS = [fs.BN254_FR, fs.BLS12_381_FP, fs.BW6_761_FP, fs.SECP256K1_FR]
IDS = [s.name for s in SPECS]


def rand_elems(spec, n, seed):
    rng = random.Random(seed)
    q = spec.modulus
    edge = [0, 1, 2, q - 1, q - 2, (q - 1) // 2, spec.r % q, (q + 1) // 2]
    vals = edge[: min(len(edge), n)]
    vals += [rng.randrange(q) for _ in range(n - len(vals))]
    return vals


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_roundtrip(spec):
    vals = rand_elems(spec, 16, 1)
    x = mont.from_int(spec, vals)
    assert mont.to_int(spec, x) == vals


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_add_sub_neg(spec):
    q = spec.modulus
    a = rand_elems(spec, 32, 2)
    b = rand_elems(spec, 32, 3)
    x, y = mont.from_int(spec, a), mont.from_int(spec, b)
    assert mont.to_int(spec, mont.add(spec, x, y)) == [(u + v) % q for u, v in zip(a, b)]
    assert mont.to_int(spec, mont.sub(spec, x, y)) == [(u - v) % q for u, v in zip(a, b)]
    assert mont.to_int(spec, mont.neg(spec, x)) == [(-u) % q for u in a]
    assert mont.to_int(spec, mont.double(spec, x)) == [(2 * u) % q for u in a]
    assert mont.to_int(spec, mont.halve(spec, x)) == [
        (u * pow(2, -1, q)) % q for u in a
    ]


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_mul(spec):
    q = spec.modulus
    a = rand_elems(spec, 32, 4)
    b = rand_elems(spec, 32, 5)
    x, y = mont.from_int(spec, a), mont.from_int(spec, b)
    got = mont.to_int(spec, mont.mul(spec, x, y))
    assert got == [(u * v) % q for u, v in zip(a, b)]
    got_sq = mont.to_int(spec, mont.square(spec, x))
    assert got_sq == [(u * u) % q for u in a]


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_mont_roundtrip_and_const(spec):
    q = spec.modulus
    a = rand_elems(spec, 8, 6)
    x_raw = mont.from_int(spec, a, mont=False)
    x_m = mont.to_mont(spec, x_raw)
    assert mont.to_int(spec, x_m) == a
    back = mont.from_mont(spec, x_m)
    assert mont.to_int(spec, back, mont=False) == a
    for c in (3, 5, 13):
        got = mont.to_int(spec, mont.mul_const(spec, x_m, c))
        assert got == [(u * c) % q for u in a], c


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_exp_inverse(spec):
    q = spec.modulus
    a = rand_elems(spec, 8, 7)
    x = mont.from_int(spec, a)
    e = 0xDEADBEEF12345
    assert mont.to_int(spec, mont.exp_const(spec, x, e)) == [pow(u, e, q) for u in a]
    inv = mont.inverse(spec, x)
    expect = [pow(u, -1, q) if u else 0 for u in a]
    assert mont.to_int(spec, inv) == expect


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_batch_inverse(spec):
    q = spec.modulus
    a = rand_elems(spec, 16, 8)
    a[3] = 0  # keep a zero in the batch
    x = mont.from_int(spec, a)
    inv = mont.batch_inverse(spec, x)
    expect = [pow(u, -1, q) if u else 0 for u in a]
    assert mont.to_int(spec, inv) == expect


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_sqrt(spec):
    q = spec.modulus
    rng = random.Random(9)
    roots = [rng.randrange(q) for _ in range(8)]
    squares = [r * r % q for r in roots]
    x = mont.from_int(spec, squares)
    r, ok = mont.sqrt(spec, x)
    assert bool(np.all(np.asarray(ok)))
    got = mont.to_int(spec, r)
    for g, s in zip(got, squares):
        assert g * g % q == s
    # non-residue detection
    nr = None
    for c in range(2, 50):
        if pow(c, (q - 1) // 2, q) == q - 1:
            nr = c
            break
    x2 = mont.from_int(spec, [nr])
    _, ok2 = mont.sqrt(spec, x2)
    assert not bool(np.asarray(ok2)[0])


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_bytes_roundtrip(spec):
    a = rand_elems(spec, 8, 10)
    x = mont.from_int(spec, a)
    bs = mont.to_bytes_host(spec, x)
    assert all(len(b) == spec.n_bytes for b in bs)
    back = mont.from_bytes_host(spec, bs)
    assert mont.to_int(spec, back) == a
    with pytest.raises(ValueError):
        mont.from_bytes_host(spec, [spec.modulus.to_bytes(spec.n_bytes, "big")])


def test_legendre():
    spec = fs.BN254_FR
    q = spec.modulus
    vals = [0, 1, 4, 5]
    x = mont.from_int(spec, vals)
    got = mont.to_int(spec, mont.legendre(spec, x))
    assert got == [pow(v, (q - 1) // 2, q) for v in vals]


def test_np_codec_matches_python_path():
    """Vectorized numpy bytes<->limbs codec (field/mont_np.py, the bulk-IO
    tier) is bit-identical to the per-element bigint path, both directions,
    mont and plain, and rejects non-canonical encodings."""
    import random

    import numpy as np
    import pytest

    from gnark_crypto_tpu.field import mont, mont_np
    from gnark_crypto_tpu.specs import field as fs

    for spec in (fs.BN254_FR, fs.BLS12_381_FP, fs.SECP256K1_FR):
        rng = random.Random(hash(spec.name) & 0xFFFF)
        vals = [0, 1, spec.modulus - 1] + [rng.randrange(spec.modulus)
                                           for _ in range(13)]
        bs = [v.to_bytes(spec.n_bytes, "big") for v in vals]
        for m in (True, False):
            # decode: numpy path vs python path
            got = np.asarray(mont_np.from_bytes_np(spec, b"".join(bs),
                                                   len(bs), mont=m))
            expect = np.asarray(mont.from_int(spec, vals, mont=m))
            assert np.array_equal(got, expect), (spec.name, m)
            # encode roundtrip
            back = mont_np.to_bytes_np(spec, got, mont=m)
            assert back == b"".join(bs), (spec.name, m)
        # non-canonical rejection
        bad = (spec.modulus).to_bytes(spec.n_bytes, "big")
        with pytest.raises(ValueError):
            mont_np.from_bytes_np(spec, bad, 1)
        # threshold dispatch: big batch through the public API
        big = [rng.randrange(spec.modulus) for _ in range(80)]
        bufs = [v.to_bytes(spec.n_bytes, "big") for v in big]
        arr = mont.from_bytes_host(spec, bufs)
        assert mont.to_int(spec, arr) == big
        assert mont.to_bytes_host(spec, arr) == bufs
