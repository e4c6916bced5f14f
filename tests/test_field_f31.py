"""31-bit field engine (babybear/koalabear) vs Python-int oracle."""

import random

import numpy as np
import pytest

from gnark_crypto_tpu.field import f31
from gnark_crypto_tpu.specs import field as fs

SPECS = [fs.BABYBEAR, fs.KOALABEAR]
IDS = [s.name for s in SPECS]


def rand_elems(spec, n, seed):
    rng = random.Random(seed)
    q = spec.modulus
    edge = [0, 1, 2, q - 1, q - 2, (q - 1) // 2]
    vals = edge[: min(len(edge), n)]
    vals += [rng.randrange(q) for _ in range(n - len(vals))]
    return vals


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_ring_ops(spec):
    q = spec.modulus
    a = rand_elems(spec, 64, 1)
    b = rand_elems(spec, 64, 2)
    x, y = f31.from_int(spec, a), f31.from_int(spec, b)
    assert f31.to_int(spec, x) == a
    assert f31.to_int(spec, f31.add(spec, x, y)) == [(u + v) % q for u, v in zip(a, b)]
    assert f31.to_int(spec, f31.sub(spec, x, y)) == [(u - v) % q for u, v in zip(a, b)]
    assert f31.to_int(spec, f31.neg(spec, x)) == [(-u) % q for u in a]
    assert f31.to_int(spec, f31.mul(spec, x, y)) == [(u * v) % q for u, v in zip(a, b)]
    assert f31.to_int(spec, f31.halve(spec, x)) == [
        u * pow(2, -1, q) % q for u in a]
    assert f31.to_int(spec, f31.mul_const(spec, x, 5)) == [u * 5 % q for u in a]


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_exp_inv_sqrt(spec):
    q = spec.modulus
    a = rand_elems(spec, 32, 3)
    x = f31.from_int(spec, a)
    e = 0xBEEF
    assert f31.to_int(spec, f31.exp_const(spec, x, e)) == [pow(u, e, q) for u in a]
    assert f31.to_int(spec, f31.inverse(spec, x)) == [
        pow(u, -1, q) if u else 0 for u in a]
    assert f31.to_int(spec, f31.batch_inverse(spec, x)) == [
        pow(u, -1, q) if u else 0 for u in a]
    squares = [u * u % q for u in a]
    r, ok = f31.sqrt(spec, f31.from_int(spec, squares))
    assert bool(np.all(np.asarray(ok)))
    for g, s in zip(f31.to_int(spec, r), squares):
        assert g * g % q == s


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_reductions(spec):
    q = spec.modulus
    a = rand_elems(spec, 100, 4)
    b = rand_elems(spec, 100, 5)
    x, y = f31.from_int(spec, a), f31.from_int(spec, b)
    assert f31.to_int(spec, f31.sum_reduce(spec, x)) == sum(a) % q
    assert f31.to_int(spec, f31.inner_product(spec, x, y)) == (
        sum(u * v for u, v in zip(a, b)) % q)


def test_f31_bulk_codec_matches_python_path():
    """Vectorized uint32 byte codec (>=64 elems) == per-element path."""
    import random

    import numpy as np
    import pytest

    from gnark_crypto_tpu.field import f31
    from gnark_crypto_tpu.specs import field as fs

    spec = fs.KOALABEAR
    rng = random.Random(3)
    vals = [0, 1, spec.modulus - 1] + [rng.randrange(spec.modulus)
                                       for _ in range(97)]
    bufs = [v.to_bytes(4, "big") for v in vals]
    for m in (True, False):
        got = np.asarray(f31.from_bytes_host(spec, bufs, mont=m))
        expect = np.asarray(f31.from_int(spec, vals, mont=m))
        assert np.array_equal(got, expect)
        assert f31.to_bytes_host(spec, got, mont=m) == bufs
    with pytest.raises(ValueError):
        f31.from_bytes_host(spec, [spec.modulus.to_bytes(4, "big")] * 64)
