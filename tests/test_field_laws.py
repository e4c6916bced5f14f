"""Generic field-law property sweep over EVERY registered field spec.

The reference backs each of its 24 fields with ~69 gopter property tests
against math/big as oracle (ecc/bn254/fr/element_test.go:19-307, identical
files per field). This module is the TPU build's equivalent: one
parameterized sweep of ring/field laws, inverse/sqrt/Legendre edge cases,
Montgomery codec + byte-codec roundtrips, and reduction bounds — oracle =
Python ints — run by name for all 25 specs in specs/field.py (the
reference's 24 + grumpkin's second half of the bn254 2-cycle).
"""

import numpy as np
import pytest

from gnark_crypto_tpu.field.api import for_spec
from gnark_crypto_tpu.specs.field import all_fields

FIELDS = sorted(all_fields())


def _cases(q: int, rng) -> list:
    """Edge values + seeded randoms (element_test.go staticTestValues:
    0, 1, q-1, q-2, 2^k boundaries, limb-carry patterns, randoms)."""
    edge = [0, 1, 2, 3, q - 1, q - 2, q // 2, q // 2 + 1]
    for k in (1, 31, 32, 63, 64, q.bit_length() - 2):
        edge += [(1 << k) % q, ((1 << k) - 1) % q, (q - (1 << k)) % q]
    rnd = [int(rng.integers(0, 1 << 62)) % q for _ in range(16)]
    rnd += [int(rng.integers(0, 4)) * (q // 4) + int(rng.integers(0, 1 << 20))
            for _ in range(8)]
    vals = sorted({int(v) % q for v in edge} | {int(v) % q for v in rnd})
    return vals


@pytest.fixture(scope="module", params=FIELDS)
def fld(request):
    spec = all_fields()[request.param]
    eng = for_spec(spec)
    rng = np.random.default_rng(hash(request.param) % (1 << 32))
    vals = _cases(spec.modulus, rng)
    x = eng.from_int(vals)
    return spec, eng, vals, x


def _ints(eng, arr):
    return [int(v) for v in eng.to_int(arr)]


def test_codec_roundtrip_and_reduction(fld):
    """from_int -> to_int is the identity and every limb row is canonical
    (reduce-smaller-than-modulus property, element_test.go:284-307)."""
    spec, eng, vals, x = fld
    assert _ints(eng, x) == vals
    # byte codec (BigEndian SetBytes/Bytes, element.go:1000-1058)
    bs = eng.to_bytes_host(x)
    back = eng.from_bytes_host(bs)
    assert _ints(eng, back) == vals


def test_ring_laws(fld):
    """add/sub/mul/neg/double/square/halve vs the int oracle; results
    always reduced below q."""
    spec, eng, vals, x = fld
    q = spec.modulus
    n = len(vals)
    y = eng.from_int(vals[::-1])
    vy = vals[::-1]
    assert _ints(eng, eng.add(x, y)) == [(a + b) % q for a, b in zip(vals, vy)]
    assert _ints(eng, eng.sub(x, y)) == [(a - b) % q for a, b in zip(vals, vy)]
    assert _ints(eng, eng.mul(x, y)) == [a * b % q for a, b in zip(vals, vy)]
    assert _ints(eng, eng.neg(x)) == [(-a) % q for a in vals]
    assert _ints(eng, eng.double(x)) == [2 * a % q for a in vals]
    assert _ints(eng, eng.square(x)) == [a * a % q for a in vals]
    inv2 = pow(2, -1, q)
    assert _ints(eng, eng.halve(x)) == [a * inv2 % q for a in vals]
    # distributivity on the device side: x*(y+y) == x*y + x*y
    lhs = eng.mul(x, eng.add(y, y))
    rhs = eng.add(eng.mul(x, y), eng.mul(x, y))
    assert _ints(eng, lhs) == _ints(eng, rhs)
    assert n == len(vals)


def test_inverse_and_batch_inverse(fld):
    """x * x^-1 == 1 (x != 0), 0 -> 0 (gnark convention, element.go:1745);
    batch_inverse (Montgomery trick, element.go:666) matches."""
    spec, eng, vals, x = fld
    q = spec.modulus
    inv = eng.inverse(x)
    expect = [pow(a, -1, q) if a else 0 for a in vals]
    assert _ints(eng, inv) == expect
    binv = eng.batch_inverse(x)
    assert _ints(eng, binv) == expect


def test_exp_const(fld):
    """Windowed fixed exponentiation vs pow() (element.go:748 Exp)."""
    spec, eng, vals, x = fld
    q = spec.modulus
    for e in (0, 1, 2, 5, 64, q - 2):
        got = _ints(eng, eng.exp_const(x, e))
        assert got == [pow(a, e, q) for a in vals], f"exp {e}"


def test_sqrt_legendre(fld):
    """Legendre symbol vs Jacobi oracle; sqrt(x^2) squares back to x^2
    (Tonelli-Shanks/Sarkar chains, element.go:1511-1584)."""
    spec, eng, vals, x = fld
    q = spec.modulus
    if q == 2:
        pytest.skip("trivial")
    leg = _ints(eng, eng.legendre(x))   # field value: 0, 1 or q-1
    expect = [pow(a, (q - 1) // 2, q) for a in vals]
    assert leg == expect
    sq = eng.square(x)
    r, ok = eng.sqrt(sq)
    # sqrt returns SOME root for every square input: r^2 == x^2
    assert all(bool(v) for v in np.asarray(ok))
    assert _ints(eng, eng.square(r)) == _ints(eng, sq)
    # non-residues: has_root False, root 0
    nr, nr_ok = eng.sqrt(x)
    assert [bool(v) for v in np.asarray(nr_ok)] == \
        [e != q - 1 for e in expect]
    is_sq = np.asarray(eng.is_square(x))
    assert [bool(v) for v in is_sq] == [e != q - 1 for e in expect]


def test_mul_const_and_sums(fld):
    """mul_const small-int chains + sum_reduce/inner_product bulk ops
    (vector.go:289-393 Sum/InnerProduct)."""
    spec, eng, vals, x = fld
    q = spec.modulus
    for cst in (3, 5, 13):
        assert _ints(eng, eng.mul_const(x, cst)) == \
            [a * cst % q for a in vals]
    s = eng.sum_reduce(x)
    assert int(eng.to_int(eng.reshape(s, (1,)))[0]) == sum(vals) % q
    y = eng.from_int(vals[::-1])
    ip = eng.inner_product(x, y)
    assert int(eng.to_int(eng.reshape(ip, (1,)))[0]) == \
        sum(a * b for a, b in zip(vals, vals[::-1])) % q
