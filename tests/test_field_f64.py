"""Goldilocks 2x32 engine (field/f64.py) vs Python-int oracle.

Counterpart of the reference's goldilocks element tests
(/root/reference/field/goldilocks/element_test.go)."""

import random

import numpy as np
import pytest

from gnark_crypto_tpu.field import f64
from gnark_crypto_tpu.specs import field as fs

SPEC = fs.GOLDILOCKS
Q = SPEC.modulus


def rand_elems(n, seed):
    rng = random.Random(seed)
    # edges stressing the 2^64 ≡ 2^32 - 1 reduction and word boundaries
    edge = [0, 1, 2, Q - 1, Q - 2, (Q - 1) // 2, SPEC.r % Q,
            0xFFFFFFFF, 1 << 32, (1 << 32) - 1, Q - (1 << 32), 1 << 63]
    vals = edge[: min(len(edge), n)]
    vals += [rng.randrange(Q) for _ in range(n - len(vals))]
    return vals


def test_spec_shape():
    assert SPEC.n_limbs == 2 and SPEC.limb_bits == 32
    from gnark_crypto_tpu.field.api import for_spec
    eng = for_spec(SPEC)
    assert eng.elem_dims == 1
    assert eng._impl is f64


def test_ring_ops():
    a = rand_elems(64, 1)
    b = rand_elems(64, 2)
    x, y = f64.from_int(SPEC, a), f64.from_int(SPEC, b)
    assert f64.to_int(SPEC, x) == a
    assert f64.to_int(SPEC, f64.add(SPEC, x, y)) == [
        (u + v) % Q for u, v in zip(a, b)]
    assert f64.to_int(SPEC, f64.sub(SPEC, x, y)) == [
        (u - v) % Q for u, v in zip(a, b)]
    assert f64.to_int(SPEC, f64.neg(SPEC, x)) == [(-u) % Q for u in a]
    assert f64.to_int(SPEC, f64.mul(SPEC, x, y)) == [
        (u * v) % Q for u, v in zip(a, b)]
    assert f64.to_int(SPEC, f64.square(SPEC, x)) == [u * u % Q for u in a]
    assert f64.to_int(SPEC, f64.halve(SPEC, x)) == [
        u * pow(2, -1, Q) % Q for u in a]
    assert f64.to_int(SPEC, f64.mul_const(SPEC, x, 7)) == [
        u * 7 % Q for u in a]


def test_exp_inv_sqrt():
    a = rand_elems(32, 3)
    x = f64.from_int(SPEC, a)
    e = 0xBEEF
    assert f64.to_int(SPEC, f64.exp_const(SPEC, x, e)) == [
        pow(u, e, Q) for u in a]
    assert f64.to_int(SPEC, f64.inverse(SPEC, x)) == [
        pow(u, -1, Q) if u else 0 for u in a]
    assert f64.to_int(SPEC, f64.batch_inverse(SPEC, x)) == [
        pow(u, -1, Q) if u else 0 for u in a]
    squares = [u * u % Q for u in a]
    r, ok = f64.sqrt(SPEC, f64.from_int(SPEC, squares))
    assert bool(np.all(np.asarray(ok)))
    for g, s in zip(f64.to_int(SPEC, r), squares):
        assert g * g % Q == s
    # non-residue detection
    nr = 7  # generator, odd order -> QNR since (Q-1)/2 odd factor...
    leg = f64.to_int(SPEC, f64.legendre(SPEC, f64.from_int(SPEC, [nr])))
    if leg[0] == Q - 1:
        _, ok2 = f64.sqrt(SPEC, f64.from_int(SPEC, [nr]))
        assert not bool(np.asarray(ok2)[0])


def test_reductions_predicates():
    a = rand_elems(33, 4)
    b = rand_elems(33, 5)
    x, y = f64.from_int(SPEC, a), f64.from_int(SPEC, b)
    assert f64.to_int(SPEC, f64.sum_reduce(SPEC, x)) == sum(a) % Q
    assert f64.to_int(SPEC, f64.inner_product(SPEC, x, y)) == (
        sum(u * v for u, v in zip(a, b)) % Q)
    assert list(np.asarray(f64.is_zero(SPEC, x))) == [v == 0 for v in a]
    assert list(np.asarray(f64.equal(SPEC, x, x))) == [True] * len(a)


def test_bytes():
    a = rand_elems(20, 6)
    x = f64.from_int(SPEC, a)
    bs = f64.to_bytes_host(SPEC, x)
    assert [int.from_bytes(v, "big") for v in bs] == a
    assert f64.to_int(SPEC, f64.from_bytes_host(SPEC, bs)) == a
    with pytest.raises(ValueError):
        f64.from_bytes_host(SPEC, [Q.to_bytes(8, "big")])


def test_mont_roundtrip():
    a = rand_elems(16, 7)
    x = f64.from_int(SPEC, a, mont=False)
    xm = f64.to_mont(SPEC, x)
    assert f64.to_int(SPEC, xm, mont=True) == a
    assert f64.to_int(SPEC, f64.from_mont(SPEC, xm), mont=False) == a
