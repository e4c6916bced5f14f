"""Endomorphism-based IsInSubGroup vs known members / non-members.

Members come from hash_to_g1/g2 (cofactor cleared); non-members are the
same field points mapped to the curve WITHOUT cofactor clearing (on-curve,
but in the full E(Fp) group — reference semantics: g1.go:635 IsInSubGroup
must reject them)."""

import numpy as np
import pytest

from gnark_crypto_tpu.curve import subgroup
from gnark_crypto_tpu.curve.jacobian import curve_ops
from gnark_crypto_tpu.hashes import hash_to_curve as h2c
from gnark_crypto_tpu.specs import curve as cs

_DST = b"SUBGROUP_TEST"


def _mask(curve, pts):
    return np.asarray(subgroup.is_in_subgroup(curve, pts))


@pytest.mark.parametrize("fam", ["bls12_381", "bls12_377", "bls24_315",
                                 "bls24_317", "bw6_761", "bw6_633"])
def test_g1_fast_subgroup_check(fam):
    curve = curve_ops(cs.get_curve(f"{fam}_g1"))
    assert subgroup.has_fast_check(curve)
    good = h2c.hash_to_g1(fam, b"member", _DST)
    assert _mask(curve, good).all()
    u = h2c.hash_to_field(curve.spec.fp, b"nonmember", _DST, 2)
    raw = h2c.map_to_g1(curve.spec, curve.fp.from_int(u))
    assert np.asarray(curve.on_curve_affine(raw)).all()
    assert not _mask(curve, raw).any()


@pytest.mark.parametrize("fam", ["bn254", "bls12_381", "bls12_377",
                                 "bls24_315", "bls24_317", "bw6_761",
                                 "bw6_633"])
def test_g2_fast_subgroup_check(fam):
    from gnark_crypto_tpu.curve.g2 import g2_curve
    curve = g2_curve(fam)
    assert subgroup.has_fast_check(curve)
    good = h2c.hash_to_g2(fam, b"member", _DST)
    assert _mask(curve, good).all()
    u = h2c.hash_to_field_e2(fam, b"nonmember", _DST, 2)
    raw = h2c.map_to_g2(fam, curve.fp.from_int(u))
    assert np.asarray(curve.on_curve_affine(raw)).all()
    assert not _mask(curve, raw).any()


def test_bn254_g1_prime_order():
    curve = curve_ops(cs.get_curve("bn254_g1"))
    assert subgroup.has_fast_check(curve)
    good = h2c.hash_to_g1("bn254", b"member", _DST)
    assert _mask(curve, good).all()


def test_identity_is_member():
    curve = curve_ops(cs.get_curve("bls12_381_g1"))
    inf = curve.inf_affine((2,))
    assert _mask(curve, inf).all()
