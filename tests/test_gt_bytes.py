"""GT byte-codec tests: gnark layout round-trips + golden pairing vectors.

The golden fixtures (tests/fixtures/gt_golden.json) are produced by the
INDEPENDENT exact-arithmetic oracle (tests/gt_oracle.py: single-variable
quotient ring, textbook affine Miller loop, direct-pow final exponentiation
with the reference's documented cofactors) — so byte equality here proves
the whole device pairing stack bit-exact end-to-end, per SURVEY §7 phase 5
("pairing correctness = GT byte encoding match", e12.go:663).
"""

import json
import os

import numpy as np
import pytest

from gnark_crypto_tpu.curve.jacobian import Affine, curve_ops
from gnark_crypto_tpu.io import gt_bytes
from gnark_crypto_tpu.pairing import api as papi
from gnark_crypto_tpu.specs import curve as cs

FAMILIES = ["bn254", "bls12_381", "bls12_377", "bls24_315", "bls24_317",
            "bw6_761", "bw6_633"]

_FIX = os.path.join(os.path.dirname(__file__), "fixtures", "gt_golden.json")


def _golden():
    with open(_FIX) as f:
        return json.load(f)


def _gens(name):
    g1 = curve_ops(cs.get_curve(f"{name}_g1"))
    if name.startswith("bw6"):
        g2 = curve_ops(cs.get_curve(f"{name}_g2"))
    else:
        from gnark_crypto_tpu.curve.g2 import g2_curve

        g2 = g2_curve(name)
    return g1, g2


def _pair_gen(name, a=1, b=1):
    g1, g2 = _gens(name)
    gp, gq = g1.generator_affine(), g2.generator_affine()
    P = Affine(g1.fp.broadcast_to(gp.x, (1,)),
               g1.fp.broadcast_to(gp.y, (1,)))
    QX = g2.fp.broadcast_to(gq.x, (1,))
    QY = g2.fp.broadcast_to(gq.y, (1,))
    if a != 1:
        P = g1.to_affine(g1.scalar_mul(
            g1.from_affine(P), g1.fr.from_int([a], mont=False), nbits=4))
        P = Affine(P.x, P.y)
    if b != 1:
        Qj = g2.scalar_mul(g2.from_affine(Affine(QX, QY)),
                           g2.fr.from_int([b], mont=False), nbits=4)
        Qa = g2.to_affine(Qj)
        QX, QY = Qa.x, Qa.y
    return papi.pair(name, P, QX, QY)


@pytest.mark.parametrize("name", FAMILIES)
def test_gt_golden_generator_pair(name):
    """pair(G1, G2) bytes == the independent oracle's (cross-implementation
    bit-exactness for Miller loop + final-exp chains + byte layout)."""
    z = _pair_gen(name)
    got = gt_bytes.gt_to_bytes(name, z)[0]
    assert got.hex() == _golden()[name]["generator"]
    # decode round-trip
    z2 = gt_bytes.gt_from_bytes(name, got)
    assert np.array_equal(np.asarray(z2),
                          np.asarray(z).reshape(np.asarray(z2).shape))


@pytest.mark.parametrize("name", ["bn254", "bw6_633"])
def test_gt_golden_scaled_pair(name):
    """e([5]P, [7]Q) bytes == oracle (exercises non-generator inputs)."""
    z = _pair_gen(name, a=5, b=7)
    got = gt_bytes.gt_to_bytes(name, z)[0]
    assert got.hex() == _golden()[name]["p5_q7"]


def test_gt_bytes_rejects_bad_input():
    with pytest.raises(ValueError):
        gt_bytes.gt_from_bytes("bn254", b"\x00" * 100)   # wrong size
    with pytest.raises(ValueError):
        # non-canonical coefficient (>= p)
        gt_bytes.gt_from_bytes("bn254", b"\xff" * gt_bytes.gt_size("bn254"))


def test_gt_bytes_batch():
    """Batched encode: one bytes per element, stable layout."""
    z = _pair_gen("bn254")
    two = np.stack([np.asarray(z), np.asarray(z)])
    bs = gt_bytes.gt_to_bytes("bn254", two)
    assert len(bs) == 2 and bs[0] == bs[1]
    assert len(bs[0]) == 384
