"""Encoder/Decoder + SRS dump round-trips."""

import io
import random

import numpy as np
import pytest

from gnark_crypto_tpu.curve.jacobian import curve_ops
from gnark_crypto_tpu.io.serialization import (Decoder, Encoder, read_dump,
                                               write_dump)
from gnark_crypto_tpu.specs import curve as cs
from gnark_crypto_tpu.specs import field as fs
from tests.test_curve_g1 import pts_to_device, rand_points


def test_fr_vector_roundtrip():
    spec = fs.BN254_FR
    rng = random.Random(1)
    vals = [rng.randrange(spec.modulus) for _ in range(10)]
    eng = curve_ops(cs.get_curve("bn254_g1")).fr
    buf = io.BytesIO()
    Encoder(buf).encode_fr_vector(spec, eng.from_int(vals, mont=False))
    buf.seek(0)
    back = Decoder(buf).decode_fr_vector(spec)
    assert eng.to_int(back, mont=False) == vals


@pytest.mark.parametrize("raw", [False, True])
def test_point_stream_roundtrip(raw):
    curve = curve_ops(cs.get_curve("bn254_g1"))
    pts = pts_to_device(curve, rand_points(curve, 4, seed=51) + [None])
    buf = io.BytesIO()
    Encoder(buf, raw=raw).encode_points("bn254_g1", pts)
    buf.seek(0)
    back = Decoder(buf, subgroup_check=False).decode_points("bn254_g1")
    assert np.array_equal(np.asarray(back.x), np.asarray(pts.x))
    assert np.array_equal(np.asarray(back.y), np.asarray(pts.y))


def test_srs_dump_roundtrip():
    from gnark_crypto_tpu.protocols import kzg

    srs = kzg.new_srs("bn254", 4, 0xBEEF)
    buf = io.BytesIO()
    write_dump(buf, "bn254", srs)
    buf.seek(0)
    back = read_dump(buf, "bn254")
    assert np.array_equal(np.asarray(back.pk.g1.x), np.asarray(srs.pk.g1.x))
    assert np.array_equal(np.asarray(back.vk.alpha_g2.x),
                          np.asarray(srs.vk.alpha_g2.x))
    assert np.array_equal(np.asarray(back.vk.g1.y), np.asarray(srs.vk.g1.y))
