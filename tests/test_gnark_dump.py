"""gnark WriteDump/ReadDump byte-format parity (kzg/marshal.go:78-114,
utils/unsafe/dump_slice.go)."""

import io

import numpy as np
import pytest

from gnark_crypto_tpu.io import gnark_dump
from gnark_crypto_tpu.protocols import kzg


def _aff_ints(codec_curve, pt):
    f = codec_curve.fp
    return (f.to_int(pt.x), f.to_int(pt.y))


@pytest.mark.parametrize("name", [
    "bn254", "bls12_381",
    pytest.param("bls12_377", marks=pytest.mark.slow),
    pytest.param("bls24_315", marks=pytest.mark.slow),
    pytest.param("bls24_317", marks=pytest.mark.slow),
    pytest.param("bw6_761", marks=pytest.mark.slow),
    pytest.param("bw6_633", marks=pytest.mark.slow),
])
def test_dump_roundtrip(name):
    srs = kzg.new_srs(name, 6, alpha=987654321)
    buf = io.BytesIO()
    gnark_dump.write_dump(buf, name, srs)
    data = buf.getvalue()

    # structural parity: total size must match the reference layout exactly
    from gnark_crypto_tpu.curve.g2 import g2_curve
    from gnark_crypto_tpu.curve.jacobian import curve_ops
    from gnark_crypto_tpu.io.marshal import PointCodec
    from gnark_crypto_tpu.pairing.lines import n_line_slots
    from gnark_crypto_tpu.specs.curve import get_curve

    g2codec = PointCodec(g2_curve(name))
    g1codec = PointCodec(curve_ops(get_curve(f"{name}_g1")))
    n64 = gnark_dump._n64(name)
    d = gnark_dump._n_coords(name)
    S = n_line_slots(name)
    coeff = 8 * n64 * d  # one line coefficient (R0 or R1)
    vk_bytes = 2 * (2 * g2codec.nb) + 2 * g1codec.nb + 2 * 2 * S * 2 * coeff
    expect = vk_bytes + 8 + 8 + 6 * 16 * n64
    assert len(data) == expect, (len(data), expect)
    # marker sits right after the VK
    assert data[vk_bytes:vk_bytes + 8] == bytes.fromhex("efbeadde00000000")
    # uint64 LE count
    assert data[vk_bytes + 8:vk_bytes + 16] == (6).to_bytes(8, "little")

    srs2, lines = gnark_dump.read_dump(io.BytesIO(data), name)
    g1c = curve_ops(get_curve(f"{name}_g1"))
    assert _aff_ints(g1c, srs2.pk.g1) == _aff_ints(g1c, srs.pk.g1)
    g2c = g2_curve(name)
    assert _aff_ints(g2c, srs2.vk.g2) == _aff_ints(g2c, srs.vk.g2)
    assert _aff_ints(g2c, srs2.vk.alpha_g2) == _aff_ints(g2c, srs.vk.alpha_g2)

    # lines read back from the file must equal a fresh precompute
    from gnark_crypto_tpu.pairing.lines import precompute_lines
    import jax.numpy as jnp

    qx = jnp.concatenate([srs.vk.g2.x, srs.vk.alpha_g2.x], axis=0)
    qy = jnp.concatenate([srs.vk.g2.y, srs.vk.alpha_g2.y], axis=0)
    fresh = precompute_lines(name, qx, qy)
    assert np.array_equal(np.asarray(lines.r0), np.asarray(fresh.r0))
    assert np.array_equal(np.asarray(lines.r1), np.asarray(fresh.r1))


def test_dump_max_points():
    """maxPkPoints truncation on both sides (kzg/marshal.go:79-82,110)."""
    name = "bn254"
    srs = kzg.new_srs(name, 6, alpha=1234567)
    buf = io.BytesIO()
    gnark_dump.write_dump(buf, name, srs, max_pk_points=4)
    srs2, _ = gnark_dump.read_dump(io.BytesIO(buf.getvalue()), name)
    assert np.asarray(srs2.pk.g1.x).shape[0] == 4

    buf2 = io.BytesIO()
    gnark_dump.write_dump(buf2, name, srs)
    srs3, _ = gnark_dump.read_dump(io.BytesIO(buf2.getvalue()), name,
                                   max_pk_points=3)
    assert np.asarray(srs3.pk.g1.x).shape[0] == 3


def test_dump_bad_marker():
    name = "bn254"
    srs = kzg.new_srs(name, 4, alpha=42)
    buf = io.BytesIO()
    gnark_dump.write_dump(buf, name, srs)
    data = bytearray(buf.getvalue())
    # corrupt the marker (simulates the big-endian-arch rejection)
    idx = data.find(bytes.fromhex("efbeadde00000000"))
    data[idx] ^= 0xFF
    with pytest.raises(ValueError):
        gnark_dump.read_dump(io.BytesIO(bytes(data)), name)


def test_kzg_verify_with_file_lines():
    """End-to-end: commit/open, then verify using the line tables READ FROM
    THE DUMP (the reference's verify always uses vk.Lines)."""
    import dataclasses

    name = "bn254"
    srs = kzg.new_srs(name, 8, alpha=55443322)
    buf = io.BytesIO()
    gnark_dump.write_dump(buf, name, srs)
    srs2, lines = gnark_dump.read_dump(io.BytesIO(buf.getvalue()), name)
    vk = dataclasses.replace(srs2.vk, lines=lines)

    from gnark_crypto_tpu.specs.curve import get_curve
    r = get_curve("bn254_g1").fr.modulus
    poly = [3, 1, 4, 1, 5, 9, 2, 6]
    from gnark_crypto_tpu.curve.jacobian import curve_ops
    g1c = curve_ops(get_curve("bn254_g1"))
    pv = g1c.fr.from_int(poly, mont=False)
    c = kzg.commit(name, srs2.pk, pv)
    point = g1c.fr.from_int([77], mont=False)
    proof = kzg.open_poly(name, srs2.pk, pv, point)
    ok = kzg.verify(name, c, proof, point, vk)
    assert bool(np.asarray(ok))
    # tampered claimed value must fail
    bad = dataclasses.replace(
        proof, claimed_value=g1c.fr.from_int([123456], mont=False))
    assert not bool(np.asarray(kzg.verify(name, c, bad, point, vk)))
