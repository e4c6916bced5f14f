"""Fiat-Shamir transcript tests (reference: fiat-shamir/transcript_test.go)
plus byte-level pins of the hashing sequence and kzg deriveGamma parity."""

import hashlib

import numpy as np
import pytest

from gnark_crypto_tpu.hashes.fiat_shamir import Transcript, TranscriptError


def _init_transcript():
    fs = Transcript(hashlib.sha256, ["alpha", "beta", "gamma"])
    vals = [b"v1", b"v2", b"v3", b"v4", b"v5", b"v6"]
    fs.bind("alpha", vals[0])
    fs.bind("alpha", vals[1])
    fs.bind("beta", vals[2])
    fs.bind("beta", vals[3])
    fs.bind("gamma", vals[4])
    fs.bind("gamma", vals[5])
    return fs


def test_transcript_basic_and_idempotent():
    """TestTranscript: challenges compute, and recompute identically."""
    fs = _init_transcript()
    alpha = fs.compute_challenge("alpha")
    beta = fs.compute_challenge("beta")
    gamma = fs.compute_challenge("gamma")
    assert alpha and beta and gamma
    assert fs.compute_challenge("alpha") == alpha
    assert fs.compute_challenge("beta") == beta
    assert fs.compute_challenge("gamma") == gamma


def test_transcript_byte_sequence():
    """Pin the exact hashing sequence (transcript.go:92-120):
    H(name || previous_value || bindings...)."""
    fs = _init_transcript()
    alpha = fs.compute_challenge("alpha")
    beta = fs.compute_challenge("beta")
    exp_alpha = hashlib.sha256(b"alpha" + b"v1" + b"v2").digest()
    assert alpha == exp_alpha
    exp_beta = hashlib.sha256(b"beta" + exp_alpha + b"v3" + b"v4").digest()
    assert beta == exp_beta
    exp_gamma = hashlib.sha256(b"gamma" + exp_beta + b"v5" + b"v6").digest()
    assert fs.compute_challenge("gamma") == exp_gamma


def test_nonexisting_challenge():
    fs = _init_transcript()
    with pytest.raises(TranscriptError):
        fs.compute_challenge("delta")
    with pytest.raises(TranscriptError):
        fs.bind("delta", b"x")


def test_wrong_order():
    """TestWrongOrder: beta before alpha must fail."""
    fs = _init_transcript()
    with pytest.raises(TranscriptError):
        fs.compute_challenge("beta")


def test_bind_to_computed_challenge():
    fs = _init_transcript()
    fs.compute_challenge("alpha")
    with pytest.raises(TranscriptError):
        fs.bind("alpha", b"test")


def test_duplicate_challenge():
    with pytest.raises(TranscriptError):
        Transcript(hashlib.sha256, ["alpha", "beta", "alpha"])


def test_new_challenge_after_construction():
    """TestNewChallenge + TestNewTranscriptVsNewChallenge."""
    fs = Transcript(hashlib.sha256, ["alpha"])
    fs.new_challenge("beta")
    with pytest.raises(TranscriptError):
        fs.new_challenge("alpha")
    fs.bind("alpha", b"v1")
    a1 = fs.compute_challenge("alpha")
    b1 = fs.compute_challenge("beta")

    fs2 = Transcript(hashlib.sha256, ["alpha", "beta"])
    fs2.bind("alpha", b"v1")
    assert fs2.compute_challenge("alpha") == a1
    assert fs2.compute_challenge("beta") == b1


def test_derive_gamma_byte_parity():
    """kzg deriveGamma (kzg.go:559): gamma == SetBytes(sha256("gamma" ||
    point.Marshal() || digest_i.Marshal()compressed || value_i.Marshal())).
    Recomputed here from raw bytes, independent of the Transcript class."""
    from gnark_crypto_tpu.curve.jacobian import Affine, curve_ops
    from gnark_crypto_tpu.io.marshal import PointCodec
    from gnark_crypto_tpu.protocols import kzg
    from gnark_crypto_tpu.specs import curve as cs

    name = "bn254"
    g1c = curve_ops(cs.get_curve(f"{name}_g1"))
    fr = g1c.fr
    r = fr.spec.modulus
    g = g1c.generator_affine()
    d0 = Affine(g1c.fp.broadcast_to(g.x, (1,)),
                g1c.fp.broadcast_to(g.y, (1,)))
    point = fr.from_int([12345], mont=False)
    claimed = fr.from_int([67890], mont=False)

    gamma = kzg._derive_gamma(name, point, [d0], [claimed])

    pt_b = fr.to_bytes_host(point, mont=False)[0]
    dig_b = PointCodec(g1c).to_bytes(d0)[0]       # compressed, like Marshal()
    val_b = fr.to_bytes_host(claimed, mont=False)[0]
    exp = hashlib.sha256(b"gamma" + pt_b + dig_b + val_b).digest()
    assert gamma == int.from_bytes(exp, "big") % r


def test_kzg_batch_proof_serialized_roundtrip_verify():
    """End-to-end interop fixture: a batch opening proof serialized in the
    gnark wire layout (compressed digests + H + claimed values) round-trips
    through deserialization and batch_verify_single_point — the gamma
    derived from the DESERIALIZED bytes must match the prover's, proving
    the transcript binds serialized (not in-memory) representations."""
    import random

    from gnark_crypto_tpu.curve.jacobian import Affine, curve_ops
    from gnark_crypto_tpu.io.marshal import PointCodec
    from gnark_crypto_tpu.protocols import kzg
    from gnark_crypto_tpu.specs import curve as cs

    name = "bn254"
    g1c = curve_ops(cs.get_curve(f"{name}_g1"))
    fr = g1c.fr
    rmod = fr.spec.modulus
    rng = random.Random(7)
    size, k = 8, 2
    srs = kzg.new_srs(name, size, 0xBEEF)
    polys = fr.from_int([rng.randrange(rmod) for _ in range(k * size)],
                        mont=False).reshape(k, size, -1)
    point = fr.from_int([rng.randrange(rmod)], mont=False)
    digests = [kzg.commit(name, srs.pk, polys[i]) for i in range(k)]
    bp = kzg.batch_open_single_point(name, srs.pk, polys, point,
                                     digests=digests)

    codec = PointCodec(g1c)
    # wire format: digests (compressed) || H (compressed) || claimed values
    wire = b"".join(codec.to_bytes(d)[0] for d in digests)
    wire += codec.to_bytes(bp.h)[0]
    for i in range(k):
        wire += fr.to_bytes_host(bp.claimed_values[i][None], mont=False)[0]

    # deserialize
    nb = codec.nb
    off = 0
    digests2 = []
    for _ in range(k):
        digests2.append(codec.from_bytes([wire[off:off + nb]]))
        off += nb
    h2 = codec.from_bytes([wire[off:off + nb]])
    off += nb
    nfr = fr.spec.n_bytes
    claimed2 = []
    for _ in range(k):
        claimed2.append(int.from_bytes(wire[off:off + nfr], "big"))
        off += nfr
    bp2 = kzg.BatchOpeningProof(
        h=h2, claimed_values=fr.from_int(claimed2, mont=False))

    ok = kzg.batch_verify_single_point(name, digests2, bp2, point, srs.vk)
    assert bool(np.asarray(ok))
