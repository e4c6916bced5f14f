"""EdDSA (twisted Edwards) + ECDSA sign/verify tests."""

import numpy as np
import pytest

from gnark_crypto_tpu.curve.twistededwards import ted_curve
from gnark_crypto_tpu.signature.ecdsa import ECDSA
from gnark_crypto_tpu.signature.eddsa import EdDSA


def test_ted_curve_basics():
    c = ted_curve("bn254")
    g = c.generator_affine((1,))
    assert bool(np.asarray(c.on_curve_affine(g))[0])
    ge = c.from_affine(g)
    # 2G via add == double
    d1 = c.to_affine(c.add(ge, ge))
    d2 = c.to_affine(c.double(ge))
    assert np.array_equal(np.asarray(d1.x), np.asarray(d2.x))
    # [order]G == identity (0,1)
    res = c.to_affine(c.scalar_mul_int(ge, [c.spec.order]))
    f = c.f
    assert f.to_int(res.x) == [0] and f.to_int(res.y) == [1]
    # serialization roundtrip
    pts = c.to_affine(c.scalar_mul_int(ge, [5]))
    bs = c.point_to_bytes(pts)
    back = c.point_from_bytes(bs)
    assert f.to_int(back.x) == f.to_int(pts.x)
    assert f.to_int(back.y) == f.to_int(pts.y)


@pytest.mark.parametrize("name", ["bn254", "bls12_377", "bls12_381",
                                  "bandersnatch", "bw6_761"])
def test_eddsa_sign_verify(name):
    ed = EdDSA(name)
    priv = ed.generate_key(b"\x01" * 32)
    msg = (123).to_bytes(32, "big")
    sig = ed.sign(priv, msg)
    assert ed.verify(priv.public_key, sig, msg)
    # wrong message fails
    assert not ed.verify(priv.public_key, sig, (124).to_bytes(32, "big"))
    # serialization roundtrip
    buf = ed.signature_to_bytes(sig)
    sig2 = ed.signature_from_bytes(buf)
    assert ed.verify(priv.public_key, sig2, msg)
    pk_buf = ed.public_key_to_bytes(priv.public_key)
    pub2 = ed.public_key_from_bytes(pk_buf)
    assert ed.verify(pub2, sig, msg)


def test_eddsa_rejects_malleable_signature():
    """Anti-malleability (eddsa/marshal.go SetBytes): s+order / s=0 /
    identity-R signatures must be rejected, not verified."""
    ed = EdDSA("bn254")
    priv = ed.generate_key(b"\x02" * 32)
    msg = (7).to_bytes(32, "big")
    sig = ed.sign(priv, msg)
    order = ed.curve.spec.order
    s_int = int.from_bytes(sig.s, "big")
    # s + order verifies identically mod order -> must be rejected
    mall = type(sig)(sig.r, (s_int + order).to_bytes(ed.nb, "big"))
    assert not ed.verify(priv.public_key, mall, msg)
    with pytest.raises(ValueError):
        ed.signature_from_bytes(ed.signature_to_bytes(mall))
    # s == 0
    zero = type(sig)(sig.r, (0).to_bytes(ed.nb, "big"))
    assert not ed.verify(priv.public_key, zero, msg)
    with pytest.raises(ValueError):
        ed.signature_from_bytes(ed.signature_to_bytes(zero))
    # identity R
    c = ed.curve
    ident = c.to_affine(c.scalar_mul_int(
        c.from_affine(c.generator_affine((1,))), [order]))
    assert not ed.verify(priv.public_key, type(sig)(ident, sig.s), msg)


def test_ecdsa_rejects_infinity_pubkey():
    """Public-key validation: the point at infinity must not verify
    (standard ECDSA key validation; ADVICE r1)."""
    from gnark_crypto_tpu.curve.jacobian import Affine
    from gnark_crypto_tpu.signature.ecdsa import PublicKey

    e = ECDSA("secp256k1_g1")
    priv = e.generate_key(b"seed")
    msg = b"msg"
    sig = e.sign(msg, priv)
    c = e.curve
    inf = PublicKey(Affine(c.fp.zeros((1,)), c.fp.zeros((1,))))
    assert not e.verify(msg, sig, inf)


@pytest.mark.parametrize("curve", ["secp256k1_g1", "bn254_g1", "stark_g1",
                                   "secp256r1_g1"])
def test_ecdsa_sign_verify(curve):
    e = ECDSA(curve)
    priv = e.generate_key(b"seed")
    msg = b"the quick brown fox"
    sig = e.sign(msg, priv)
    assert e.verify(msg, sig, priv.public_key)
    assert not e.verify(msg + b"!", sig, priv.public_key)
    bad = type(sig)(sig.r, (sig.s + 1) % e.order)
    assert not e.verify(msg, bad, priv.public_key)
    buf = e.signature_to_bytes(sig)
    assert e.verify(msg, e.signature_from_bytes(buf), priv.public_key)


def test_ecdsa_known_secp256k1_vector():
    # cross-check with a fixed (k, d) pair computed by an independent
    # Python-int implementation of secp256k1 math
    e = ECDSA("secp256k1_g1")
    n = e.order
    d = 0x1234567890ABCDEF
    h = 0xDEADBEEF
    k = 0x1111111111111111
    # independent affine math oracle
    p = e.spec.fp.modulus
    from tests.test_curve_g1 import oracle_mul

    g = (e.spec.gx, e.spec.gy)
    R = oracle_mul(g, k, p, 0)
    r = R[0] % n
    s = pow(k, -1, n) * (h + r * d) % n
    # verify with our device verifier (bypassing hashing)
    from gnark_crypto_tpu.signature.ecdsa import Signature

    class _FakeHash:
        def __init__(self, data):
            pass

        def digest(self):
            return h.to_bytes(32, "big")

    pub = type(e.generate_key(b"x").public_key)(
        e._base_mul(d))
    assert e.verify(b"ignored", Signature(r, s), pub, hasher=_FakeHash)


def test_stark_pedersen_hash_known_vector():
    # cross-checked with the Starkware reference implementation:
    # pedersen_hash(1, 2) — well-known community test value
    from gnark_crypto_tpu.hashes.pedersen_hash import pedersen

    got = pedersen([1], [2])[0]
    expect = 0x5bb9440e27889a364bcb678b1f679ecd1347acdedcbf36e83494f857cc58026
    assert got == expect


@pytest.mark.parametrize("ted", ["bls12_377", "bls12_381", "bandersnatch",
                                 "bls24_315", "bw6_633"])
def test_ted_companions_on_curve(ted):
    c = ted_curve(ted)
    g = c.generator_affine((1,))
    assert bool(np.asarray(c.on_curve_affine(g))[0]), ted
    res = c.to_affine(c.scalar_mul_int(c.from_affine(g), [c.spec.order]))
    assert c.f.to_int(res.x) == [0] and c.f.to_int(res.y) == [1], ted


@pytest.mark.parametrize("name", ["secp256k1_g1", "stark_g1",
                                  "bls12_381_g1"])
def test_ecdsa_public_key_recovery(name):
    """SignForRecover + RecoverFrom roundtrip (ecdsa.go:248,
    marshal.go:58): recovered key equals the signer's; signatures are
    low-s (BIP-62); tampered inputs recover a different key or fail."""
    from gnark_crypto_tpu.signature.ecdsa import ECDSA

    e = ECDSA(name)
    priv = e.generate_key(b"recover-seed-" + name.encode())
    msg = b"key recovery message"
    v, sig = e.sign_for_recover(msg, priv)
    assert sig.s <= (e.order - 1) // 2
    assert e.verify(msg, sig, priv.public_key)
    rec = e.recover_public_key(msg, v, sig)
    f = e.curve.fp
    assert f.to_int(rec.q.x) == f.to_int(priv.public_key.q.x)
    assert f.to_int(rec.q.y) == f.to_int(priv.public_key.q.y)
    # wrong parity bit -> different (or invalid) key
    try:
        rec2 = e.recover_public_key(msg, v ^ 1, sig)
        assert f.to_int(rec2.q.y) != f.to_int(priv.public_key.q.y)
    except ValueError:
        pass
