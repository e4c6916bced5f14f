"""ECDSA over any registered curve (secp256k1/r1, stark, pairing G1s).

Counterpart of ``ecc/<curve>/ecdsa/ecdsa.go``: same math (sign/verify,
HashToInt truncation ecdsa.go:117, public-key recovery), interoperable
signatures. Nonces are derived with HMAC-SHA256 (RFC 6979 flavor) instead of
the reference's AES-CTR csprng (ecdsa.go:167) — signatures differ bitwise
from gnark's (which are randomized anyway) but verify identically in both
directions.
"""

from __future__ import annotations

import dataclasses
import hashlib
import hmac

import numpy as np

from gnark_crypto_tpu.curve.jacobian import Affine, Jac, curve_ops
from gnark_crypto_tpu.specs.curve import CurveSpec, get_curve


@dataclasses.dataclass
class PublicKey:
    q: Affine  # batch-of-1


@dataclasses.dataclass
class PrivateKey:
    public_key: PublicKey
    d: int


@dataclasses.dataclass
class Signature:
    r: int
    s: int


def hash_to_int(msg_hash: bytes, order: int) -> int:
    """Leftmost-bits truncation (ecdsa.go HashToInt)."""
    n_bits = order.bit_length()
    n_bytes = (n_bits + 7) // 8
    h = msg_hash[:n_bytes]
    v = int.from_bytes(h, "big")
    excess = len(h) * 8 - n_bits
    if excess > 0:
        v >>= excess
    return v


class ECDSA:
    def __init__(self, curve_name: str):
        self.spec: CurveSpec = get_curve(curve_name)
        self.curve = curve_ops(self.spec)
        self.order = self.spec.fr.modulus

    def _base_mul(self, k: int) -> Affine:
        c = self.curve
        g = c.generator_affine()
        base = c.from_affine(Affine(
            c.fp.broadcast_to(g.x, (1,)), c.fp.broadcast_to(g.y, (1,))))
        return c.to_affine(c.scalar_mul(
            base, c.fr.from_int([k % self.order], mont=False)))

    def generate_key(self, seed: bytes) -> PrivateKey:
        d = int.from_bytes(
            hashlib.sha512(b"ecdsa-key" + seed).digest(), "big") % self.order
        if d == 0:
            d = 1
        return PrivateKey(PublicKey(self._base_mul(d)), d)

    def _nonce(self, priv_d: int, h: int) -> int:
        nb = (self.order.bit_length() + 7) // 8
        data = priv_d.to_bytes(nb, "big") + h.to_bytes(nb, "big")
        k, v = b"\x00" * 32, b"\x01" * 32
        k = hmac.new(k, v + b"\x00" + data, hashlib.sha256).digest()
        v = hmac.new(k, v, hashlib.sha256).digest()
        k = hmac.new(k, v + b"\x01" + data, hashlib.sha256).digest()
        v = hmac.new(k, v, hashlib.sha256).digest()
        while True:
            t = b""
            while len(t) < nb:
                v = hmac.new(k, v, hashlib.sha256).digest()
                t += v
            cand = int.from_bytes(t[:nb], "big") % self.order
            if cand != 0:
                return cand

    def sign(self, msg: bytes, priv: PrivateKey,
             hasher=hashlib.sha256) -> Signature:
        """Sign with BIP-62 low-s normalization, like the reference's Sign
        (which delegates to SignForRecover, ecdsa.go:336)."""
        return self.sign_for_recover(msg, priv, hasher)[1]

    def sign_for_recover(self, msg: bytes, priv: PrivateKey,
                         hasher=hashlib.sha256):
        """(v, Signature) with recovery id v = (x_P div n) << 1 | y_P parity
        (ecdsa.go:248 SignForRecover). The deterministic nonce is re-derived
        (counter-perturbed) until r != 0 and s <= (n-1)/2 — the reference's
        rejection loop with fresh randomness."""
        n = self.order
        h = hash_to_int(hasher(msg).digest(), n)
        f = self.curve.fp
        ctr = 0
        while True:
            k = self._nonce(priv.d, h + ctr)
            ctr += 1
            rp = self._base_mul(k)
            x = f.to_int(rp.x)[0]
            y = f.to_int(rp.y)[0]
            v = ((x // n) << 1) | (y & 1)
            r = x % n
            if r == 0:
                continue
            s = pow(k, -1, n) * (h + r * priv.d) % n
            if s == 0 or s > (n - 1) // 2:
                continue
            return v, Signature(r, s)

    def recover_public_key(self, msg: bytes, v: int, sig: Signature,
                           hasher=hashlib.sha256) -> PublicKey:
        """Public-key recovery (marshal.go:58 RecoverFrom + ecdsa.go:111
        recoverP): P = point with x = r + (v>>1)*n and y parity v&1;
        Q = [-z/r]G + [s/r]P via the joint ladder."""
        n = self.order
        p = self.spec.fp.modulus
        if not (0 < sig.r < n and 0 < sig.s < n):
            raise ValueError("invalid signature scalars")
        # full x-quotient, not one bit: pairing G1s have p >> n, so the
        # nonce point's x // n can be large (the reference only enables
        # recovery where the quotient fits one bit; we carry it whole)
        x = sig.r + (v >> 1) * n
        if x >= p:
            raise ValueError("recovery x overflows the base field")
        a = self.spec.a % p
        y2 = (pow(x, 3, p) + a * x + self.spec.b) % p
        if p % 4 == 3:
            y = pow(y2, (p + 1) // 4, p)
        else:
            from gnark_crypto_tpu.curve.twistededwards import _tonelli_int
            y = _tonelli_int(y2, p)
        if y * y % p != y2:
            raise ValueError("recovery point has no square root")
        if (y & 1) != (v & 1):
            y = p - y
        z = hash_to_int(hasher(msg).digest(), n)
        rinv = pow(sig.r, -1, n)
        u1 = (-z * rinv) % n
        u2 = sig.s * rinv % n
        c = self.curve
        f = c.fp
        g = c.generator_affine()
        gj = c.from_affine(Affine(f.broadcast_to(g.x, (1,)),
                                  f.broadcast_to(g.y, (1,))))
        pj = c.from_affine(Affine(f.from_int([x]), f.from_int([y])))
        q = c.joint_scalar_mul(gj, pj,
                               c.fr.from_int([u1], mont=False),
                               c.fr.from_int([u2], mont=False))
        if bool(np.asarray(c.is_inf_jac(q))[0]):
            raise ValueError("recovered point at infinity")
        return PublicKey(c.to_affine(q))

    def verify(self, msg: bytes, sig: Signature, pub: PublicKey,
               hasher=hashlib.sha256) -> bool:
        n = self.order
        if not (0 < sig.r < n and 0 < sig.s < n):
            return False
        # Public-key validation: reject the point at infinity explicitly
        # (on_curve_affine admits (0,0) via its infinity clause) and, for
        # cofactor > 1 curves, points outside the prime-order subgroup.
        if bool(np.asarray(self.curve.is_inf_affine(pub.q))[0]):
            return False
        if not bool(np.asarray(self.curve.on_curve_affine(pub.q))[0]):
            return False
        if getattr(self.spec, "cofactor", 1) != 1:
            # reduce=False: n is the fr modulus, so a reducing from_int
            # would silently turn this into the vacuous [0]Q check
            k = self.curve.fr.from_int([n], mont=False, reduce=False)
            rn = self.curve.scalar_mul(self.curve.from_affine(pub.q), k,
                                       nbits=n.bit_length() + 1)
            if not bool(np.asarray(self.curve.is_inf_jac(rn))[0]):
                return False
        h = hash_to_int(hasher(msg).digest(), n)
        w = pow(sig.s, -1, n)
        u1 = h * w % n
        u2 = sig.r * w % n
        c = self.curve
        # [u1]G + [u2]Q with a shared doubling chain (the reference's
        # JointScalarMultiplicationBase, g1.go:873)
        g = c.from_affine(Affine(
            c.fp.broadcast_to(c.generator_affine().x, (1,)),
            c.fp.broadcast_to(c.generator_affine().y, (1,))))
        res = c.joint_scalar_mul(g, c.from_affine(pub.q),
                                 c.fr.from_int([u1], mont=False),
                                 c.fr.from_int([u2], mont=False))
        if bool(np.asarray(c.is_inf_jac(res))[0]):
            return False
        rp = c.to_affine(res)
        return c.fp.to_int(rp.x)[0] % n == sig.r

    # -- serialization (ecdsa/marshal.go: r||s big-endian fr pairs) ---------
    def signature_to_bytes(self, sig: Signature) -> bytes:
        nb = self.spec.fr.n_bytes
        return sig.r.to_bytes(nb, "big") + sig.s.to_bytes(nb, "big")

    def signature_from_bytes(self, buf: bytes) -> Signature:
        nb = self.spec.fr.n_bytes
        return Signature(int.from_bytes(buf[:nb], "big"),
                         int.from_bytes(buf[nb : 2 * nb], "big"))
