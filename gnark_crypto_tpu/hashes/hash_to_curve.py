"""RFC 9380 hash-to-curve: expand_message_xmd, hash_to_field, SVDW map.

Counterpart of ``field/hash/hashutils.go`` (ExpandMsgXmd), the per-field
``Hash`` (element.go:719, L = 16 + Bytes), and the generated SVDW maps
(``ecc/bn254/hash_to_g1.go`` straight-line svdw). The map itself runs
batched on device with masked selects (Legendre/sqrt based CMOVs).
"""

from __future__ import annotations

import hashlib

import jax.numpy as jnp
import numpy as np

from gnark_crypto_tpu.curve.jacobian import Affine, Curve, Jac, curve_ops
from gnark_crypto_tpu.specs.curve import CurveSpec
from gnark_crypto_tpu.specs.field import FieldSpec

# SVDW constants per curve: (Z, c1, c2, c3, c4) — from
# internal/generator/config/<curve>.go HashE1 (decimal strings)
SVDW = {
    "bn254_g1": (
        1,
        4,
        10944121435919637611123202872628637544348155578648911831344518947322613104291,
        8815841940592487685674414971303048083897117035520822607866,
        7296080957279758407415468581752425029565437052432607887563012631548408736189,
    ),
}


def expand_msg_xmd(msg: bytes, dst: bytes, n: int) -> bytes:
    """RFC 9380 expand_message_xmd with SHA-256 (hashutils.go:11)."""
    h = hashlib.sha256
    b_len = 32
    r_len = 64
    ell = -(-n // b_len)
    if ell > 255 or len(dst) > 255:
        raise ValueError("invalid expand_msg_xmd parameters")
    dst_prime = dst + bytes([len(dst)])
    b0 = h(b"\x00" * r_len + msg + n.to_bytes(2, "big") + b"\x00"
           + dst_prime).digest()
    bi = h(b0 + b"\x01" + dst_prime).digest()
    out = bi
    for i in range(2, ell + 1):
        strxor = bytes(a ^ b for a, b in zip(b0, bi))
        bi = h(strxor + bytes([i]) + dst_prime).digest()
        out += bi
    return out[:n]


def hash_to_field(spec: FieldSpec, msg: bytes, dst: bytes, count: int
                  ) -> list[int]:
    """count field elements from msg (element.go:719 Hash; L = 16+Bytes)."""
    L = 16 + spec.n_bytes
    pr = expand_msg_xmd(msg, dst, count * L)
    return [int.from_bytes(pr[i * L : (i + 1) * L], "big") % spec.modulus
            for i in range(count)]


def map_to_curve_svdw(curve: Curve, u):
    """Shallue–van de Woestijne map, batched (hash_to_g1.go:63 MapToCurve1).

    u: base-field element batch (Montgomery). Returns Affine batch.
    """
    f = curve.fp
    consts = SVDW[curve.spec.name]
    z, c1, c2, c3, c4 = (f.broadcast_to(f.from_int(c), f.eshape(u))
                         for c in consts)
    one = f.broadcast_to(f.ones(), f.eshape(u))
    b = f.broadcast_to(f.from_int(curve.spec.b), f.eshape(u))

    tv1 = f.mul(f.square(u), c1)
    tv2 = f.add(one, tv1)
    tv1 = f.sub(one, tv1)
    tv3 = f.inverse(f.mul(tv1, tv2))        # inv0
    tv4 = f.mul(f.mul(f.mul(u, tv1), tv3), c3)
    x1 = f.sub(c2, tv4)
    gx1 = f.add(f.mul(f.square(x1), x1), b)
    x2 = f.add(c2, tv4)
    gx2 = f.add(f.mul(f.square(x2), x2), b)
    x3 = f.add(f.mul(f.square(f.mul(f.square(tv2), tv3)), c4), z)

    qnr = f.neg(one)
    gx1_square = ~f.equal(f.legendre(gx1), qnr)   # legendre in {1, 0, q-1}
    gx2_square = ~f.equal(f.legendre(gx2), qnr)
    x = f.select(gx1_square, x1, x3)
    x = f.select(gx2_square & ~gx1_square, x2, x)
    gx = f.add(f.mul(f.square(x), x), b)
    y, _ = f.sqrt(gx)
    # select sign: sgn0(y) must equal sgn0(u) (canonical parity)
    sgn_u = _sgn0(f, u)
    sgn_y = _sgn0(f, y)
    y = f.select(sgn_u == sgn_y, y, f.neg(y))
    return Affine(x, y)


def _sgn0(f, v):
    """Parity of the canonical (non-Montgomery) value (G1Sgn0)."""
    plain = f.from_mont(v)
    if f.elem_dims:
        return plain[..., 0] & 1
    return (plain & 1).astype(jnp.int32)


def map_to_g1(name_or_spec, u) -> Affine:
    curve = _curve(name_or_spec)
    res = map_to_curve_svdw(curve, u)
    # bn254/grumpkin G1 cofactor is 1: no clearing needed (config
    # CofactorCleaning=false); curves needing it get it with their specs.
    return res


def _curve(name_or_spec) -> Curve:
    if isinstance(name_or_spec, CurveSpec):
        return curve_ops(name_or_spec)
    from gnark_crypto_tpu.specs.curve import get_curve
    return curve_ops(get_curve(name_or_spec))


def encode_to_g1(name: str, msg: bytes, dst: bytes) -> Affine:
    """EncodeToG1 (hash_to_g1.go:24): one field element, non-uniform."""
    curve = _curve(name)
    u = hash_to_field(curve.spec.fp, msg, dst, 1)
    return map_to_g1(curve.spec, curve.fp.from_int(u))


def hash_to_g1(name: str, msg: bytes, dst: bytes) -> Affine:
    """HashToG1 (hash_to_g1.go:42): two map evaluations added."""
    curve = _curve(name)
    u = hash_to_field(curve.spec.fp, msg, dst, 2)
    pts = map_to_g1(curve.spec, curve.fp.from_int(u))
    q0 = Jac(*(c[:1] for c in curve.from_affine(pts)))
    q1 = Jac(*(c[1:] for c in curve.from_affine(pts)))
    return curve.to_affine(curve.add(q0, q1))
