"""Streaming Encoder/Decoder + SRS checkpoint formats.

Counterpart of ``ecc/<curve>/marshal.go`` (Encoder/Decoder), the vector
codecs (``fr/vector.go:53`` WriteTo: uint32-BE length + big-endian
elements), and the fast raw-dump SRS snapshot (``utils/unsafe/
dump_slice.go``; our dump stores canonical little-endian element bytes with
an explicit header instead of raw process memory — portable across hosts,
same O(bytes) cost).

This is the checkpoint/resume subsystem (SURVEY §5): every heavy object —
SRS, domains, vectors — round-trips through these byte formats.
"""

from __future__ import annotations

import io as _io
import struct

from gnark_crypto_tpu.curve.jacobian import Affine, curve_ops
from gnark_crypto_tpu.field.api import FieldEngine, for_spec
from gnark_crypto_tpu.io.marshal import PointCodec
from gnark_crypto_tpu.specs.curve import get_curve
from gnark_crypto_tpu.specs.field import FieldSpec

_DUMP_MAGIC = b"GCTPU\x01"


class Encoder:
    """gnark-style encoder: slices framed with uint32-BE length
    (marshal.go:444; vector framing fr/vector.go:53)."""

    def __init__(self, w, raw: bool = False):
        self.w = w
        self.raw = raw
        self.n = 0

    def _write(self, b: bytes):
        self.w.write(b)
        self.n += len(b)

    def encode_fr_vector(self, spec: FieldSpec, vec, mont: bool = False):
        eng = for_spec(spec)
        bs = eng.to_bytes_host(vec, mont=mont)
        self._write(struct.pack(">I", len(bs)))
        for b in bs:
            self._write(b)

    def encode_points(self, curve_name: str, pts: Affine):
        codec = PointCodec(curve_ops(get_curve(curve_name)))
        bufs = codec.to_bytes(pts, raw=self.raw)
        self._write(struct.pack(">I", len(bufs)))
        for b in bufs:
            self._write(b)


class Decoder:
    def __init__(self, r, subgroup_check: bool = True):
        self.r = r
        self.subgroup_check = subgroup_check
        self.n = 0

    def _read(self, k: int) -> bytes:
        b = self.r.read(k)
        if len(b) != k:
            raise EOFError("short read")
        self.n += len(b)
        return b

    def decode_fr_vector(self, spec: FieldSpec, mont: bool = False):
        (count,) = struct.unpack(">I", self._read(4))
        eng = for_spec(spec)
        bs = [self._read(spec.n_bytes) for _ in range(count)]
        return eng.from_bytes_host(bs, mont=mont)

    def decode_points(self, curve_name: str):
        (count,) = struct.unpack(">I", self._read(4))
        curve = curve_ops(get_curve(curve_name))
        codec = PointCodec(curve)
        first = self._read(codec.nb)
        flag = first[0] & 0xC0
        size = codec.nb if flag != 0x00 else 2 * codec.nb
        bufs = [first + (self._read(size - codec.nb) if size > codec.nb
                         else b"")]
        for _ in range(count - 1):
            bufs.append(self._read(size))
        return codec.from_bytes(bufs, subgroup_check=self.subgroup_check)


# ---------------------------------------------------------------------------
# fast SRS / vector dumps (utils/unsafe analogue)
# ---------------------------------------------------------------------------

def write_dump(w, curve_name: str, srs) -> None:
    """KZG SRS snapshot (kzg WriteDump analogue): raw uncompressed points."""
    from gnark_crypto_tpu.protocols.kzg import SRS

    w.write(_DUMP_MAGIC)
    enc = Encoder(w, raw=True)
    enc.encode_points(curve_name + "_g1", srs.pk.g1)
    g2codec = PointCodec(__import__(
        "gnark_crypto_tpu.curve.g2", fromlist=["g2_curve"]).g2_curve(
        curve_name))
    for pt in (srs.vk.g2, srs.vk.alpha_g2):
        for b in g2codec.to_bytes(pt, raw=True):
            w.write(b)
    for b in PointCodec(curve_ops(get_curve(curve_name + "_g1"))).to_bytes(
            srs.vk.g1, raw=True):
        w.write(b)


def read_dump(r, curve_name: str):
    from gnark_crypto_tpu.curve.g2 import g2_curve
    from gnark_crypto_tpu.protocols.kzg import (SRS, ProvingKey,
                                                VerifyingKey)

    magic = r.read(len(_DUMP_MAGIC))
    if magic != _DUMP_MAGIC:
        raise ValueError("bad dump header")
    dec = Decoder(r, subgroup_check=False)
    g1 = dec.decode_points(curve_name + "_g1")
    g2codec = PointCodec(g2_curve(curve_name))
    nb2 = 2 * g2codec.nb
    g2 = g2codec.from_bytes([r.read(nb2)], subgroup_check=False)
    alpha_g2 = g2codec.from_bytes([r.read(nb2)], subgroup_check=False)
    g1codec = PointCodec(curve_ops(get_curve(curve_name + "_g1")))
    vk_g1 = g1codec.from_bytes([r.read(2 * g1codec.nb)],
                               subgroup_check=False)
    return SRS(ProvingKey(g1), VerifyingKey(g2, alpha_g2, vk_g1))
