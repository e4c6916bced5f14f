"""gnark-crypto KZG SRS dump codec — byte-for-byte WriteDump/ReadDump parity.

Reference format (``ecc/<curve>/kzg/marshal.go:78-114`` WriteDump/ReadDump +
``utils/unsafe/dump_slice.go``):

  1. VerifyingKey via writeTo(RawEncoding): G2[0] raw, G2[1] raw, G1 raw,
     then the precomputed pairing lines ``Lines[k][j][i]`` for k in {0,1}
     (G2 gen / [alpha]G2), j in {0,1}, i from nLines-1 DOWN to 0, each line
     as R0 then R1 — E2 elements written by ``binary.Write(BigEndian)`` of
     the in-memory struct: **Montgomery-form** 64-bit words, array order
     (least-significant word first), each word big-endian.
  2. Marker: uint64 0xdeadbeef in raw (little-endian) memory order.
  3. ``unsafe.WriteSlice`` of Pk.G1: uint64 little-endian count, then each
     G1Affine as raw memory — X then Y, Montgomery-form 64-bit words,
     little-endian within each word.

The amd64/arm64 architectures gnark targets are little-endian, so "raw
memory" is deterministic and this codec interoperates with real gnark dump
files.
"""

from __future__ import annotations

import struct

import jax.numpy as jnp
import numpy as np

from gnark_crypto_tpu.curve.g2 import g2_curve
from gnark_crypto_tpu.curve.jacobian import Affine, curve_ops
from gnark_crypto_tpu.io.marshal import PointCodec
from gnark_crypto_tpu.specs.curve import get_curve

_MARKER = (0xDEADBEEF).to_bytes(8, "little")

# all pairing families have fixed-Q line support (pairing/lines.py)
_SUPPORTED = ("bn254", "bls12_381", "bls12_377", "bls24_315", "bls24_317",
              "bw6_761", "bw6_633")
_BW6 = ("bw6_761", "bw6_633")


def _n_coords(name: str) -> int:
    """fp words per line coefficient: E2=2, E4=4 (bls24), fp=1 (bw6)."""
    return 1 if name in _BW6 else (4 if "bls24" in name else 2)


def _fp_modulus(name: str) -> int:
    return get_curve(f"{name}_g1").fp.modulus


def _n64(name: str) -> int:
    return (_fp_modulus(name).bit_length() + 63) // 64


def _to_mont(v: int, name: str) -> int:
    p = _fp_modulus(name)
    return (v << (64 * _n64(name))) % p


def _from_mont(v: int, name: str) -> int:
    p = _fp_modulus(name)
    return (v * pow(1 << (64 * _n64(name)), -1, p)) % p


def _words_be(v: int, n64: int) -> bytes:
    """[n64]uint64 array written by binary.Write(BigEndian): word 0 (LSW)
    first, each word big-endian."""
    return b"".join(((v >> (64 * i)) & ((1 << 64) - 1)).to_bytes(8, "big")
                    for i in range(n64))


def _words_be_read(b: bytes, n64: int) -> int:
    return sum(int.from_bytes(b[8 * i:8 * i + 8], "big") << (64 * i)
               for i in range(n64))


def _ext_mont_bytes(name: str, coords) -> bytes:
    """Line coefficient (d fp coords, natural struct order) -> raw-memory
    bytes: each coord a [n64]uint64 array, LSW first, words big-endian."""
    n64 = _n64(name)
    return b"".join(_words_be(_to_mont(c, name), n64) for c in coords)


def _ext_mont_read(name: str, b: bytes):
    n64 = _n64(name)
    d = _n_coords(name)
    return tuple(
        _from_mont(_words_be_read(b[8 * n64 * i:8 * n64 * (i + 1)], n64),
                   name) for i in range(d))


# ---------------------------------------------------------------------------
# line tables <-> bytes
# ---------------------------------------------------------------------------

def _fp_spec_of(name: str):
    return get_curve(f"{name}_g1").fp


def _lines_to_ints(name: str, lines, k: int):
    """AffLines (batch 2: [gen, alpha]) -> nested int list
    [j][i] -> (r0 coord tuple, r1 coord tuple) for batch element k."""
    from gnark_crypto_tpu.field import mont
    from gnark_crypto_tpu.pairing.lines import n_line_slots

    spec = _fp_spec_of(name)
    d = _n_coords(name)
    S = n_line_slots(name)
    L = spec.n_limbs
    out = []
    # (2, S, batch, *edims, L) -> per-slot flat coord rows
    r0 = np.asarray(lines.r0).reshape(2, S, -1, d, L)
    r1 = np.asarray(lines.r1).reshape(2, S, -1, d, L)
    for j in range(2):
        row = []
        for i in range(S):
            c0 = tuple(mont.to_int(spec, r0[j, i, k, c]) for c in range(d))
            c1 = tuple(mont.to_int(spec, r1[j, i, k, c]) for c in range(d))
            row.append((c0, c1))
        out.append(row)
    return out


def write_dump(w, name: str, srs, max_pk_points: int | None = None) -> None:
    """WriteDump parity (kzg/marshal.go:78). ``srs`` is protocols.kzg.SRS;
    the VK line tables are computed here (reference kzg.go:114-123)."""
    if name not in _SUPPORTED:
        raise NotImplementedError(f"gnark dump: {name}")
    from gnark_crypto_tpu.pairing.lines import n_line_slots, precompute_lines

    g2c = g2_curve(name)
    g1c = curve_ops(get_curve(f"{name}_g1"))
    g2codec = PointCodec(g2c)
    g1codec = PointCodec(g1c)

    # --- VK raw points
    for pt in (srs.vk.g2, srs.vk.alpha_g2):
        w.write(g2codec.to_bytes(pt, raw=True)[0])
    w.write(g1codec.to_bytes(srs.vk.g1, raw=True)[0])

    # --- VK precomputed lines for [G2, alphaG2]
    qx = jnp.concatenate([srs.vk.g2.x, srs.vk.alpha_g2.x], axis=0)
    qy = jnp.concatenate([srs.vk.g2.y, srs.vk.alpha_g2.y], axis=0)
    lines = precompute_lines(name, qx, qy)
    S = n_line_slots(name)
    for k in range(2):
        ints = _lines_to_ints(name, lines, k)
        for j in range(2):
            for i in range(S - 1, -1, -1):
                (r0, r1) = ints[j][i]
                w.write(_ext_mont_bytes(name, r0))
                w.write(_ext_mont_bytes(name, r1))

    # --- marker + unsafe G1 slice
    w.write(_MARKER)
    xs = g1c.fp.to_int(srs.pk.g1.x)
    ys = g1c.fp.to_int(srs.pk.g1.y)
    n = len(xs) if max_pk_points is None else min(len(xs), max_pk_points)
    w.write(struct.pack("<Q", n))
    n64 = _n64(name)
    buf = bytearray()
    for i in range(n):
        for v in (xs[i], ys[i]):
            buf += _to_mont(v, name).to_bytes(8 * n64, "little")
    w.write(bytes(buf))


def read_dump(r, name: str, max_pk_points: int | None = None):
    """ReadDump parity (kzg/marshal.go:99): returns (SRS, AffLines) — the
    lines come straight from the file (not recomputed), ready for
    pairing_check_fixed_q."""
    if name not in _SUPPORTED:
        raise NotImplementedError(f"gnark dump: {name}")
    from gnark_crypto_tpu.field import mont
    from gnark_crypto_tpu.pairing.lines import AffLines, n_line_slots
    from gnark_crypto_tpu.protocols.kzg import SRS, ProvingKey, VerifyingKey

    g2c = g2_curve(name)
    g1c = curve_ops(get_curve(f"{name}_g1"))
    g2codec = PointCodec(g2c)
    g1codec = PointCodec(g1c)

    nb2, nb1 = g2codec.nb, g1codec.nb
    g2 = g2codec.from_bytes([r.read(2 * nb2)], subgroup_check=False)
    alpha_g2 = g2codec.from_bytes([r.read(2 * nb2)], subgroup_check=False)
    vk_g1 = g1codec.from_bytes([r.read(2 * nb1)], subgroup_check=False)

    spec = _fp_spec_of(name)
    d = _n_coords(name)
    S = n_line_slots(name)
    n64 = _n64(name)
    esz = 8 * n64 * d  # bytes per line coefficient (R0 or R1)
    # slots[j][i][k] -> (r0 coord tuple, r1 coord tuple)
    vals = {}
    for k in range(2):
        for j in range(2):
            for i in range(S - 1, -1, -1):
                r0 = _ext_mont_read(name, r.read(esz))
                r1 = _ext_mont_read(name, r.read(esz))
                vals[(j, i, k)] = (r0, r1)

    # element trailing dims (before limbs) per family: E2 (2,), E4 (2,2)
    # with gnark struct order B0.A0,B0.A1,B1.A0,B1.A1, BW6 fp ()
    edims = () if name in _BW6 else ((2, 2) if "bls24" in name else (2,))

    def build(sel):
        flat = [vals[(j, i, k)][sel][c]
                for j in range(2) for i in range(S)
                for k in range(2) for c in range(d)]
        arr = mont.from_int(spec, flat)
        return jnp.asarray(arr).reshape(2, S, 2, *edims, spec.n_limbs)

    lines = AffLines(build(0), build(1))

    if r.read(8) != _MARKER:
        raise ValueError("bad dump marker (wrong arch or corrupt file)")
    (count,) = struct.unpack("<Q", r.read(8))
    n = count if max_pk_points is None else min(count, max_pk_points)
    psz = 16 * n64  # point bytes (X+Y)
    raw = r.read(psz * n)
    if len(raw) != psz * n:
        raise EOFError("short G1 slice")
    if count > n:
        r.read(psz * (count - n))  # advance past skipped points
    arr = np.frombuffer(raw, dtype="<u8").reshape(n, 2, n64)
    shifts = np.array([1 << (64 * i) for i in range(n64)], dtype=object)
    vals_xy = (arr.astype(object) * shifts).sum(axis=-1)
    p = _fp_modulus(name)
    rinv = pow(1 << (64 * n64), -1, p)
    xs = [int(v * rinv % p) for v in vals_xy[:, 0]]
    ys = [int(v * rinv % p) for v in vals_xy[:, 1]]
    pk_g1 = Affine(g1c.fp.from_int(xs), g1c.fp.from_int(ys))

    srs = SRS(ProvingKey(pk_g1), VerifyingKey(g2, alpha_g2, vk_g1))
    return srs, lines
