"""gnark-compatible point serialization (bit-exact byte formats).

Counterpart of ``ecc/<curve>/marshal.go``:
  flag bits in the 2 MSBs of the first byte (marshal.go:24-30):
    00 uncompressed | 10 compressed smallest-Y | 11 compressed largest-Y |
    01 compressed infinity
  compressed payload = big-endian X (G2: X.A1 || X.A0, marshal.go G2 Bytes);
  uncompressed = X || Y. Y recomputation on decode solves y^2 = x^3 + ax + b
  and picks the root by the lexicographic rule (element.go:277
  LexicographicallyLargest: v > (q-1)/2).

Encode/decode of the flag bytes is host-side; batched Y-recomputation (the
compute-heavy part, reference's parallel ``unsafeComputeY`` marshal.go:944)
runs on device over the whole batch at once.
"""

from __future__ import annotations

import numpy as np

from gnark_crypto_tpu.curve.jacobian import Affine, Curve

M_MASK = 0b11 << 6
M_UNCOMPRESSED = 0b00 << 6
M_COMPRESSED_SMALLEST = 0b10 << 6
M_COMPRESSED_LARGEST = 0b11 << 6
M_COMPRESSED_INFINITY = 0b01 << 6


class MarshalError(ValueError):
    pass


def _lex_largest_int(v: int, q: int) -> bool:
    return v > (q - 1) // 2


class PointCodec:
    """Serialization for one group (works for G1 and, with an E2 engine
    curve, G2 — coefficient order handled by the engine's to_int tuples)."""

    def __init__(self, curve: Curve):
        self.curve = curve
        self.fp = curve.fp
        self.q = self._base_modulus()
        self.nb = self._coord_bytes()

    def _base_spec(self):
        """Walk a (possibly nested) extension engine down to the prime
        field spec (E2 over fp, E4 = E2 over E2 for bls24 G2, ...)."""
        f = self.fp
        while not hasattr(f, "spec"):
            f = f.base
        return f.spec

    def _base_modulus(self):
        return self._base_spec().modulus

    def _total_degree(self):
        f, d = self.fp, 1
        while hasattr(f, "degree"):
            d *= f.degree
            f = f.base
        return d

    def _coord_bytes(self):
        return self._total_degree() * self._base_spec().n_bytes

    def _zero_coord(self):
        """Zero coordinate matching the engine's nested-tuple structure."""
        def z(f):
            if hasattr(f, "degree"):
                return tuple(z(f.base) for _ in range(f.degree))
            return 0
        return z(self.fp)

    # -- host int conversion helpers ---------------------------------------
    def _coord_to_bytes(self, v, nb: int | None = None) -> bytes:
        """Field coordinate (int or nested tuple) -> big-endian bytes,
        highest coefficient first, recursively (A1 || A0 for E2; for bls24
        Fp4: B1.A1 || B1.A0 || B0.A1 || B0.A0 — marshal.go G2 Bytes)."""
        nb = self.nb if nb is None else nb
        if isinstance(v, tuple):
            sub = nb // len(v)
            return b"".join(self._coord_to_bytes(c, sub) for c in reversed(v))
        return v.to_bytes(nb, "big")

    def _coord_from_bytes(self, b: bytes, f=None):
        f = self.fp if f is None else f
        if hasattr(f, "degree"):
            nb = len(b) // f.degree
            parts = [self._coord_from_bytes(b[i * nb : (i + 1) * nb], f.base)
                     for i in range(f.degree)]
            return tuple(reversed(parts))
        v = int.from_bytes(b, "big")
        if v >= self.q:
            raise MarshalError("non-canonical coordinate")
        return v

    def _lex_largest(self, v) -> bool:
        """Recursive lexicographic order (fptower LexicographicallyLargest):
        decide on the highest nonzero coefficient, any extension degree
        (E2, Fp4 for bls24 G2, nested towers)."""
        if isinstance(v, tuple):
            for c in reversed(v):
                if not _is_zero_coord(c):
                    return self._lex_largest(c)
            return False
        return _lex_largest_int(v, self.q)

    def _coords_list(self, arr):
        """Engine to_int output -> list of per-point coords (int or nested
        tuple). Extension engines return structure-of-arrays (nested tuples
        of lists for nested towers); transpose recursively."""
        v = _soa_to_aos(self.fp.to_int(arr))
        return v if isinstance(v, list) else [v]

    # -- encode -------------------------------------------------------------
    def to_bytes(self, pts: Affine, raw: bool = False) -> list[bytes]:
        """Bytes() / RawBytes() (marshal.go:800,825)."""
        xs = self._coords_list(pts.x)
        ys = self._coords_list(pts.y)
        out = []
        for x, y in zip(xs, ys):
            inf = _is_zero_coord(x) and _is_zero_coord(y)
            if raw:
                if inf:
                    out.append(bytes([M_UNCOMPRESSED]) +
                               b"\x00" * (2 * self.nb - 1))
                    continue
                buf = bytearray(self._coord_to_bytes(x) +
                                self._coord_to_bytes(y))
                buf[0] |= M_UNCOMPRESSED
                out.append(bytes(buf))
            else:
                if inf:
                    out.append(bytes([M_COMPRESSED_INFINITY]) +
                               b"\x00" * (self.nb - 1))
                    continue
                flag = (M_COMPRESSED_LARGEST if self._lex_largest(y)
                        else M_COMPRESSED_SMALLEST)
                buf = bytearray(self._coord_to_bytes(x))
                buf[0] |= flag
                out.append(bytes(buf))
        return out

    # -- decode -------------------------------------------------------------
    def from_bytes(self, bufs: list[bytes], subgroup_check: bool = True
                   ) -> Affine:
        """SetBytes (marshal.go:854): batched decode; compressed entries get
        their Y solved on device in one vectorized sqrt."""
        f = self.fp
        xs, ys, want_largest, need_y, infs = [], [], [], [], []
        for buf in bufs:
            if len(buf) < self.nb:
                raise MarshalError("short buffer")
            m = buf[0] & M_MASK
            if m == M_COMPRESSED_INFINITY:
                if any(buf[1 : self.nb]) or (buf[0] & ~M_MASK):
                    raise MarshalError("invalid infinity encoding")
                xs.append(self._zero_coord())
                ys.append(xs[-1])
                want_largest.append(False)
                need_y.append(False)
                infs.append(True)
                continue
            infs.append(False)
            first = bytes([buf[0] & ~M_MASK]) + buf[1 : self.nb]
            x = self._coord_from_bytes(first)
            xs.append(x)
            if m == M_UNCOMPRESSED:
                if len(buf) < 2 * self.nb:
                    raise MarshalError("short buffer")
                ys.append(self._coord_from_bytes(buf[self.nb : 2 * self.nb]))
                want_largest.append(False)
                need_y.append(False)
            elif m in (M_COMPRESSED_SMALLEST, M_COMPRESSED_LARGEST):
                ys.append(self._zero_coord())
                want_largest.append(m == M_COMPRESSED_LARGEST)
                need_y.append(True)
            else:
                raise MarshalError("invalid flag bits")

        x_dev = f.from_int(xs)
        y_dev = f.from_int(ys)
        pts = Affine(x_dev, y_dev)
        if any(need_y):
            pts = self._solve_y(pts, need_y, want_largest, infs)
        curve = self.curve
        on = np.asarray(curve.on_curve_affine(pts))
        if not bool(np.all(on)):
            raise MarshalError("invalid point encoding (not on curve)")
        if subgroup_check:
            ok = np.asarray(self._subgroup_check(pts))
            if not bool(np.all(ok)):
                raise MarshalError("subgroup check failed")
        return pts

    def _solve_y(self, pts: Affine, need_y, want_largest, infs) -> Affine:
        import jax.numpy as jnp

        f = self.fp
        curve = self.curve
        x = pts.x
        rhs = f.mul(f.square(x), x)
        b_const = f.broadcast_to(f.from_int(curve.spec.b), f.eshape(x))
        rhs = f.add(rhs, b_const)
        if not curve.a_is_zero:
            rhs = f.add(rhs, f.mul(x, f.broadcast_to(
                f.from_int(curve.spec.a), f.eshape(x))))
        y, ok = f.sqrt(rhs)
        okh = np.asarray(ok)
        for i, nd in enumerate(need_y):
            if nd and not okh[i]:
                raise MarshalError(
                    "invalid compressed coordinate: no square root")
        # choose the root matching the flag
        ylist = self._coords_list(y)
        is_large = np.asarray([self._lex_largest(v) for v in ylist])
        flip = jnp.asarray(is_large != np.asarray(want_largest))
        y = f.where(flip, f.neg(y), y)
        nd = jnp.asarray(np.asarray(need_y))
        y_final = f.where(nd, y, pts.y)
        return Affine(pts.x, y_final)

    def _subgroup_check(self, pts: Affine):
        """r-torsion membership via the per-family endomorphism fast paths
        (curve/subgroup.py), the reference's IsInSubGroup counterpart —
        seed-length ladders instead of the naive [r]P check."""
        from gnark_crypto_tpu.curve.subgroup import is_in_subgroup
        return is_in_subgroup(self.curve, pts)


def _is_zero_coord(v) -> bool:
    if isinstance(v, tuple):
        return all(_is_zero_coord(c) for c in v)
    return v == 0


def _soa_to_aos(v):
    """Structure-of-arrays (nested tuples of per-coefficient lists) ->
    list of per-element nested tuples; passes scalars through."""
    if isinstance(v, tuple):
        subs = [_soa_to_aos(c) for c in v]
        if isinstance(subs[0], list):
            return [tuple(s[i] for s in subs) for i in range(len(subs[0]))]
        return tuple(subs)
    return v
