"""Vectorized host-side codec: canonical bytes <-> Montgomery limb arrays.

Native-speed counterpart of the reference's bulk-IO tier — ``Vector.ReadFrom
/ AsyncReadFrom`` (ecc/bn254/fr/vector.go:53,97, asm-speed per-element
SetBytes) and the raw ``utils/unsafe`` dump (dump_slice.go:16) used for
multi-GB SRS files. The pure-Python path in ``mont.py`` does one bigint
Montgomery multiplication per element; for large batches this module does
the whole conversion as numpy int64 array ops:

  * bytes -> limbs / limbs -> bytes: bit-level repacking via
    ``np.unpackbits``/``np.packbits`` (no Python ints at all);
  * Montgomery enter/leave: CIOS Montgomery multiplication by the constant
    r^2 (resp. 1) in vectorized int64 — L rounds of O(L) numpy ops over the
    whole batch, exactly the element.go:478 _mulGeneric schedule.

Everything is exact integer arithmetic; the dispatch threshold lives in
``mont.to_bytes_host`` / ``mont.from_bytes_host``.
"""

from __future__ import annotations

import numpy as np

from gnark_crypto_tpu.specs.field import FieldSpec, int_to_limbs


def _q_limbs64(spec: FieldSpec) -> np.ndarray:
    return np.asarray(int_to_limbs(spec.modulus, spec.limb_bits,
                                   spec.n_limbs), np.int64)


def _const_limbs64(spec: FieldSpec, v: int) -> np.ndarray:
    return np.asarray(int_to_limbs(v, spec.limb_bits, spec.n_limbs),
                      np.int64)


def mont_mul_const_np(spec: FieldSpec, a: np.ndarray,
                      c_limbs: np.ndarray) -> np.ndarray:
    """CIOS Montgomery product a * c * r^-1 mod q, vectorized over rows.

    a: (n, L) int64 limbs (< 2^b each); c_limbs: (L,) int64. Returns (n, L).
    int64 bounds: t accumulates < (L+2) * 2^(2b) + 2^(2b) << 2^63 for
    b <= 13, L <= 32.
    """
    L, b = spec.n_limbs, spec.limb_bits
    mask = (1 << b) - 1
    q = _q_limbs64(spec)
    n = a.shape[0]
    t = np.zeros((n, L + 1), np.int64)
    for i in range(L):
        # t += a[:, i] * c
        t[:, :L] += a[:, i : i + 1] * c_limbs[None, :]
        # carry-save one pass so limbs stay bounded
        carry = t[:, :L] >> b
        t[:, :L] &= mask
        t[:, 1:] += carry
        # m = t0 * qinv mod 2^b; t += m * q; t >>= b
        m = (t[:, 0] * spec.qinv_neg) & mask
        t[:, :L] += m[:, None] * q[None, :]
        carry = t[:, 0] >> b
        t[:, 0] = 0
        t[:, 1] += carry
        t = np.concatenate([t[:, 1:], np.zeros((n, 1), np.int64)], axis=1)
    # final carry propagation
    for j in range(L):
        carry = t[:, j] >> b
        t[:, j] &= mask
        t[:, j + 1] += carry
    assert (t[:, L] == 0).all()
    out = t[:, :L]
    # conditional subtract q (compare MSB-first)
    ge = _ge_q(out, q)
    if ge.any():
        sub = out[ge] - q[None, :]
        for j in range(L - 1):
            borrow = sub[:, j] < 0
            sub[:, j] += borrow << b
            sub[:, j + 1] -= borrow
        out[ge] = sub
    return out


def _ge_q(limbs: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Row mask: limb vector >= q (lexicographic from the top limb)."""
    res = np.zeros(limbs.shape[0], np.int8)  # -1 lt, 0 unknown(==), +1 gt
    for i in range(limbs.shape[1] - 1, -1, -1):
        d = np.sign(limbs[:, i] - q[i]).astype(np.int8)
        res = np.where(res == 0, d, res)
    return res >= 0


def bytes_to_limbs_np(spec: FieldSpec, buf: bytes, n: int,
                      check: bool = True) -> np.ndarray:
    """n canonical big-endian fixed-width elements -> (n, L) int32 limbs.

    ``check``: reject rows >= q (element.go:1018 SetBytes strictness)."""
    nb, L, b = spec.n_bytes, spec.n_limbs, spec.limb_bits
    arr = np.frombuffer(buf, np.uint8).reshape(n, nb)
    # big-endian bytes -> LSB-first bit columns
    bits = np.unpackbits(arr[:, ::-1], axis=1, bitorder="little")
    total = L * b
    if bits.shape[1] < total:
        bits = np.pad(bits, ((0, 0), (0, total - bits.shape[1])))
    else:
        if check and bits[:, total:].any():
            raise ValueError("non-canonical field element encoding")
        bits = bits[:, :total]
    w = (np.int64(1) << np.arange(b, dtype=np.int64))
    limbs = (bits.reshape(n, L, b).astype(np.int64) * w).sum(axis=2)
    if check and _ge_q(limbs, _q_limbs64(spec)).any():
        raise ValueError("non-canonical field element encoding")
    return limbs


def limbs_to_bytes_np(spec: FieldSpec, limbs: np.ndarray) -> bytes:
    """(n, L) plain limbs -> concatenated canonical big-endian bytes."""
    n = limbs.shape[0]
    L, b, nb = spec.n_limbs, spec.limb_bits, spec.n_bytes
    vals = limbs.astype(np.int64)
    bits = ((vals[..., None] >> np.arange(b, dtype=np.int64)) & 1).astype(
        np.uint8).reshape(n, L * b)
    if L * b < nb * 8:
        bits = np.pad(bits, ((0, 0), (0, nb * 8 - L * b)))
    else:
        bits = bits[:, : nb * 8]
    le = np.packbits(bits, axis=1, bitorder="little")
    return le[:, ::-1].tobytes()


def from_bytes_np(spec: FieldSpec, buf: bytes, n: int,
                  mont: bool = True) -> np.ndarray:
    """Canonical bytes -> (n, L) int32 limb array (Montgomery by default)."""
    limbs = bytes_to_limbs_np(spec, buf, n)
    if mont:
        limbs = mont_mul_const_np(spec, limbs,
                                  _const_limbs64(spec, spec.r2 % spec.modulus))
    return limbs.astype(np.int32)


def to_bytes_np(spec: FieldSpec, limbs: np.ndarray,
                mont: bool = True) -> bytes:
    """(n, L) limb array (Montgomery by default) -> canonical bytes."""
    vals = np.asarray(limbs, np.int64)
    if mont:
        one = np.zeros(spec.n_limbs, np.int64)
        one[0] = 1
        vals = mont_mul_const_np(spec, vals, one)
    return limbs_to_bytes_np(spec, vals)
