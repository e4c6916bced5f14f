"""MiMC hash (Miyaguchi-Preneel mode) over Fr — bit-exact with the reference.

Counterpart of ``ecc/<curve>/fr/mimc/mimc.go``: x^e S-box (e = 5, or 17 for
bls12-377), per-curve round counts, round constants derived from the legacy
Keccak-256 chain seeded with "seed" (mimc.go:250-263). The compression
function runs on device as a lax.scan over rounds, vectorized over a batch of
parallel hash states (the reference hashes one message per call; batching is
the TPU win).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from gnark_crypto_tpu.field.api import FieldEngine, for_spec
from gnark_crypto_tpu.hashes.keccak import keccak256
from gnark_crypto_tpu.specs import field as fs
from gnark_crypto_tpu.specs.field import FieldSpec

# (rounds, sbox exponent) per field — from each generated mimc.go:52 + encrypt
PARAMS: dict[str, tuple[int, int]] = {
    "bn254_fr": (110, 5),
    "bls12_377_fr": (62, 17),
    "bls12_381_fr": (111, 5),
    "bls24_315_fr": (109, 5),
    "bls24_317_fr": (91, 5),
    "bw6_633_fr": (136, 5),
    "bw6_761_fr": (163, 5),
    "grumpkin_fr": (110, 5),
}

SEED = b"seed"


@functools.lru_cache(maxsize=None)
def constants(spec: FieldSpec) -> tuple[int, ...]:
    """Round constants: keccak chain rnd -> keccak(rnd), c_i = rnd mod r
    (mimc.go initConstants)."""
    rounds, _ = PARAMS[spec.name]
    rnd = keccak256(SEED)
    out = []
    for _ in range(rounds):
        rnd = keccak256(rnd)
        out.append(int.from_bytes(rnd, "big") % spec.modulus)
    return tuple(out)


class MiMC:
    """Batched MiMC hasher for one field.

    Device API: hash a (blocks, batch) array of plain fr elements ->
    (batch,) digests. Host API mirrors the reference's hash.Hash (Write
    accumulates canonical 32-byte blocks; Sum returns the digest bytes).
    """

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.eng: FieldEngine = for_spec(spec)
        self.rounds, self.exponent = PARAMS[spec.name]
        self._cs_mont = self.eng.to_mont(
            self.eng.from_int(list(constants(spec)), mont=False))
        self._data: list[bytes] = []
        self._state = 0  # flushed Miyaguchi-Preneel chaining value (plain)

    # -- device path --------------------------------------------------------
    def _encrypt(self, m, h):
        """E_h(m): rounds of m = (m + h + c_i)^e, then + h (mimc.go:224).
        All values Montgomery."""
        eng = self.eng
        e = self.exponent

        def body(m, c):
            tmp = eng.add(eng.add(m, h), eng.broadcast_to(c, eng.eshape(m)))
            # x^e for e = 2^k + 1: k squarings + 1 mul
            acc = tmp
            k = (e - 1).bit_length() - 1
            for _ in range(k):
                acc = eng.square(acc)
            return eng.mul(acc, tmp), None

        m, _ = lax.scan(body, m, self._cs_mont)
        return eng.add(m, h)

    def hash_elements(self, blocks, h0: int = 0):
        """(nb_blocks, batch) plain fr -> (batch,) plain fr digests.

        Miyaguchi-Preneel: h = E_h(m) + h + m per block (mimc.go:186-190).
        ``h0``: initial chaining value (SetState support, mimc.go:279).
        """
        eng = self.eng
        bm = eng.to_mont(blocks)
        nb = blocks.shape[0]
        if h0:
            h = eng.broadcast_to(eng.from_int(h0), eng.eshape(bm[0]))
        else:
            h = eng.zeros(eng.eshape(bm[0]))

        def body(h, m):
            r = self._encrypt(m, h)
            return eng.add(eng.add(r, h), m), None

        h, _ = lax.scan(body, h, bm)
        return eng.from_mont(h)

    # -- host hash.Hash-compatible path (reference Write/Sum semantics) -----
    def reset(self):
        self._data = []
        self._state = 0

    def set_state(self, new_state: bytes):
        """Load an externally saved chaining value (mimc.go:279 SetState):
        must be canonical fr bytes; rejects a hasher with buffered blocks
        (the reference clears d.data, but silently dropping written data
        diverges from every caller's intent — flush with sum() first)."""
        if self._data:
            raise ValueError("mimc has buffered data; call sum() first")
        if len(new_state) != self.spec.n_bytes:
            raise ValueError(
                f"mimc state must be {self.spec.n_bytes} bytes")
        v = int.from_bytes(new_state, "big")
        if v >= self.spec.modulus:
            raise ValueError("invalid mimc state (non-canonical)")
        self._state = v
        self._data = []

    def state(self) -> bytes:
        """Flush buffered blocks into the chaining value and return it
        (mimc.go:295 State)."""
        out = self.sum()
        return out

    def write(self, data: bytes):
        """Strict: data must be canonical fr chunks (mimc.go Write)."""
        bs = self.spec.n_bytes
        if len(data) % bs:
            raise ValueError(f"invalid input length (must be {bs}-multiples)")
        for i in range(0, len(data), bs):
            chunk = data[i : i + bs]
            if int.from_bytes(chunk, "big") >= self.spec.modulus:
                raise ValueError("non-canonical block")
            self._data.append(chunk)

    def sum(self) -> bytes:
        """Fold buffered blocks into the chaining value and return its bytes
        (reference Sum flushes: checksum mutates d.h, mimc.go:109,178)."""
        if not self._data:
            # no blocks -> current state (0 on a fresh hasher)
            return self._state.to_bytes(self.spec.n_bytes, "big")
        vals = [int.from_bytes(c, "big") for c in self._data]
        arr = self.eng.from_int(vals, mont=False)
        arr = arr.reshape(len(vals), 1, *arr.shape[1:])
        out = self.hash_elements(arr, h0=self._state)
        buf = self.eng.to_bytes_host(out, mont=False)[0]
        self._state = int.from_bytes(buf, "big")
        self._data = []
        return buf

    # hashlib-style aliases (for Transcript)
    def update(self, data: bytes):
        self.write(data)

    def digest(self) -> bytes:
        return self.sum()


@functools.lru_cache(maxsize=None)
def mimc(field_name: str) -> MiMC:
    return MiMC(fs.get_field(field_name))
