"""Poseidon2 permutation + Merkle-Damgard hasher — bit-exact with the
reference (``ecc/<c>/fr/poseidon2``, ``field/<f>/poseidon2``).

One generic implementation over any field engine; per-field parameters
(width/rounds/sbox degree/seed-name/internal diagonal) mirror the generated
Go. Round constants derive from the legacy-Keccak chain over the parameter
string (poseidon2.go initRC). The state is a (t, batch) element array so one
permutation instance hashes a whole batch of inputs — the TPU replacement
for the reference's AVX-512 batched kernels (poseidon2_amd64.s).
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


def _frac(num, den=1):
    return (num, den)


# internal-matrix diagonals for width>=4 instances, as exact fractions mod q
# (from the matMulInternalInPlace comments / Plonky3 constants)
_DIAG = {
    ("koalabear", 16): [(-2, 1), (1, 1), (2, 1), (1, 2), (3, 1), (4, 1),
                        (-1, 2), (-3, 1), (-4, 1), (1, 2**8), (1, 8),
                        (1, 2**24), (-1, 2**8), (-1, 8), (-1, 16),
                        (-1, 2**24)],
    ("koalabear", 24): [(-2, 1), (1, 1), (2, 1), (1, 2), (3, 1), (4, 1),
                        (-1, 2), (-3, 1), (-4, 1), (1, 2**8), (1, 4), (1, 8),
                        (1, 16), (1, 32), (1, 64), (1, 2**24), (-1, 2**8),
                        (-1, 8), (-1, 16), (-1, 32), (-1, 64), (-1, 2**7),
                        (-1, 2**9), (-1, 2**24)],
    ("babybear", 16): [(-2, 1), (1, 1), (2, 1), (1, 2), (3, 1), (4, 1),
                       (-1, 2), (-3, 1), (-4, 1), (1, 2**8), (1, 4), (1, 8),
                       (1, 2**27), (-1, 2**8), (-1, 16), (-1, 2**27)],
    ("babybear", 24): [(-2, 1), (1, 1), (2, 1), (1, 2), (3, 1), (4, 1),
                       (-1, 2), (-3, 1), (-4, 1), (1, 2**8), (1, 4), (1, 8),
                       (1, 16), (1, 2**7), (1, 2**9), (1, 2**27), (-1, 2**8),
                       (-1, 4), (-1, 8), (-1, 16), (-1, 32), (-1, 64),
                       (-1, 2**7), (-1, 2**27)],
    ("goldilocks", 8): [(v, 1) for v in [
        12216033376705242021, 2072934925475504800, 16432743296706583078,
        1287600597097751715, 10482065724875379356, 3057917794534811537,
        4460508886913832365, 4574242228824269566]],
    ("goldilocks", 12): [(v, 1) for v in [
        14102670999874605824, 15585654191999307702, 940187017142450255,
        8747386241522630711, 6750641561540124747, 7440998025584530007,
        6136358134615751536, 12413576830284969611, 11675438539028694709,
        17580553691069642926, 892707462476851331, 15167485180850043744]],
}

# (seed curve/field tag, sbox degree, default (width, rf, rp))
PARAMS = {
    "bn254_fr": ("BN254", 5, (2, 6, 50)),
    "grumpkin_fr": ("GRUMPKIN", 5, (2, 6, 50)),
    "bls12_377_fr": ("BLS12_377", 17, (2, 6, 26)),
    "bls12_381_fr": ("BLS12_381", 5, (2, 6, 50)),
    "bls24_315_fr": ("BLS24_315", 5, (2, 6, 50)),
    "bls24_317_fr": ("BLS24_317", 7, (2, 6, 40)),
    "bw6_633_fr": ("BW6_633", 5, (2, 6, 50)),
    "bw6_761_fr": ("BW6_761", 5, (2, 6, 50)),
    "koalabear": ("koalabear", 3, (16, 6, 21)),
    "babybear": ("babybear", 7, (16, 8, 13)),
    "goldilocks": ("goldilocks", 7, (8, 6, 17)),
}


class Poseidon2:
    def __init__(self, spec: FieldSpec, width: int | None = None,
                 rf: int | None = None, rp: int | None = None,
                 seed: str | None = None):
        tag, d, (dw, drf, drp) = PARAMS[spec.name]
        self.spec = spec
        self.eng: FieldEngine = for_spec(spec)
        self.width = width or dw
        self.rf = rf or drf
        self.rp = rp or drp
        self.d = d
        t = self.width
        if seed is None:
            seed = (f"Poseidon2-{tag}[t={t},rF={self.rf},"
                    f"rP={self.rp},d={d}]")
        self.seed = seed
        self._init_round_keys()
        self._init_matrices()

    # -- constants ----------------------------------------------------------
    def _init_round_keys(self):
        """Keccak chain (poseidon2.go:88 initRC): full rounds get width keys,
        partial rounds one key each, in derivation order."""
        q = self.spec.modulus
        rnd = keccak256(self.seed.encode())

        def next_key():
            nonlocal rnd
            rnd = keccak256(rnd)
            return int.from_bytes(rnd, "big") % q

        t, rf, rp = self.width, self.rf, self.rp
        pre = [[next_key() for _ in range(t)] for _ in range(rf // 2)]
        mid = [next_key() for _ in range(rp)]
        post = [[next_key() for _ in range(t)] for _ in range(rf // 2)]
        eng = self.eng
        to_m = lambda vals: eng.to_mont(eng.from_int(vals, mont=False))
        self._rk_pre = [to_m(row) for row in pre]       # each (t, ...)
        self._rk_mid = to_m(mid)                         # (rp, ...)
        self._rk_post = [to_m(row) for row in post]

    def _init_matrices(self):
        key = (self.spec.name, self.width)
        if self.width >= 4:
            diag = _DIAG.get(key)
            if diag is None and self.width % 4 == 0:
                raise NotImplementedError(
                    f"no internal diagonal for {key}; add it to _DIAG")
            q = self.spec.modulus
            vals = [n * pow(d, -1, q) % q for n, d in diag]
            eng = self.eng
            self._diag = eng.to_mont(eng.from_int(vals, mont=False))
        else:
            self._diag = None

    # -- permutation pieces (state: (t, batch...) Montgomery) ----------------
    def _sbox(self, x):
        eng = self.eng
        d = self.d
        if d == 3:
            return eng.mul(eng.square(x), x)
        if d == 5:
            return eng.mul(eng.square(eng.square(x)), x)
        if d == 7:
            x2 = eng.square(x)
            return eng.mul(eng.mul(eng.square(x2), x2), x)
        if d == 17:
            x16 = eng.square(eng.square(eng.square(eng.square(x))))
            return eng.mul(x16, x)
        raise NotImplementedError(d)

    def _mat_external(self, s):
        """circ(2M4, M4, ...) / small-width specials (poseidon2.go:221)."""
        eng = self.eng
        t = self.width
        xs = [s[i] for i in range(t)]
        if t == 2:
            tot = eng.add(xs[0], xs[1])
            return jnp.stack([eng.add(tot, xs[0]), eng.add(tot, xs[1])])
        if t == 3:
            tot = eng.add(eng.add(xs[0], xs[1]), xs[2])
            return jnp.stack([eng.add(tot, x) for x in xs])
        out = list(xs)
        for b in range(t // 4):
            s0, s1, s2, s3 = out[4 * b : 4 * b + 4]
            t01 = eng.add(s0, s1)
            t23 = eng.add(s2, s3)
            t0123 = eng.add(t01, t23)
            t01123 = eng.add(t0123, s1)
            t01233 = eng.add(t0123, s3)
            o3 = eng.add(eng.double(s0), t01233)
            o1 = eng.add(eng.double(s2), t01123)
            o0 = eng.add(t01, t01123)
            o2 = eng.add(t23, t01233)
            out[4 * b : 4 * b + 4] = [o0, o1, o2, o3]
        if t > 4:
            sums = [out[j] for j in range(4)]
            for b in range(1, t // 4):
                for j in range(4):
                    sums[j] = eng.add(sums[j], out[4 * b + j])
            out = [eng.add(out[i], sums[i % 4]) for i in range(t)]
        return jnp.stack(out)

    def _mat_internal(self, s):
        eng = self.eng
        t = self.width
        xs = [s[i] for i in range(t)]
        tot = xs[0]
        for x in xs[1:]:
            tot = eng.add(tot, x)
        if t == 2:
            return jnp.stack([eng.add(xs[0], tot),
                              eng.add(eng.double(xs[1]), tot)])
        if t == 3:
            return jnp.stack([eng.add(xs[0], tot), eng.add(xs[1], tot),
                              eng.add(eng.double(xs[2]), tot)])
        diag = self._diag
        return jnp.stack([
            eng.add(eng.mul(xs[i], diag[i]), tot) for i in range(t)])

    def permutation(self, state):
        """Full Poseidon2 permutation; state (t, batch...) Montgomery."""
        eng = self.eng
        s = self._mat_external(state)
        for rk in self._rk_pre:
            s = eng.add(s, rk[:, None] if rk.ndim < s.ndim else rk)
            s = self._sbox(s)
            s = self._mat_external(s)

        def partial(s, rk):
            s0 = eng.add(s[0], rk)
            s = s.at[0].set(self._sbox(s0))
            return self._mat_internal(s), None

        s, _ = lax.scan(partial, s, self._rk_mid)
        for rk in self._rk_post:
            s = eng.add(s, rk[:, None] if rk.ndim < s.ndim else rk)
            s = self._sbox(s)
            s = self._mat_external(s)
        return s

    # -- hashing API --------------------------------------------------------
    def permute_plain(self, state_plain):
        """(t, batch) plain values -> permuted plain values."""
        eng = self.eng
        return eng.from_mont(self.permutation(eng.to_mont(state_plain)))

    def compress(self, left, right):
        """2-1 compression with right feed-forward (poseidon2.go Compress):
        out = P(left || right)[t/2:] + right. Inputs (t/2, batch) plain."""
        eng = self.eng
        t = self.width
        x = jnp.concatenate([left, right], axis=0)
        y = self.permute_plain(x)
        return eng.add(y[t // 2 :], right)

    def hash_blocks(self, blocks):
        """Merkle-Damgard over (nb, t/2, batch) plain blocks, zero IV
        (hash/merkle-damgard.go:77): state <- Compress(state, block)."""
        eng = self.eng
        t = self.width
        state0 = eng.zeros((t // 2, *eng.eshape(blocks[0, 0])))

        def body(state, block):
            return self.compress(state, block), None

        state, _ = lax.scan(body, state0, blocks)
        return state


@functools.lru_cache(maxsize=None)
def poseidon2(field_name: str, width=None, rf=None, rp=None) -> Poseidon2:
    return Poseidon2(fs.get_field(field_name), width, rf, rp)


class Poseidon2MD:
    """Host hashlib-style Merkle-Damgard hasher over a Poseidon2 permutation
    (reference NewMerkleDamgardHasher, hash/merkle-damgard.go:77): zero IV,
    blocks of t/2 canonical field elements, zero-padded on the left."""

    def __init__(self, perm: Poseidon2):
        self.perm = perm
        self.spec = perm.spec
        self._buf = b""

    @property
    def block_bytes(self) -> int:
        return (self.perm.width // 2) * self.spec.n_bytes

    def reset(self):
        self._buf = b""

    def update(self, data: bytes):
        self._buf += data

    write = update

    def digest(self) -> bytes:
        eng = self.perm.eng
        t2 = self.perm.width // 2
        nb = self.spec.n_bytes
        data = self._buf
        bb = self.block_bytes
        if len(data) % bb:
            # zero-pad the final partial block on the left (cloneLeftPadded)
            last = data[-(len(data) % bb):]
            data = data[: -(len(data) % bb)] + b"\x00" * (bb - len(last)) + last
        state = eng.zeros((t2, 1))
        for off in range(0, len(data), bb):
            block_vals = []
            for i in range(t2):
                chunk = data[off + i * nb : off + (i + 1) * nb]
                v = int.from_bytes(chunk, "big")
                if v >= self.spec.modulus:
                    raise ValueError("non-canonical block element")
                block_vals.append(v)
            block = eng.from_int(block_vals, mont=False)
            block = block.reshape(t2, 1, *block.shape[1:])
            state = self.perm.compress(state, block)
        out = b""
        for i in range(t2):
            out += eng.to_bytes_host(state[i], mont=False)[0]
        return out

    def sum(self) -> bytes:
        return self.digest()
