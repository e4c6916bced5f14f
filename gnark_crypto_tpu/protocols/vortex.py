"""Vortex: post-quantum polynomial commitment over koalabear.

Counterpart of ``field/koalabear/vortex``: rows are Reed-Solomon encoded
(rate 1/2 by default, reedsolomon.go:15), columns hashed with Ring-SIS
(transversal hash), SIS digests hashed to 8-element leaves with Poseidon2-16
and Merkle-ized; opening = random E4 linear combination of the rows + spot
checks of verifier-selected columns (prover.go Commit/OpenLinComb/
OpenColumns, verifier.go Verify).

E4 row combinations use the compositional extension engine; the E4
IFFT/codeword checks decompose into 4 base-field transforms (linearity).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gnark_crypto_tpu.field.api import for_spec
from gnark_crypto_tpu.hashes.poseidon2 import poseidon2
from gnark_crypto_tpu.hashes.sis import RSis
from gnark_crypto_tpu.ntt import fft as fftm
from gnark_crypto_tpu.ntt.domain import Domain
from gnark_crypto_tpu.specs import field as fs
from gnark_crypto_tpu.towers.smallfield import e4 as e4_engine


@dataclasses.dataclass
class Params:
    nb_columns: int          # row length (power of two)
    max_nb_rows: int
    inv_rate: int            # Reed-Solomon inverse rate (power of two)
    sis: RSis
    num_selected_columns: int

    def __post_init__(self):
        spec = fs.KOALABEAR
        self.eng = for_spec(spec)
        self.e4 = e4_engine("koalabear")
        self.dom_small = Domain(spec, self.nb_columns, with_coset=False)
        self.dom_big = Domain(spec, self.nb_columns * self.inv_rate,
                              with_coset=False)
        self.perm16 = poseidon2("koalabear")  # width 16 -> 8-elem hashes

    @property
    def size_codeword(self):
        return self.nb_columns * self.inv_rate


def new_params(nb_columns: int, max_nb_rows: int, *, inv_rate: int = 2,
               num_selected_columns: int = 16, sis_seed: int = 42,
               sis_log_two_degree: int = 4, sis_log_two_bound: int = 8
               ) -> Params:
    sis = RSis(fs.KOALABEAR, sis_seed, sis_log_two_degree, sis_log_two_bound,
               max_nb_rows)
    return Params(nb_columns, max_nb_rows, inv_rate, sis,
                  num_selected_columns)


# -- Reed-Solomon ------------------------------------------------------------

def encode_rs(p: Params, rows):
    """(rows, nb_columns) plain values -> (rows, size_codeword) codewords.

    IFFT on the small domain then FFT of the zero-padded coefficients on the
    big domain (reedsolomon.go:15)."""
    eng = p.eng
    m = eng.to_mont(rows)

    def enc_one(row):
        coeffs = fftm.bit_reverse(
            fftm.fft_inverse(p.dom_small, row, fftm.DIF))
        padded = jnp.concatenate(
            [coeffs, jnp.zeros((p.size_codeword - p.nb_columns,),
                               coeffs.dtype)], axis=0)
        return fftm.bit_reverse(fftm.fft(p.dom_big, padded, fftm.DIF))

    return eng.from_mont(jax.vmap(enc_one)(m))


# -- commitment --------------------------------------------------------------

@dataclasses.dataclass
class ProverState:
    params: Params
    encoded: jax.Array               # (rows, size_codeword) plain
    column_hashes: jax.Array         # (size_codeword, sis_degree) plain
    levels: list                     # merkle levels, leaves last
    ualpha: jax.Array | None = None  # (size_codeword, 4) E4 values (plain)

    @property
    def root(self):
        return self.levels[0][0]


def _hash_columns(p: Params, encoded):
    """SIS-hash every column (transversal_hash.go) — one batched SIS
    pipeline over all columns (sis.hash_many)."""
    cols = encoded.T  # (size_codeword, rows)
    return p.sis.hash_many(cols)


def _leaf_hashes(p: Params, column_hashes):
    """Poseidon2-MD over 8-element blocks -> 8-element leaves
    (prover.go HashPoseidon2)."""
    n, d = column_hashes.shape
    nb = d // 8
    blocks = column_hashes.reshape(n, nb, 8).transpose(1, 2, 0)  # (nb, 8, n)
    return p.perm16.hash_blocks(blocks).T  # (n, 8)


def _merkle_levels(p: Params, leaves):
    """Tree of 8-element hashes; node = Compress(left, right) with the
    width-16 permutation, batched across each level."""
    levels = [leaves]
    cur = leaves
    while cur.shape[0] > 1:
        left = cur[0::2].T   # (8, n/2)
        right = cur[1::2].T
        cur = p.perm16.compress(left, right).T
        levels.append(cur)
    levels.reverse()  # root first
    return levels


def _commit_fn(p: Params):
    """One jitted program for the whole commit pipeline: eagerly the
    Merkle/MD phases are Poseidon2 dispatch storms through the device
    tunnel (measured 14 s of the 23 s commit at 64x2^10 was the eager
    per-level compress chain). Cached per Params instance (the dataclass
    is mutable, so identity caching instead of lru_cache)."""
    fn = getattr(p, "_commit_jit", None)
    if fn is None:
        @jax.jit
        def run(rows):
            encoded = encode_rs(p, rows)
            col_hashes = _hash_columns(p, encoded)
            leaves = _leaf_hashes(p, col_hashes)
            return encoded, col_hashes, tuple(_merkle_levels(p, leaves))

        p._commit_jit = fn = run
    return fn


def commit(p: Params, rows) -> ProverState:
    encoded, col_hashes, levels = _commit_fn(p)(rows)
    return ProverState(params=p, encoded=encoded, column_hashes=col_hashes,
                       levels=list(levels))


# -- opening -----------------------------------------------------------------

def _e4_from_base_rows(p: Params, rows):
    """(k, n) base values -> (k, n, 2, 2) E4 embeddings (plain)."""
    out = jnp.zeros((*rows.shape, 2, 2), rows.dtype)
    return out.at[..., 0, 0].set(rows)


def _e4_pows(p: Params, alpha4, k: int):
    """[alpha^0 .. alpha^(k-1)] as (k, 4) E4 Montgomery elements."""
    e4 = p.e4
    pows = [e4.ones(())]
    for _ in range(1, k):
        pows.append(e4.mul(pows[-1], alpha4))
    return jnp.stack(pows)


def open_lincomb(ps: ProverState, alpha: tuple) -> ProverState:
    """Ualpha = sum_i alpha^i * row_i over the codeword (prover.go:126)."""
    p = ps.params
    e4 = p.e4
    k = ps.encoded.shape[0]
    alpha4 = e4.from_int(alpha)
    pows = _e4_pows(p, alpha4, k)                  # (k, 2, 2) mont
    enc4m = p.eng.to_mont(_e4_from_base_rows(p, ps.encoded))  # (k, n, 2, 2)
    terms = e4.mul(pows[:, None], enc4m)           # (k, n, 2, 2)
    acc = terms
    while acc.shape[0] > 1:
        half = acc.shape[0] // 2
        red = e4.add(acc[:half], acc[half : 2 * half])
        acc = jnp.concatenate([red, acc[2 * half :]], 0) \
            if acc.shape[0] % 2 else red
    ps.ualpha = p.eng.from_mont(acc[0])            # (n, 2, 2) plain
    return ps


@dataclasses.dataclass
class Proof:
    ualpha: jax.Array                  # (size_codeword, 2, 2) plain E4
    opened_columns: jax.Array          # (k_sel, rows) plain
    merkle_paths: list                 # per column: list of (8,) sibling hashes


def _merkle_path(ps: ProverState, col: int):
    """Sibling hashes from leaf level up (levels stored root-first)."""
    path = []
    idx = col
    for level in reversed(ps.levels):
        if level.shape[0] == 1:
            break
        path.append(level[idx ^ 1])
        idx >>= 1
    return path


def open_columns(ps: ProverState, selected: list[int]) -> Proof:
    cols = ps.encoded.T[jnp.asarray(selected)]  # (k_sel, rows)
    paths = [_merkle_path(ps, c) for c in selected]
    return Proof(ualpha=ps.ualpha, opened_columns=cols, merkle_paths=paths)


# -- verification ------------------------------------------------------------

def _e4_horner(p: Params, coeffs_plain, x4):
    """Horner evaluation of (n, 2, 2) plain E4 coeffs at Montgomery E4 x."""
    e4 = p.e4
    cm = p.eng.to_mont(coeffs_plain)
    acc = cm[-1]
    for i in range(cm.shape[0] - 2, -1, -1):
        acc = e4.add(e4.mul(acc, x4), cm[i])
    return acc


def _base_to_e4_plain(p: Params, v):
    out = jnp.zeros((*v.shape, 2, 2), v.dtype)
    return out.at[..., 0, 0].set(v)


def verify(p: Params, root, proof: Proof, selected: list[int],
           alpha: tuple, eval_point: tuple, claimed_values: list[tuple]
           ) -> bool:
    """verifier.go:37 Verify."""
    e4 = p.e4
    eng = p.eng
    n = p.size_codeword
    alpha4 = e4.from_int(alpha)
    x4 = e4.from_int(eval_point)

    # 1. RS membership: IFFT per E4 coordinate slot (linearity), top
    #    (n - nb_columns) coefficients must vanish
    flat = proof.ualpha.reshape(n, 4)
    # all 4 coordinate slots in ONE batched inverse transform
    rows = eng.to_mont(flat.T)                          # (4, n)
    inv = fftm.fft_batch(p.dom_big, rows, fftm.DIF, inverse=True)
    inv = jnp.take(inv, jnp.asarray(fftm._bitrev_perm(n)), axis=1)
    coeffs4 = eng.from_mont(inv).T.reshape(n, 2, 2)
    top = coeffs4[p.nb_columns :]
    if not bool(np.all(np.asarray(top) == 0)):
        return False

    # 2. consistency with claimed values:
    #    UalphaPoly(x) == Horner(claimed_values, alpha)
    ua_at_x = _e4_horner(p, coeffs4[: p.nb_columns], x4)
    claims4 = jnp.stack([e4.from_int(c) for c in claimed_values])
    acc = claims4[-1]
    for i in range(claims4.shape[0] - 2, -1, -1):
        acc = e4.add(e4.mul(acc, alpha4), claims4[i])
    if not np.array_equal(np.asarray(ua_at_x), np.asarray(acc)):
        return False

    # 3. column linear combinations match ualpha at the selected positions
    for i, col in enumerate(selected):
        col4 = _base_to_e4_plain(p, proof.opened_columns[i])
        y = _e4_horner(p, col4, alpha4)
        ua_mont = eng.to_mont(proof.ualpha[col])
        if not np.array_equal(np.asarray(y), np.asarray(ua_mont)):
            return False

    # 4. SIS hash + merkle membership of each opened column
    for i, col in enumerate(selected):
        sis_h = p.sis.hash(proof.opened_columns[i])
        leaf = _leaf_hashes(p, sis_h[None])[0]
        idx = col
        cur = leaf
        for sib in proof.merkle_paths[i]:
            if idx & 1:
                cur = p.perm16.compress(sib[:, None], cur[:, None])[:, 0]
            else:
                cur = p.perm16.compress(cur[:, None], sib[:, None])[:, 0]
            idx >>= 1
        if not np.array_equal(np.asarray(cur), np.asarray(root)):
            return False
    return True
