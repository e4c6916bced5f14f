"""Ring-SIS hash over Z_q[X]/(X^d + 1) — bit-exact with the reference.

Counterpart of ``field/<f>/sis/sis.go``: key polynomials A_i derived from
blake2b("SIS" || seed || i || j); inputs limb-decomposed little-endian into
2^logTwoBound digits; negacyclic multiply-accumulate done in evaluation form
on the coset sqrt(g)*<g> (the reference's WithShift domain, sis.go:93-99);
one inverse coset FFT at the end. The whole limb matrix is transformed with
one batched coset-NTT on device (reference: per-poly FFTs + the fused
AVX-512 sis512_16 kernel).
"""

from __future__ import annotations

import functools
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from gnark_crypto_tpu.field.api import for_spec
from gnark_crypto_tpu.ntt import fft as fftm
from gnark_crypto_tpu.ntt.domain import Domain
from gnark_crypto_tpu.specs import field as fs
from gnark_crypto_tpu.specs.field import FieldSpec


def _derive_element(seed: int, i: int, j: int, q: int) -> int:
    buf = b"SIS" + seed.to_bytes(8, "big") + i.to_bytes(8, "big") \
        + j.to_bytes(8, "big")
    return int.from_bytes(
        hashlib.blake2b(buf, digest_size=32).digest(), "big") % q


class RSis:
    def __init__(self, spec: FieldSpec, seed: int, log_two_degree: int,
                 log_two_bound: int, max_nb_elements: int):
        if log_two_bound % 8 != 0:
            raise ValueError("logTwoBound must be a multiple of 8")
        if (spec.n_bytes * 8) % log_two_bound and spec.n_bytes % (
                log_two_bound // 8):
            raise ValueError("limb size must divide the field byte size")
        self.spec = spec
        self.eng = for_spec(spec)
        self.degree = 1 << log_two_degree
        self.log_two_bound = log_two_bound
        self.limbs_per_elem = spec.n_bytes // (log_two_bound // 8)
        n = self.limbs_per_elem * max_nb_elements
        self.n_polys = -(-n // self.degree)
        self.max_nb_elements = max_nb_elements
        q = spec.modulus
        # coset shift = generator of order 2d (sqrt of the domain generator)
        shift = pow(spec.two_adic_root,
                    1 << (spec.two_adicity - (log_two_degree + 1)), q)
        self.domain = Domain(spec, self.degree, shift=shift)
        # The reference writes decomposed limbs straight into the Montgomery
        # slot (InnerHash: k[j][0] = l, sis.go:225), so a coefficient's
        # VALUE is l * R_ref^-1 with R_ref = 2^(64*words) — the GO field's
        # radix. Our limb engines use R_ours = 2^(limb_bits*n_limbs); the
        # hash is bilinear, so the fixed mismatch factor R_ours/R_ref is
        # folded into the key's evaluation form once here (zero per-hash
        # cost) instead of multiplying every decomposed input.
        if self.eng.elem_dims:
            words = -(-q.bit_length() // 64)
            r_ref = pow(2, 64 * words, q)
            r_ours = (1 << (spec.limb_bits * spec.n_limbs)) % q
            self._radix_corr = r_ours * pow(r_ref, -1, q) % q
        else:
            self._radix_corr = 1  # f31: R_ours = R_ref = 2^32
        # key polynomials + their coset-evaluation forms, one batched FFT
        self.set_key([[_derive_element(seed, i, j, q)
                       for j in range(self.degree)]
                      for i in range(self.n_polys)])

    def set_key(self, a_rows: list[list[int]]):
        """Install explicit key polynomials (rows of canonical ints) and
        precompute their coset-evaluation form (reference Ag)."""
        eng = self.eng
        flat = [int(v) for row in a_rows for v in row]
        if self._radix_corr != 1:
            q = self.spec.modulus
            flat = [v * self._radix_corr % q for v in flat]
        a_dev = eng.reshape(eng.from_int(flat), (self.n_polys, self.degree))
        self.ag = jax.vmap(
            lambda p: fftm.fft(self.domain, p, fftm.DIF, coset=True))(a_dev)

    def set_key_sage(self, seed: int):
        """The reference test-vector key (sis_test.go:147
        makeKeyDeterministic): A[i][j] = (seed+i)^(2^(j+1)) mod q."""
        q = self.spec.modulus
        rows = []
        for i in range(self.n_polys):
            s = (seed + i) % q
            row = []
            for _ in range(self.degree):
                s = s * s % q
                row.append(s)
            rows.append(row)
        self.set_key(rows)

    def _decompose(self, v):
        """(N,) plain field values -> (n_polys, degree) limb coefficients.

        Little-endian limb order within each element (LimbIterator,
        sis.go:319-342); zero-padded to the full poly matrix.
        """
        eng = self.eng
        n = v.shape[0]
        b = self.log_two_bound
        if eng.elem_dims:
            # limb engine: element limbs are little-endian base 2^lb
            lb = self.spec.limb_bits
            vals = []
            for k in range(self.limbs_per_elem):
                lo = k * b
                acc = None
                for i in range(self.spec.n_limbs):
                    ls = i * lb
                    if ls + lb <= lo or ls >= lo + b:
                        continue
                    piece = v[..., i]
                    sh = ls - lo
                    part = piece << sh if sh >= 0 else piece >> (-sh)
                    acc = part if acc is None else acc | part
                vals.append((acc if acc is not None
                             else jnp.zeros(n, v.dtype))
                            & ((1 << b) - 1))
            limbs = jnp.stack(vals, axis=1)  # (N, limbs_per_elem)
        else:
            shifts = jnp.asarray(
                [k * b for k in range(self.limbs_per_elem)], jnp.uint32)
            limbs = (v[:, None] >> shifts[None]) & jnp.uint32((1 << b) - 1)
        flat = limbs.reshape(-1)
        total = self.n_polys * self.degree
        flat = jnp.pad(flat, (0, total - flat.shape[0]))
        return flat.reshape(self.n_polys, self.degree).astype(
            jnp.uint32 if not eng.elem_dims else jnp.int32)

    def _fft_rows_coset(self, m):
        """Batched coset DIF over the (n_polys, degree) limb rows.

        TPU + 31-bit engine: ONE fused Pallas pass over all rows
        (run_batch_small_f31 — the sis512_16 fused-kernel counterpart;
        the vmapped per-row path measured 2.3M elems/s at 2^16 because
        XLA lowers the small-stride butterflies as gathers). Elsewhere:
        vmapped fft (bit-identical)."""
        import jax as _jax

        eng = self.eng
        if (_jax.default_backend() == "tpu"
                and 8 <= self.degree <= 1024):
            ct = jnp.asarray(self.domain.coset_table)
            if eng.elem_dims == 0:
                from gnark_crypto_tpu.ntt.pallas_ntt_f31 import \
                    run_batch_small_f31
                mm = eng.mul(m, ct[None, :])
                return run_batch_small_f31(self.domain, mm, fftm.DIF,
                                           False)
            if (self.spec.limb_bits == 32 and self.spec.n_limbs == 2
                    and (m.shape[0] * self.degree) % 1024 == 0):
                from gnark_crypto_tpu.ntt.pallas_ntt_f64 import \
                    run_batch_small_f64
                mm = eng.mul(m, ct[None, :])
                return run_batch_small_f64(self.domain, mm, fftm.DIF,
                                           False)
        return jax.vmap(
            lambda p: fftm.fft(self.domain, p, fftm.DIF, coset=True))(m)

    def hash(self, v):
        """(N,) plain field elements -> (degree,) plain hash coefficients.

        res = InvFFT_coset( sum_i FFT_coset(m_i) * Ag_i )  (sis.go:142-196).
        """
        eng = self.eng
        # Raw limbs go straight into the Montgomery slot, exactly like the
        # reference (InnerHash: k[j][0] = l, sis.go:225). The radix
        # mismatch between our limb engines and the Go fields is already
        # folded into the key (see __init__ _radix_corr).
        if eng.elem_dims:
            limbs = self._decompose(v)
            lb = self.spec.limb_bits
            # f64 stores uint32 words (lb == 32: no mask — it would not fit
            # in int32 and a whole word passes through unmasked anyway)
            dt = jnp.uint32 if lb == 32 else jnp.int32
            memb = jnp.zeros((*limbs.shape, self.spec.n_limbs), dt)
            for i in range(-(-self.log_two_bound // lb)):
                piece = limbs >> (i * lb)
                if lb < 32:
                    piece = piece & ((1 << lb) - 1)
                memb = memb.at[..., i].set(piece.astype(dt))
            m = memb
        else:
            m = self._decompose(v)
        kf = self._fft_rows_coset(m)
        acc = eng.mul(kf, self.ag)
        res = eng.sum_reduce(acc)
        out = fftm.fft_inverse(self.domain, res, fftm.DIT, coset=True)
        return eng.from_mont(out)

    def hash_many(self, vs):
        """(B, N) -> (B, degree): B independent hashes in ONE batched
        pipeline (the Vortex transversal-hash shape,
        transversal_hash.go:10-51). On TPU/f31 both FFT directions run as
        single fused Pallas passes over all B*n_polys rows; elsewhere it
        is a vmap of :meth:`hash` (bit-identical)."""
        import jax as _jax

        eng = self.eng
        if not (_jax.default_backend() == "tpu" and eng.elem_dims == 0
                and 8 <= self.degree <= 1024):
            return jax.vmap(self.hash)(vs)
        B = vs.shape[0]
        m = jax.vmap(self._decompose)(vs)          # (B, P, d)
        P, d = m.shape[1], m.shape[2]
        from gnark_crypto_tpu.ntt.pallas_ntt_f31 import run_batch_small_f31
        ct = jnp.asarray(self.domain.coset_table)
        mm = eng.mul(m.reshape(B * P, d), ct[None, :])
        kf = run_batch_small_f31(self.domain, mm, fftm.DIF,
                                 False).reshape(B, P, d)
        acc = eng.mul(kf, jnp.asarray(self.ag)[None])
        res = acc[:, 0]
        for i in range(1, P):                      # P is small (tree-free)
            res = eng.add(res, acc[:, i])
        out = run_batch_small_f31(self.domain, res, fftm.DIT, True)
        cti = jnp.asarray(self.domain.coset_table_inv)
        card = jnp.asarray(self.domain.cardinality_inv)
        scale = eng.mul(cti, jnp.broadcast_to(card, cti.shape))
        return eng.from_mont(eng.mul(out, scale[None, :]))


@functools.lru_cache(maxsize=None)
def rsis(field_name: str, seed: int, log_two_degree: int, log_two_bound: int,
         max_nb_elements: int) -> RSis:
    return RSis(fs.get_field(field_name), seed, log_two_degree,
                log_two_bound, max_nb_elements)
