"""Distributed NTT: Bailey 4-step factorization across the device mesh.

The reference scales FFT within one node via fork-join recursion
(fft.go:196-266); across chips the TPU-native scheme (SURVEY §5) is:

    n = n1*n2, input viewed as A[i1, i2] (row-major), sharded over i2
    1. local column DFTs of size n1        (fully local per device)
    2. twiddle scale by w^(i2 * k1)        (local, precomputed table)
    3. all_to_all redistribution           (the only collective, rides ICI)
    4. local row DFTs of size n2
    output: natural-order DFT X[k1 + n1*k2] = D[k1, k2], sharded over k1.

Returns natural-order DFT values (the single-chip equivalent is
bit_reverse(fft(a, DIF))).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnark_crypto_tpu.field.api import for_spec
from gnark_crypto_tpu.ntt import fft as fftm
from gnark_crypto_tpu.ntt.domain import Domain
from gnark_crypto_tpu.specs.field import FieldSpec
from gnark_crypto_tpu.utils.scans import exp_table


class DistDomain:
    def __init__(self, spec: FieldSpec, n: int, mesh: Mesh, axis: str = "sp",
                 with_coset: bool = False, shift: int | None = None):
        self.spec = spec
        self.eng = for_spec(spec)
        self.mesh = mesh
        self.axis = axis
        d = mesh.devices.size
        k = n.bit_length() - 1
        k1 = k // 2
        self.n = n
        self.n1 = 1 << k1
        self.n2 = n >> k1
        assert self.n1 % d == 0 and self.n2 % d == 0, \
            "n1 and n2 must be divisible by the mesh size"
        self.dom1 = Domain(spec, self.n1, with_coset=False)
        self.dom2 = Domain(spec, self.n2, with_coset=False)
        # big domain root w (order n); twiddle table T[k1, i2] = w^(k1*i2)
        big = Domain(spec, n, with_coset=False)
        self.generator_int = big.generator_int
        eng = self.eng
        row = exp_table(eng, big.generator, self.n2)  # w^i2

        def body(prev, _):
            nxt = eng.mul(prev, row)
            return nxt, prev

        _, tbl = lax.scan(body, eng.broadcast_to(eng.ones(), (self.n2,)),
                          None, length=self.n1)
        self.twiddle = tbl  # (n1, n2) elements
        q = spec.modulus
        self.n_inv = eng.from_int(pow(n, -1, q))
        # coset tables (domain.go:24-58 semantics: scale by shift^i before
        # the forward transform, by shift^-i after the inverse), built as
        # outer products so no length-n scan is needed
        self.shift_int = (spec.generator if shift is None else shift) % q
        self.shift_inv_int = pow(self.shift_int, -1, q)
        if with_coset:
            self.coset_table = self._outer_table(self.shift_int)
            self.coset_table_inv = self._outer_table(self.shift_inv_int)
        else:
            self.coset_table = None
            self.coset_table_inv = None

    def _outer_table(self, base: int):
        """shift^(i1*n2 + i2) as a flat (n,) element array: outer product of
        exp tables of length n1 (stride n2) and n2."""
        eng = self.eng
        q = self.spec.modulus
        row = exp_table(eng, eng.from_int(base), self.n2)
        col = exp_table(eng, eng.from_int(pow(base, self.n2, q)), self.n1)
        cb = eng.broadcast_to(eng.reshape(col, (self.n1, 1)),
                              (self.n1, self.n2))
        rb = eng.broadcast_to(eng.reshape(row, (1, self.n2)),
                              (self.n1, self.n2))
        return eng.reshape(eng.mul(cb, rb), (self.n,))

    def _local_fft(self, dom, block, batch_axis):
        """DFT along the non-batch axis of a 2-axis element array."""
        fn = lambda v: fftm.bit_reverse(fftm.fft(dom, v, fftm.DIF))
        return jax.vmap(fn, in_axes=batch_axis, out_axes=batch_axis)(block)

    def fft(self, a, coset: bool = False):
        """a: (n,) element array sharded over the leading axis ->
        natural-order DFT, sharded over the leading axis. ``coset=True``
        evaluates on shift*<w> (pre-scale by shift^i, fft.go:44-82)."""
        eng = self.eng
        if coset:
            a = eng.mul(a, self.coset_table)
        n1, n2 = self.n1, self.n2
        d = self.mesh.devices.size
        ax = self.axis

        def step(a_loc, tw_loc):
            # a_loc: rows of A (n1/d, n2): redistribute to column shards
            a_cols = lax.all_to_all(
                a_loc.reshape(n1 // d, d, n2 // d, *a_loc.shape[2:]),
                ax, split_axis=1, concat_axis=0, tiled=False)
            # (d, n1/d, n2/d, ...) -> (n1, n2/d, ...)
            a_cols = a_cols.reshape(n1, n2 // d, *a_loc.shape[2:])
            b = self._local_fft(self.dom1, a_cols, 1)     # column DFTs
            c = eng.mul(b, tw_loc)                        # twiddle scale
            # redistribute to row shards of the (k1, i2) matrix
            c = c.reshape(d, n1 // d, n2 // d, *a_loc.shape[2:])
            c_rows = lax.all_to_all(c, ax, split_axis=0, concat_axis=1,
                                    tiled=False)
            c_rows = c_rows.reshape(n1 // d, n2, *a_loc.shape[2:])
            return self._local_fft(self.dom2, c_rows, 0)  # row DFTs

        elem = (slice(None),) * self.eng.elem_dims
        a2 = a.reshape(n1, n2, *a.shape[1:])
        espec = [None] * self.eng.elem_dims
        fn = shard_map(
            step, mesh=self.mesh,
            in_specs=(P(ax, None, *espec), P(None, ax, *espec)),
            out_specs=P(ax, None, *espec),
            check_vma=False)
        out = fn(a2, self.twiddle)  # (n1, n2): D[k1, k2] = X[k1 + n1*k2]
        # natural order: X[j], j = k1 + n1*k2 -> transpose to (n2, n1)
        out = jnp.swapaxes(out, 0, 1).reshape(self.n, *a.shape[1:])
        return out

    def ifft(self, x, coset: bool = False):
        """Natural-order inverse DFT (+ 1/n scale; + shift^-i unscale when
        ``coset=True``), input/output sharded over the leading axis.

        Uses IDFT[j] = (1/n) * DFT[(-j) mod n]: the forward 4-step program
        is reused verbatim and the index reversal is one cyclic flip (a
        single resharding permutation over ICI) — no w^-1 twiddle tables or
        inverse local domains needed.
        """
        eng = self.eng
        y = self.fft(x)
        y = jnp.concatenate([y[:1], y[1:][::-1]], axis=0)  # j -> -j mod n
        y = eng.mul(y, eng.broadcast_to(self.n_inv, (self.n,)))
        if coset:
            y = eng.mul(y, self.coset_table_inv)
        return y
