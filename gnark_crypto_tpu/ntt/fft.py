"""Radix-2 NTT over batched field arrays — single-chip programs.

TPU-native counterpart of ``ecc/bn254/fr/fft/fft.go``. Semantics match the
reference exactly (bit-exact outputs):

  * ``fft(a, DIF)``  : natural-order input  -> bit-reversed output
  * ``fft(a, DIT)``  : bit-reversed input   -> natural-order output
  * ``fft_inverse``  : same decimations with inverse twiddles + 1/n scale
  * ``coset=True``   : evaluate on u*<g> — pre-scale by u^i (DIF) /
    u^bitrev(i) (DIT); inverse post-scales by u^-i (fft.go:44-106,145-194)

Where the reference does fork-join recursion into unrolled leaf kernels
(``difFFT`` fft.go:196-266, ``kerDIFNP_256`` fft.go:389+), the TPU program is
k fully-vectorized stages: stage s views the array as (2^s, 2, n/2^(s+1))
blocks and applies one batched butterfly over a constant (n/2)-element shape,
so XLA compiles a single fused elementwise kernel per stage shape; there is
no recursion and no scalar loop.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from gnark_crypto_tpu.ntt.domain import Domain

DIF = "DIF"
DIT = "DIT"
Decimation = Literal["DIF", "DIT"]


@functools.lru_cache(maxsize=None)
def _bitrev_perm(n: int) -> np.ndarray:
    k = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int32)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


def bit_reverse(a: jax.Array) -> jax.Array:
    """Bit-reversal permutation along the leading axis (utils/bitreverse.go:14).

    One XLA gather — the reference's cache-oblivious COBRA tiling
    (bitreverse.go:57) is unnecessary on TPU where gathers stream from HBM.
    """
    n = a.shape[0]
    return a[jnp.asarray(_bitrev_perm(n))]


def _split(eng, a, s):
    n = a.shape[0]
    half = n >> (s + 1)
    v = eng.reshape(a, (1 << s, 2, half))
    return (eng.reshape(v[:, 0], (n // 2,)),
            eng.reshape(v[:, 1], (n // 2,)))


def _join(eng, lo, hi, s, n):
    half = n >> (s + 1)
    lo = eng.reshape(lo, (1 << s, 1, half))
    hi = eng.reshape(hi, (1 << s, 1, half))
    return eng.reshape(jnp.concatenate([lo, hi], axis=1), (n,))


def _dif_stages(eng, a, twiddle_fn, k):
    n = a.shape[0]
    for s in range(k):
        lo, hi = _split(eng, a, s)
        tw = eng.tile_lead(twiddle_fn(s), 1 << s)
        out_lo = eng.add(lo, hi)
        out_hi = eng.mul(eng.sub(lo, hi), tw)
        a = _join(eng, out_lo, out_hi, s, n)
    return a


def _dit_stages(eng, a, twiddle_fn, k):
    n = a.shape[0]
    for s in range(k - 1, -1, -1):
        lo, hi = _split(eng, a, s)
        tw = eng.tile_lead(twiddle_fn(s), 1 << s)
        hi = eng.mul(hi, tw)
        out_lo = eng.add(lo, hi)
        out_hi = eng.sub(lo, hi)
        a = _join(eng, out_lo, out_hi, s, n)
    return a


# ---------------------------------------------------------------------------
# staged execution: ONE compiled butterfly kernel per (spec, n), reused for
# every stage via index arrays. Rationale: the fused whole-transform graph
# (k stages x unrolled limb mul) compiles for minutes on the TPU backend;
# a single gather/scatter stage keeps the graph tiny and constant-shape.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _stage_index_stack(n: int, k: int, reverse: bool):
    """(k, n/2) lo/hi/twiddle index arrays, one row per butterfly stage."""
    los, his, tws = [], [], []
    order = range(k - 1, -1, -1) if reverse else range(k)
    for s in order:
        half = n >> (s + 1)
        i = np.arange(n // 2, dtype=np.int32)
        block = i // half
        off = i % half
        lo = block * (2 * half) + off
        los.append(lo)
        his.append(lo + half)
        tws.append((off << s).astype(np.int32))
    # concrete even when first touched inside a jit trace: the cached
    # arrays must not be leaked tracers (observed via the vmapped SIS FFT)
    with jax.ensure_compile_time_eval():
        return (jnp.asarray(np.stack(los)), jnp.asarray(np.stack(his)),
                jnp.asarray(np.stack(tws)))


@functools.lru_cache(maxsize=None)
def _stage_kernel(eng, decimation: Decimation):
    """One jitted butterfly stage (same shape for every stage of a size-n
    transform) — compiled once, dispatched k times from the host."""
    def dif_stage(a, tw0, lo_i, hi_i, tw_i):
        lo, hi, tw = a[lo_i], a[hi_i], tw0[tw_i]
        out_lo = eng.add(lo, hi)
        out_hi = eng.mul(eng.sub(lo, hi), tw)
        return a.at[lo_i].set(out_lo).at[hi_i].set(out_hi)

    def dit_stage(a, tw0, lo_i, hi_i, tw_i):
        lo, hi, tw = a[lo_i], a[hi_i], tw0[tw_i]
        hi = eng.mul(hi, tw)
        return a.at[lo_i].set(eng.add(lo, hi)).at[hi_i].set(eng.sub(lo, hi))

    return jax.jit(dif_stage if decimation == DIF else dit_stage)


def _run_stages(domain: Domain, a, decimation: Decimation, inverse: bool):
    """Butterfly stages via a single reused stage kernel.

    The fused whole-transform graph (k stages x unrolled limb mul) takes
    minutes to compile on the TPU backend, so on TPU the transform runs as
    one small constant-shape gather/scatter kernel: host-dispatched k times
    when called eagerly, or as a lax.scan over the stacked per-stage index
    arrays when inside an outer trace (jit/vmap/shard_map)."""
    eng = domain.eng
    n = domain.n
    tw0 = domain.twiddles0_inv if inverse else domain.twiddles0
    if not isinstance(a, jax.core.Tracer):
        kern = _stage_kernel(eng, decimation)
        lo, hi, tw = _stage_index_stack(n, domain.k,
                                        reverse=(decimation == DIT))
        for s in range(domain.k):
            a = kern(a, tw0, lo[s], hi[s], tw[s])
        return a

    idx = _stage_index_stack(n, domain.k, reverse=(decimation == DIT))

    if decimation == DIF:
        def body(a, s):
            lo_i, hi_i, tw_i = s
            lo, hi, tw = a[lo_i], a[hi_i], tw0[tw_i]
            out_lo = eng.add(lo, hi)
            out_hi = eng.mul(eng.sub(lo, hi), tw)
            return a.at[lo_i].set(out_lo).at[hi_i].set(out_hi), None
    else:
        def body(a, s):
            lo_i, hi_i, tw_i = s
            lo, hi, tw = a[lo_i], a[hi_i], tw0[tw_i]
            hi = eng.mul(hi, tw)
            return (a.at[lo_i].set(eng.add(lo, hi))
                    .at[hi_i].set(eng.sub(lo, hi))), None

    a, _ = jax.lax.scan(body, a, idx)
    return a


def _use_staged(domain: Domain, a) -> bool:
    import jax as _jax

    # The fused whole-transform graph compiles pathologically slowly under
    # the TPU backend for BOTH engines (measured: minutes even for f31 at
    # 2^20); the staged path keeps the compiled graph O(1) in transform size.
    return _jax.default_backend() == "tpu"


def _use_pallas(domain: Domain, a):
    """Returns the Pallas runner for this engine/shape on TPU, else None."""
    import jax as _jax

    if _jax.default_backend() != "tpu":
        return None
    from gnark_crypto_tpu.ntt import pallas_ntt, pallas_ntt_f31, \
        pallas_ntt_f64
    if pallas_ntt.supported(domain, a):
        return pallas_ntt.run_stages_pallas
    if pallas_ntt_f31.supported(domain, a):
        return pallas_ntt_f31.run_stages_pallas_f31
    if pallas_ntt_f64.supported(domain, a):
        return pallas_ntt_f64.run_stages_pallas_f64
    return None


def _run(domain: Domain, a, decimation: Decimation, inverse: bool):
    """Stage dispatcher. Preference order on TPU: four-step Pallas
    (per-tile-constant twiddles — see pallas_ntt4), radix-2 Pallas passes,
    gather-stage kernels; fused XLA graph on CPU.

    Returns (out, scale_folded): the four-step inverse path folds the 1/n
    scale into its untwist table, so callers must skip the separate scale
    multiply when scale_folded is True."""
    import jax as _jax

    if _jax.default_backend() == "tpu":
        from gnark_crypto_tpu.ntt import pallas_ntt4
        if pallas_ntt4.supported(domain, a, decimation, inverse):
            return (pallas_ntt4.run_stages_four_step(
                domain, a, decimation, inverse), inverse)
    runner = _use_pallas(domain, a)
    if runner is not None:
        return runner(domain, a, decimation, inverse), False
    if _use_staged(domain, a):
        return _run_stages(domain, a, decimation, inverse), False
    eng = domain.eng
    tw = lambda s: domain.stage_twiddles(s, inverse=inverse)
    if decimation == DIF:
        return _dif_stages(eng, a, tw, domain.k), False
    return _dit_stages(eng, a, tw, domain.k), False


def fft(domain: Domain, a: jax.Array, decimation: Decimation = DIF,
        coset: bool = False) -> jax.Array:
    """Forward NTT; layout conventions as in the module docstring."""
    eng = domain.eng
    n = domain.n
    assert a.shape[0] == n, (a.shape, n)
    if coset:
        table = domain.coset_table
        if decimation == DIT:
            table = bit_reverse(table)
        a = eng.mul(a, table)
    out, _ = _run(domain, a, decimation, inverse=False)
    return out


def fft_inverse(domain: Domain, a: jax.Array, decimation: Decimation = DIF,
                coset: bool = False) -> jax.Array:
    """Inverse NTT (+ 1/n scale; + coset unscale when coset=True)."""
    eng = domain.eng
    n = domain.n
    assert a.shape[0] == n
    a, scale_folded = _run(domain, a, decimation, inverse=True)
    card_inv = eng.broadcast_to(domain.cardinality_inv, (1,))
    if not coset:
        return a if scale_folded else eng.mul(a, card_inv)
    table = domain.coset_table_inv
    if decimation == DIF:
        table = bit_reverse(table)
    scale = table if scale_folded else eng.mul(table, card_inv)
    return eng.mul(a, scale)


def make_fft_fn(domain: Domain, decimation: Decimation = DIF,
                coset: bool = False, inverse: bool = False):
    """Return a jitted a -> fft(a) closure over the domain's tables."""
    if inverse:
        return jax.jit(lambda a: fft_inverse(domain, a, decimation, coset))
    return jax.jit(lambda a: fft(domain, a, decimation, coset))


def fft_batch(domain: Domain, a: jax.Array, decimation: Decimation = DIF,
              coset: bool = False, inverse: bool = False) -> jax.Array:
    """Transform a batch of B polynomials along axis 1.

    ``a``: (B, n) for 31-bit engines, (B, n, L) for multi-limb engines —
    the layout of the reference's per-polynomial ``domain.FFT`` calls in a
    loop (iop/quotient pipelines transform dozens of polynomials per
    proof). On TPU each row dispatches through the Pallas pipeline (the
    per-row programs are compiled once and reused); elsewhere the rows are
    vmapped into one fused program.
    """
    fn = fft_inverse if inverse else fft
    if jax.default_backend() == "tpu":
        rows = [fn(domain, a[i], decimation, coset)
                for i in range(a.shape[0])]
        return jnp.stack(rows, axis=0)
    return jax.vmap(lambda v: fn(domain, v, decimation, coset))(a)
