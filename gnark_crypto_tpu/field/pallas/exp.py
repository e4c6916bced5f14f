"""Pallas TPU kernel: fixed-exponent ladder for small batches.

The XLA form of ``exp_const`` (lax.scan over exponent bits) is latency-bound
for small batches: each of ~254 steps is a separate tiny device op, measured
~77 ms for a width-1 Fermat inversion on the bench chip. Pippenger's
batch-affine accumulator needs one such inversion per tree level (the
Montgomery-trick seed, reference ``BatchInvert`` element.go:666), so this
kernel runs the WHOLE square-and-multiply ladder inside one Pallas program:
~2*nbits in-VMEM CIOS multiplies with zero dispatch latency (~1 ms).

One Mosaic kernel per (spec, exponent) pair — exponent bits are baked in as
a static unrolled schedule (the exponent is a compile-time constant, exactly
like the reference's addchain-generated ``element_exp.go``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnark_crypto_tpu.field.pallas.mont_mul import _mm_tile, _round_up
from gnark_crypto_tpu.specs.field import FieldSpec, int_to_limbs

LANES = 128


def _exp_kernel(spec: FieldSpec, l_pad: int, nbits: int,
                bits_ref, x_ref, one_ref, q_ref, o_ref):
    q = q_ref[:]
    x = x_ref[:]
    # MSB-first square-and-multiply as a fori_loop over the exponent bits
    # (read from SMEM): two _mm_tile instances total in the kernel IR —
    # an unrolled 254-step schedule costs minutes of Mosaic compile and the
    # persistent compile cache does not hit on this backend.
    def body(i, acc):
        acc = _mm_tile(spec, l_pad, acc, acc, q)
        m = _mm_tile(spec, l_pad, acc, x, q)
        return jnp.where(bits_ref[i] == 1, m, acc)

    o_ref[:] = jax.lax.fori_loop(0, nbits, body, one_ref[:])


@functools.lru_cache(maxsize=None)
def _const_tiles(spec: FieldSpec, l_pad: int):
    L = spec.n_limbs
    q = np.asarray(spec.q_limbs + (0,) * (l_pad - L), np.int32)[:, None]
    one = np.asarray(
        tuple(int_to_limbs(spec.r % spec.modulus, spec.limb_bits, L))
        + (0,) * (l_pad - L), np.int32)[:, None]
    return (np.broadcast_to(q, (l_pad, LANES)).copy(),
            np.broadcast_to(one, (l_pad, LANES)).copy())


@functools.lru_cache(maxsize=None)
def _exp_bits(e: int):
    nbits = e.bit_length()
    return np.asarray([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)],
                      np.int32)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def exp_const_pallas(spec: FieldSpec, x, e: int, interpret: bool = False):
    """x^e (Montgomery in/out) on an (n, L) int32 array, n <= 128.

    Intended for tiny widths (Fermat inversion seeds, sqrt chains) where the
    XLA bit-scan is dispatch-latency-bound; big batches should keep the scan
    (compute-bound either way).
    """
    assert e > 0
    n, L = x.shape
    assert n <= LANES, n
    l_pad = _round_up(max(L, 8), 8)
    xt = jnp.zeros((l_pad, LANES), jnp.int32).at[:L, :n].set(x.T)
    qt, onet = _const_tiles(spec, l_pad)
    bits = _exp_bits(e)
    nbits = bits.shape[0]
    kern = functools.partial(_exp_kernel, spec, l_pad, nbits)
    bs = pl.BlockSpec((l_pad, LANES), lambda: (0, 0),
                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((l_pad, LANES), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), bs, bs, bs],
        out_specs=bs,
        interpret=interpret,
    )(jnp.asarray(bits), xt, jnp.asarray(onet), jnp.asarray(qt))
    return out[:L, :n].T


def inverse_small(spec: FieldSpec, x, interpret: bool = False):
    """x^(q-2) for small (n, L) batches via the in-kernel ladder.

    Maps 0 -> 0 like the engine's Fermat inverse (x=0 stays 0 through the
    ladder since every term contains a factor x).
    """
    return exp_const_pallas(spec, x, spec.modulus - 2, interpret)
