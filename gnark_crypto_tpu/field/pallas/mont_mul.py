"""Pallas TPU kernel: batched multi-limb Montgomery multiplication.

The native tier of the field engine (the reference's counterpart is the
generated ADX/AVX-512 assembly, ``field/asm/element_4w``). The kernel runs
the same lazy-carry operand-scan CIOS as ``field/mont.py`` but in the
TPU-native layout: **limbs in sublanes, elements in lanes** — a block is
``(L_pad, TILE)`` int32 with TILE a multiple of 128, so every op in the
limb recurrence is a full-width VPU op and the whole product stays in
VMEM/registers (no interstage HBM traffic, no XLA graph blow-up: Mosaic
compiles the unrolled kernel directly).

Use ``mont_mul(spec, x, y)`` on ``(N, L)`` arrays; CPU tests run the same
kernel under the Pallas interpreter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnark_crypto_tpu.specs.field import FieldSpec

TILE = 512  # elements per grid step (lanes); multiple of 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def _carry_rows(t, l_pad, b, mask):
    """Full carry propagation over the (l_pad, TILE) limb rows (signed lazy
    carries: arithmetic >> floors, so negative interim limbs work)."""
    rows = [t[i, :] for i in range(l_pad)]
    # tracer-derived zero: a literal jnp.zeros would concretize under
    # jax.ensure_compile_time_eval (table builds) and become an illegal
    # captured constant in the kernel jaxpr
    c = rows[0] ^ rows[0]
    norm = []
    for i in range(l_pad):
        v = rows[i] + c
        norm.append(v & mask)
        c = v >> b
    return jnp.stack(norm, axis=0), c


def _cond_sub_q(t, q_col, l_pad, b, mask):
    """t - q with borrow chain; keep t where it would underflow."""
    d = t - q_col
    dnorm, c = _carry_rows(d, l_pad, b, mask)
    return jnp.where((c < 0)[None, :], t, dnorm)


def _mm_tile(spec: FieldSpec, l_pad: int, x, y, q_col):
    """Montgomery product of two (l_pad, TILE) limb tiles (in-kernel).

    The operand scan runs as a lax.fori_loop (not unrolled): Mosaic compile
    time scales with instruction count, and the unrolled 22-iteration CIOS
    at wide tiles pushed whole-NTT compiles past 10 minutes.
    """
    b = spec.limb_bits
    L = spec.n_limbs
    mask = spec.mask
    qinv = spec.qinv_neg
    zero_row = x[0:1, :] ^ x[0:1, :]  # tracer-derived (see _carry_rows)

    unroll = 2 if L % 2 == 0 else 1  # odd limb counts (e.g. goldilocks L=5)

    def body(i, carry_in):
        t, xr = carry_in
        for u in range(unroll):
            xi = xr[u:u + 1, :]  # current limb row (x rotates up per
            # iteration — Mosaic has no dynamic value slicing)
            t = t + xi * y
            m = (t[0:1, :] * qinv) & mask
            t = t + m * q_col
            carry = t[0:1, :] >> b
            t = jnp.concatenate([t[1:], zero_row], axis=0)
            t = jnp.concatenate([t[0:1] + carry, t[1:]], axis=0)
        xr = jnp.concatenate([xr[unroll:], xr[:unroll]], axis=0)
        return t, xr

    t, _ = jax.lax.fori_loop(0, L // unroll, body,
                             (x ^ x, x))
    # full carry propagation (l_pad rows; rows >= L absorb the top carry)
    t, _ = _carry_rows(t, l_pad, b, spec.mask)
    return _cond_sub_q(t, q_col, l_pad, b, mask)


def _add_tile(spec: FieldSpec, l_pad: int, x, y, q_col):
    """Modular add of two canonical (l_pad, TILE) limb tiles."""
    t, _ = _carry_rows(x + y, l_pad, spec.limb_bits, spec.mask)
    return _cond_sub_q(t, q_col, l_pad, spec.limb_bits, spec.mask)


def _sub_tile(spec: FieldSpec, l_pad: int, x, y, q_col):
    """Modular subtract (x - y) of canonical (l_pad, TILE) limb tiles."""
    t, _ = _carry_rows(x + q_col - y, l_pad, spec.limb_bits, spec.mask)
    return _cond_sub_q(t, q_col, l_pad, spec.limb_bits, spec.mask)


def _kernel_body(spec: FieldSpec, l_pad: int, x_ref, y_ref, q_ref, o_ref):
    o_ref[:] = _mm_tile(spec, l_pad, x_ref[:], y_ref[:], q_ref[:])


@functools.partial(jax.jit, static_argnums=(0, 3))
def mont_mul(spec: FieldSpec, x, y, interpret: bool = False):
    """Montgomery product on (N, L) int32 arrays via the Pallas kernel."""
    n, L = x.shape
    l_pad = _round_up(max(L, 8), 8)
    n_pad = _round_up(n, TILE)
    xt = jnp.zeros((l_pad, n_pad), jnp.int32).at[:L, :n].set(x.T)
    yt = jnp.zeros((l_pad, n_pad), jnp.int32).at[:L, :n].set(y.T)

    qt = jnp.broadcast_to(jnp.asarray(
        np.asarray(spec.q_limbs + (0,) * (l_pad - L), dtype=np.int32)
        [:, None]), (l_pad, TILE))
    kern = functools.partial(_kernel_body, spec, l_pad)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((l_pad, n_pad), jnp.int32),
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((l_pad, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, TILE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((l_pad, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xt, yt, qt)
    return out[:L, :n].T
