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


def _kernel_body(spec: FieldSpec, l_pad: int, x_ref, y_ref, q_ref, o_ref):
    b = spec.limb_bits
    L = spec.n_limbs
    mask = spec.mask
    qinv = spec.qinv_neg
    q_col = q_ref[:]  # (L_pad, TILE) broadcast limb column of q

    x = x_ref[:]
    y = y_ref[:]
    t = jnp.zeros_like(x)
    zero_row = jnp.zeros((1, x.shape[1]), jnp.int32)
    for i in range(L):
        xi = x[i : i + 1, :]
        t = t + xi * y
        m = (t[0:1, :] * qinv) & mask
        t = t + m * q_col
        carry = t[0:1, :] >> b
        t = jnp.concatenate([t[1:], zero_row], axis=0)
        t = jnp.concatenate([t[0:1] + carry, t[1:]], axis=0)
    # full carry propagation (L_pad rows; rows >= L absorb the top carry)
    rows = [t[i, :] for i in range(l_pad)]
    c = jnp.zeros_like(rows[0])
    norm = []
    for i in range(l_pad):
        v = rows[i] + c
        norm.append(v & mask)
        c = v >> b
    t = jnp.stack(norm, axis=0)
    # conditional subtract q: compute t - q with borrow chain, select
    d = t - q_col
    c = jnp.zeros_like(rows[0])
    dn = []
    for i in range(l_pad):
        v = d[i, :] + c
        dn.append(v & mask)
        c = v >> b
    under = c < 0
    dnorm = jnp.stack(dn, axis=0)
    o_ref[:] = jnp.where(under[None, :], t, dnorm)


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
