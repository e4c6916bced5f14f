"""Engine-generic parallel scan primitives (log-stride, XLA-friendly)."""

from __future__ import annotations

import jax.numpy as jnp


def prefix_sum(eng, x):
    """Inclusive modular prefix sum along the leading element axis.

    Hillis-Steele: log2(N) vectorized modular adds; O(log N) graph.
    """
    n = eng.eshape(x)[0]
    d = 1
    while d < n:
        shifted = x[:-d]
        head = x[:d]
        tail = eng.add(x[d:], shifted)
        x = jnp.concatenate([head, tail], axis=0)
        d *= 2
    return x


def exp_table(eng, w, n: int):
    """[w^0 .. w^(n-1)] via index-bit masked muls — constant shapes so only
    two kernel shapes compile regardless of n (n need not be a power of 2)."""
    nbits = max((n - 1).bit_length(), 1)
    idx = jnp.arange(n, dtype=jnp.int32)
    table = eng.ones((n,))
    wp = w[None] if eng.eshape(w) == () else w
    for bit in range(nbits):
        bit_set = (idx >> bit) & 1
        table = eng.where(bit_set == 1,
                          eng.mul(table, eng.broadcast_to(wp[0], (n,))),
                          table)
        wp = eng.square(wp)
    return table
