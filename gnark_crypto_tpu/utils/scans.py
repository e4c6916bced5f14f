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
    """[w^0 .. w^(n-1)] via log-doubling (n power of two not required)."""
    table = eng.ones((1,))
    stride = w[None] if eng.eshape(w) == () else w
    while table.shape[0] < n:
        table = jnp.concatenate([table, eng.mul(table, stride)], axis=0)
        stride = eng.square(stride)
    return table[:n]
