"""Host-dispatched square-and-multiply ladders for eager execution.

XLA:CPU intermittently segfaults in ``backend_compile`` on very large scan
bodies (E12/E24 square+mul ladders: hundreds of multi-limb muls per
iteration), and the TPU backend compiles such fused graphs pathologically
slowly. When running EAGERLY (tests, host-driven protocols) the exponent
bits are static Python ints, so the ladder can instead dispatch two small
compiled kernels (square, square-then-mul) k times from the host — each
kernel compiles once per engine and is reused by every exponentiation.

Inside a jit/vmap/shard_map trace the caller keeps its ``lax.scan``; this
module is only for the eager path. Mirrors the staged-NTT dispatch split
(ntt/fft.py _run_stages).
"""

from __future__ import annotations

import functools

import jax


def is_tracing(*leaves) -> bool:
    return any(isinstance(v, jax.core.Tracer)
               for leaf in leaves
               for v in jax.tree_util.tree_leaves(leaf))


@functools.lru_cache(maxsize=None)
def _ladder_kernels(square_fn, mul_fn):
    """(square, mul) jitted once per (square_fn, mul_fn) pair.

    Kept as two SEPARATE programs (not a fused square-then-mul): smaller
    LLVM functions per compile — the XLA:CPU segfault probability grows
    with program size. Callers must pass STABLE function objects (bound
    methods of cached engine/tower singletons) or the cache degenerates
    to per-call jits.
    """
    sq = jax.jit(lambda r: square_fn(r))
    mul = jax.jit(lambda r, x: mul_fn(r, x))
    return sq, mul


def exp_ladder(square_fn, mul_fn, x, e: int, *, ones=None, skip_leading=True):
    """MSB-first square-and-multiply x^e via host-dispatched kernels.

    ``skip_leading``: start the ladder from x (top bit consumed), as the
    scan versions do; when False, starts from ``ones``.
    """
    sq, mul = _ladder_kernels(square_fn, mul_fn)
    nbits = e.bit_length()
    if skip_leading:
        res = x
        start = 1
    else:
        res = ones
        start = 0
    for i in range(start, nbits):
        bit = (e >> (nbits - 1 - i)) & 1
        res = sq(res)
        if bit:
            res = mul(res, x)
    return res
