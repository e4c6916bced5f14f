"""Multilinear (bookkeeping-table) polynomials for sumcheck/GKR protocols.

Counterpart of ``ecc/<curve>/fr/polynomial/multilin.go``: Fold (partial
evaluation of the first variable), Evaluate (repeated folds), EvalEq (the
eq(q, h) Lagrange kernel). Tables are plain fr arrays; each fold is one
fully-vectorized fused op (the reference parallelizes with a worker pool,
multilin.go FoldParallel).
"""

from __future__ import annotations

import jax

from gnark_crypto_tpu.field.api import FieldEngine, for_spec
from gnark_crypto_tpu.specs.field import FieldSpec


def fold(spec: FieldSpec, table, r):
    """table[i] <- table[i] + r*(table[i+mid] - table[i]); halves the table.
    table: (2^k, ...) Montgomery; r: Montgomery scalar element."""
    eng = for_spec(spec)
    mid = table.shape[0] // 2
    bottom, top = table[:mid], table[mid:]
    t = eng.mul(eng.sub(top, bottom), eng.broadcast_to(r, (mid,)))
    return eng.add(bottom, t)


def evaluate(spec: FieldSpec, table, coords):
    """m(r_1, ..., r_k) by repeated folding (multilin.go Evaluate)."""
    for r in coords:
        table = fold(spec, table, r)
    return table[0]


def eval_eq(spec: FieldSpec, q, h):
    """eq(q, h) = prod_i (1 + 2 q_i h_i - q_i - h_i) (multilin.go EvalEq).
    q, h: (k,) Montgomery arrays; returns a Montgomery element."""
    eng = for_spec(spec)
    prod2 = eng.double(eng.mul(q, h))
    one = eng.broadcast_to(eng.ones(), eng.eshape(q))
    terms = eng.sub(eng.add(prod2, one), eng.add(q, h))
    # tree-reduce product
    n = terms.shape[0]
    while n > 1:
        half = n // 2
        red = eng.mul(terms[:half], terms[half : 2 * half])
        if n % 2:
            import jax.numpy as jnp

            terms = jnp.concatenate([red, terms[2 * half :]], axis=0)
        else:
            terms = red
        n = terms.shape[0]
    return terms[0]
