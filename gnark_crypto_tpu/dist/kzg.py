"""Distributed KZG: polynomial-partition axis over the device mesh.

The reference parallelizes KZG inside one node (goroutine MSM chunks,
kzg.go:160 Commit); at multi-chip scale the natural BATCH axis is the
polynomial index (SURVEY §5 long-context row / BASELINE north-star
"distributed KZG batch partitioning"): a PLONK-class prover commits to many
polynomials of the same degree, so each device runs whole local MSMs over
its polynomial shard — zero cross-chip traffic until the (tiny) commitment
gather. SRS points are replicated (read-only, broadcast once).

``batch_commit``: (B, n) coefficient batch sharded over B -> (B,) affine.
``batch_open``:   same sharding -> per-poly opening proofs at one shared
point (kzg.go:181 Open semantics, quotient built in-lane).
"""

from __future__ import annotations

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gnark_crypto_tpu.curve.jacobian import Affine, Jac, curve_ops
from gnark_crypto_tpu.msm import pippenger
from gnark_crypto_tpu.protocols import kzg
from gnark_crypto_tpu.specs import curve as cs


def _pp(axis: str, arr) -> P:
    return P(axis, *([None] * (arr.ndim - 1)))


def batch_commit(name: str, pk: kzg.ProvingKey, polys, mesh: Mesh,
                 axis: str = "pp") -> Affine:
    """Commit to a batch of polynomials, batch axis sharded over ``axis``.

    polys: (B, n) plain fr coefficient batch (element dims trailing);
    B must divide by the mesh size. Returns (B,) affine commitments,
    sharded over the batch axis.
    """
    spec = cs.get_curve(f"{name}_g1")
    g1c = curve_ops(spec)
    n = polys.shape[1]
    px, py = pk.g1.x[:n], pk.g1.y[:n]
    c = pippenger.best_c(n)

    def local(pxl, pyl, pol):
        return jax.vmap(
            lambda p: tuple(pippenger._msm_jit(spec, pxl, pyl, c,
                                               scalars=p)))(pol)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), _pp(axis, polys)),
        out_specs=(P(axis, None), P(axis, None), P(axis, None)),
        check_vma=False)
    return g1c.to_affine(Jac(*fn(px, py, polys)))


def batch_open(name: str, pk: kzg.ProvingKey, polys, point, mesh: Mesh,
               axis: str = "pp"):
    """Open every polynomial of the sharded batch at one shared point.

    Returns (h: Affine (B,), claimed: plain fr (B,)) — the per-poly
    OpeningProof fields, batch axis sharded. Equivalent to mapping
    ``kzg.open_poly`` over the batch (bit-identical quotient + MSM path).
    """

    def local(pol):
        def one(p):
            pr = kzg.open_poly(name, pk, p, point)
            return pr.h.x[0], pr.h.y[0], pr.claimed_value[0]

        return jax.vmap(one)(pol)

    fr_dims = polys.ndim - 2  # element dims of the scalar field
    out_elem = (P(axis, *([None] * fr_dims)),) * 3
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(_pp(axis, polys),),
        out_specs=out_elem,
        check_vma=False)
    hx, hy, cv = fn(polys)
    return Affine(hx, hy), cv
