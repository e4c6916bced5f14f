"""Multi-chip MSM: points data-parallel across the mesh, one collective fold.

The reference parallelizes MSM with goroutines over windows and recursive
point splits (multiexp.go:99-207). Across chips the natural axis is points
(SURVEY §2.4): each device runs the full single-chip Pippenger on its point
shard inside shard_map, then the D partial Jacobian sums are all_gathered
(tiny payload — one point per device) and tree-folded on every device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnark_crypto_tpu.curve.jacobian import Affine, Jac, curve_ops
from gnark_crypto_tpu.msm import pippenger
from gnark_crypto_tpu.specs.curve import CurveSpec


def msm_sharded(spec: CurveSpec, mesh: Mesh, points: Affine, scalars,
                c: int | None = None, axis: str = "dp") -> Jac:
    """sum_i k_i P_i with points/scalars sharded along `axis`."""
    curve = curve_ops(spec)
    n = points.x.shape[0]
    c = c or pippenger.best_c(max(n // mesh.devices.size, 1))

    def local(px, py, k):
        part = pippenger._msm_jit(spec, px, py, c, scalars=k)
        # gather every device's partial sum (D points), fold locally
        gathered = jax.tree.map(
            lambda a: jax.lax.all_gather(a, axis), part)  # (D, ...)
        acc = jax.tree.map(lambda a: a[0], gathered)
        acc = Jac(*acc)
        for i in range(1, mesh.devices.size):
            acc = curve.add(acc, Jac(*jax.tree.map(lambda a: a[i], gathered)))
        return acc

    shard = P(axis, *([None] * (points.x.ndim - 1)))
    ks = P(axis, *([None] * (scalars.ndim - 1)))
    fn = shard_map(local, mesh=mesh,
                   in_specs=(shard, shard, ks),
                   out_specs=jax.tree.map(lambda _: P(), Jac(0, 0, 0)),
                   check_vma=False)
    return fn(points.x, points.y, scalars)
