"""Device mesh helpers — the cross-chip layer the reference never had.

gnark-crypto is a single-node shared-memory library (SURVEY §5: no
MPI/NCCL/RPC anywhere); scaling beyond one chip is a new, first-class
component here: meshes + shard_map + XLA collectives over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def make_mesh_2d(shape: tuple[int, int], axes=("dp", "win")) -> Mesh:
    """2D mesh, e.g. {points x windows} for the sharded MSM (SURVEY §2.4:
    'msm-points axis x window axis')."""
    devs = jax.devices()
    d = shape[0] * shape[1]
    return Mesh(np.asarray(devs[:d]).reshape(shape), axes)


def shard_leading(mesh: Mesh, x, axis: str = "dp"):
    """Place an array sharded along its leading axis."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))
