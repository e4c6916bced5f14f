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


def msm_sharded_2d(spec: CurveSpec, mesh: Mesh, points: Affine, scalars,
                   c: int | None = None, axes=("dp", "win")) -> Jac:
    """MSM over a 2D mesh: points sharded on ``axes[0]`` (data parallel),
    Pippenger windows sharded on ``axes[1]`` (the reference's
    goroutine-per-chunk axis, multiexp.go:181-207, mapped to chips).

    Each device bucket-accumulates its window block over its point shard
    (bucket memory shrinks by the window-axis size). Partial window totals
    combine with GROUP adds — point sums are not vector sums, so the
    reduction is an all_gather of one point per device (tiny payload ~100B)
    followed by a local tree fold, not a psum. The full window vector is
    then all_gathered along the window axis and Horner-folded identically
    on every device (replicated output).
    """
    from jax import lax

    curve = curve_ops(spec)
    dp_axis, win_axis = axes
    D = mesh.shape[dp_axis]
    W = mesh.shape[win_axis]
    n = points.x.shape[0]
    c = c or pippenger.best_c(max(n // D, 1))
    nbits = curve.spec.fr.modulus.bit_length()
    nwin = pippenger.n_windows(nbits, c)  # signed_digits window count
    wb = -(-nwin // W)                   # windows per device (padded)
    nwin_pad = wb * W

    def local(px, py, k):
        pts = Affine(px, py)
        mags, negs = pippenger.signed_digits(curve, k, c)
        # pad to W*wb windows; extra (most-significant) windows are all-0
        # digits -> infinity totals, absorbed by the Horner fold
        pad = nwin_pad - mags.shape[0]
        mags_p = jnp.concatenate(
            [mags, jnp.zeros((pad, *mags.shape[1:]), mags.dtype)])
        negs_p = jnp.concatenate(
            [negs, jnp.zeros((pad, *negs.shape[1:]), negs.dtype)])
        w0 = lax.axis_index(win_axis) * wb
        my_mags = lax.dynamic_slice_in_dim(mags_p, w0, wb, axis=0)
        my_negs = lax.dynamic_slice_in_dim(negs_p, w0, wb, axis=0)

        totals = pippenger._window_totals(curve, pts, my_mags, my_negs,
                                          c)                   # (wb, ...)

        # combine point-shard partials per window: group-add fold of the
        # dp-axis gather (one point per device per window)
        gathered = jax.tree.map(lambda a: lax.all_gather(a, dp_axis),
                                totals)                        # (D, wb, ..)
        acc = Jac(*jax.tree.map(lambda a: a[0], gathered))
        for i in range(1, D):
            acc = curve.add(acc, Jac(*jax.tree.map(lambda a: a[i],
                                                   gathered)))
        # concatenate window blocks in window order along the win axis
        full = jax.tree.map(
            lambda a: lax.all_gather(a, win_axis, tiled=True), acc)
        return pippenger._fold_windows(curve, Jac(*full), c)

    shard = P(dp_axis, *([None] * (points.x.ndim - 1)))
    ks = P(dp_axis, *([None] * (scalars.ndim - 1)))
    fn = shard_map(local, mesh=mesh,
                   in_specs=(shard, shard, ks),
                   out_specs=jax.tree.map(lambda _: P(), Jac(0, 0, 0)),
                   check_vma=False)
    return fn(points.x, points.y, scalars)
