"""Pallas TPU NTT: radix-2 butterfly passes in the limbs-in-sublanes layout.

The performance tier of the transform (reference counterpart: the unrolled
leaf kernels of ``fft.go:389+`` plus its parallel recursion) — but designed
for the TPU memory system instead of a cache hierarchy:

  * data lives as ``(L_pad, n)`` int32 — limbs in sublanes, elements in
    lanes, the same layout as the Pallas Montgomery-mul kernel, so every
    butterfly is a full-width VPU op;
  * stages with half-block >= 128 lanes are tile-aligned: one
    ``pallas_call`` per stage, grid over 128-lane tiles, a/b operand tiles
    addressed purely by ``index_map`` (no gathers, no relayouts — the XLA
    gather path costs ~150 ms/stage at 2^20 on TPU, see PERF.md);
  * the final 7 stages (half < 128) fuse into ONE pass: each 128-lane tile
    runs its remaining log2(128) butterflies entirely in VMEM/registers
    with static lane shifts (concat of lane slices) — no HBM traffic
    between those stages;
  * the whole transform is assembled under one ``jit`` so consecutive
    stage kernels dispatch device-side back-to-back (the axon host link
    costs ~5-10 ms per eager dispatch, which would dominate).

Semantics are bit-identical to ``fft._run_stages`` (same stage order, same
twiddle indexing): DIF = ascending stages, Gentleman-Sande butterfly
(a+b, (a-b)*w); DIT = descending stages, Cooley-Tukey (a+w*b, a-w*b).
CPU tests run the same kernels under the Pallas interpreter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnark_crypto_tpu.field.pallas.mont_mul import (
    _add_tile, _mm_tile, _round_up, _sub_tile)
from gnark_crypto_tpu.specs.field import FieldSpec

LANES = 128
TILE_W = 2048  # lanes per grid step: wide tiles amortize DMA (48 ms vs 102 ms
            # per 2^20 transform at 128); compile stays fast because the
            # CIOS loop is a fori_loop, not unrolled


def _roll_left(x, h):
    """bring lane l+h to lane l (within the 128-lane tile)."""
    return jnp.concatenate([x[:, h:], x[:, :h]], axis=1)


def _roll_right(x, h):
    return jnp.concatenate([x[:, -h:], x[:, :-h]], axis=1)


# -- big-stride stage kernel (half >= 128 lanes) -----------------------------

def _stage_kernel_body(spec, l_pad, hb, dif, x_lo_ref, x_hi_ref, tw_ref,
                       q_ref, o_ref):
    # tw_ref may be a single broadcast column (transposed-tail stages);
    # every op in the mul/add/sub helpers broadcasts over lane width
    q = q_ref[:, 0:1]  # (l_pad, 1) broadcasts over any tile width
    is_lo = (pl.program_id(0) % (2 * hb)) < hb
    if dif:
        # lo tiles never touch the Montgomery mul (pl.when branches, so the
        # expensive CIOS only runs on the half of the grid that needs it)
        @pl.when(is_lo)
        def _():
            o_ref[:] = _add_tile(spec, l_pad, x_lo_ref[:], x_hi_ref[:], q)

        @pl.when(jnp.logical_not(is_lo))
        def _():
            d = _sub_tile(spec, l_pad, x_lo_ref[:], x_hi_ref[:], q)
            o_ref[:] = _mm_tile(spec, l_pad, d, tw_ref[:], q)
    else:
        t = _mm_tile(spec, l_pad, x_hi_ref[:], tw_ref[:], q)

        @pl.when(is_lo)
        def _():
            o_ref[:] = _add_tile(spec, l_pad, x_lo_ref[:], t, q)

        @pl.when(jnp.logical_not(is_lo))
        def _():
            o_ref[:] = _sub_tile(spec, l_pad, x_lo_ref[:], t, q)


def _big_stage(spec: FieldSpec, l_pad: int, x, tw_s, half: int, dif: bool,
               q_tile, interpret: bool):
    """One butterfly stage with half >= LANES on the (l_pad, n) array.

    Grid = one instance per output tile; the lo/hi operand tiles and the
    stage-twiddle tile are pure index_map addressing. Tile width adapts to
    the stage (wider tiles amortize DMA; capped by the half-block size).
    """
    n = x.shape[1]
    tile = min(half, TILE_W)
    hb = half // tile

    def lo_map(t):
        r2 = t % (2 * hb)
        return (0, t - jnp.where(r2 >= hb, hb, 0))

    def hi_map(t):
        r2 = t % (2 * hb)
        return (0, t + jnp.where(r2 >= hb, 0, hb))

    def tw_map(t):
        return (0, t % hb)

    kern = functools.partial(_stage_kernel_body, spec, l_pad, hb, dif)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((l_pad, n), jnp.int32),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((l_pad, tile), lo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, tile), hi_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, tile), tw_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((l_pad, tile), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, tw_s, q_tile)


# -- fused tail kernel (all stages with half < 128, one HBM pass) ------------

def _tail_kernel_body(spec, l_pad, halves, dif, x_ref, tw_ref, q_ref, o_ref):
    q = q_ref[:, 0:1]
    x = x_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    order = halves if dif else halves[::-1]
    for idx, h in enumerate(order):
        ti = idx if dif else len(halves) - 1 - idx
        w = x.shape[1]
        tw = tw_ref[:, ti * w:(ti + 1) * w]
        m = (lane % (2 * h)) < h
        if dif:
            plo = _roll_left(x, h)      # partner b for lo lanes
            phi = _roll_right(x, h)     # partner a for hi lanes
            s = _add_tile(spec, l_pad, x, plo, q)
            d = _sub_tile(spec, l_pad, phi, x, q)
            x = jnp.where(m, s, _mm_tile(spec, l_pad, d, tw, q))
        else:
            t = _mm_tile(spec, l_pad, x, tw, q)   # valid at hi lanes
            out_lo = _add_tile(spec, l_pad, x, _roll_left(t, h), q)
            out_hi = _sub_tile(spec, l_pad, _roll_right(x, h), t, q)
            x = jnp.where(m, out_lo, out_hi)
    o_ref[:] = x


def _tail_pass(spec: FieldSpec, l_pad: int, x, tw_tail, halves, dif: bool,
               q_tile, interpret: bool):
    """All remaining sub-tile stages fused in one pass. ``tw_tail`` is
    (l_pad, len(halves)*128): per-stage lane twiddle vectors, ordered by
    ascending stage s (descending half)."""
    n = x.shape[1]
    tile = min(n, TILE_W)
    if tw_tail.shape[1] != len(halves) * tile:
        # repeat the 128-periodic lane patterns out to the tile width
        reps = tile // LANES
        parts = [jnp.tile(tw_tail[:, i * LANES:(i + 1) * LANES], (1, reps))
                 for i in range(len(halves))]
        tw_tail = jnp.concatenate(parts, axis=1)
    kern = functools.partial(_tail_kernel_body, spec, l_pad, tuple(halves),
                             dif)
    tw_w = tw_tail.shape[1]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((l_pad, n), jnp.int32),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((l_pad, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, tw_w), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((l_pad, tile), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, tw_tail, q_tile)


# -- transposed tail: sub-tile stages as tile-aligned stages -----------------

def _ttail_kernel_body(spec, l_pad, hb, dif, tile, W128, x_lo_ref,
                       x_hi_ref, tw_ref, q_ref, o_ref):
    q = q_ref[:, 0:1]
    j = (pl.program_id(0) * tile) // W128   # single j per tile
    # extract column j as a broadcast column via a masked lane-reduction
    # (Mosaic cannot lower a dynamic single-lane vector load)
    lane = jax.lax.broadcasted_iota(jnp.int32, (l_pad, LANES), 1)
    tw = jnp.sum(jnp.where(lane == j, tw_ref[:], 0), axis=1, keepdims=True)
    is_lo = (pl.program_id(0) % (2 * hb)) < hb
    if dif:
        @pl.when(is_lo)
        def _():
            o_ref[:] = _add_tile(spec, l_pad, x_lo_ref[:], x_hi_ref[:], q)

        @pl.when(jnp.logical_not(is_lo))
        def _():
            d = _sub_tile(spec, l_pad, x_lo_ref[:], x_hi_ref[:], q)
            o_ref[:] = _mm_tile(spec, l_pad, d, tw, q)
    else:
        t = _mm_tile(spec, l_pad, x_hi_ref[:], tw, q)

        @pl.when(is_lo)
        def _():
            o_ref[:] = _add_tile(spec, l_pad, x_lo_ref[:], t, q)

        @pl.when(jnp.logical_not(is_lo))
        def _():
            o_ref[:] = _sub_tile(spec, l_pad, x_lo_ref[:], t, q)


def _tail_stage_transposed(spec, l_pad, xt, tw128, half, W128, dif,
                           q_tile, interpret):
    """One tail stage on the TRANSPOSED layout (element i = c*128 + j sits
    at lane j*W128 + c, W128 = n/128): the pair stride half*W128 is
    lane-tile aligned, so lo tiles skip the Montgomery mul entirely —
    halving the tail's mul count vs the lane-rolled kernel (the fused
    kernel multiplies every lane at every stage).

    ``tw128``: (l_pad, 128) lane table tw0[(j % half) << s]; each tile
    spans a single j (tile <= W128), fetched as a broadcast column.
    """
    n = xt.shape[1]
    stride = half * W128
    tile = min(W128, TILE_W)
    hb = stride // tile

    def lo_map(t):
        r2 = t % (2 * hb)
        return (0, t - jnp.where(r2 >= hb, hb, 0))

    def hi_map(t):
        r2 = t % (2 * hb)
        return (0, t + jnp.where(r2 >= hb, 0, hb))

    kern = functools.partial(_ttail_kernel_body, spec, l_pad, hb, dif,
                             tile, W128)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((l_pad, n), jnp.int32),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((l_pad, tile), lo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, tile), hi_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((l_pad, tile), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xt, xt, tw128, q_tile)


def _to_transposed(x, W128):
    l_pad, n = x.shape
    return x.reshape(l_pad, W128, LANES).swapaxes(1, 2).reshape(l_pad, n)


def _from_transposed(x, W128):
    l_pad, n = x.shape
    return x.reshape(l_pad, LANES, W128).swapaxes(1, 2).reshape(l_pad, n)


# -- twiddle table preparation (device, cached per domain) -------------------

@functools.lru_cache(maxsize=None)
def _tables(domain, inverse: bool):
    """Transposed twiddle tables for the Pallas passes.

    Returns (big, tail): ``big[s]`` = (l_pad, half_s) stage table for the
    tile-aligned stages; ``tail`` = (l_pad, n_tail*128) stacked lane
    twiddles for the fused tail (stage s lane l twiddle = tw0[(l % half)
    << s], periodic across tiles).
    """
    spec = domain.eng.spec
    L = spec.n_limbs
    l_pad = _round_up(max(L, 8), 8)
    n, k = domain.n, domain.k
    tw0 = domain.twiddles0_inv if inverse else domain.twiddles0  # (n/2, L)
    tw0T = jnp.zeros((l_pad, n // 2), jnp.int32).at[:L, :].set(tw0.T)
    big = {}
    tail_vecs = []
    for s in range(k):
        half = n >> (s + 1)
        if half >= LANES:
            big[s] = tw0T[:, :: 1 << s]  # tw0[off << s], off in [0, half)
        else:
            lanes = (np.arange(LANES, dtype=np.int64) % half) << s
            tail_vecs.append(tw0T[:, jnp.asarray(lanes, jnp.int32)])
    tail = (jnp.concatenate(tail_vecs, axis=1) if tail_vecs
            else jnp.zeros((l_pad, 0), jnp.int32))
    q_tile = jnp.broadcast_to(jnp.asarray(
        np.asarray(spec.q_limbs + (0,) * (l_pad - L), dtype=np.int32)
        [:, None]), (l_pad, LANES))
    return big, tail, tuple(tail_vecs), q_tile, l_pad


def run_stages_pallas(domain, a, decimation: str, inverse: bool,
                      interpret: bool = False):
    """Drop-in replacement for fft._run_stages on the (n, L) layout."""
    spec = domain.eng.spec
    n, k = domain.n, domain.k
    L = spec.n_limbs
    big, tail, tail_list, q_tile, l_pad = _tables(domain, inverse)
    x = jnp.zeros((l_pad, n), jnp.int32).at[:L, :].set(a.T)

    dif = decimation == "DIF"
    tail_halves = tuple(n >> (s + 1) for s in range(k)
                        if (n >> (s + 1)) < LANES)
    big_stages = [s for s in range(k) if (n >> (s + 1)) >= LANES]
    W128 = n // LANES
    use_transposed_tail = W128 >= LANES  # tile >= 128 lanes per j

    def tail_fwd(x, dif_dir):
        if not tail_halves:
            return x
        if not use_transposed_tail:
            return _tail_pass(spec, l_pad, x, tail, tail_halves, dif_dir,
                              q_tile, interpret)
        xt = _to_transposed(x, W128)
        order = (range(len(tail_halves)) if dif_dir
                 else reversed(range(len(tail_halves))))
        for i in order:
            xt = _tail_stage_transposed(spec, l_pad, xt, tail_list[i],
                                        tail_halves[i], W128, dif_dir,
                                        q_tile, interpret)
        return _from_transposed(xt, W128)

    if dif:
        for s in big_stages:
            x = _big_stage(spec, l_pad, x, big[s], n >> (s + 1), True,
                           q_tile, interpret)
        x = tail_fwd(x, True)
    else:
        x = tail_fwd(x, False)
        for s in reversed(big_stages):
            x = _big_stage(spec, l_pad, x, big[s], n >> (s + 1), False,
                           q_tile, interpret)
    return x[:L, :].T


def supported(domain, a) -> bool:
    """Pallas path preconditions: multi-limb int32 engine (goldilocks'
    2x32 uint32 pairs do NOT fit the int32 CIOS tiles), tile-divisible
    size."""
    eng = domain.eng
    return (getattr(eng, "elem_dims", 0) == 1
            and eng.spec.limb_bits <= 13
            and domain.n >= 2 * LANES and a.ndim == 2)
