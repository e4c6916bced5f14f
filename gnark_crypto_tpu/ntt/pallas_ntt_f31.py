"""Pallas TPU NTT for the 31-bit fields (koalabear/babybear).

Counterpart of the reference's F31 AVX-512 FFT kernels
(``field/generator/asm/amd64/element_vec_F31.go`` innerDIF/innerDIT): one
uint32 lane per element, radix-2^32 Montgomery arithmetic synthesized from
16-bit half products (field/f31.py semantics, bit-identical).

Layout: the flat (n,) array becomes (8, W) COLUMN-major (element i at
row i%8, lane i//8, W = n/8). Consequences:
  * stages with half >= 8*128 lanes are lane-tile aligned -> one
    pallas_call per stage, operands addressed by index_map;
  * ALL remaining stages (half = 512 .. 1, ten of them at large n) fuse
    into ONE pass: lane rotations for half in [8, 512] (lane stride
    half/8 in [1, 64]) and sublane rotations for half in {1, 2, 4} — the
    whole tail runs VMEM-resident per tile.

Stage order/twiddle indexing matches fft._run_stages exactly (DIF:
ascending stages, (a+b, (a-b)w); DIT: descending, (a+wb, a-wb)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnark_crypto_tpu.ntt.pallas_ntt4 import _r4_perm
from gnark_crypto_tpu.specs.field import FieldSpec

LANES = 128
ROWS = 8
TILE_W = 2048  # lanes per grid step

U32 = jnp.uint32


# -- in-kernel field ops (mirror field/f31.py exactly) -----------------------

def _mul_wide(a, b):
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    p00 = a0 * b0
    mid = a1 * b0 + a0 * b1 + (p00 >> 16)
    hi = a1 * b1 + (mid >> 16)
    lo = (mid << 16) | (p00 & 0xFFFF)
    return hi, lo


def _mmul(spec: FieldSpec, x, y):
    q = np.uint32(spec.modulus)
    qinv = np.uint32(spec.qinv_neg)
    t_hi, t_lo = _mul_wide(x, y)
    m = t_lo * qinv
    mq_hi, _ = _mul_wide(m, q)
    carry = (t_lo != 0).astype(U32)
    r = t_hi + mq_hi + carry
    return jnp.where(r >= q, r - q, r)


def _madd(spec: FieldSpec, x, y):
    q = np.uint32(spec.modulus)
    s = x + y
    return jnp.where(s >= q, s - q, s)


def _msub(spec: FieldSpec, x, y):
    q = np.uint32(spec.modulus)
    d = x + q - y
    return jnp.where(d >= q, d - q, d)


def _roll_lane_l(x, h):
    return jnp.concatenate([x[:, h:], x[:, :h]], axis=1)


def _roll_lane_r(x, h):
    return jnp.concatenate([x[:, -h:], x[:, :-h]], axis=1)


def _roll_row_l(x, h):
    return jnp.concatenate([x[h:, :], x[:h, :]], axis=0)


def _roll_row_r(x, h):
    return jnp.concatenate([x[-h:, :], x[:-h, :]], axis=0)


# -- big lane-stride stage (half/8 >= tile lanes) ----------------------------

def _stage_kernel(spec, hb, dif, x_lo_ref, x_hi_ref, tw_ref, o_ref):
    is_lo = (pl.program_id(0) % (2 * hb)) < hb
    if dif:
        @pl.when(is_lo)
        def _():
            o_ref[:] = _madd(spec, x_lo_ref[:], x_hi_ref[:])

        @pl.when(jnp.logical_not(is_lo))
        def _():
            d = _msub(spec, x_lo_ref[:], x_hi_ref[:])
            o_ref[:] = _mmul(spec, d, tw_ref[:])
    else:
        t = _mmul(spec, x_hi_ref[:], tw_ref[:])

        @pl.when(is_lo)
        def _():
            o_ref[:] = _madd(spec, x_lo_ref[:], t)

        @pl.when(jnp.logical_not(is_lo))
        def _():
            o_ref[:] = _msub(spec, x_lo_ref[:], t)


def _big_stage(spec: FieldSpec, x, tw_s, half: int, dif: bool,
               interpret: bool, tile: int | None = None, in_perm=None):
    """Stage with lane-stride hl = half/8 >= 128 on the (8, W) array."""
    W = x.shape[1]
    hl = half // ROWS
    tile = tile or min(hl, TILE_W)
    hb = hl // tile
    perm = in_perm or (lambda l: l)

    def lo_map(t):
        r2 = t % (2 * hb)
        return (0, perm(t - jnp.where(r2 >= hb, hb, 0)))

    def hi_map(t):
        r2 = t % (2 * hb)
        return (0, perm(t + jnp.where(r2 >= hb, 0, hb)))

    kern = functools.partial(_stage_kernel, spec, hb, dif)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((ROWS, W), U32),
        grid=(W // tile,),
        in_specs=[
            pl.BlockSpec((ROWS, tile), lo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, tile), hi_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, tile), lambda t: (0, t % hb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, tile), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, tw_s)


# -- radix-4 fused big-stage pairs (half the big-stage HBM passes) -----------
# Same scheme as pallas_ntt4: one program owns a group of 4 blocks
# {g, g+Q, g+2Q, g+3Q} (Q = stage-(s+1) half in block units), reads each
# input block once and writes its 4 outputs contiguously; the resulting
# block permutation is undone in the next consumer's input index map. No
# extra twiddle tables: the w^3-style product is two chained elementwise
# muls of the existing stage-s and stage-(s+1) tables.

def _r4_kernel_f31(spec, tile, dif, a_ref, b_ref, c_ref, d_ref,
                   w_ref, wq_ref, w2_ref, o_ref):
    A, B, C, D = a_ref[:], b_ref[:], c_ref[:], d_ref[:]
    if dif:
        ac = _madd(spec, A, C)
        bd = _madd(spec, B, D)
        o_ref[:, 0:tile] = _madd(spec, ac, bd)
        o_ref[:, tile:2 * tile] = _mmul(spec, _msub(spec, ac, bd),
                                        w2_ref[:])
        t1 = _mmul(spec, _msub(spec, A, C), w_ref[:])
        t2 = _mmul(spec, _msub(spec, B, D), wq_ref[:])
        o_ref[:, 2 * tile:3 * tile] = _madd(spec, t1, t2)
        o_ref[:, 3 * tile:4 * tile] = _mmul(spec, _msub(spec, t1, t2),
                                            w2_ref[:])
    else:
        t = _mmul(spec, B, w2_ref[:])
        td = _mmul(spec, D, w2_ref[:])
        a1 = _madd(spec, A, t)
        b1 = _msub(spec, A, t)
        c1 = _madd(spec, C, td)
        d1 = _msub(spec, C, td)
        u = _mmul(spec, c1, w_ref[:])
        v = _mmul(spec, d1, wq_ref[:])
        o_ref[:, 0:tile] = _madd(spec, a1, u)
        o_ref[:, tile:2 * tile] = _madd(spec, b1, v)
        o_ref[:, 2 * tile:3 * tile] = _msub(spec, a1, u)
        o_ref[:, 3 * tile:4 * tile] = _msub(spec, b1, v)


def _big_stage_r4(spec: FieldSpec, x, tw_s, tw_s1, quarter: int, tile: int,
                  dif: bool, interpret: bool, in_perm):
    """Fused stages (s, s+1); ``quarter`` = stage-(s+1) half in blocks of
    ``tile`` lanes. Returns (out, perm)."""
    W = x.shape[1]
    perm = in_perm or (lambda l: l)

    def in_map(role):
        def m(t4):
            g = (t4 // quarter) * (4 * quarter) + (t4 % quarter)
            return (0, perm(g + role * quarter))
        return m

    bs = lambda m: pl.BlockSpec((ROWS, tile), m, memory_space=pltpu.VMEM)
    kern = functools.partial(_r4_kernel_f31, spec, tile, dif)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((ROWS, W), U32),
        grid=(W // tile // 4,),
        in_specs=[bs(in_map(r)) for r in range(4)] + [
            bs(lambda t4: (0, t4 % quarter)),            # w  (stage s)
            bs(lambda t4: (0, t4 % quarter + quarter)),  # w*i (stage s)
            bs(lambda t4: (0, t4 % quarter)),            # w^2 (stage s+1)
        ],
        out_specs=pl.BlockSpec((ROWS, 4 * tile), lambda t4: (0, t4),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, x, x, tw_s, tw_s, tw_s1)
    return out, _r4_perm(quarter)


# -- fused tail: all stages with half < 8*tile, one HBM pass -----------------

def _tail_kernel(spec, halves, dif, x_ref, tw_ref, o_ref):
    x = x_ref[:]
    w = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    order = halves if dif else halves[::-1]
    for idx, h in enumerate(order):
        ti = idx if dif else len(halves) - 1 - idx
        tw = tw_ref[:, ti * w:(ti + 1) * w]
        if h >= ROWS:
            hl = h // ROWS  # lane stride
            m = (lane % (2 * hl)) < hl
            rl = lambda v, _h=hl: _roll_lane_l(v, _h)
            rr = lambda v, _h=hl: _roll_lane_r(v, _h)
        else:
            m = (row % (2 * h)) < h
            rl = lambda v, _h=h: _roll_row_l(v, _h)
            rr = lambda v, _h=h: _roll_row_r(v, _h)
        if dif:
            s = _madd(spec, x, rl(x))
            d = _msub(spec, rr(x), x)
            x = jnp.where(m, s, _mmul(spec, d, tw))
        else:
            t = _mmul(spec, x, tw)
            out_lo = _madd(spec, x, rl(t))
            out_hi = _msub(spec, rr(x), t)
            x = jnp.where(m, out_lo, out_hi)
    o_ref[:] = x


def _tail_pass(spec: FieldSpec, x, tw_tail, halves, dif: bool,
               interpret: bool, tile: int | None = None, in_perm=None):
    W = x.shape[1]
    tile = tile or min(W, TILE_W)
    perm = in_perm or (lambda l: l)
    kern = functools.partial(_tail_kernel, spec, tuple(halves), dif)
    tw_w = tw_tail.shape[1]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((ROWS, W), U32),
        grid=(W // tile,),
        in_specs=[
            pl.BlockSpec((ROWS, tile), lambda t: (0, perm(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, tw_w), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, tile), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, tw_tail)


def run_batch_small_f31(domain, a2, decimation: str, inverse: bool,
                        interpret: bool = False):
    """Batch of B independent small transforms, ONE fused-tail pass.

    ``a2``: (B, n) uint32 with n = domain.n <= 8*128. A batch of
    independent n-point NTTs is exactly the tail pass of a virtual big
    NTT whose final log2(n) stages use the n-domain root: in the
    column-major layout, block b occupies lanes [b*n/8, (b+1)*n/8) and
    every stage's butterfly partners and twiddle pattern are periodic
    with the block — so the existing ``_tail_kernel`` and ``_tables``
    apply verbatim. This is the TPU face of the reference's fused
    ``sis512_16`` batch-FFT (sis.go:142, element_vec_F31_sis_fft.go):
    ~256 x 512-point transforms run VMEM-resident in one kernel.
    """
    spec = domain.eng.spec
    B, n = a2.shape
    assert n == domain.n and ROWS <= n <= ROWS * LANES
    W = B * n // ROWS
    tile = min(W, TILE_W)
    while W % tile:
        tile //= 2
    assert tile % (n // ROWS) == 0, (tile, n)
    halves = tuple(n >> (s + 1) for s in range(domain.k))
    _big, tail = _tables(domain, inverse, tile)
    x = a2.reshape(W, ROWS).T
    x = _tail_pass(spec, x, tail, halves, decimation == "DIF", interpret,
                   tile)
    return x.T.reshape(B, n)


# -- twiddle tables ----------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _tables(domain, inverse: bool, tail_tile: int):
    """Per-stage twiddles in the (8, W) column-major layout.

    Element i = c*8 + r sits at [r, c]; stage-s twiddle for it is
    tw0[(i % half) << s]. Big stages get (8, half/8) tables; the tail gets
    one (8, n_tail*tail_tile) stacked table (patterns are periodic in c
    with period half/8 <= 64, or constant per row for half < 8).
    """
    n, k = domain.n, domain.k
    tw0 = np.asarray(domain.twiddles0_inv if inverse else domain.twiddles0)
    big = {}
    tail_vecs = []
    r = np.arange(ROWS, dtype=np.int64)[:, None]
    for s in range(k):
        half = n >> (s + 1)
        if half >= ROWS * LANES:
            c = np.arange(half // ROWS, dtype=np.int64)[None, :]
            idx = ((c * ROWS + r) % half) << s
            big[s] = jnp.asarray(tw0[idx])
        else:
            c = np.arange(tail_tile, dtype=np.int64)[None, :]
            idx = ((c * ROWS + r) % half) << s
            tail_vecs.append(tw0[idx])
    tail = jnp.asarray(np.concatenate(tail_vecs, axis=1)) if tail_vecs \
        else jnp.zeros((ROWS, 0), U32)
    return big, tail


def run_stages_pallas_f31(domain, a, decimation: str, inverse: bool,
                          interpret: bool = False):
    """Drop-in replacement for fft._run_stages on flat (n,) uint32 arrays."""
    import os

    spec = domain.eng.spec
    n, k = domain.n, domain.k
    W = n // ROWS
    dif = decimation == "DIF"
    big_stages = [s for s in range(k) if (n >> (s + 1)) >= ROWS * LANES]
    tail_halves = tuple(n >> (s + 1) for s in range(k)
                        if (n >> (s + 1)) < ROWS * LANES)
    # default OFF for f31: the cheap 31-bit butterflies are bandwidth-bound
    # and the radix-4 variant's LANES-wide tiles lose DMA efficiency
    # (measured 2026-08-19: 2.53 ms vs 1.79 ms radix-2 @ 2^20 koalabear)
    r4 = (os.environ.get("GNARK_NTT_RADIX4_F31", "") == "1"
          and len(big_stages) >= 2)
    # uniform block width so the radix-4 block permutation composes across
    # passes; the smallest big stage always has lane stride exactly LANES
    tile = LANES if r4 else min(W, TILE_W)
    big, tail = _tables(domain, inverse, min(W, tile if r4 else TILE_W))
    x = a.reshape(W, ROWS).T  # column-major: element i at [i%8, i//8]

    if not r4:
        if dif:
            for s in big_stages:
                x = _big_stage(spec, x, big[s], n >> (s + 1), True,
                               interpret)
            if tail_halves:
                x = _tail_pass(spec, x, tail, tail_halves, True, interpret)
        else:
            if tail_halves:
                x = _tail_pass(spec, x, tail, tail_halves, False, interpret)
            for s in reversed(big_stages):
                x = _big_stage(spec, x, big[s], n >> (s + 1), False,
                               interpret)
        return x.T.reshape(n)

    m = len(big_stages)
    pairs = [(big_stages[i], big_stages[i + 1])
             for i in range(0, m - 1, 2)]
    leftover = big_stages[m - 1] if m % 2 else None
    perm = None

    def fused(z, s, perm):
        hl1 = (n >> (s + 2)) // ROWS
        return _big_stage_r4(spec, z, big[s], big[s + 1], hl1 // tile,
                             tile, dif, interpret, perm)

    if dif:
        for s, _ in pairs:
            x, perm = fused(x, s, perm)
        if leftover is not None:
            x = _big_stage(spec, x, big[leftover], n >> (leftover + 1),
                           True, interpret, tile, perm)
            perm = None
        if tail_halves:
            x = _tail_pass(spec, x, tail, tail_halves, True, interpret,
                           tile, perm)
            perm = None
    else:
        if tail_halves:
            x = _tail_pass(spec, x, tail, tail_halves, False, interpret,
                           tile)
        if leftover is not None:
            x = _big_stage(spec, x, big[leftover], n >> (leftover + 1),
                           False, interpret, tile)
        for s, _ in reversed(pairs):
            x, perm = fused(x, s, perm)
    if perm is not None:
        # fold the pending block permutation into the final transpose copy
        nb = W // tile
        src = np.asarray([perm(l) for l in range(nb)])
        idx = (src[:, None] * tile + np.arange(tile)[None, :]).reshape(-1)
        x = x[:, jnp.asarray(idx)]
    return x.T.reshape(n)


def supported(domain, a) -> bool:
    eng = domain.eng
    return (getattr(eng, "elem_dims", 1) == 0 and domain.n >= 2 * ROWS * LANES
            and a.ndim == 1)
