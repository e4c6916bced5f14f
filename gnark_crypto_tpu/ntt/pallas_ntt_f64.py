"""Pallas TPU NTT for goldilocks (2x32 uint32-pair engine, field/f64.py).

Counterpart of the reference's ``field/goldilocks`` FFT tier. Same stage
plan as ``pallas_ntt_f31`` — the flat array in (8, W) column-major layout,
one pallas_call per big stage, the whole sub-(8*128) tail fused into ONE
VMEM-resident pass — but every element is a [lo, hi] uint32 pair carried
as TWO parallel (8, W) arrays, and the in-kernel field ops are the
bit-identical pair forms of field/f64.py (schoolbook 4-word product, two
multiplier-free REDC rounds exploiting q ≡ 1 mod 2^32).

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

from gnark_crypto_tpu.specs.field import FieldSpec

LANES = 128
ROWS = 8
TILE_W = 1024  # lanes per grid step (pairs double the VMEM per lane)

U32 = jnp.uint32
_M32 = np.uint32(0xFFFFFFFF)


# -- in-kernel field ops (mirror field/f64.py exactly) -----------------------

def _mul_wide(a, b):
    """Full-range 32x32 -> (hi, lo)."""
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    p00 = a0 * b0
    mid = a0 * b1 + (p00 >> 16)            # < 2^32
    s = mid + a1 * b0
    c = (s < mid).astype(U32)
    hi = a1 * b1 + (s >> 16) + (c << 16)
    lo = (s << 16) | (p00 & 0xFFFF)
    return hi, lo


def _adc(a, b, cin):
    s = a + b
    c1 = (s < b).astype(U32)
    s2 = s + cin
    c2 = (s2 < cin).astype(U32)
    return s2, c1 + c2


def _ge_q(lo, hi):
    return (hi == _M32) & (lo >= 1)


def _cond_sub_q(lo, hi, cond):
    borrow = (lo == 0).astype(U32)
    lo2 = lo - 1
    hi2 = hi + 1 - borrow
    return (jnp.where(cond, lo2, lo), jnp.where(cond, hi2, hi))


def _sub_2to64_q(lo, hi, cond):
    c = (lo != 0).astype(U32)
    lo2 = lo - 1
    hi2 = hi + c
    return (jnp.where(cond, lo2, lo), jnp.where(cond, hi2, hi))


def _madd(x, y):
    xl, xh = x
    yl, yh = y
    lo = xl + yl
    c = (lo < yl).astype(U32)
    hi, c2 = _adc(xh, yh, c)
    over = c2 != 0
    lo, hi = _sub_2to64_q(lo, hi, over)
    ge = (~over) & _ge_q(lo, hi)
    return _cond_sub_q(lo, hi, ge)


def _msub(x, y):
    xl, xh = x
    yl, yh = y
    lo = xl - yl
    b = (xl < yl).astype(U32)
    hi = xh - yh - b
    borrow = (xh < yh) | ((xh == yh) & (b != 0))
    lo2 = lo + np.uint32(1)
    c = (lo2 < np.uint32(1)).astype(U32)
    hi2 = hi + _M32 + c
    return (jnp.where(borrow, lo2, lo), jnp.where(borrow, hi2, hi))


def _mmul(x, y):
    xl, xh = x
    yl, yh = y
    h00, l00 = _mul_wide(xl, yl)
    h01, l01 = _mul_wide(xl, yh)
    h10, l10 = _mul_wide(xh, yl)
    h11, l11 = _mul_wide(xh, yh)
    t0 = l00
    zero = t0 ^ t0
    t1, c1 = _adc(h00, l01, zero)
    t1, c1b = _adc(t1, l10, zero)
    t2, c2 = _adc(h01, h10, c1 + c1b)
    t2, c2b = _adc(t2, l11, zero)
    t3 = h11 + c2 + c2b

    nz0 = (t0 != 0).astype(U32)
    s1, a1 = _adc(t1, t0, nz0)
    wh = (zero - t0) - nz0
    s2, a2 = _adc(t2, wh, a1)
    s3 = t3 + a2

    nz1 = (s1 != 0).astype(U32)
    u0, b1 = _adc(s2, s1, nz1)
    wh2 = (zero - s1) - nz1
    u1, b2 = _adc(s3, wh2, b1)

    over = b2 != 0
    lo, hi = _sub_2to64_q(u0, u1, over)
    ge = (~over) & _ge_q(lo, hi)
    return _cond_sub_q(lo, hi, ge)


def _roll_lane_l(x, h):
    return jnp.concatenate([x[:, h:], x[:, :h]], axis=1)


def _roll_lane_r(x, h):
    return jnp.concatenate([x[:, -h:], x[:, :-h]], axis=1)


def _roll_row_l(x, h):
    return jnp.concatenate([x[h:, :], x[:h, :]], axis=0)


def _roll_row_r(x, h):
    return jnp.concatenate([x[-h:, :], x[:-h, :]], axis=0)


def _pair_roll(fn, x, h):
    return (fn(x[0], h), fn(x[1], h))


def _pair_where(m, a, b):
    return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]))


# -- big lane-stride stage ---------------------------------------------------

def _stage_kernel(hb, dif, al_ref, ah_ref, bl_ref, bh_ref,
                  twl_ref, twh_ref, ol_ref, oh_ref):
    is_lo = (pl.program_id(0) % (2 * hb)) < hb
    a = (al_ref[:], ah_ref[:])
    b = (bl_ref[:], bh_ref[:])
    tw = (twl_ref[:], twh_ref[:])
    if dif:
        @pl.when(is_lo)
        def _():
            s = _madd(a, b)
            ol_ref[:], oh_ref[:] = s

        @pl.when(jnp.logical_not(is_lo))
        def _():
            d = _mmul(_msub(a, b), tw)
            ol_ref[:], oh_ref[:] = d
    else:
        t = _mmul(b, tw)

        @pl.when(is_lo)
        def _():
            s = _madd(a, t)
            ol_ref[:], oh_ref[:] = s

        @pl.when(jnp.logical_not(is_lo))
        def _():
            d = _msub(a, t)
            ol_ref[:], oh_ref[:] = d


def _big_stage(x, tw_s, half: int, dif: bool, interpret: bool):
    """Stage with lane-stride hl = half/8 >= 128; x = (lo, hi) arrays."""
    xl, xh = x
    W = xl.shape[1]
    hl = half // ROWS
    tile = min(hl, TILE_W)
    hb = hl // tile

    def lo_map(t):
        r2 = t % (2 * hb)
        return (0, t - jnp.where(r2 >= hb, hb, 0))

    def hi_map(t):
        r2 = t % (2 * hb)
        return (0, t + jnp.where(r2 >= hb, 0, hb))

    bs = lambda m: pl.BlockSpec((ROWS, tile), m, memory_space=pltpu.VMEM)
    kern = functools.partial(_stage_kernel, hb, dif)
    ol, oh = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((ROWS, W), U32)] * 2,
        grid=(W // tile,),
        in_specs=[bs(lo_map), bs(lo_map), bs(hi_map), bs(hi_map),
                  bs(lambda t: (0, t % hb)), bs(lambda t: (0, t % hb))],
        out_specs=[pl.BlockSpec((ROWS, tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM)] * 2,
        interpret=interpret,
    )(xl, xh, xl, xh, tw_s[0], tw_s[1])
    return ol, oh


# -- fused tail: all stages with half < 8*tile, one HBM pass -----------------

def _tail_kernel(halves, dif, xl_ref, xh_ref, twl_ref, twh_ref,
                 ol_ref, oh_ref):
    x = (xl_ref[:], xh_ref[:])
    w = x[0].shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x[0].shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, x[0].shape, 0)
    order = halves if dif else halves[::-1]
    for idx, h in enumerate(order):
        ti = idx if dif else len(halves) - 1 - idx
        tw = (twl_ref[:, ti * w:(ti + 1) * w],
              twh_ref[:, ti * w:(ti + 1) * w])
        if h >= ROWS:
            hl = h // ROWS
            m = (lane % (2 * hl)) < hl
            rl = lambda v, _h=hl: _pair_roll(_roll_lane_l, v, _h)
            rr = lambda v, _h=hl: _pair_roll(_roll_lane_r, v, _h)
        else:
            m = (row % (2 * h)) < h
            rl = lambda v, _h=h: _pair_roll(_roll_row_l, v, _h)
            rr = lambda v, _h=h: _pair_roll(_roll_row_r, v, _h)
        if dif:
            s = _madd(x, rl(x))
            d = _mmul(_msub(rr(x), x), tw)
            x = _pair_where(m, s, d)
        else:
            t = _mmul(x, tw)
            out_lo = _madd(x, rl(t))
            out_hi = _msub(rr(x), t)
            x = _pair_where(m, out_lo, out_hi)
    ol_ref[:], oh_ref[:] = x


def _tail_pass(x, tw_tail, halves, dif: bool, interpret: bool):
    xl, xh = x
    W = xl.shape[1]
    tile = min(W, TILE_W)
    kern = functools.partial(_tail_kernel, tuple(halves), dif)
    tw_w = tw_tail[0].shape[1]
    ol, oh = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((ROWS, W), U32)] * 2,
        grid=(W // tile,),
        in_specs=[
            pl.BlockSpec((ROWS, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, tw_w), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, tw_w), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((ROWS, tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM)] * 2,
        interpret=interpret,
    )(xl, xh, tw_tail[0], tw_tail[1])
    return ol, oh


# -- twiddle tables ----------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _tables(domain, inverse: bool, tail_tile: int):
    """Per-stage twiddle pairs in the (8, W) column-major layout
    (indexing identical to pallas_ntt_f31._tables)."""
    n, k = domain.n, domain.k
    tw0 = np.asarray(domain.twiddles0_inv if inverse else domain.twiddles0)
    big = {}
    tail_lo, tail_hi = [], []
    r = np.arange(ROWS, dtype=np.int64)[:, None]
    for s in range(k):
        half = n >> (s + 1)
        if half >= ROWS * LANES:
            c = np.arange(half // ROWS, dtype=np.int64)[None, :]
            idx = ((c * ROWS + r) % half) << s
            big[s] = (jnp.asarray(tw0[idx, 0]), jnp.asarray(tw0[idx, 1]))
        else:
            c = np.arange(tail_tile, dtype=np.int64)[None, :]
            idx = ((c * ROWS + r) % half) << s
            tail_lo.append(tw0[idx, 0])
            tail_hi.append(tw0[idx, 1])
    if tail_lo:
        tail = (jnp.asarray(np.concatenate(tail_lo, axis=1)),
                jnp.asarray(np.concatenate(tail_hi, axis=1)))
    else:
        tail = (jnp.zeros((ROWS, 0), U32), jnp.zeros((ROWS, 0), U32))
    return big, tail


def run_stages_pallas_f64(domain, a, decimation: str, inverse: bool,
                          interpret: bool = False):
    """Drop-in replacement for fft._run_stages on (n, 2) uint32 arrays."""
    n, k = domain.n, domain.k
    W = n // ROWS
    dif = decimation == "DIF"
    big_stages = [s for s in range(k) if (n >> (s + 1)) >= ROWS * LANES]
    tail_halves = tuple(n >> (s + 1) for s in range(k)
                        if (n >> (s + 1)) < ROWS * LANES)
    big, tail = _tables(domain, inverse, min(W, TILE_W))
    # column-major per word: element i at [i%8, i//8]
    xl = a[:, 0].reshape(W, ROWS).T
    xh = a[:, 1].reshape(W, ROWS).T
    x = (xl, xh)

    if dif:
        for s in big_stages:
            x = _big_stage(x, big[s], n >> (s + 1), True, interpret)
        if tail_halves:
            x = _tail_pass(x, tail, tail_halves, True, interpret)
    else:
        if tail_halves:
            x = _tail_pass(x, tail, tail_halves, False, interpret)
        for s in reversed(big_stages):
            x = _big_stage(x, big[s], n >> (s + 1), False, interpret)
    return jnp.stack([x[0].T.reshape(n), x[1].T.reshape(n)], axis=-1)


def run_batch_small_f64(domain, a3, decimation: str, inverse: bool,
                        interpret: bool = False):
    """Batch of B independent small transforms, ONE fused-tail pass.

    ``a3``: (B, n, 2) uint32 pairs with n = domain.n <= 8*128 — the f64
    face of pallas_ntt_f31.run_batch_small_f31 (same argument: a batch
    of independent n-point NTTs is the tail of a virtual big NTT with
    the n-domain root, so the existing kernel + tables apply verbatim).
    Serves the goldilocks Ring-SIS batched pipeline (sis512_16 shape).
    """
    B, n, _w = a3.shape
    assert n == domain.n and ROWS <= n <= ROWS * LANES
    W = B * n // ROWS
    tile = min(W, TILE_W)
    assert W % tile == 0 and tile % (n // ROWS) == 0, (W, tile, n)
    halves = tuple(n >> (s + 1) for s in range(domain.k))
    _big, tail = _tables(domain, inverse, tile)
    xl = a3[..., 0].reshape(W, ROWS).T
    xh = a3[..., 1].reshape(W, ROWS).T
    ol, oh = _tail_pass((xl, xh), tail, halves, decimation == "DIF",
                        interpret)
    return jnp.stack([ol.T.reshape(B, n), oh.T.reshape(B, n)], axis=-1)


def supported(domain, a) -> bool:
    eng = domain.eng
    spec = getattr(eng, "spec", None)
    return (getattr(eng, "elem_dims", 0) == 1 and spec is not None
            and spec.limb_bits == 32 and spec.n_limbs == 2
            and domain.n >= 2 * ROWS * LANES
            and a.ndim == 2 and a.shape[-1] == 2)
