"""Pallas TPU kernel: fused complete Jacobian point addition.

The MSM hot loop (bucket tree reduction, ``msm/pippenger.py``) is made of
full-batch point adds; composing them from ~20 separate Montgomery-mul
dispatches costs ~40 HBM round trips per add. This kernel runs the whole
masked-complete add-2007-bl + double fallback (reference ``g1.go:332
AddAssign`` / ``:397 DoubleAssign``) in VMEM on (l_pad, TILE) limb tiles —
one read of the two operand points, one write of the sum.

Layout and in-kernel Montgomery helpers are shared with
``field/pallas/mont_mul.py`` (limbs in sublanes, elements in lanes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnark_crypto_tpu.field.pallas.mont_mul import (TILE, _add_tile,
                                                    _mm_tile, _round_up,
                                                    _sub_tile)
from gnark_crypto_tpu.specs.field import FieldSpec, int_to_limbs


def _is_zero_row(t):
    """(l_pad, TILE) canonical tile -> bool row (TILE,): element == 0."""
    return jnp.all(t == 0, axis=0)


def _sel(cond_row, a, b):
    return jnp.where(cond_row[None, :], a, b)


def _field_ops(spec: FieldSpec, l_pad: int, q_col):
    mm = functools.partial(_mm_tile, spec, l_pad)
    ad = functools.partial(_add_tile, spec, l_pad)
    sb = functools.partial(_sub_tile, spec, l_pad)

    def mul(a, b):
        return mm(a, b, q_col)

    def add2(a, b):
        return ad(a, b, q_col)

    def sub2(a, b):
        return sb(a, b, q_col)

    def dbl(a):
        return ad(a, a, q_col)

    return mul, add2, sub2, dbl


def _dbl_core(mul, add2, sub2, dbl, a_is_zero, a_tile, x1, y1, z1):
    """dbl-2009-l / dbl-2007-bl on limb tiles (g1.go:397 DoubleAssign).

    Infinity-safe without masks: Z3 = 2*Y1*Z1 = 0 when Z1 = 0."""
    A = mul(x1, x1)
    B = mul(y1, y1)
    C = mul(B, B)
    t = add2(x1, B)
    t = mul(t, t)
    D = dbl(sub2(sub2(t, A), C))
    E = add2(dbl(A), A)
    if not a_is_zero:
        z2 = mul(z1, z1)
        E = add2(E, mul(mul(z2, z2), a_tile))
    F = mul(E, E)
    xd = sub2(F, dbl(D))
    yd = sub2(mul(E, sub2(D, xd)), dbl(dbl(dbl(C))))
    zd = dbl(mul(y1, z1))
    return xd, yd, zd


def _add_core(spec, l_pad, a_is_zero, a_tile, q_col,
              x1, y1, z1, x2, y2, z2):
    """Complete masked Jacobian add on limb tiles -> (ox, oy, oz)."""
    return _add_core_ops(_field_ops(spec, l_pad, q_col), a_is_zero, a_tile,
                         x1, y1, z1, x2, y2, z2)


def _add_core_ops(ops, a_is_zero, a_tile, x1, y1, z1, x2, y2, z2):
    """Layout-agnostic add core: ``ops`` = (mul, add, sub, dbl) over any
    tile layout (base-field (l_pad, T) or Fp2 stacked (2*l_pad, T))."""
    mul, add2, sub2, dbl = ops

    # --- add-2007-bl (g1.go:332)
    z1z1 = mul(z1, z1)
    z2z2 = mul(z2, z2)
    u1 = mul(x1, z2z2)
    u2 = mul(x2, z1z1)
    s1 = mul(mul(y1, z2), z2z2)
    s2 = mul(mul(y2, z1), z1z1)
    h = sub2(u2, u1)
    i = dbl(h)
    i = mul(i, i)
    j = mul(h, i)
    rr = dbl(sub2(s2, s1))
    v = mul(u1, i)
    x3 = sub2(sub2(mul(rr, rr), j), dbl(v))
    y3 = sub2(mul(rr, sub2(v, x3)), dbl(mul(s1, j)))
    z12 = add2(z1, z2)
    z3 = mul(sub2(sub2(mul(z12, z12), z1z1), z2z2), h)

    # --- double fallback (g1.go:397, dbl-2009-l / dbl-2007-bl)
    xd, yd, zd = _dbl_core(mul, add2, sub2, dbl, a_is_zero, a_tile,
                           x1, y1, z1)

    # --- completeness masks (curve/jacobian.py add)
    h0 = _is_zero_row(h)
    r0 = _is_zero_row(rr)
    p_inf = _is_zero_row(z1)
    q_inf = _is_zero_row(z2)
    zero = h ^ h
    is_dbl = h0 & r0
    is_inf = h0 & (~r0) & (~p_inf) & (~q_inf)
    ox, oy, oz = x3, y3, z3
    ox, oy, oz = (_sel(is_dbl, xd, ox), _sel(is_dbl, yd, oy),
                  _sel(is_dbl, zd, oz))
    # infinity encoded as (0, 0, 0) canonical
    ox, oy, oz = (_sel(is_inf, zero, ox), _sel(is_inf, zero, oy),
                  _sel(is_inf, zero, oz))
    ox, oy, oz = (_sel(p_inf, x2, ox), _sel(p_inf, y2, oy),
                  _sel(p_inf, z2, oz))
    ox, oy, oz = (_sel(q_inf, x1, ox), _sel(q_inf, y1, oy),
                  _sel(q_inf, z1, oz))
    return ox, oy, oz


def _kernel(spec: FieldSpec, l_pad: int, a_is_zero: bool,
            x1r, y1r, z1r, x2r, y2r, z2r, qr, ar,
            x3r, y3r, z3r):
    ox, oy, oz = _add_core(spec, l_pad, a_is_zero, ar[:], qr[:],
                           x1r[:], y1r[:], z1r[:], x2r[:], y2r[:], z2r[:])
    x3r[:] = ox
    y3r[:] = oy
    z3r[:] = oz


def _dbl_kernel(spec: FieldSpec, l_pad: int, a_is_zero: bool,
                x1r, y1r, z1r, qr, ar, x3r, y3r, z3r):
    q_col = qr[:]
    mul, add2, sub2, dbl = _field_ops(spec, l_pad, q_col)
    xd, yd, zd = _dbl_core(mul, add2, sub2, dbl, a_is_zero, ar[:],
                           x1r[:], y1r[:], z1r[:])
    x3r[:] = xd
    y3r[:] = yd
    z3r[:] = zd


@functools.lru_cache(maxsize=None)
def _q_a_tiles(spec: FieldSpec, l_pad: int, a_int: int):
    q = np.asarray(spec.q_limbs + (0,) * (l_pad - spec.n_limbs),
                   dtype=np.int32)[:, None]
    # a in Montgomery form (as the engine stores constants)
    am = (a_int % spec.modulus) * spec.r % spec.modulus
    a = np.asarray(
        tuple(int_to_limbs(am, spec.limb_bits, spec.n_limbs))
        + (0,) * (l_pad - spec.n_limbs), dtype=np.int32)[:, None]
    return (np.broadcast_to(q, (l_pad, TILE)).copy(),
            np.broadcast_to(a, (l_pad, TILE)).copy())


def _launch(spec: FieldSpec, a_int: int, kernel, coords, interpret: bool):
    """Shared pallas_call plumbing: transpose (N, L) coordinate arrays to
    (l_pad, n_pad) limb tiles, append the q/a constant tiles, run, and
    transpose the three output coordinates back."""
    n, L = coords[0].shape
    l_pad = _round_up(max(L, 8), 8)
    n_pad = _round_up(n, TILE)

    def tr(a):
        return jnp.zeros((l_pad, n_pad), jnp.int32).at[:L, :n].set(a.T)

    qt, at = _q_a_tiles(spec, l_pad, a_int)
    kern = functools.partial(kernel, spec, l_pad, a_int == 0)
    bs = pl.BlockSpec((l_pad, TILE), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    cs = pl.BlockSpec((l_pad, TILE), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((l_pad, n_pad), jnp.int32)] * 3,
        grid=(n_pad // TILE,),
        in_specs=[bs] * len(coords) + [cs, cs],
        out_specs=[bs] * 3,
        interpret=interpret,
    )(*(tr(c) for c in coords), jnp.asarray(qt), jnp.asarray(at))
    return tuple(o[:L, :n].T for o in out)


@functools.partial(jax.jit, static_argnums=(0, 1, 8))
def jac_add(spec: FieldSpec, a_int: int, x1, y1, z1, x2, y2, z2,
            interpret: bool = False):
    """Complete Jacobian add on (N, L) int32 coordinate arrays.

    ``a_int``: the curve's a coefficient (plain int); a == 0 skips the
    aZ^4 term in the double fallback. Returns (x3, y3, z3)."""
    return _launch(spec, a_int, _kernel, (x1, y1, z1, x2, y2, z2),
                   interpret)


@functools.partial(jax.jit, static_argnums=(0, 1, 5))
def jac_double(spec: FieldSpec, a_int: int, x1, y1, z1,
               interpret: bool = False):
    """Jacobian double on (N, L) int32 coordinate arrays (infinity-safe)."""
    return _launch(spec, a_int, _dbl_kernel, (x1, y1, z1), interpret)


# -- fused batch-affine tree-level kernels ------------------------------------
# One MSM accumulator level = a complete masked affine add (batchAddG1Affine
# g1.go:1396) split around the XLA batch inversion: kernel 1 computes the
# shared denominator/numerator and the completeness mask bits; kernel 2
# finishes the add and applies the tree's select logic — replacing ~7
# separate Montgomery-mul dispatches and ~10 full-width selects per level.

_MB_DBL, _MB_INFOUT, _MB_PINF, _MB_QINF = 1, 2, 4, 8


def _prep_kernel(spec: FieldSpec, l_pad: int, a_is_zero: bool,
                 pxr, pyr, qxr, qyr, qr, ar, oner,
                 denr, numr, mr):
    q_col = qr[:]
    mul, add2, sub2, dbl = _field_ops(spec, l_pad, q_col)
    px, py = pxr[:], pyr[:]
    qx, qy = qxr[:], qyr[:]
    p_inf = _is_zero_row(px) & _is_zero_row(py)
    q_inf = _is_zero_row(qx) & _is_zero_row(qy)
    both = (~p_inf) & (~q_inf)
    x_eq = _is_zero_row(px ^ qx)
    y_eq = _is_zero_row(py ^ qy)
    is_dbl = x_eq & y_eq & both
    inf_out = (x_eq & (~y_eq) & both) | (is_dbl & _is_zero_row(py))
    den = _sel(is_dbl, dbl(py), sub2(qx, px))
    den = _sel(_is_zero_row(den), oner[:], den)
    x2 = mul(px, px)
    num_dbl = add2(dbl(x2), x2)
    if not a_is_zero:
        num_dbl = add2(num_dbl, ar[:])
    num = _sel(is_dbl, num_dbl, sub2(qy, py))
    denr[:] = den
    numr[:] = num
    bits = (is_dbl * _MB_DBL + inf_out * _MB_INFOUT
            + p_inf * _MB_PINF + q_inf * _MB_QINF)
    mr[:] = jnp.broadcast_to(bits[None, :].astype(jnp.int32),
                             mr.shape)


def _finish_kernel(spec: FieldSpec, l_pad: int,
                   lpxr, lpyr, lsxr, lsyr, rpxr, rpyr, rsxr, rsyr,
                   numr, dinvr, mr, tmr, qr, oner,
                   oprex, oprey, osufx, osufy, optax, optay, ozar):
    q_col = qr[:]
    mul, add2, sub2, dbl = _field_ops(spec, l_pad, q_col)
    px, py = lsxr[:], lsyr[:]          # p = l_suf
    qx, qy = rpxr[:], rpyr[:]          # q = r_pre
    bits = mr[0, :]
    is_dbl = (bits & _MB_DBL) != 0
    inf_out = (bits & _MB_INFOUT) != 0
    p_inf = (bits & _MB_PINF) != 0
    q_inf = (bits & _MB_QINF) != 0

    s = mul(numr[:], dinvr[:])
    x3 = sub2(sub2(mul(s, s), px), qx)
    y3 = sub2(mul(s, sub2(px, x3)), py)
    zero = px ^ px
    mx = _sel(inf_out, zero, x3)
    my = _sel(inf_out, zero, y3)
    mx, my = _sel(p_inf, qx, mx), _sel(p_inf, qy, my)
    mx, my = _sel(q_inf, px, mx), _sel(q_inf, py, my)  # mid = l_suf+r_pre

    tbits = tmr[0, :]
    eq = (tbits & 1) != 0
    l_single = (tbits & 2) != 0
    r_single = (tbits & 4) != 0

    pax = _sel(eq, mx, px)             # pt_a = eq ? mid : l_suf
    pay = _sel(eq, my, py)
    optax[:] = pax
    optay[:] = pay
    ozar[:] = _sel(_is_zero_row(pax) & _is_zero_row(pay), zero, oner[:])
    oprex[:] = _sel(l_single & eq, mx, lpxr[:])
    oprey[:] = _sel(l_single & eq, my, lpyr[:])
    osufx[:] = _sel(r_single & eq, mx, rsxr[:])
    osufy[:] = _sel(r_single & eq, my, rsyr[:])


@functools.partial(jax.jit, static_argnums=(0, 1, 6))
def affine_prep(spec: FieldSpec, a_int: int, px, py, qx, qy,
                interpret: bool = False):
    """(den, num, maskbits) for a complete affine add batch; (N, L) in,
    den/num (N, L) + maskbits (N,) int32 out."""
    n, L = px.shape
    l_pad = _round_up(max(L, 8), 8)
    n_pad = _round_up(n, TILE)

    def tr(a):
        return jnp.zeros((l_pad, n_pad), jnp.int32).at[:L, :n].set(a.T)

    qt, at = _q_a_tiles(spec, l_pad, a_int)
    onet = jnp.asarray(_one_tile(spec, l_pad))
    kern = functools.partial(_prep_kernel, spec, l_pad, a_int == 0)
    bs = pl.BlockSpec((l_pad, TILE), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    cs2 = pl.BlockSpec((l_pad, TILE), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    ms = pl.BlockSpec((8, TILE), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    den, num, mb = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((l_pad, n_pad), jnp.int32),
                   jax.ShapeDtypeStruct((l_pad, n_pad), jnp.int32),
                   jax.ShapeDtypeStruct((8, n_pad), jnp.int32)],
        grid=(n_pad // TILE,),
        in_specs=[bs] * 4 + [cs2] * 3,
        out_specs=[bs, bs, ms],
        interpret=interpret,
    )(tr(px), tr(py), tr(qx), tr(qy), jnp.asarray(qt), jnp.asarray(at),
      onet)
    return den[:L, :n].T, num[:L, :n].T, mb[0, :n]


@functools.partial(jax.jit, static_argnums=(0, 1, 14))
def affine_finish(spec: FieldSpec, a_int: int,
                  lpx, lpy, lsx, lsy, rpx, rpy, rsx, rsy,
                  num, dinv, maskbits, treebits,
                  interpret: bool = False):
    """Finish the fused tree level: returns (pre_x, pre_y, suf_x, suf_y,
    pta_x, pta_y, z_a), all (N, L) except z_a (N, L) Jacobian-z limbs."""
    n, L = lpx.shape
    l_pad = _round_up(max(L, 8), 8)
    n_pad = _round_up(n, TILE)

    def tr(a):
        return jnp.zeros((l_pad, n_pad), jnp.int32).at[:L, :n].set(a.T)

    def trm(b):
        return (jnp.zeros((8, n_pad), jnp.int32)
                .at[:, :n].set(jnp.broadcast_to(
                    b.astype(jnp.int32)[None, :], (8, n))))

    qt, _at = _q_a_tiles(spec, l_pad, a_int)
    onet = jnp.asarray(_one_tile(spec, l_pad))
    kern = functools.partial(_finish_kernel, spec, l_pad)
    bs = pl.BlockSpec((l_pad, TILE), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    cs2 = pl.BlockSpec((l_pad, TILE), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    ms = pl.BlockSpec((8, TILE), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((l_pad, n_pad), jnp.int32)] * 7,
        grid=(n_pad // TILE,),
        in_specs=[bs] * 10 + [ms, ms] + [cs2, cs2],
        out_specs=[bs] * 7,
        interpret=interpret,
    )(tr(lpx), tr(lpy), tr(lsx), tr(lsy), tr(rpx), tr(rpy), tr(rsx),
      tr(rsy), tr(num), tr(dinv), trm(maskbits), trm(treebits),
      jnp.asarray(qt), onet)
    return tuple(o[:L, :n].T for o in outs)


@functools.lru_cache(maxsize=None)
def _one_tile(spec: FieldSpec, l_pad: int):
    # numpy, NOT jnp: a jnp array materialized inside a jit trace would be
    # cached as a leaked tracer (same convention as _q_a_tiles)
    one = np.asarray(
        tuple(int_to_limbs(spec.r % spec.modulus, spec.limb_bits,
                           spec.n_limbs))
        + (0,) * (l_pad - spec.n_limbs), dtype=np.int32)[:, None]
    return np.broadcast_to(one, (l_pad, TILE)).copy()


# -- in-kernel Horner window fold --------------------------------------------

def _fold_kernel(spec: FieldSpec, l_pad: int, a_is_zero: bool,
                 nwin: int, c: int, xr, yr, zr, qr, ar, oxr, oyr, ozr):
    """acc = sum_w 2^(cw) T_w, the whole c*(nwin-1)-deep doubling chain in
    VMEM (the XLA scan form is ~270 sequential dispatches = ~190 ms of pure
    latency at width 1; in-kernel it is microseconds of VPU work).

    Window w sits in lane w of the (l_pad, LANES) tiles; the accumulator is
    a broadcast tile (all lanes equal). Lane w is extracted with a masked
    lane-reduction (Mosaic cannot lower a dynamic single-lane load)."""
    q_col = qr[:]
    a_tile = ar[:]
    mul, add2, sub2, dbl = _field_ops(spec, l_pad, q_col)
    lane = jax.lax.broadcasted_iota(jnp.int32, (l_pad, TILE), 1)

    def lane_bcast(t, w):
        col = jnp.sum(jnp.where(lane == w, t, 0), axis=1, keepdims=True)
        return jnp.broadcast_to(col, t.shape)

    x, y, z = xr[:], yr[:], zr[:]
    acc = (lane_bcast(x, nwin - 1), lane_bcast(y, nwin - 1),
           lane_bcast(z, nwin - 1))

    def dbl_once(_, acc):
        return _dbl_core(mul, add2, sub2, dbl, a_is_zero, a_tile, *acc)

    def body(i, acc):
        ax, ay, az = jax.lax.fori_loop(0, c, dbl_once, acc)
        w = nwin - 2 - i
        tx, ty, tz = lane_bcast(x, w), lane_bcast(y, w), lane_bcast(z, w)
        return _add_core(spec, l_pad, a_is_zero, a_tile, q_col,
                         ax, ay, az, tx, ty, tz)

    ax, ay, az = jax.lax.fori_loop(0, nwin - 1, body, acc)
    oxr[:] = ax
    oyr[:] = ay
    ozr[:] = az


@functools.partial(jax.jit, static_argnums=(0, 1, 5, 6))
def jac_fold_windows(spec: FieldSpec, a_int: int, x, y, z, c: int,
                     interpret: bool = False):
    """Horner fold of per-window totals (msmReduceChunkG1Affine,
    multiexp.go:303): x/y/z are (nwin, L) Jacobian coords, nwin <= TILE.
    Returns the folded point as (1, L) coordinate arrays."""
    nwin, L = x.shape
    assert nwin <= TILE
    l_pad = _round_up(max(L, 8), 8)

    def tr(a):
        return jnp.zeros((l_pad, TILE), jnp.int32).at[:L, :nwin].set(a.T)

    qt, at = _q_a_tiles(spec, l_pad, a_int)
    kern = functools.partial(_fold_kernel, spec, l_pad, a_int == 0, nwin, c)
    bs = pl.BlockSpec((l_pad, TILE), lambda: (0, 0),
                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((l_pad, TILE), jnp.int32)] * 3,
        in_specs=[bs] * 5,
        out_specs=[bs] * 3,
        interpret=interpret,
    )(tr(x), tr(y), tr(z), jnp.asarray(qt), jnp.asarray(at))
    return tuple(o[:L, :1].T for o in out)
