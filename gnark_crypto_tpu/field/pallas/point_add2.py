"""Pallas TPU kernels: fused batch-affine MSM tree levels over Fp2.

G2 MSM (curve over the quadratic extension) previously ran its phase-1
compaction levels on the XLA tower engine — each level is ~7 Fp2 muls
(~21 base CIOS muls) materialized as separate full-width HLO ops, which
both blows up compile time (~27 min at 2^13, measured round 5) and pays
an HBM round trip per op. These kernels are the Fp2 counterparts of
``field/pallas/point_add.py``'s ``affine_prep``/``affine_finish``: an Fp2
element occupies a (2*l_pad, TILE) stacked limb tile — re limbs in rows
[0, l_pad), im limbs in rows [l_pad, 2*l_pad) — and the whole level body
(Karatsuba Fp2 muls, completeness masks, tree selects) runs in VMEM.

Reference counterpart: ``ecc/bn254/g2.go`` batchAddG2Affine + the
``multiexp_affine.go`` G2 bucket path. Supported non-residues are the
small-int betas of the G2 families (u^2 = -1 bn254/bls12-381, -5
bls12-377); curves must have a == 0 (all supported G2 twists do).
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
from gnark_crypto_tpu.field.pallas.point_add import (_MB_DBL, _MB_INFOUT,
                                                     _MB_PINF, _MB_QINF,
                                                     _is_zero_row, _sel)
from gnark_crypto_tpu.specs.field import FieldSpec, int_to_limbs


def _fp2_ops(spec: FieldSpec, l_pad: int, nr: int, q_col):
    """(mul, add, sub, dbl) on (2*l_pad, TILE) stacked re/im limb tiles.

    Karatsuba 3-mul with the small-int non-residue folded into adds
    (e2.go MulByNonResidue): fewer base muls >> extra adds on the VPU,
    same trade the reference's asm makes.
    """
    mm = functools.partial(_mm_tile, spec, l_pad)
    ad = functools.partial(_add_tile, spec, l_pad)
    sb = functools.partial(_sub_tile, spec, l_pad)

    def split(t):
        return t[:l_pad], t[l_pad:]

    def cat(r, i):
        return jnp.concatenate([r, i], axis=0)

    def small_mul(x, k: int):
        """k*x for 1 <= k <= 16 via double-and-add on modular adds."""
        acc = None
        for bit in bin(k)[2:]:
            if acc is not None:
                acc = ad(acc, acc, q_col)
            if bit == "1":
                acc = x if acc is None else ad(acc, x, q_col)
        return acc

    def mul2(a, b):
        ar, ai = split(a)
        br, bi = split(b)
        v0 = mm(ar, br, q_col)
        v1 = mm(ai, bi, q_col)
        t = mm(ad(ar, ai, q_col), ad(br, bi, q_col), q_col)
        if nr == -1:
            c0 = sb(v0, v1, q_col)
        elif nr < 0:
            c0 = sb(v0, small_mul(v1, -nr), q_col)
        else:
            c0 = ad(v0, small_mul(v1, nr), q_col)
        c1 = sb(sb(t, v0, q_col), v1, q_col)
        return cat(c0, c1)

    def add2(a, b):
        ar, ai = split(a)
        br, bi = split(b)
        return cat(ad(ar, br, q_col), ad(ai, bi, q_col))

    def sub2(a, b):
        ar, ai = split(a)
        br, bi = split(b)
        return cat(sb(ar, br, q_col), sb(ai, bi, q_col))

    def dbl2(a):
        return add2(a, a)

    return mul2, add2, sub2, dbl2


def _prep2_kernel(spec: FieldSpec, l_pad: int, nr: int,
                  pxr, pyr, qxr, qyr, qr, oner,
                  denr, numr, mr):
    """Fp2 mirror of point_add._prep_kernel (a == 0 only)."""
    q_col = qr[:]
    mul, add2, sub2, dbl = _fp2_ops(spec, l_pad, nr, q_col)
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
    num = _sel(is_dbl, num_dbl, sub2(qy, py))
    denr[:] = den
    numr[:] = num
    bits = (is_dbl * _MB_DBL + inf_out * _MB_INFOUT
            + p_inf * _MB_PINF + q_inf * _MB_QINF)
    mr[:] = jnp.broadcast_to(bits[None, :].astype(jnp.int32), mr.shape)


def _finish2_kernel(spec: FieldSpec, l_pad: int, nr: int,
                    lpxr, lpyr, lsxr, lsyr, rpxr, rpyr, rsxr, rsyr,
                    numr, dinvr, mr, tmr, qr, oner,
                    oprex, oprey, osufx, osufy, optax, optay, ozar):
    """Fp2 mirror of point_add._finish_kernel."""
    q_col = qr[:]
    mul, add2, sub2, dbl = _fp2_ops(spec, l_pad, nr, q_col)
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


@functools.lru_cache(maxsize=None)
def _q_one2_tiles(spec: FieldSpec, l_pad: int):
    """q (l_pad, TILE) + the Fp2 one (2*l_pad, TILE) as numpy constants
    (numpy, NOT jnp — see point_add._one_tile for the tracer-leak rule)."""
    q = np.asarray(spec.q_limbs + (0,) * (l_pad - spec.n_limbs),
                   dtype=np.int32)[:, None]
    one_re = np.asarray(
        tuple(int_to_limbs(spec.r % spec.modulus, spec.limb_bits,
                           spec.n_limbs))
        + (0,) * (l_pad - spec.n_limbs), dtype=np.int32)[:, None]
    one = np.concatenate([one_re, np.zeros_like(one_re)], axis=0)
    return (np.broadcast_to(q, (l_pad, TILE)).copy(),
            np.broadcast_to(one, (2 * l_pad, TILE)).copy())


def _tr2(a, l_pad, n_pad):
    """(N, 2, L) int32 coefficients -> (2*l_pad, n_pad) stacked limb tile."""
    n, _, L = a.shape
    t = jnp.zeros((2 * l_pad, n_pad), jnp.int32)
    t = t.at[:L, :n].set(a[:, 0].T)
    return t.at[l_pad:l_pad + L, :n].set(a[:, 1].T)


def _untr2(t, L, n, l_pad):
    """(2*l_pad, n_pad) stacked tile -> (N, 2, L)."""
    return jnp.stack([t[:L, :n].T, t[l_pad:l_pad + L, :n].T], axis=1)


@functools.partial(jax.jit, static_argnums=(0, 1, 6))
def affine_prep2(spec: FieldSpec, nr: int, px, py, qx, qy,
                 interpret: bool = False):
    """(den, num, maskbits) for a complete Fp2 affine-add batch.

    (N, 2, L) coefficient arrays in; den/num (N, 2, L) + maskbits (N,)
    int32 out. ``spec`` is the BASE field spec; ``nr`` the E2 non-residue.
    """
    n, _, L = px.shape
    l_pad = _round_up(max(L, 8), 8)
    n_pad = _round_up(n, TILE)
    qt, onet = _q_one2_tiles(spec, l_pad)
    kern = functools.partial(_prep2_kernel, spec, l_pad, nr)
    bs = pl.BlockSpec((2 * l_pad, TILE), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    qs = pl.BlockSpec((l_pad, TILE), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    cs = pl.BlockSpec((2 * l_pad, TILE), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    ms = pl.BlockSpec((8, TILE), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    tr = functools.partial(_tr2, l_pad=l_pad, n_pad=n_pad)
    den, num, mb = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((2 * l_pad, n_pad), jnp.int32),
                   jax.ShapeDtypeStruct((2 * l_pad, n_pad), jnp.int32),
                   jax.ShapeDtypeStruct((8, n_pad), jnp.int32)],
        grid=(n_pad // TILE,),
        in_specs=[bs] * 4 + [qs, cs],
        out_specs=[bs, bs, ms],
        interpret=interpret,
    )(tr(px), tr(py), tr(qx), tr(qy), jnp.asarray(qt), jnp.asarray(onet))
    return (_untr2(den, L, n, l_pad), _untr2(num, L, n, l_pad), mb[0, :n])


@functools.partial(jax.jit, static_argnums=(0, 1, 14))
def affine_finish2(spec: FieldSpec, nr: int,
                   lpx, lpy, lsx, lsy, rpx, rpy, rsx, rsy,
                   num, dinv, maskbits, treebits,
                   interpret: bool = False):
    """Finish the fused Fp2 tree level: returns (pre_x, pre_y, suf_x,
    suf_y, pta_x, pta_y, z_a), all (N, 2, L)."""
    n, _, L = lpx.shape
    l_pad = _round_up(max(L, 8), 8)
    n_pad = _round_up(n, TILE)
    qt, onet = _q_one2_tiles(spec, l_pad)
    kern = functools.partial(_finish2_kernel, spec, l_pad, nr)
    bs = pl.BlockSpec((2 * l_pad, TILE), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    qs = pl.BlockSpec((l_pad, TILE), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    cs = pl.BlockSpec((2 * l_pad, TILE), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    ms = pl.BlockSpec((8, TILE), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    tr = functools.partial(_tr2, l_pad=l_pad, n_pad=n_pad)

    def trm(b):
        return (jnp.zeros((8, n_pad), jnp.int32)
                .at[:, :n].set(jnp.broadcast_to(
                    b.astype(jnp.int32)[None, :], (8, n))))

    outs = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((2 * l_pad, n_pad), jnp.int32)] * 7,
        grid=(n_pad // TILE,),
        in_specs=[bs] * 10 + [ms, ms] + [qs, cs],
        out_specs=[bs] * 7,
        interpret=interpret,
    )(tr(lpx), tr(lpy), tr(lsx), tr(lsy), tr(rpx), tr(rpy), tr(rsx),
      tr(rsy), tr(num), tr(dinv), trm(maskbits), trm(treebits),
      jnp.asarray(qt), jnp.asarray(onet))
    return tuple(_untr2(o, L, n, l_pad) for o in outs)


# -- Fp2 Jacobian add / double / window fold ---------------------------------
# Same cores as point_add.py (_add_core_ops / _dbl_core) instantiated over
# the stacked-tile Fp2 ops; a == 0 only (all supported G2 twists).

from gnark_crypto_tpu.field.pallas.point_add import (_add_core_ops,
                                                     _dbl_core)


def _jac_add2_kernel(spec: FieldSpec, l_pad: int, nr: int,
                     x1r, y1r, z1r, x2r, y2r, z2r, qr,
                     x3r, y3r, z3r):
    ops = _fp2_ops(spec, l_pad, nr, qr[:])
    ox, oy, oz = _add_core_ops(ops, True, None,
                               x1r[:], y1r[:], z1r[:],
                               x2r[:], y2r[:], z2r[:])
    x3r[:] = ox
    y3r[:] = oy
    z3r[:] = oz


def _jac_dbl2_kernel(spec: FieldSpec, l_pad: int, nr: int,
                     x1r, y1r, z1r, qr, x3r, y3r, z3r):
    mul, add2, sub2, dbl = _fp2_ops(spec, l_pad, nr, qr[:])
    xd, yd, zd = _dbl_core(mul, add2, sub2, dbl, True, None,
                           x1r[:], y1r[:], z1r[:])
    x3r[:] = xd
    y3r[:] = yd
    z3r[:] = zd


def _launch2(spec: FieldSpec, nr: int, kernel, coords, interpret: bool):
    """pallas_call plumbing for (N, 2, L) Fp2 coordinate arrays."""
    n, _, L = coords[0].shape
    l_pad = _round_up(max(L, 8), 8)
    n_pad = _round_up(n, TILE)
    qt, _one = _q_one2_tiles(spec, l_pad)
    kern = functools.partial(kernel, spec, l_pad, nr)
    bs = pl.BlockSpec((2 * l_pad, TILE), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    qs = pl.BlockSpec((l_pad, TILE), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    tr = functools.partial(_tr2, l_pad=l_pad, n_pad=n_pad)
    out = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((2 * l_pad, n_pad), jnp.int32)] * 3,
        grid=(n_pad // TILE,),
        in_specs=[bs] * len(coords) + [qs],
        out_specs=[bs] * 3,
        interpret=interpret,
    )(*(tr(c) for c in coords), jnp.asarray(qt))
    return tuple(_untr2(o, L, n, l_pad) for o in out)


@functools.partial(jax.jit, static_argnums=(0, 1, 8))
def jac_add2(spec: FieldSpec, nr: int, x1, y1, z1, x2, y2, z2,
             interpret: bool = False):
    """Complete Jacobian add on (N, 2, L) Fp2 coordinate arrays."""
    return _launch2(spec, nr, _jac_add2_kernel, (x1, y1, z1, x2, y2, z2),
                    interpret)


@functools.partial(jax.jit, static_argnums=(0, 1, 5))
def jac_double2(spec: FieldSpec, nr: int, x1, y1, z1,
                interpret: bool = False):
    """Jacobian double on (N, 2, L) Fp2 coordinate arrays (infinity-safe)."""
    return _launch2(spec, nr, _jac_dbl2_kernel, (x1, y1, z1), interpret)


def _fold2_kernel(spec: FieldSpec, l_pad: int, nr: int, nwin: int, c: int,
                  xr, yr, zr, qr, oxr, oyr, ozr):
    """Horner window fold over Fp2 (point_add._fold_kernel counterpart):
    window w in lane w; the whole c*(nwin-1) doubling chain in VMEM."""
    q_col = qr[:]
    ops = _fp2_ops(spec, l_pad, nr, q_col)
    mul, add2, sub2, dbl = ops
    lane = jax.lax.broadcasted_iota(jnp.int32, (2 * l_pad, TILE), 1)

    def lane_bcast(t, w):
        col = jnp.sum(jnp.where(lane == w, t, 0), axis=1, keepdims=True)
        return jnp.broadcast_to(col, t.shape)

    x, y, z = xr[:], yr[:], zr[:]
    acc = (lane_bcast(x, nwin - 1), lane_bcast(y, nwin - 1),
           lane_bcast(z, nwin - 1))

    def dbl_once(_, acc):
        return _dbl_core(mul, add2, sub2, dbl, True, None, *acc)

    def body(i, acc):
        ax, ay, az = jax.lax.fori_loop(0, c, dbl_once, acc)
        w = nwin - 2 - i
        tx, ty, tz = lane_bcast(x, w), lane_bcast(y, w), lane_bcast(z, w)
        return _add_core_ops(ops, True, None, ax, ay, az, tx, ty, tz)

    ax, ay, az = jax.lax.fori_loop(0, nwin - 1, body, acc)
    oxr[:] = ax
    oyr[:] = ay
    ozr[:] = az


@functools.partial(jax.jit, static_argnums=(0, 1, 5, 6))
def jac_fold_windows2(spec: FieldSpec, nr: int, x, y, z, c: int,
                      interpret: bool = False):
    """Horner fold of per-window totals over Fp2: x/y/z are (nwin, 2, L)
    Jacobian coords, nwin <= TILE. Returns the fold as (1, 2, L) arrays."""
    nwin, _, L = x.shape
    assert nwin <= TILE
    l_pad = _round_up(max(L, 8), 8)
    qt, _one = _q_one2_tiles(spec, l_pad)

    def tr(a):
        t = jnp.zeros((2 * l_pad, TILE), jnp.int32)
        t = t.at[:L, :nwin].set(a[:, 0].T)
        return t.at[l_pad:l_pad + L, :nwin].set(a[:, 1].T)

    kern = functools.partial(_fold2_kernel, spec, l_pad, nr, nwin, c)
    bs = pl.BlockSpec((2 * l_pad, TILE), lambda: (0, 0),
                      memory_space=pltpu.VMEM)
    qs = pl.BlockSpec((l_pad, TILE), lambda: (0, 0),
                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((2 * l_pad, TILE), jnp.int32)] * 3,
        in_specs=[bs] * 3 + [qs],
        out_specs=[bs] * 3,
        interpret=interpret,
    )(tr(x), tr(y), tr(z), jnp.asarray(qt))
    return tuple(_untr2(o, L, 1, l_pad) for o in out)
