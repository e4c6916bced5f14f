"""Full pairings as straight-line VM programs (single-dispatch execution).

The eager pairing path is dispatch-latency-bound through the device tunnel
(~1500 round trips, measured 106 pairs/s at batch 2048), and a whole-pairing
XLA graph OOM-kills the remote compile helper (PERF.md round 3). Here the
entire Miller loop + final exponentiation is ASSEMBLED into a VM program
(``field/pallas/vm.py``) by running the very same ``PairingCtx`` formulas
over the symbolic tower (``towers/symbolic.py``) — the NAF digit branches
become straight-line code because the loop counter is a compile-time
constant, exactly like the reference's unrolled ``e12_pairing.go`` chains.

Execution: ONE Pallas kernel dispatch per ≤``vm.TILE`` pairs (Miller +
in-kernel lane-product + final exp), or two dispatches for larger batches
(per-tile Miller/product, then a cross-tile reduce + final exp program).

Infinite pairs are neutralized WITHOUT branches: the caller feeds per-lane
Montgomery masks (m, mc) ∈ {0,1}, and the program computes
``facc = m*facc + mc`` before the product tree (matching the reference's
pair filtering, pairing.go:118-126; garbage Miller values on dead lanes are
multiplied away). Pad lanes beyond the batch get m=0, mc=1 automatically.

Reference anchors: Pair/MillerLoop/FinalExponentiation
(ecc/bn254/pairing.go:26,111,52).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from gnark_crypto_tpu.curve.jacobian import Affine
from gnark_crypto_tpu.field.pallas import vm
from gnark_crypto_tpu.pairing.pairing12 import (G2Proj, PairingCtx,
                                                final_exponentiation, get_ctx)
from gnark_crypto_tpu.towers.symbolic import SymTower12
from gnark_crypto_tpu.towers.tower24 import _scale_ext_by_fp

VM_FAMILIES = ("bn254", "bls12_381", "bls12_377")


def _flat_ids(x) -> list[int]:
    return [int(v) for v in np.asarray(x).ravel()]


def _sym_miller(asm: vm.Asm, ctx: PairingCtx):
    """Emit the per-lane Miller loop; returns the masked facc ids array."""
    tw = ctx.tower
    f, e2, e12 = tw.fp, tw.e2, tw.e12

    px, py = f.input("px"), f.input("py")
    qx = e2.build([f.input("qx0"), f.input("qx1")])
    qy = e2.build([f.input("qy0"), f.input("qy1")])
    m, mc = f.input("m"), f.input("mc")

    q = G2Proj(qx, qy, e2.ones(()))
    qny = e2.neg(qy)
    facc = e12.ones(())

    def line_mul(facc, line):
        # sparse MulBy034/MulBy014 (13 E2 muls/line vs 18)
        return ctx.line_prod(facc, line, px, py)

    for d in ctx.loop[-2::-1]:
        facc = e12.square(facc)
        q, line = ctx.double_step(q)
        facc = line_mul(facc, line)
        if d != 0:
            q, line = ctx.add_mixed_step(q, qx, qny if d == -1 else qy)
            facc = line_mul(facc, line)

    if ctx.family == "bn":
        # terminal lines with Q1 = pi(Q), Q2 = -pi^2(Q) (pairing.go:256-286)
        q1x, q1y = ctx.psi_coords(qx, qy)
        q2x, q2y = ctx.psi2_coords(qx, qy)
        q, line = ctx.add_mixed_step(q, q1x, q1y)
        facc = line_mul(facc, line)
        facc = line_mul(facc, ctx.line_compute(q, q2x, q2y))
    elif ctx.seed_neg:
        facc = tw.conjugate(facc)

    # neutralize dead lanes: facc = m * facc (+ mc at the C0B0 real slot)
    facc = _scale_ext_by_fp(tw, facc, m)
    facc[(0,) * (facc.ndim - 1) + (0,)] = f.add(
        facc[(0,) * (facc.ndim - 1) + (0,)], mc)
    return facc


def _sym_lane_product(tw, facc):
    """All-lanes product: log2(TILE) rotate-multiply rounds; afterwards
    every lane holds prod over the tile."""
    k = vm.TILE // 2
    while k:
        facc = tw.e12.mul(facc, tw.rot(facc, k))
        k //= 2
    return facc


@functools.lru_cache(maxsize=None)
def build_program(name: str, variant: str) -> vm.Program:
    """variant: 'full' (miller+product+finalexp), 'miller' (per-tile
    miller+product), 'product' (lane product only, 12 in -> 12 out),
    'reduce' (lane product + finalexp over GT inputs)."""
    assert name in VM_FAMILIES, name
    from gnark_crypto_tpu.towers.tower12 import TOWER12_PARAMS
    spec = TOWER12_PARAMS[name][0]
    asm = vm.Asm(spec)
    tw = SymTower12(name, asm)
    if variant in ("reduce", "product"):
        f = tw.fp
        facc = np.asarray([f.input(f"f{i}")
                           for i in range(12)], np.int32).reshape(2, 3, 2)
        ctx = PairingCtx(name, tower=tw)
        facc = _sym_lane_product(tw, facc)
        if variant == "product":
            return asm.build(
                {f"g{i}": v for i, v in enumerate(_flat_ids(facc))})
        gt = final_exponentiation(ctx, facc)
        return asm.build({f"g{i}": v for i, v in enumerate(_flat_ids(gt))})
    ctx = PairingCtx(name, tower=tw)
    facc = _sym_miller(asm, ctx)
    facc = _sym_lane_product(tw, facc)
    if variant == "miller":
        outs = {f"g{i}": v for i, v in enumerate(_flat_ids(facc))}
        return asm.build(outs)
    assert variant == "full"
    gt = final_exponentiation(ctx, facc)
    return asm.build({f"g{i}": v for i, v in enumerate(_flat_ids(gt))})


def _pad_rows(x, n_pad: int, fill):
    """(n, L) -> (n_pad, L) with constant fill rows."""
    n, L = x.shape
    if n == n_pad:
        return x
    return jnp.concatenate(
        [x, jnp.broadcast_to(fill, (n_pad - n, L))], axis=0)


def pair_vm(name: str, P: Affine, QX, QY, interpret: bool = False):
    """Reduced pairing prod_i e(P_i, Q_i) via VM programs (1-2 dispatches).

    Same result as ``pairing12.pair`` (reference Pair, pairing.go:26).
    """
    ctx = get_ctx(name)
    tw = ctx.tower
    f, e2 = tw.fp, tw.e2
    spec = tw.fp_spec
    L = spec.n_limbs
    n = f.eshape(P.x)[0]
    n_pad = -(-n // vm.TILE) * vm.TILE

    inf = (f.is_zero(P.x) & f.is_zero(P.y)) | \
        (e2.is_zero(QX) & e2.is_zero(QY))
    ones = f.broadcast_to(f.ones(), (n,))
    zero = f.zeros((n,))
    m = f.where(inf, zero, ones)
    mc = f.where(inf, ones, zero)

    one_row = jnp.asarray(f.ones())  # Montgomery-form 1, (L,) limbs
    zero_row = jnp.zeros((L,), jnp.int32)
    inputs = {
        "px": _pad_rows(P.x, n_pad, zero_row),
        "py": _pad_rows(P.y, n_pad, zero_row),
        "qx0": _pad_rows(e2.coeff(QX, 0), n_pad, zero_row),
        "qx1": _pad_rows(e2.coeff(QX, 1), n_pad, zero_row),
        "qy0": _pad_rows(e2.coeff(QY, 0), n_pad, zero_row),
        "qy1": _pad_rows(e2.coeff(QY, 1), n_pad, zero_row),
        "m": _pad_rows(m, n_pad, zero_row),
        "mc": _pad_rows(mc, n_pad, one_row),
    }

    def gt_from(out, row):
        coeffs = [out[f"g{i}"][row] for i in range(12)]
        return jnp.stack(coeffs, 0).reshape(2, 3, 2, L)

    if n_pad == vm.TILE:
        prog = build_program(name, "full")
        out = vm.execute(prog, inputs, n_pad, interpret=interpret)
        return gt_from(out, 0)

    # multi-tile: per-tile miller products, then cross-tile reduce+finalexp.
    # For T > TILE tile-products (batches > TILE^2), fold with product-only
    # rounds until one reduce tile remains.
    prog1 = build_program(name, "miller")
    out1 = vm.execute(prog1, inputs, n_pad, interpret=interpret)
    T = n_pad // vm.TILE
    rows = jnp.arange(T) * vm.TILE
    vals = [out1[f"g{i}"][rows] for i in range(12)]  # (T, L) per-tile prods

    def tile_inputs(vals, t_pad):
        return {f"f{i}": _pad_rows(v, t_pad, one_row if i == 0 else zero_row)
                for i, v in enumerate(vals)}

    while T > vm.TILE:
        t_pad = -(-T // vm.TILE) * vm.TILE
        prog_p = build_program(name, "product")
        out_p = vm.execute(prog_p, tile_inputs(vals, t_pad), t_pad,
                           interpret=interpret)
        T = t_pad // vm.TILE
        rows = jnp.arange(T) * vm.TILE
        vals = [out_p[f"g{i}"][rows] for i in range(12)]

    prog2 = build_program(name, "reduce")
    out2 = vm.execute(prog2, tile_inputs(vals, vm.TILE), vm.TILE,
                      interpret=interpret)
    return gt_from(out2, 0)
