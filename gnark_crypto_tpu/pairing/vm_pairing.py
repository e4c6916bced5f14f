"""Full pairings as straight-line VM programs (single-dispatch execution).

The eager pairing path is dispatch-latency-bound through the device tunnel
(~1500 round trips, measured 106 pairs/s at batch 2048), and a whole-pairing
XLA graph OOM-kills the remote compile helper (PERF.md round 3). Here the
entire Miller loop + final exponentiation is ASSEMBLED into a VM program
(``field/pallas/vm.py``) by running the very same pairing formulas
(``PairingCtx`` for BN/BLS12/BLS24, ``PairingCtx6`` for BW6) over the
symbolic towers (``towers/symbolic.py``) — the digit branches become
straight-line code because the loop counters are compile-time constants,
exactly like the reference's unrolled ``e12_pairing.go`` chains.

Execution: ONE Pallas kernel dispatch per ≤``_TILE[name]`` pairs (Miller +
in-kernel lane-product + final exp), or a short chain of dispatches for
larger batches (per-tile Miller/product, product-only folds while more
than one tile of tile-products remains, then a reduce + final exp
program). The tile width is per-family (``_TILE``) so the register file
fits VMEM for every GT width.

Infinite pairs are neutralized WITHOUT branches: the caller feeds per-lane
Montgomery masks (m, mc) ∈ {0,1}, and the program computes
``facc = m*facc + mc`` before the product tree (matching the reference's
pair filtering, pairing.go:118-126; garbage Miller values on dead lanes are
multiplied away). Pad lanes beyond the batch get m=0, mc=1 automatically.

Reference anchors: Pair/MillerLoop/FinalExponentiation for every family
(``ecc/bn254/pairing.go:26,111,52``, ``ecc/bls24-315/pairing.go``,
``ecc/bw6-761/pairing.go:32,124,62``).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from gnark_crypto_tpu.curve.jacobian import Affine
from gnark_crypto_tpu.field.pallas import vm
from gnark_crypto_tpu.pairing.pairing12 import (G2Proj, PairingCtx,
                                                final_exponentiation, get_ctx)
from gnark_crypto_tpu.towers.symbolic import (SymTower6, SymTower12,
                                              SymTower24)
from gnark_crypto_tpu.towers.tower24 import _scale_ext_by_fp

VM_FAMILIES = ("bn254", "bls12_381", "bls12_377",
               "bls24_315", "bls24_317", "bw6_761", "bw6_633")
_BW6 = ("bw6_761", "bw6_633")

# lanes per VM tile, per family. The register file is auto-sized to the
# program's peak live count (vm.Asm.build), and VMEM holds
# K x (l_pad, tile) int32 — E24 programs (hundreds of live fp coefficients,
# l_pad 24) and BW6 (l_pad 64 at 11-bit limbs) must shrink the tile to fit
# the ~16 MB VMEM budget; bn254/bls12 (l_pad 24-32, K~128) run full-width.
_TILE = {
    "bn254": 256, "bls12_381": 256, "bls12_377": 256,
    "bls24_315": 128, "bls24_317": 128,
    "bw6_761": 128, "bw6_633": 128,
}
# tile must be a multiple of 128: Mosaic's tpu.dynamic_rotate (the lane
# product's pltpu.roll) rejects unaligned lane shapes (measured: tile=64
# fails with "unsupported unaligned shape vector<72x64xi32>").


def _gt_coeffs(name: str) -> int:
    return 6 if name in _BW6 else (24 if "bls24" in name else 12)


def _q_coords(name: str) -> int:
    """fp coefficients per G2 coordinate (1 for BW6, 2 E2, 4 E4)."""
    return 1 if name in _BW6 else (4 if "bls24" in name else 2)


def _coord_shape(name: str):
    return {1: (), 2: (2,), 4: (2, 2)}[_q_coords(name)]


def _flat_ids(x) -> list[int]:
    return [int(v) for v in np.asarray(x).ravel()]


def _sym_tower(name: str, asm: vm.Asm):
    if name in _BW6:
        return SymTower6(name, asm)
    if "bls24" in name:
        return SymTower24(name, asm)
    return SymTower12(name, asm)


def _coord_input(asm, prefix: str, name: str):
    d = _q_coords(name)
    ids = [asm.input(f"{prefix}{i}") for i in range(d)]
    arr = np.asarray(ids, np.int32).reshape(_coord_shape(name))
    return arr if d > 1 else arr[()]


def _mask_gt(tw, gt_eng, facc, m, mc):
    """facc = m * facc (+ mc at the real unit slot): dead-lane neutralizer."""
    f = tw.fp
    facc = _scale_ext_by_fp(tw, facc, m)
    idx = (0,) * facc.ndim
    facc = np.array(facc)
    facc[idx] = f.add(facc[idx], mc)
    return facc


def _sym_miller12(asm: vm.Asm, ctx: PairingCtx):
    """BN/BLS12/BLS24 Miller loop over the symbolic tower; returns the
    masked facc coefficient-id array."""
    tw = ctx.tower
    f, ce = tw.fp, tw.e2            # ce: G2 coordinate engine (E2 or E4)
    name = ctx.name

    px, py = f.input("px"), f.input("py")
    qx = _coord_input(asm, "qx", name)
    qy = _coord_input(asm, "qy", name)
    m, mc = f.input("m"), f.input("mc")

    q = G2Proj(qx, qy, ce.ones(()))
    qny = ce.neg(qy)
    facc = tw.e12.ones(())

    def line_mul(facc, line):
        # sparse MulBy034/MulBy014 via ctx (13 coord-muls/line vs 18),
        # at the E2 level for Tower12 and the E4 level for Tower24
        # (e24_pairing.go:35 MulBy034)
        return ctx.line_prod(facc, line, px, py)

    for d in ctx.loop[-2::-1]:
        facc = tw.e12.square(facc)
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

    return _mask_gt(tw, tw.e12, facc, m, mc)


def _sym_miller6(asm: vm.Asm, ctx6):
    """BW6 joint two-row Miller loop over the symbolic Tower6
    (pairing6.miller_loop without the data-dependent infinity select)."""
    from gnark_crypto_tpu.pairing.pairing6 import G2ProjFp

    tw = ctx6.tower
    f, e6 = tw.fp, tw.e6
    px, py = f.input("px"), f.input("py")
    qx, qy = f.input("qx0"), f.input("qy0")
    m, mc = f.input("m"), f.input("mc")

    w = f.from_int(ctx6.third_root)
    q0 = (qx, qy)
    q0n = (qx, f.neg(qy))
    q1 = (f.mul(qx, w), f.neg(qy))
    q1n = (q1[0], qy)
    adds = {3: q1, 1: q0, -1: q0n, -3: q1n}

    start = q1 if ctx6.par["start_q1"] else q0
    qp = G2ProjFp(start[0], start[1], f.ones(()))
    facc = e6.ones(())

    def line_val(line):
        r0, r1, r2 = line
        zero = f.zeros(())
        return tw.from_coeffs6([r0, f.mul(r1, px), zero,
                                zero, f.mul(r2, py), zero])

    for i in range(ctx6.nbits - 1, 0, -1):
        facc = e6.square(facc)
        qp, line = ctx6.double_step(qp)
        facc = e6.mul(facc, line_val(line))
        j = ctx6._dig(i)
        if j:
            ax, ay = adds[j]
            qp, line = ctx6.add_mixed_step(qp, ax, ay)
            facc = e6.mul(facc, line_val(line))
    facc = e6.square(facc)
    qp, line = ctx6.double_step(qp)
    facc = e6.mul(facc, line_val(line))
    lp = {"q1n": q1n, "q0": q0}[ctx6.par["i0"][0]]
    facc = e6.mul(facc, line_val(ctx6.line_compute(qp, lp[0], lp[1])))
    if ctx6.par["conj_end"]:
        facc = tw.conjugate(facc)

    return _mask_gt(tw, e6, facc, m, mc)


def _sym_lane_product(tw, gt_eng, facc):
    """All-lanes product: log2(tile) rotate-multiply rounds; afterwards
    every lane holds prod over the tile (the assembler's tile width)."""
    k = tw.fp.asm.tile // 2
    while k:
        facc = gt_eng.mul(facc, tw.rot(facc, k))
        k //= 2
    return facc


@functools.lru_cache(maxsize=None)
def build_program(name: str, variant: str) -> vm.Program:
    """variant: 'full' (miller+product+finalexp), 'miller' (per-tile
    miller+product), 'product' (lane product only, GT in -> GT out),
    'reduce' (lane product + finalexp over GT inputs)."""
    assert name in VM_FAMILIES, name
    nc = _gt_coeffs(name)
    tile = _TILE[name]

    if name in _BW6:
        from gnark_crypto_tpu.pairing.pairing6 import (PairingCtx6,
                                                       final_exponentiation
                                                       as finexp6)
        from gnark_crypto_tpu.towers.tower6 import TOWER6_PARAMS

        spec = TOWER6_PARAMS[name][0]
        asm = vm.Asm(spec, tile=tile)
        tw = SymTower6(name, asm)
        ctx = PairingCtx6(name, tower=tw)
        gt_eng, fin = tw.e6, lambda z: finexp6(ctx, z)
        miller = lambda: _sym_miller6(asm, ctx)  # noqa: E731
    else:
        from gnark_crypto_tpu.towers.tower12 import TOWER12_PARAMS
        from gnark_crypto_tpu.towers.tower24 import TOWER24_PARAMS

        params = TOWER24_PARAMS if "bls24" in name else TOWER12_PARAMS
        spec = params[name][0]
        asm = vm.Asm(spec, tile=tile)
        tw = _sym_tower(name, asm)
        ctx = PairingCtx(name, tower=tw)
        gt_eng, fin = tw.e12, lambda z: final_exponentiation(ctx, z)
        miller = lambda: _sym_miller12(asm, ctx)  # noqa: E731

    if variant in ("reduce", "product"):
        f = tw.fp
        facc = np.asarray([f.input(f"f{i}") for i in range(nc)],
                          np.int32).reshape(gt_eng.ones(()).shape)
        facc = _sym_lane_product(tw, gt_eng, facc)
        if variant == "product":
            return asm.build(
                {f"g{i}": v for i, v in enumerate(_flat_ids(facc))})
        gt = fin(facc)
        return asm.build({f"g{i}": v for i, v in enumerate(_flat_ids(gt))})

    facc = miller()
    facc = _sym_lane_product(tw, gt_eng, facc)
    if variant == "miller":
        return asm.build(
            {f"g{i}": v for i, v in enumerate(_flat_ids(facc))})
    assert variant == "full"
    gt = fin(facc)
    return asm.build({f"g{i}": v for i, v in enumerate(_flat_ids(gt))})


def _pad_rows(x, n_pad: int, fill):
    """(n, L) -> (n_pad, L) with constant fill rows."""
    n, L = x.shape
    if n == n_pad:
        return x
    return jnp.concatenate(
        [x, jnp.broadcast_to(fill, (n_pad - n, L))], axis=0)


def _gt_shape(name: str):
    return {6: (2, 3), 12: (2, 3, 2), 24: (2, 3, 2, 2)}[_gt_coeffs(name)]


_VM_DISABLED: set = set()


def vm_tier(name: str) -> str:
    """Which tier ``pair()`` would use right now: 'vm' or 'eager'
    (bench reporting — a 100-450x eager fallback must never masquerade
    as the VM kernel's number)."""
    return "eager" if name in _VM_DISABLED else "vm"


def reset_vm(name: str | None = None):
    """Re-enable the VM tier after a transient backend failure (the remote
    compile helper accumulates state over long processes; a fresh attempt
    usually succeeds — NEXT.md round-4 probe notes)."""
    if name is None:
        _VM_DISABLED.clear()
    else:
        _VM_DISABLED.discard(name)


def try_pair_vm(name: str, P: Affine, QX, QY):
    """``pair_vm`` with retry + per-process fallback: the remote compile
    helper fails TRANSIENTLY on long processes (observed: bls12-381 full
    program compiles fine standalone but died once mid-bench), so the
    first failure is retried once in-place; only a second consecutive
    failure marks the family and returns ``None`` so callers fall back to
    the eager step-kernel ladder (later calls skip the retry — each
    failed compile costs minutes)."""
    if name in _VM_DISABLED:
        return None
    for attempt in (0, 1):
        try:
            return pair_vm(name, P, QX, QY)
        except Exception as e:  # Mosaic / remote-compile failure class
            import warnings

            if attempt == 0:
                warnings.warn(
                    f"VM pairing compile failed for {name} "
                    f"({type(e).__name__}); retrying once")
                continue
            _VM_DISABLED.add(name)
            warnings.warn(
                f"VM pairing unavailable for {name} on this backend "
                f"({type(e).__name__}); falling back to step kernels")
    return None


def pair_vm(name: str, P: Affine, QX, QY, interpret: bool = False):
    """Reduced pairing prod_i e(P_i, Q_i) via VM programs (1-2 dispatches
    for batches ≤ TILE^2, logarithmically more beyond).

    Same result as ``pairing/api.pair`` (reference Pair, pairing.go:26).
    """
    if name in _BW6:
        from gnark_crypto_tpu.pairing.pairing6 import get_ctx6

        ctx = get_ctx6(name)
        tw = ctx.tower
        ce = tw.fp
    else:
        ctx = get_ctx(name)
        tw = ctx.tower
        ce = tw.e2
    f = tw.fp
    spec = tw.fp_spec
    L = spec.n_limbs
    nc = _gt_coeffs(name)
    d = _q_coords(name)
    n = f.eshape(P.x)[0]
    tile = _TILE[name]
    n_pad = -(-n // tile) * tile

    inf = (f.is_zero(P.x) & f.is_zero(P.y)) | \
        (ce.is_zero(QX) & ce.is_zero(QY))
    ones = f.broadcast_to(f.ones(), (n,))
    zero = f.zeros((n,))
    m = f.where(inf, zero, ones)
    mc = f.where(inf, ones, zero)

    one_row = jnp.asarray(f.ones())  # Montgomery-form 1, (L,) limbs
    zero_row = jnp.zeros((L,), jnp.int32)
    qx_flat = jnp.reshape(QX, (n, d, L))
    qy_flat = jnp.reshape(QY, (n, d, L))
    inputs = {
        "px": _pad_rows(P.x, n_pad, zero_row),
        "py": _pad_rows(P.y, n_pad, zero_row),
        "m": _pad_rows(m, n_pad, zero_row),
        "mc": _pad_rows(mc, n_pad, one_row),
    }
    for i in range(d):
        inputs[f"qx{i}"] = _pad_rows(qx_flat[:, i], n_pad, zero_row)
        inputs[f"qy{i}"] = _pad_rows(qy_flat[:, i], n_pad, zero_row)

    def gt_from(out, row):
        coeffs = [out[f"g{i}"][row] for i in range(nc)]
        return jnp.stack(coeffs, 0).reshape(*_gt_shape(name), L)

    if n_pad == tile:
        prog = build_program(name, "full")
        out = vm.execute(prog, inputs, n_pad, interpret=interpret)
        return gt_from(out, 0)

    # multi-tile: per-tile miller products, then cross-tile reduce+finalexp.
    # For T > TILE tile-products (batches > TILE^2), fold with product-only
    # rounds until one reduce tile remains.
    prog1 = build_program(name, "miller")
    out1 = vm.execute(prog1, inputs, n_pad, interpret=interpret)
    T = n_pad // tile
    rows = jnp.arange(T) * tile
    vals = [out1[f"g{i}"][rows] for i in range(nc)]

    def tile_inputs(vals, t_pad):
        return {f"f{i}": _pad_rows(v, t_pad, one_row if i == 0 else zero_row)
                for i, v in enumerate(vals)}

    while T > tile:
        t_pad = -(-T // tile) * tile
        prog_p = build_program(name, "product")
        out_p = vm.execute(prog_p, tile_inputs(vals, t_pad), t_pad,
                           interpret=interpret)
        T = t_pad // tile
        rows = jnp.arange(T) * tile
        vals = [out_p[f"g{i}"][rows] for i in range(nc)]

    prog2 = build_program(name, "reduce")
    out2 = vm.execute(prog2, tile_inputs(vals, tile), tile,
                      interpret=interpret)
    return gt_from(out2, 0)
