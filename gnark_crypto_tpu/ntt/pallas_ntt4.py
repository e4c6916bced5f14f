"""Four-step Pallas NTT with per-tile-constant twiddles (multi-limb fields).

The radix-2 pipeline (``pallas_ntt.py``) is bounded by the general CIOS
Montgomery multiply: its operand-scan loop is a serial dependency chain, so
the measured cost is ~4.2 ms per 2^20-element pass on one chip even though
the VPU is not saturated. This module removes almost every general multiply
from the transform by the classic four-step factorization (n = S1*S2):

    step 1:  S2 independent NTT_S1 over the hi index    (10 stages @ n=2^20)
    twist:   elementwise multiply by w^(lo*rev(hi))     (1 general mul pass)
    step 3:  S1 independent NTT_S2 over the lo index    (10 stages)

In steps 1/3 every butterfly twiddle depends only on the hi (resp. lo)
index, so with elements laid out ``(L_pad, n)`` (limbs in sublanes) each
128+-lane tile multiplies by ONE constant w. Multiplication by a constant
is a *linear map over the limbs*: out = sum_i x_i * C[:, i] with
C[:, i] = limbs of (w * 2^(b*(i+2)) mod q), followed by two Montgomery REDC
steps (the 2^(2b) pre-factor makes the REDC exact) — an unrolled
multiply-accumulate with no serial chain. Measured: 0.61 ms per pass vs
4.16 ms for CIOS (6.8x), because the accumulate is pure ILP.

Value ranges are lazy throughout (out of the reference's playbook of lazy
reduction, done TPU-style): butterfly outputs stay in [~0, 4.5q) with limbs
kept near-canonical by single vectorized carry sweeps (the sequential
row-ripple carry was ~6x the cost of the add it followed), and an
approximate top-limb fold subtracts k*2q to bound growth. One final pass
canonicalizes bit-exactly to the reference layout.

Output order: with DIF sub-NTTs the four-step lands exactly in the global
bit-reversed DIF order (rev_n(khi + S1*klo) = rev_S1(khi)*S2 + rev_S2(klo)),
so results are bit-identical to ``fft._run_stages`` — no extra permutation.

Supported combinations: (DIF, forward) and (DIT, inverse) — the pair used
by fft/fft_inverse round trips. (DIT, forward) / (DIF, inverse) fall back
to the radix-2 pipeline. The inverse folds the 1/n scale into the untwist
table for free (callers skip the separate scale pass).

Reference counterpart: ``ecc/bn254/fr/fft/fft.go`` (recursive DIF/DIT with
unrolled leaf kernels); the four-step split plays the role of the
reference's fork-join recursion, re-shaped for a 128-lane SIMD memory
system instead of a cache hierarchy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnark_crypto_tpu.field.pallas.mont_mul import _round_up
from gnark_crypto_tpu.specs.field import FieldSpec, int_to_limbs

LANES = 128
FOLD_SHIFT = 20


# ---------------------------------------------------------------------------
# lazy limb primitives (vectorized carries — no sequential row ripple)
# ---------------------------------------------------------------------------

def _carry_vec(spec: FieldSpec, t, passes: int = 1):
    """Vectorized lazy carry sweep(s): after each pass limb i holds
    (t_i & mask) + (t_{i-1} >> b). Signed-safe (arithmetic shift)."""
    b = spec.limb_bits
    mask = spec.mask
    for _ in range(passes):
        c = t >> b
        t = (t & mask) + jnp.concatenate(
            [jnp.zeros_like(c[0:1]), c[:-1]], axis=0)
    return t


def _top_estimate(spec: FieldSpec, t, lp: int):
    """Value's top-limb count u (units of 2^(b*(L-1))) from the rows at and
    above limb L-1 (the overflow rows, lp - L of them)."""
    b = spec.limb_bits
    top = spec.n_limbs - 1
    u = t[top:top + 1]
    for r in range(top + 1, min(lp, top + 3)):
        u = u + (t[r:r + 1] << (b * (r - top)))
    return u


def _fold_tile(spec: FieldSpec, lp: int, t, q2_col, fm: int):
    """Subtract k*2q with k ~ floor(value / 2q) estimated from the top
    limb rows (underestimate -> result stays >= 0). Keeps butterfly-add
    chains bounded (~4.5q) without a compare/borrow chain."""
    u = _top_estimate(spec, t, lp)
    k = (u * fm) >> FOLD_SHIFT
    return _carry_vec(spec, t - k * q2_col, 1)


def _add_fold(spec, lp, x, y, q2_col, fm):
    return _fold_tile(spec, lp, _carry_vec(spec, x + y, 1), q2_col, fm)


def _sub_lazy(spec, lp, x, y, off_col):
    """x - y + OFF (OFF = 6q) with one carry sweep; value <= B+6q, feeds a
    multiply (which resets the value range)."""
    return _carry_vec(spec, x - y + off_col, 1)


def _mulconst_tile(spec: FieldSpec, lp: int, x, c_ref, q_col):
    """x * w for a per-tile constant w, as a limb-linear map.

    c_ref: (lp, L) with column i = limbs of (w * 2^(b*(i+2)) mod q).
    out = (sum_i x_i * C[:, i]) / 2^(2b)  via two exact REDC steps.
    Output value in (-eps, ~1.05q); limbs <= 2^b after 3 carry sweeps.
    """
    L = spec.n_limbs
    b = spec.limb_bits
    mask = spec.mask
    qinv = spec.qinv_neg
    t = x[0:1, :] * c_ref[:, 0:1]
    for i in range(1, L):
        t = t + x[i:i + 1, :] * c_ref[:, i:i + 1]
    zero_row = jnp.zeros((1, x.shape[1]), jnp.int32)
    for _ in range(2):
        m = (t[0:1, :] * qinv) & mask
        t = t + m * q_col
        carry = t[0:1, :] >> b
        t = jnp.concatenate([t[1:2] + carry, t[2:], zero_row], axis=0)
    return _carry_vec(spec, t, 3)


# ---------------------------------------------------------------------------
# stage kernels
# ---------------------------------------------------------------------------

def _stage4_dif_body(spec, lp, hb, x_lo_ref, x_hi_ref, c_ref, cn_ref, o_ref):
    q_col = cn_ref[:, 0:1]
    q2_col = cn_ref[:, 1:2]
    off_col = cn_ref[:, 2:3]
    fm = spec._fold_mul  # attached by _consts_tile
    is_lo = (pl.program_id(0) % (2 * hb)) < hb

    @pl.when(is_lo)
    def _():
        o_ref[:] = _add_fold(spec, lp, x_lo_ref[:], x_hi_ref[:], q2_col, fm)

    @pl.when(jnp.logical_not(is_lo))
    def _():
        d = _sub_lazy(spec, lp, x_lo_ref[:], x_hi_ref[:], off_col)
        o_ref[:] = _mulconst_tile(spec, lp, d, c_ref[:], q_col)


def _stage4_dit_body(spec, lp, hb, x_lo_ref, x_hi_ref, c_ref, cn_ref, o_ref):
    q_col = cn_ref[:, 0:1]
    q2_col = cn_ref[:, 1:2]
    off_col = cn_ref[:, 2:3]
    fm = spec._fold_mul
    t = _mulconst_tile(spec, lp, x_hi_ref[:], c_ref[:], q_col)
    is_lo = (pl.program_id(0) % (2 * hb)) < hb

    @pl.when(is_lo)
    def _():
        o_ref[:] = _add_fold(spec, lp, x_lo_ref[:], t, q2_col, fm)

    @pl.when(jnp.logical_not(is_lo))
    def _():
        o_ref[:] = _fold_tile(
            spec, lp, _sub_lazy(spec, lp, x_lo_ref[:], t, off_col),
            q2_col, fm)


def _stage4(spec, lp, x, c_tab, c_off, half, tile, dit, consts, interpret,
            in_perm=None):
    """One sub-NTT butterfly stage over 'blocks' of width `tile` lanes.

    Block index t = sub-NTT position; pair stride = half blocks; the
    twiddle-constant block for pair j = t % half lives at c_tab column
    block (c_off + j). ``in_perm``: logical->physical block map of the
    input array (radix-4 stages leave their output block-permuted)."""
    n = x.shape[1]
    hb = half
    perm = in_perm or (lambda l: l)

    def lo_map(t):
        r2 = t % (2 * hb)
        return (0, perm(t - jnp.where(r2 >= hb, hb, 0)))

    def hi_map(t):
        r2 = t % (2 * hb)
        return (0, perm(t + jnp.where(r2 >= hb, 0, hb)))

    def c_map(t):
        return (0, c_off + t % half)

    body = _stage4_dit_body if dit else _stage4_dif_body
    kern = functools.partial(body, spec, lp, hb)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((lp, n), jnp.int32),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((lp, tile), lo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((lp, tile), hi_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((lp, LANES), c_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((lp, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lp, tile), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, c_tab, consts)


def _twist_body(spec, lp, x_ref, t_ref, cn_ref, o_ref):
    q_col = cn_ref[:, 0:1]
    o_ref[:] = _mm_tile_lazy(spec, lp, x_ref[:], t_ref[:], q_col)


def _mm_tile_lazy(spec: FieldSpec, l_pad: int, x, y, q_col):
    """General CIOS Montgomery product, lazy epilogue (no cond-sub; output
    < ~1.01q for lazy inputs <= 4.5q). Same inner loop as
    ``mont_mul._mm_tile``."""
    b = spec.limb_bits
    L = spec.n_limbs
    mask = spec.mask
    qinv = spec.qinv_neg
    zero_row = jnp.zeros((1, x.shape[1]), jnp.int32)
    unroll = 2 if L % 2 == 0 else 1

    def body(i, carry_in):
        t, xr = carry_in
        for u in range(unroll):
            xi = xr[u:u + 1, :]
            t = t + xi * y
            m = (t[0:1, :] * qinv) & mask
            t = t + m * q_col
            carry = t[0:1, :] >> b
            t = jnp.concatenate([t[1:], zero_row], axis=0)
            t = jnp.concatenate([t[0:1] + carry, t[1:]], axis=0)
        xr = jnp.concatenate([xr[unroll:], xr[:unroll]], axis=0)
        return t, xr

    t, _ = jax.lax.fori_loop(0, L // unroll, body, (jnp.zeros_like(x), x))
    return _carry_vec(spec, t, 3)


def _twist(spec, lp, x, twist_t, tile, consts, interpret, in_perm=None):
    n = x.shape[1]
    perm = in_perm or (lambda l: l)
    kern = functools.partial(_twist_body, spec, lp)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((lp, n), jnp.int32),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((lp, tile), lambda t: (0, perm(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lp, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lp, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lp, tile), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, twist_t, consts)


def _carry_exact(spec, lp, t):
    """Exact sequential carry ripple; returns (normalized, carry_out)."""
    b = spec.limb_bits
    mask = spec.mask
    c = jnp.zeros_like(t[0, :])
    norm = []
    for i in range(lp):
        v = t[i, :] + c
        norm.append(v & mask)
        c = v >> b
    return jnp.stack(norm, axis=0), c


def _canon_body(spec, lp, x_ref, cn_ref, o_ref):
    """Exact reduction to canonical limbs < q (bit-exact output)."""
    q_col = cn_ref[:, 0:1]
    q2_col = cn_ref[:, 1:2]
    fmq = spec._fold_mul_q
    t = x_ref[:] + q2_col  # lift possible tiny-negative values
    t, _ = _carry_exact(spec, lp, t)
    # approximate fold by q (underestimate), then exact cond-subs
    u = _top_estimate(spec, t, lp)
    k = (u * fmq) >> FOLD_SHIFT
    t = t - k * q_col
    t, _ = _carry_exact(spec, lp, t)
    for _ in range(3):
        dn, c = _carry_exact(spec, lp, t - q_col)
        t = jnp.where((c < 0)[None, :], t, dn)
    o_ref[:] = t


def _canonicalize(spec, lp, x, tile, consts, interpret, in_perm=None):
    n = x.shape[1]
    perm = in_perm or (lambda l: l)
    kern = functools.partial(_canon_body, spec, lp)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((lp, n), jnp.int32),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((lp, tile), lambda t: (0, perm(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lp, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lp, tile), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, consts)


# ---------------------------------------------------------------------------
# radix-4 fused stage pairs (half the HBM passes)
# ---------------------------------------------------------------------------
# Each sub-NTT stage above is one full read+write of the (lp, n) array and
# runs at the HBM roofline (~0.6 ms/pass @ 2^20), so fusing two radix-2
# stages into one radix-4 kernel halves the dominant cost. A kernel program
# handles one group of 4 blocks {g, g+Q, g+2Q, g+3Q} (Q = S >> (s+2)) and
# writes all 4 outputs, so every block is read and written exactly once per
# fused pair. Per-group twiddles [w, w*i, w^2, w^3, w^3*i] (w = root^(j<<s),
# i = root^(Q<<s), the order-4 element) come from a dedicated table.
#
# DIF composition of stages (s, s+1):
#   outA = a + b + c + d
#   outB = ((a+c) - (b+d)) * w^2
#   outC = (a-c) * w   + (b-d) * (w*i)
#   outD = (a-c) * w^3 - (b-d) * (w^3*i)
# DIT (inverse order) composition of stages (s+1, s):
#   t = B*w^2; u = (C + D*w^2)*w; v = (C - D*w^2)*(w*i)
#   outA = A + t + u;  outB = A - t + v
#   outC = A + t - u;  outD = A - t - v


def _r4_dif_body(spec, lp, tile, a_ref, b_ref, c_ref, d_ref,
                 cw, cwi, cw2, cw3, cw3i, cn_ref, o_ref):
    q_col = cn_ref[:, 0:1]
    q2_col = cn_ref[:, 1:2]
    off_col = cn_ref[:, 2:3]
    fm = spec._fold_mul
    a, b = a_ref[:], b_ref[:]
    c, d = c_ref[:], d_ref[:]

    ac = _add_fold(spec, lp, a, c, q2_col, fm)
    bd = _add_fold(spec, lp, b, d, q2_col, fm)
    o_ref[:, 0:tile] = _add_fold(spec, lp, ac, bd, q2_col, fm)
    o_ref[:, tile:2 * tile] = _mulconst_tile(
        spec, lp, _carry_vec(spec, ac - bd + off_col, 1), cw2[:], q_col)
    amc = _carry_vec(spec, a - c + off_col, 1)
    bmd = _carry_vec(spec, b - d + off_col, 1)
    mc1 = _mulconst_tile(spec, lp, amc, cw[:], q_col)
    mc2 = _mulconst_tile(spec, lp, bmd, cwi[:], q_col)
    o_ref[:, 2 * tile:3 * tile] = _add_fold(spec, lp, mc1, mc2, q2_col, fm)
    md1 = _mulconst_tile(spec, lp, amc, cw3[:], q_col)
    md2 = _mulconst_tile(spec, lp, bmd, cw3i[:], q_col)
    o_ref[:, 3 * tile:4 * tile] = _fold_tile(
        spec, lp, _carry_vec(spec, md1 - md2 + off_col, 1), q2_col, fm)


def _r4_dit_body(spec, lp, tile, a_ref, b_ref, c_ref, d_ref,
                 cw, cwi, cw2, cw3, cw3i, cn_ref, o_ref):
    q_col = cn_ref[:, 0:1]
    q2_col = cn_ref[:, 1:2]
    off_col = cn_ref[:, 2:3]
    fm = spec._fold_mul
    A, B = a_ref[:], b_ref[:]
    C, D = c_ref[:], d_ref[:]

    t = _mulconst_tile(spec, lp, B, cw2[:], q_col)
    td = _mulconst_tile(spec, lp, D, cw2[:], q_col)
    c1 = _add_fold(spec, lp, C, td, q2_col, fm)
    d1 = _fold_tile(spec, lp, _carry_vec(spec, C - td + off_col, 1),
                    q2_col, fm)
    u = _mulconst_tile(spec, lp, c1, cw[:], q_col)
    v = _mulconst_tile(spec, lp, d1, cwi[:], q_col)
    apt = _add_fold(spec, lp, A, t, q2_col, fm)
    amt = _fold_tile(spec, lp, _carry_vec(spec, A - t + off_col, 1),
                     q2_col, fm)
    o_ref[:, 0:tile] = _add_fold(spec, lp, apt, u, q2_col, fm)
    o_ref[:, tile:2 * tile] = _add_fold(spec, lp, amt, v, q2_col, fm)
    o_ref[:, 2 * tile:3 * tile] = _fold_tile(
        spec, lp, _carry_vec(spec, apt - u + off_col, 1), q2_col, fm)
    o_ref[:, 3 * tile:4 * tile] = _fold_tile(
        spec, lp, _carry_vec(spec, amt - v + off_col, 1), q2_col, fm)


def _r4_perm(quarter: int):
    """Physical block index of logical block l after a fused stage with
    group quarter Q (in blocks): programs write their 4 outputs
    contiguously, so phys = 4*t4 + role."""
    def phys(l):
        t4 = (l // (4 * quarter)) * quarter + (l % quarter)
        return 4 * t4 + (l // quarter) % 4
    return phys


def _stage4_r4(spec, lp, x, c4_tab, c4_off, quarter, tile, dit, consts,
               interpret, in_perm):
    """One fused radix-4 stage pair over blocks of ``tile`` lanes.

    ``quarter`` = Q in block units; ``in_perm`` maps logical block index ->
    physical block index of the INPUT array (identity if None). Output is
    block-permuted by `_r4_perm(quarter)` — one full read + one full write
    of the array per two radix-2 stages; downstream passes undo the
    permutation for free in their input index maps."""
    n = x.shape[1]
    nb = n // tile
    perm = in_perm or (lambda l: l)

    def in_map(role):
        def m(t4):
            g = (t4 // quarter) * (4 * quarter) + (t4 % quarter)
            return (0, perm(g + role * quarter))
        return m

    def c_map(cidx):
        def m(t4):
            return (0, c4_off + (t4 % quarter) * 5 + cidx)
        return m

    body = _r4_dit_body if dit else _r4_dif_body
    kern = functools.partial(body, spec, lp, tile)
    bs = lambda m: pl.BlockSpec((lp, tile), m, memory_space=pltpu.VMEM)
    cbs = lambda m: pl.BlockSpec((lp, LANES), m, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((lp, n), jnp.int32),
        grid=(nb // 4,),
        in_specs=[bs(in_map(r)) for r in range(4)]
        + [cbs(c_map(i)) for i in range(5)]
        + [cbs(lambda t4: (0, 0))],
        out_specs=pl.BlockSpec((lp, 4 * tile), lambda t4: (0, t4),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, x, x, c4_tab, c4_tab, c4_tab, c4_tab, c4_tab, consts)
    return out, _r4_perm(quarter)


# ---------------------------------------------------------------------------
# table precomputation (host ints -> device arrays, cached per domain)
# ---------------------------------------------------------------------------

def _attach_fold_consts(spec: FieldSpec):
    if not hasattr(spec, "_fold_mul"):
        b, L, q = spec.limb_bits, spec.n_limbs, spec.modulus
        object.__setattr__(spec, "_fold_mul",
                           (1 << (FOLD_SHIFT + b * (L - 1))) // (2 * q))
        object.__setattr__(spec, "_fold_mul_q",
                           (1 << (FOLD_SHIFT + b * (L - 1))) // q)


def _bitrev(x: int, bits: int) -> int:
    return int(f"{x:0{bits}b}"[::-1], 2) if bits else 0


def _c_blocks(spec: FieldSpec, root: int, kk: int, lp: int) -> jax.Array:
    """Stacked twiddle-constant blocks for a DIF/DIT sub-NTT of size 2^kk.

    Block for (stage s, pair j) at column-block offset (2^kk - 2^(kk-s)) + j;
    each block is LANES wide (TPU lane tiling), columns 0..L-1 hold the
    limbs of (root^(j<<s) * 2^(b*(i+2)) mod q).
    """
    q = spec.modulus
    b = spec.limb_bits
    L = spec.n_limbs
    S = 1 << kk
    cols = np.zeros((lp, (S - 1) * LANES), np.int32)
    shift2 = pow(2, 2 * b, q)
    for s in range(kk):
        half = S >> (s + 1)
        off = S - (S >> s)
        for j in range(half):
            w = pow(root, j << s, q) * shift2 % q
            base = (off + j) * LANES
            acc = w
            for i in range(L):
                cols[:L, base + i] = int_to_limbs(acc, b, L)
                acc = acc * (1 << b) % q
    return jnp.asarray(cols)


def _c4_offs(kk: int) -> dict:
    """Static block offsets of the radix-4 constant table for size 2^kk
    (derived from kk alone so the jitted core can rebuild them)."""
    offs, total = {}, 0
    for s in range(0, kk - 1, 2):
        offs[s] = total
        total += 5 * ((1 << kk) >> (s + 2))
    return offs


def _c4_blocks(spec: FieldSpec, root: int, kk: int, lp: int):
    """Radix-4 twiddle-constant blocks for fused stage pairs (s, s+1).

    For pair s (s even, s+1 < kk), Q = 2^kk >> (s+2); per group position
    jq < Q the 5 constants [w, w*i, w^2, w^3, w^3*i] (w = root^(jq<<s),
    i = root^(Q<<s)) live at block offset offs[s] + jq*5 + cidx, each a
    LANES-wide mulconst block. Returns (table, offs)."""
    q = spec.modulus
    b = spec.limb_bits
    L = spec.n_limbs
    S = 1 << kk
    offs = _c4_offs(kk)
    total = sum(5 * (S >> (s + 2)) for s in range(0, kk - 1, 2))
    cols = np.zeros((lp, max(total, 1) * LANES), np.int32)
    shift2 = pow(2, 2 * b, q)
    for s in range(0, kk - 1, 2):
        Q = S >> (s + 2)
        i_rt = pow(root, Q << s, q)
        for jq in range(Q):
            w = pow(root, jq << s, q)
            w3 = pow(w, 3, q)
            for cidx, v in enumerate(
                    (w, w * i_rt % q, w * w % q, w3, w3 * i_rt % q)):
                base = (offs[s] + jq * 5 + cidx) * LANES
                acc = v * shift2 % q
                for li in range(L):
                    cols[:L, base + li] = int_to_limbs(acc, b, L)
                    acc = acc * (1 << b) % q
    return jnp.asarray(cols), offs


def _twist_table(domain, w: int, k1: int, k2: int, lp: int,
                 fold_n_inv: bool) -> jax.Array:
    """(lp, n) Montgomery twist table T[h*S2 + lo] = w^(lo * rev_S1(h)),
    optionally scaled by n^-1 (inverse transforms). Built on device with
    log-doubling masked muls (k2 full-width muls)."""
    eng = domain.eng
    spec = eng.spec
    q = spec.modulus
    S1, S2 = 1 << k1, 1 << k2
    n = S1 * S2
    bases_int = [pow(w, _bitrev(h, k1), q) for h in range(S1)]
    bases = eng.from_int(bases_int)                     # (S1, L) mont
    bases = jnp.repeat(bases, S2, axis=0)               # (n, L)
    lo = jnp.tile(jnp.arange(S2, dtype=jnp.int32), S1)  # (n,)
    table = eng.ones((n,))
    wp = bases
    for bit in range(k2):
        bit_set = ((lo >> bit) & 1) == 1
        table = eng.where(bit_set, eng.mul(table, wp), table)
        if bit != k2 - 1:
            wp = eng.square(wp)
    if fold_n_inv:
        n_inv = eng.broadcast_to(
            eng.from_int(pow(n, -1, q)), (n,))
        table = eng.mul(table, n_inv)
    L = spec.n_limbs
    return jnp.zeros((lp, n), jnp.int32).at[:L, :].set(table.T)


@functools.lru_cache(maxsize=None)
def _tables4(domain, inverse: bool):
    # Build eagerly even when first touched inside a jit trace: without this
    # the table construction (10 full-width masked muls for the twist table)
    # would be traced into the caller's graph and re-executed EVERY call
    # (measured: 630 ms/transform instead of 21). When NOT tracing, build
    # directly — ensure_compile_time_eval would lower the construction with
    # the intermediate tables as captured CONSTANTS (3.22 GB at 2^24),
    # transiently doubling HBM and OOMing the chip.
    from jax._src import core as _core
    if _core.trace_state_clean():
        return _tables4_build(domain, inverse)
    with jax.ensure_compile_time_eval():
        return _tables4_build(domain, inverse)


def _tables4_build(domain, inverse: bool):
    spec = domain.eng.spec
    _attach_fold_consts(spec)
    q = spec.modulus
    n, k = domain.n, domain.k
    k2 = k // 2
    k1 = k - k2
    S1, S2 = 1 << k1, 1 << k2
    L = spec.n_limbs
    lp = _round_up(max(L, 8), 8)
    w = domain.generator_inv_int if inverse else domain.generator_int
    w1 = pow(w, S2, q)   # order S1: hi sub-NTT root
    w2 = pow(w, S1, q)   # order S2: lo sub-NTT root
    c1 = _c_blocks(spec, w1, k1, lp)
    c2 = _c_blocks(spec, w2, k2, lp)
    twist = _twist_table(domain, w, k1, k2, lp, fold_n_inv=inverse)
    # consts tile: col 0 = q limbs, col 1 = 2q limbs, col 2 = 6q limbs
    cn = np.zeros((lp, LANES), np.int32)
    cn[:L, 0] = spec.q_limbs
    cn[:L, 1] = int_to_limbs(2 * q, spec.limb_bits, L)
    cn[:L, 2] = int_to_limbs(6 * q, spec.limb_bits, L)
    return k1, k2, c1, c2, twist, jnp.asarray(cn), lp


@functools.lru_cache(maxsize=None)
def _tables4_r4(domain, inverse: bool):
    """Radix-4 twiddle tables, built (and resident in HBM) only when the
    fused path is actually enabled — they are several MB per domain."""
    spec = domain.eng.spec
    q = spec.modulus
    n, k = domain.n, domain.k
    k2 = k // 2
    k1 = k - k2
    lp = _round_up(max(spec.n_limbs, 8), 8)
    w = domain.generator_inv_int if inverse else domain.generator_int
    with jax.ensure_compile_time_eval():
        c1_4 = _c4_blocks(spec, pow(w, 1 << k2, q), k1, lp)
        c2_4 = _c4_blocks(spec, pow(w, 1 << k1, q), k2, lp)
    return c1_4, c2_4


# ---------------------------------------------------------------------------
# drivers
# ---------------------------------------------------------------------------

def _radix4_enabled() -> bool:
    """Fused radix-4 stage pairs (half the HBM passes). Default ON —
    measured 2026-08-19 on the bench chip: bn254 2^20 17.45 ms vs 20.44 ms
    radix-2 (1.17x). GNARK_NTT_RADIX4=0 forces the radix-2 stages."""
    import os

    return os.environ.get("GNARK_NTT_RADIX4", "1") != "0"


def run_stages_four_step(domain, a, decimation: str, inverse: bool,
                         interpret: bool = False):
    """Drop-in replacement for fft._run_stages on the (n, L) layout.

    Forward DIF: step1 (DIF over hi) -> twist -> swap -> step3 (DIF over lo)
    -> canonicalize -> swap back.  Inverse DIT is the exact mirror (the 1/n
    scale is folded into the untwist table — callers must skip it).

    With radix-4 fusing on, sub-NTT stages run as fused pairs whose outputs
    are block-permuted; the next consumer (stage / twist / canonicalize)
    undoes the permutation in its input index map, and the DIT unswap
    applies it as a static column gather — no extra HBM passes anywhere.

    The compute core is jitted HERE with the twiddle tables as runtime
    ARGUMENTS: eager per-op execution is ~1000x slower (21 s at 2^22), and
    an outer jit over this function would capture the tables as program
    constants (1.6 GB twist at 2^24 -> transient HBM doubling + OOM)."""
    spec = domain.eng.spec
    k1, k2, c1, c2, twist, cn, lp = _tables4(domain, inverse)
    r4 = _radix4_enabled()
    if r4:
        (c1_4t, _), (c2_4t, _) = _tables4_r4(domain, inverse)
    else:
        c1_4t = c2_4t = jnp.zeros((0,), jnp.int32)
    return _four_step_jit(spec, k1, k2, lp, decimation, inverse, r4,
                          interpret, a, c1, c2, twist, cn, c1_4t, c2_4t)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def _four_step_jit(spec, k1: int, k2: int, lp: int, decimation: str,
                   inverse: bool, r4: bool, interpret: bool,
                   a, c1, c2, twist, cn, c1_4t, c2_4t):
    n = 1 << (k1 + k2)
    L = spec.n_limbs
    S1, S2 = 1 << k1, 1 << k2
    c1_4 = (c1_4t, _c4_offs(k1))
    c2_4 = (c2_4t, _c4_offs(k2))
    x = jnp.zeros((lp, n), jnp.int32).at[:L, :].set(a.T)

    def swap(z):
        return z.reshape(lp, S1, S2).swapaxes(1, 2).reshape(lp, n)

    def unswap(z, perm, tile):
        if perm is not None:  # fold the block permutation into the gather
            nb = n // tile
            src = np.asarray([perm(l) for l in range(nb)])
            idx = (src[:, None] * tile
                   + np.arange(tile)[None, :]).reshape(-1)
            z = z[:, jnp.asarray(idx)]
        return z.reshape(lp, S2, S1).swapaxes(1, 2).reshape(lp, n)

    def step(z, kk, c_tab, c4, tile, dit):
        """All kk sub-NTT stages; returns (z, perm) with perm the pending
        block permutation of the output (None when radix-2 only)."""
        S = 1 << kk
        c4_tab, offs4 = c4
        perm = None
        if r4:
            pairs = list(range(0, kk - 1, 2))
            leftover = [kk - 1] if kk % 2 else []
            plan = ([("r2", s) for s in leftover] if dit else []) \
                + [("r4", s) for s in (reversed(pairs) if dit else pairs)] \
                + ([] if dit else [("r2", s) for s in leftover])
        else:
            plan = [("r2", s)
                    for s in (range(kk - 1, -1, -1) if dit else range(kk))]
        for kind, s in plan:
            if kind == "r4":
                Q = S >> (s + 2)
                z, perm = _stage4_r4(spec, lp, z, c4_tab, offs4[s], Q,
                                     tile, dit, cn, interpret, perm)
            else:
                half = S >> (s + 1)
                off = S - (S >> s)
                z = _stage4(spec, lp, z, c_tab, off, half, tile, dit, cn,
                            interpret, perm)
                perm = None
        return z, perm

    if decimation == "DIF" and not inverse:
        x, p1 = step(x, k1, c1, c1_4, S2, dit=False)
        x = _twist(spec, lp, x, twist, S2, cn, interpret, p1)
        x = swap(x)
        x, p2 = step(x, k2, c2, c2_4, S1, dit=False)
        x = _canonicalize(spec, lp, x, S1, cn, interpret, p2)
        x = unswap(x, None, S1)
    elif decimation == "DIT" and inverse:
        x = swap(x)
        x, p2 = step(x, k2, c2, c2_4, S1, dit=True)
        x = unswap(x, p2, S1)
        x = _twist(spec, lp, x, twist, S2, cn, interpret)
        x, p1 = step(x, k1, c1, c1_4, S2, dit=True)
        x = _canonicalize(spec, lp, x, S2, cn, interpret, p1)
    else:
        raise ValueError("four-step supports (DIF, forward) / (DIT, inverse)")
    return x[:L, :].T


def supported(domain, a, decimation: str, inverse: bool) -> bool:
    """Compiled-path preconditions: multi-limb engine, S1/S2 >= 128 lanes,
    one of the two supported decimation/direction pairs."""
    eng = domain.eng
    if getattr(eng, "elem_dims", 0) != 1 or a.ndim != 2:
        return False
    if eng.spec.limb_bits > 13:  # f64 uint32 pairs: no int32 CIOS tiles
        return False
    if domain.n < (1 << 14):  # S1, S2 >= 128
        return False
    spec = eng.spec
    lp = _round_up(max(spec.n_limbs, 8), 8)
    if lp - spec.n_limbs < 2:  # top-estimate / CIOS overflow rows needed
        return False
    ok_dir = ((decimation == "DIF" and not inverse)
              or (decimation == "DIT" and inverse))
    return ok_dir
