"""Fixed-Q pairing: precomputed affine Miller lines + sparse-mul loop.

TPU-native counterpart of the reference's ``PrecomputeLines`` /
``MillerLoopFixedQ`` / ``PairFixedQ`` (``ecc/bn254/pairing.go:676,873,401``,
``ecc/bls12-381/pairing.go:660,736``). Lines are stored in the reference's
slot layout — ``lines[j][i]`` with j=0 the double-step tangent and j=1 the
add-step chord at loop index i; bn254 additionally stores its two Frobenius
terminal lines in slots ``[1][last]`` then ``[0][last]`` — and each slot
holds the exact same (R0, R1) values as the reference's affine ladder
(doubleStep / Eisentraeger-Lauter-Montgomery doubleAndAddStep), so KZG SRS
dumps round-trip byte-identically.

Everything is batched: Q may be a batch of n points, producing line stacks
of shape (2, S, n, ...); the loop then pairs them with a batch of n G1
points, sharing each E12 squaring across the batch like the reference
mutualizes its squaring across pairs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gnark_crypto_tpu.curve.jacobian import Affine
from gnark_crypto_tpu.pairing.pairing12 import PairingCtx, get_ctx
from gnark_crypto_tpu.utils import hostloop


class AffLines(NamedTuple):
    """Stacked line coefficients: arrays (2, S, *batch, *e2dims)."""
    r0: jax.Array
    r1: jax.Array


_BW6 = ("bw6_761", "bw6_633")


def n_line_slots(name: str) -> int:
    """Reference slot count: len(LoopCounter) for bn254 (terminal lines in
    the extra slot), len(LoopCounter)-1 for BLS12/BLS24/BW6
    (kzg/marshal.go nLines)."""
    if name in _BW6:
        from gnark_crypto_tpu.pairing.pairing6 import get_ctx6

        return get_ctx6(name).nbits
    ctx = get_ctx(name)
    return len(ctx.loop) if ctx.family == "bn" else len(ctx.loop) - 1


# ---------------------------------------------------------------------------
# affine steps (E2 coordinates), transcribed from pairing.go:1030-1180
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _aff_kernels(ctx: PairingCtx):
    e2 = ctx.tower.e2

    def div(n, d):
        return e2.mul(n, e2.inverse(d))

    def dbl(x, y):
        """doubleStep: tangent at (x, y); line R0=lam, R1=lam*x-y."""
        lam = div(e2.add(e2.double(e2.square(x)), e2.square(x)),
                  e2.double(y))
        xr = e2.sub(e2.sub(e2.square(lam), x), x)
        yr = e2.sub(e2.mul(lam, e2.sub(x, xr)), y)
        return xr, yr, lam, e2.sub(e2.mul(lam, x), y)

    def add(x, y, ax, ay):
        """addStep: chord (x,y)-(ax,ay); line R0=lam, R1=lam*x-y."""
        lam = div(e2.sub(ay, y), e2.sub(ax, x))
        xr = e2.sub(e2.sub(e2.square(lam), x), ax)
        yr = e2.sub(e2.mul(lam, e2.sub(x, xr)), y)
        return xr, yr, lam, e2.sub(e2.mul(lam, x), y)

    def dbl_add(x, y, ax, ay):
        """doubleAndAddStep (ELM 2P+Q, eprint 2003/257): both lines use the
        ORIGINAL (x, y); one shared inversion of A*U."""
        A = e2.sub(x, ax)
        B = e2.sub(y, ay)
        A2 = e2.square(A)
        B2 = e2.square(B)
        U = e2.sub(B2, e2.mul(e2.add(e2.double(x), ax), A2))
        inv_AU = e2.inverse(e2.mul(A, U))
        l1 = e2.mul(B, e2.mul(U, inv_AU))            # B/A
        x3 = e2.sub(e2.sub(e2.square(l1), x), ax)
        r0a, r1a = l1, e2.sub(e2.mul(l1, x), y)
        l2 = e2.neg(e2.add(
            e2.mul(e2.mul(e2.double(y), A2), e2.mul(A, inv_AU)), l1))
        x4 = e2.sub(e2.sub(e2.square(l2), x), x3)
        y4 = e2.sub(e2.mul(l2, e2.sub(x, x4)), y)
        return x4, y4, r0a, r1a, l2, e2.sub(e2.mul(l2, x), y)

    return jax.jit(dbl), jax.jit(add), jax.jit(dbl_add)


def precompute_lines(name: str, QX, QY) -> AffLines:
    """Per-Q line tables (reference PrecomputeLines). Host-driven eager
    ladder (lines are precomputed once, off the hot path). All 7 pairing
    families; BW6 delegates to the direct-sextic ladder (pairing6)."""
    if name in _BW6:
        from gnark_crypto_tpu.pairing.pairing6 import precompute_lines6

        r0, r1 = precompute_lines6(name, QX, QY)
        return AffLines(r0, r1)
    ctx = get_ctx(name)
    assert ctx.family in ("bn", "bls12", "bls24"), name
    e2 = ctx.tower.e2
    dbl, add, dbl_add = _aff_kernels(ctx)
    S = n_line_slots(name)
    digits = ctx.loop
    zero = e2.zeros(e2.eshape(QX))
    slots0 = {}  # [i] -> (r0, r1), double-step tangents
    slots1 = {}
    x, y = QX, QY
    neg_qy = e2.neg(QY)
    top = len(digits) - 2
    for i in range(top, -1, -1):
        d = digits[i]
        if d == 0:
            x, y, r0, r1 = dbl(x, y)
            slots0[i] = (r0, r1)
        else:
            ay = neg_qy if d == -1 else QY
            if i == top:
                # accQ == Q: ELM would divide by zero (bls12-381
                # pairing.go:674-678) — double then add separately
                x, y, r0, r1 = dbl(x, y)
                slots0[i] = (r0, r1)
                x, y, r0, r1 = add(x, y, QX, ay)
                slots1[i] = (r0, r1)
            else:
                x, y, r0a, r1a, r0b, r1b = dbl_add(x, y, QX, ay)
                slots0[i] = (r0a, r1a)
                slots1[i] = (r0b, r1b)
    if ctx.family == "bn":
        # terminal Frobenius lines (pairing.go:858-867): addStep with
        # phiQ = pi(Q) into [1][65], then psiQ = -pi^2(Q) into [0][65]
        phix, phiy = ctx.psi_coords(QX, QY)
        psix, psiy = ctx.psi2_coords(QX, QY)
        x, y, r0, r1 = add(x, y, phix, phiy)
        slots1[S - 1] = (r0, r1)
        x, y, r0, r1 = add(x, y, psix, psiy)
        slots0[S - 1] = (r0, r1)

    def stack(slots):
        return (jnp.stack([slots.get(i, (zero, zero))[0] for i in range(S)]),
                jnp.stack([slots.get(i, (zero, zero))[1] for i in range(S)]))

    r0_0, r1_0 = stack(slots0)
    r0_1, r1_1 = stack(slots1)
    return AffLines(jnp.stack([r0_0, r0_1]), jnp.stack([r1_0, r1_1]))


# ---------------------------------------------------------------------------
# fixed-Q Miller loop (sparse-mul consumption)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _loop_kernels(ctx: PairingCtx):
    tw = ctx.tower
    e12 = tw.e12
    sparse = hasattr(tw, "mul_by_34")   # SparseLineMixin (Tower12+Tower24)

    def scale(ctx_, r0, r1, xnoy, yinv):
        if ctx_.twist_type == "D":
            # c3 = R0 * (-x/y), c4 = R1 * (1/y) (bn254 pairing.go:915-916)
            return ctx_._scale_e2(r0, xnoy), ctx_._scale_e2(r1, yinv)
        # M-twist: c0 = R1 * (1/y), c1 = R0 * (-x/y) (bls12-381 :781-794)
        return ctx_._scale_e2(r1, yinv), ctx_._scale_e2(r0, xnoy)

    def line_elt(a, b):
        """Dense sextic-coefficient line element: (1,0,0,a,b,0) for D
        twists, (a,b,0,0,1,0) for M (bls24 fallback; bit-identical to the
        sparse products)."""
        e2 = tw.e2
        zero = e2.zeros(e2.eshape(a))
        one = e2.broadcast_to(e2.ones(), e2.eshape(a))
        if ctx.twist_type == "D":
            return tw.from_coeffs6([one, zero, zero, a, b, zero])
        return tw.from_coeffs6([a, b, zero, zero, one, zero])

    def step0(f, r0, r1, xnoy, yinv):
        f = e12.square(f)
        a, b = scale(ctx, r0, r1, xnoy, yinv)
        if not sparse:
            return e12.mul(f, line_elt(a, b))
        if ctx.twist_type == "D":
            return tw.mul_by_34(f, a, b)
        return tw.mul_by_01(f, a, b)

    def step1(f, r0a, r1a, r0b, r1b, xnoy, yinv):
        f = e12.square(f)
        a0, b0 = scale(ctx, r0a, r1a, xnoy, yinv)
        a1, b1 = scale(ctx, r0b, r1b, xnoy, yinv)
        if not sparse:
            return e12.mul(e12.mul(f, line_elt(a0, b0)), line_elt(a1, b1))
        if ctx.twist_type == "D":
            prod = tw.mul_34_by_34(a1, b1, a0, b0)
            return tw.mul_by_01234(f, prod)
        prod = tw.mul_01_by_01(a1, b1, a0, b0)
        return tw.mul_by_01245(f, prod)

    def terminal(f, r0a, r1a, r0b, r1b, xnoy, yinv):
        # bn254: (l[1][65] x l[0][65]) x f, no squaring (pairing.go:996-1022)
        a0, b0 = scale(ctx, r0a, r1a, xnoy, yinv)
        a1, b1 = scale(ctx, r0b, r1b, xnoy, yinv)
        prod = tw.mul_34_by_34(a0, b0, a1, b1)
        return tw.mul_by_01234(f, prod)

    return jax.jit(step0), jax.jit(step1), jax.jit(terminal)


def miller_loop_fixed_q(name: str, P: Affine, lines: AffLines):
    """Batched multi-Miller loop over fixed-Q line tables (reference
    MillerLoopFixedQ). P: G1 affine batch (n,); lines from
    :func:`precompute_lines` on the matching Q batch."""
    if name in _BW6:
        from gnark_crypto_tpu.pairing.pairing6 import miller_loop_fixed_q6

        return miller_loop_fixed_q6(name, P, (lines.r0, lines.r1))
    ctx = get_ctx(name)
    tw = ctx.tower
    e12, f = tw.e12, tw.fp
    n = f.eshape(P.x)[0]

    # yInv = 1/y, xNegOverY = -x/y; gnark's 0-maps-to-0 inverse convention
    # makes infinity pairs contribute 1 automatically (pairing.go:879-888)
    yinv = f.inverse(P.y)
    xnoy = f.neg(f.mul(P.x, yinv))

    facc = e12.broadcast_to(e12.ones(), (n,))
    digits = ctx.loop
    S = n_line_slots(name)
    step0, step1, terminal = _loop_kernels(ctx)

    if not hostloop.is_tracing(P.x, lines.r0):
        for i in range(len(digits) - 2, -1, -1):
            if digits[i] == 0:
                facc = step0(facc, lines.r0[0, i], lines.r1[0, i],
                             xnoy, yinv)
            else:
                facc = step1(facc, lines.r0[0, i], lines.r1[0, i],
                             lines.r0[1, i], lines.r1[1, i], xnoy, yinv)
        if ctx.family == "bn":
            facc = terminal(facc, lines.r0[1, S - 1], lines.r1[1, S - 1],
                            lines.r0[0, S - 1], lines.r1[0, S - 1],
                            xnoy, yinv)
    else:
        idxs = list(range(len(digits) - 2, -1, -1))
        dig_arr = jnp.asarray([digits[i] for i in idxs], jnp.int32)
        perm = jnp.asarray(idxs, jnp.int32)
        ld = jax.tree.map(lambda a: a[:, perm], lines)

        def body(facc, slot):
            d, r00, r10, r01, r11 = slot
            f0 = step0(facc, r00, r10, xnoy, yinv)
            f1 = step1(facc, r00, r10, r01, r11, xnoy, yinv)
            return e12.where(d == 0, f0, f1), None

        facc, _ = jax.lax.scan(
            body, facc,
            (dig_arr, ld.r0[0], ld.r1[0], ld.r0[1], ld.r1[1]))
        if ctx.family == "bn":
            facc = terminal(facc, lines.r0[1, S - 1], lines.r1[1, S - 1],
                            lines.r0[0, S - 1], lines.r1[0, S - 1],
                            xnoy, yinv)

    if ctx.family != "bn" and ctx.seed_neg:
        facc = tw.conjugate(facc)

    # product over the pair batch (pairwise tree, as miller_loop)
    while facc.shape[0] > 1:
        m = facc.shape[0]
        half = m // 2
        red = e12.mul(facc[:half], facc[half:2 * half])
        facc = (jnp.concatenate([red, facc[2 * half:]], 0)
                if m % 2 else red)
    return facc[0]


def pair_fixed_q(name: str, P: Affine, lines: AffLines):
    """Reduced pairing with fixed Q (reference PairFixedQ)."""
    if name in _BW6:
        from gnark_crypto_tpu.pairing.pairing6 import pair_fixed_q6

        return pair_fixed_q6(name, P, (lines.r0, lines.r1))
    from gnark_crypto_tpu.pairing.pairing12 import final_exponentiation

    ctx = get_ctx(name)
    return final_exponentiation(ctx, miller_loop_fixed_q(name, P, lines))


def pairing_check_fixed_q(name: str, P: Affine, lines: AffLines):
    """prod e(P_i, Q_i) == 1 with fixed Q (reference PairingCheckFixedQ)."""
    if name in _BW6:
        from gnark_crypto_tpu.pairing.pairing6 import pairing_check_fixed_q6

        return pairing_check_fixed_q6(name, P, (lines.r0, lines.r1))
    ctx = get_ctx(name)
    g = pair_fixed_q(name, P, lines)
    e12 = ctx.tower.e12
    return e12.equal(g, e12.ones())
