"""BW6 optimal ate pairing (Fp6 target group, G2 over Fp).

Counterpart of ``ecc/bw6-761/pairing.go``: the single Miller loop of
eprint 2021/1359 Alg.2 — f_{x+1 + lambda(x^3-x^2-x), Q}(P) — driven by two
joint NAF digit rows, with the G1 third-root-of-unity endomorphism
providing the lambda component (q1 = (w*X, -Y)); final exponentiation per
Algorithm 4.4 of El Housni's thesis (pairing.go:62-122).

Everything is batched over lanes like pairing12; steps run on the fp
engine directly (BW6's twist is over Fp itself). Runs as a host-dispatched
ladder (utils/hostloop.py rationale) — the digit rows are static.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gnark_crypto_tpu.curve.jacobian import Affine
from gnark_crypto_tpu.pairing.pairing12 import naf
from gnark_crypto_tpu.towers.tower6 import Tower6, get_tower6


class G2ProjFp(NamedTuple):
    x: jax.Array
    y: jax.Array
    z: jax.Array


_W633 = 4098895725012429242072311240482566844345873033931481129362557724405008256668293241245050359832461015092695507587185678086043587575438449040313411246717257958467499181450742260777082884928318

_PARAMS = {
    "bw6_761": dict(
        x0=9586122913090633729,  # bw6-761.go:136 xGen
        third_root=1968985824090209297278610739700577151397666382303825728450741611566800370218827257750865013421937292370006175842381275743914023380727582819905021229583192207421122272650305267822868639090213645505120388400344940985710520836292650,
        b_twist=4,  # bw6-761.go:101
        # joint digits: a0 = x0+1 (row scaled by 1), a1 = x0^3-x0^2-x0
        # (row scaled by 3); start from q1, last step j=-3 -> q1Neg
        a0=9586122913090633730, a1=880904806456922042166256752416502360955572640081583800319,
        a1_scaled=True, start_q1=True, i0=("q1n",), conj_end=False,
        # hard-part exponents (Algorithm 4.4; x0 > 0)
        exps=dict(m1=9586122913090633728, m1sq=9586122913090633728 ** 2,
                  p1=9586122913090633730, div3=3195374304363544576,
                  c1=11, c2=103, alg="4.4"),
    ),
    "bw6_633": dict(
        x0=-3218079743,  # bw6-633.go:127 xGen ("negative")
        third_root=(_W633 * _W633),  # thirdRootOneG2 = w^2 (bw6-633.go:119)
        b_twist=8,  # bw6-633.go:90 (M-twist)
        # |x0+1| row scaled by 3, |x0^5-x0^4-x0| row scaled by 1; start
        # from q0, final conjugation (negative seed), last step j=1 -> q0
        a0=3218079742, a1=345131030376204096837580131803633448876874137601,
        a1_scaled=False, start_q1=False, i0=("q0",), conj_end=True,
        exps=dict(m1=-3218079744, m1sq=3218079744 ** 2,
                  p1=-3218079742, div3=-1072693248,
                  sq_p1=3218079743 ** 2 + 1,
                  c1=-3, c2=13, alg="4.5"),
    ),
}


class PairingCtx6:
    def __init__(self, name: str, tower=None):
        """``tower``: inject an alternative Tower6 (e.g. the symbolic
        program-emitting SymTower6) in place of the device one."""
        par = _PARAMS[name]
        self.name = name
        self.tower: Tower6 = tower or get_tower6(name)
        self.fp = self.tower.fp
        self.x0 = par["x0"]
        self.third_root = par["third_root"]
        self._w_dev = self.fp.from_int(self.third_root)
        self._b_twist = par["b_twist"]
        self._b_twist_dev = self.fp.from_int(self._b_twist)
        self.par = par
        # digit rows, LSB-first NAF of the two loop scalars (bw6-761.go:102,
        # 118 / bw6-633.go:106,110); the MSB of the longer row is consumed
        # by the starting point (q1 for bw6-761, q0 for bw6-633).
        self.l0 = naf(par["a0"])
        self.l1 = naf(par["a1"])
        self.nbits = len(self.l1) - 1  # iterate i = nbits-1 .. 0

    def _dig(self, i: int) -> int:
        d0 = self.l0[i] if i < len(self.l0) else 0
        d1 = self.l1[i]
        # bw6-761: j = 3*L1 + L0 (pairing.go:216); bw6-633: j = 3*L0 + L1
        # (pairing.go:210)
        return (3 * d1 + d0) if self.par["a1_scaled"] else (3 * d0 + d1)

    # -- projective steps over fp (pairing.go:277,318,355) ------------------
    def double_step(self, q: G2ProjFp):
        f = self.fp
        A = f.halve(f.mul(q.x, q.y))
        B = f.square(q.y)
        C = f.square(q.z)
        D = f.add(f.double(C), C)
        E = f.mul(D, f.broadcast_to(self._b_twist_dev, f.eshape(D)))
        F = f.add(f.double(E), E)
        G = f.halve(f.add(B, F))
        H = f.sub(f.square(f.add(q.y, q.z)), f.add(B, C))
        I = f.sub(E, B)
        J = f.square(q.x)
        EE = f.square(E)
        K = f.add(f.double(EE), EE)
        x3 = f.mul(f.sub(B, F), A)
        y3 = f.sub(f.square(G), K)
        z3 = f.mul(B, H)
        # line (r0, r1, r2) = (I, 3J, -H)  [pairing.go:310-313]
        return G2ProjFp(x3, y3, z3), (I, f.add(f.double(J), J), f.neg(H))

    def add_mixed_step(self, q: G2ProjFp, a_x, a_y):
        f = self.fp
        O = f.sub(q.y, f.mul(a_y, q.z))
        L = f.sub(q.x, f.mul(a_x, q.z))
        C = f.square(O)
        D = f.square(L)
        E = f.mul(L, D)
        F = f.mul(q.z, C)
        G = f.mul(q.x, D)
        H = f.sub(f.add(E, F), f.double(G))
        x3 = f.mul(L, H)
        y3 = f.sub(f.mul(f.sub(G, H), O), f.mul(q.y, E))
        z3 = f.mul(E, q.z)
        J = f.sub(f.mul(a_x, O), f.mul(L, a_y))
        # line (r0, r1, r2) = (J, -O, L)  [pairing.go:348-350]
        return G2ProjFp(x3, y3, z3), (J, f.neg(O), L)

    def line_compute(self, q: G2ProjFp, a_x, a_y):
        f = self.fp
        O = f.sub(q.y, f.mul(a_y, q.z))
        L = f.sub(q.x, f.mul(a_x, q.z))
        J = f.sub(f.mul(a_x, O), f.mul(L, a_y))
        return (J, f.neg(O), L)

    # -- line -> E6 (positions 0, 1, 4: pairing.go:182-184 MulBy014) --------
    def line_value(self, line, px, py, inf_mask):
        tw, f, e6 = self.tower, self.fp, self.tower.e6
        r0, r1, r2 = line
        zero = f.zeros(f.eshape(r0))
        lv = tw.from_coeffs6([r0, f.mul(r1, px), zero,
                              zero, f.mul(r2, py), zero])
        ones = e6.broadcast_to(e6.ones(), e6.eshape(lv))
        return e6.where(inf_mask, ones, lv)


@functools.lru_cache(maxsize=None)
def get_ctx6(name: str) -> PairingCtx6:
    return PairingCtx6(name)


@functools.lru_cache(maxsize=None)
def _miller_kernels6(ctx: PairingCtx6):
    e6 = ctx.tower.e6

    def dbl(facc, qp, px, py, infm):
        facc = e6.square(facc)
        qp, line = ctx.double_step(qp)
        return e6.mul(facc, ctx.line_value(line, px, py, infm)), qp

    def add(facc, qp, ax, ay, px, py, infm):
        qp, line = ctx.add_mixed_step(qp, ax, ay)
        return e6.mul(facc, ctx.line_value(line, px, py, infm)), qp

    def last(facc, qp, ax, ay, px, py, infm):
        line = ctx.line_compute(qp, ax, ay)
        return e6.mul(facc, ctx.line_value(line, px, py, infm))

    return jax.jit(dbl), jax.jit(add), jax.jit(last)


def miller_loop(ctx: PairingCtx6, P: Affine, QX, QY):
    """Batched multi-Miller loop; infinite pairs neutralized
    (pairing.go:139-148 filtering)."""
    f, e6 = ctx.fp, ctx.tower.e6
    n = f.eshape(P.x)[0]
    inf_mask = (f.is_zero(P.x) & f.is_zero(P.y)) | \
        (f.is_zero(QX) & f.is_zero(QY))

    w = f.broadcast_to(ctx._w_dev, (n,))
    q0 = (QX, QY)
    q0n = (QX, f.neg(QY))
    q1 = (f.mul(QX, w), f.neg(QY))       # pairing.go:157-161
    q1n = (q1[0], QY)

    one = f.broadcast_to(f.ones(), (n,))
    start = q1 if ctx.par["start_q1"] else q0  # MSB of the scaled-by-3 row
    qp = G2ProjFp(start[0], start[1], one)
    facc = e6.broadcast_to(e6.ones(), (n,))

    dblk, addk, lastk = _miller_kernels6(ctx)
    adds = {3: q1, 1: q0, -1: q0n, -3: q1n}
    for i in range(ctx.nbits - 1, 0, -1):
        facc, qp = dblk(facc, qp, P.x, P.y, inf_mask)
        j = ctx._dig(i)
        if j:
            ax, ay = adds[j]
            facc, qp = addk(facc, qp, ax, ay, P.x, P.y, inf_mask)
    # i = 0: final line only, no point update (bw6-761 pairing.go:259-271
    # j=-3 -> q1Neg; bw6-633 pairing.go:274-289 j=1 -> q0)
    facc, qp = dblk(facc, qp, P.x, P.y, inf_mask)
    last_pt = {"q1n": q1n, "q0": q0}[ctx.par["i0"][0]]
    facc = lastk(facc, qp, last_pt[0], last_pt[1], P.x, P.y, inf_mask)
    if ctx.par["conj_end"]:
        facc = ctx.tower.conjugate(facc)  # negative seed (bw6-633)

    # product over pairs
    total = facc[:1]
    for idx in range(1, n):
        total = e6.mul(total, facc[idx:idx + 1])
    return total


def final_exponentiation(ctx: PairingCtx6, z):
    """(p^6-1)/r via easy part + hard part: Algorithm 4.4 (bw6-761,
    pairing.go:62-122) or 4.5 (bw6-633) of El Housni's thesis. Signed
    exponents use conjugation (cyclotomic inverse)."""
    tw, e6 = ctx.tower, ctx.tower.e6
    E = ctx.par["exps"]

    def exp(x, e):
        if e < 0:
            return tw.conjugate(tw.exp_cyclotomic(x, -e))
        return tw.exp_cyclotomic(x, e)

    # easy part: (p^3 - 1)(p + 1)
    buf = tw.conjugate(z)
    res = e6.inverse(z)
    buf = e6.mul(buf, res)
    res = e6.mul(tw.frobenius(buf), buf)

    if E["alg"] == "4.4":
        a = e6.mul(exp(res, E["m1sq"]), tw.frobenius(res))
        b = e6.mul(exp(a, E["p1"]), tw.conjugate(res))
        a = e6.mul(a, tw.cyclotomic_square(a))            # a^3
        c = exp(b, E["div3"])
        d = exp(c, E["m1"])
        e = e6.mul(exp(d, E["m1sq"]), d)
        d = tw.conjugate(d)
        f_ = e6.mul(d, b)
        g = e6.mul(exp(e, E["p1"]), f_)
        h = e6.mul(g, c)
        i = exp(e6.mul(g, d), E["p1"])
        i = e6.mul(i, tw.conjugate(f_))
        j = e6.mul(exp(h, E["c1"]), e)
        k = e6.mul(e6.mul(tw.cyclotomic_square(j), j), b)
        k = e6.mul(k, exp(i, E["c2"]))
        return e6.mul(a, k)

    # Algorithm 4.5 (bw6-633 pairing.go:62-130)
    mp = tw.frobenius(res)
    a = exp(exp(mp, E["m1sq"]), E["sq_p1"])
    a = e6.mul(res, a)
    b = e6.mul(exp(a, E["p1"]), tw.conjugate(mp))
    t = e6.mul(tw.cyclotomic_square(a), a)
    a = tw.conjugate(t)                                   # (a^3)^-1
    c = exp(b, E["div3"])
    d = exp(exp(c, E["m1"]), E["sq_p1"])
    e = e6.mul(exp(exp(d, E["m1sq"]), E["sq_p1"]), d)
    f_ = e6.mul(tw.conjugate(e6.mul(exp(e, E["p1"]), c)), d)
    g = tw.conjugate(e6.mul(f_, d))
    h = e6.mul(e6.mul(exp(g, E["p1"]), c), b)
    i = e6.mul(exp(f_, E["c1"]), e)
    t = e6.mul(e6.mul(tw.cyclotomic_square(i), i), b)
    i = e6.mul(exp(h, E["c2"]), t)
    return e6.mul(a, i)


# ---------------------------------------------------------------------------
# fixed-Q: precomputed affine lines (reference bw6-761 pairing.go:408
# PrecomputeLines / :838 MillerLoopFixedQ)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _aff_kernels6(ctx: PairingCtx6):
    f = ctx.fp

    def div(n, d):
        return f.mul(n, f.inverse(d))

    def dbl(x, y):
        """Affine tangent; line R0 = lam, R1 = lam*x - y."""
        lam = div(f.add(f.double(f.square(x)), f.square(x)), f.double(y))
        xr = f.sub(f.sub(f.square(lam), x), x)
        yr = f.sub(f.mul(lam, f.sub(x, xr)), y)
        return xr, yr, lam, f.sub(f.mul(lam, x), y)

    def add(x, y, ax, ay):
        lam = div(f.sub(ay, y), f.sub(ax, x))
        xr = f.sub(f.sub(f.square(lam), x), ax)
        yr = f.sub(f.mul(lam, f.sub(x, xr)), y)
        return xr, yr, lam, f.sub(f.mul(lam, x), y)

    return jax.jit(dbl), jax.jit(add)


def precompute_lines6(name: str, QX, QY):
    """Per-Q affine line tables [2][S] with S = nbits slots (reference
    PrecomputeLines, bw6-761 pairing.go:408). Returns (r0, r1) arrays of
    shape (2, S, *batch) matching lines.AffLines semantics over fp."""
    ctx = get_ctx6(name)
    f = ctx.fp
    dbl, add = _aff_kernels6(ctx)
    S = ctx.nbits
    w = f.broadcast_to(ctx._w_dev, f.eshape(QX))
    q0 = (QX, QY)
    q0n = (QX, f.neg(QY))
    q1 = (f.mul(QX, w), f.neg(QY))
    q1n = (q1[0], QY)
    adds = {3: q1, 1: q0, -1: q0n, -3: q1n}
    zero = f.zeros(f.eshape(QX))
    slots0, slots1 = {}, {}
    start = q1 if ctx.par["start_q1"] else q0
    x, y = start
    for i in range(S - 1, 0, -1):
        x, y, r0, r1 = dbl(x, y)
        slots0[i] = (r0, r1)
        j = ctx._dig(i)
        if j:
            ax, ay = adds[j]
            x, y, r0, r1 = add(x, y, ax, ay)
            slots1[i] = (r0, r1)
    # i = 0: tangent, then the final chord to the fixed last point with NO
    # point update (pairing.go:259-271 / :274-289)
    x, y, r0, r1 = dbl(x, y)
    slots0[0] = (r0, r1)
    lp = {"q1n": q1n, "q0": q0}[ctx.par["i0"][0]]
    lam = f.mul(f.sub(lp[1], y), f.inverse(f.sub(lp[0], x)))
    slots1[0] = (lam, f.sub(f.mul(lam, x), y))

    import jax.numpy as _jnp

    def stack(slots):
        return (_jnp.stack([slots.get(i, (zero, zero))[0]
                            for i in range(S)]),
                _jnp.stack([slots.get(i, (zero, zero))[1]
                            for i in range(S)]))

    r0_0, r1_0 = stack(slots0)
    r0_1, r1_1 = stack(slots1)
    return (_jnp.stack([r0_0, r0_1]), _jnp.stack([r1_0, r1_1]))


@functools.lru_cache(maxsize=None)
def _fixedq_kernels6(ctx: PairingCtx6):
    tw, f, e6 = ctx.tower, ctx.fp, ctx.tower.e6

    def line_elt(r0, r1, xnoy, yinv):
        # MulBy01 sparse element (R1*yInv, R0*xNegOverY, 0, 0, 1, 0)
        # (bw6-761 e6.go:901, pairing.go MillerLoopFixedQ scaling)
        zero = f.zeros(f.eshape(r0))
        one = f.broadcast_to(f.ones(), f.eshape(r0))
        return tw.from_coeffs6([f.mul(r1, yinv), f.mul(r0, xnoy),
                                zero, zero, one, zero])

    def step0(facc, r0, r1, xnoy, yinv):
        facc = e6.square(facc)
        return e6.mul(facc, line_elt(r0, r1, xnoy, yinv))

    def step1(facc, r0a, r1a, r0b, r1b, xnoy, yinv):
        facc = e6.square(facc)
        facc = e6.mul(facc, line_elt(r0a, r1a, xnoy, yinv))
        return e6.mul(facc, line_elt(r0b, r1b, xnoy, yinv))

    return jax.jit(step0), jax.jit(step1)


def miller_loop_fixed_q6(name: str, P: Affine, lines):
    """Batched Miller loop over fixed-Q line tables. Infinite P need no
    filtering: 1/0 == 0 makes both line slots vanish (pairing.go:845-858)."""
    ctx = get_ctx6(name)
    f, e6 = ctx.fp, ctx.tower.e6
    n = f.eshape(P.x)[0]
    yinv = f.inverse(P.y)
    xnoy = f.neg(f.mul(P.x, yinv))
    facc = e6.broadcast_to(e6.ones(), (n,))
    step0, step1 = _fixedq_kernels6(ctx)
    r0, r1 = lines
    for i in range(ctx.nbits - 1, 0, -1):
        if ctx._dig(i) == 0:
            facc = step0(facc, r0[0, i], r1[0, i], xnoy, yinv)
        else:
            facc = step1(facc, r0[0, i], r1[0, i], r0[1, i], r1[1, i],
                         xnoy, yinv)
    facc = step1(facc, r0[0, 0], r1[0, 0], r0[1, 0], r1[1, 0], xnoy, yinv)
    if ctx.par["conj_end"]:
        facc = ctx.tower.conjugate(facc)
    total = facc[:1]
    for idx in range(1, n):
        total = e6.mul(total, facc[idx:idx + 1])
    return total


def pair_fixed_q6(name: str, P: Affine, lines):
    ctx = get_ctx6(name)
    return final_exponentiation(ctx, miller_loop_fixed_q6(name, P, lines))


def pairing_check_fixed_q6(name: str, P: Affine, lines):
    ctx = get_ctx6(name)
    e6 = ctx.tower.e6
    g = pair_fixed_q6(name, P, lines)
    return e6.equal(g, e6.broadcast_to(e6.ones(), e6.eshape(g)))


def pair(name: str, P: Affine, QX, QY):
    """Reduced pairing; on TPU routes through the straight-line VM
    (vm_pairing.py) with an eager step-kernel fallback — same dispatch
    policy as pairing12.pair."""
    import os

    import jax as _jax

    from gnark_crypto_tpu.utils import hostloop
    if (_jax.default_backend() == "tpu"
            and not hostloop.is_tracing(P, QX, QY)
            and os.environ.get("GNARK_TPU_NO_VM_PAIRING") != "1"):
        from gnark_crypto_tpu.pairing.vm_pairing import try_pair_vm
        out = try_pair_vm(name, P, QX, QY)
        if out is not None:
            return out
    ctx = get_ctx6(name)
    return final_exponentiation(ctx, miller_loop(ctx, P, QX, QY))


def pairing_check(name: str, P: Affine, QX, QY):
    ctx = get_ctx6(name)
    e6 = ctx.tower.e6
    r = pair(name, P, QX, QY)
    return e6.equal(r, e6.broadcast_to(e6.ones(), e6.eshape(r)))
