"""Optimal ate pairings for BN254 / BLS12 curves, batched over pairs.

TPU-native counterpart of ``ecc/bn254/pairing.go`` / ``ecc/bls12-381/
pairing.go``. Differences from the reference (deliberate, same reduced
pairing value):

  * The reference shares one accumulator across pairs and multiplies each
    pair's line in sequentially (``MillerLoop`` pairing.go:111). Here each
    pair keeps its own accumulator in a lane — all line math is batched over
    N pairs — and the accumulators are product-reduced at the end. The loop
    skeleton is the *standard* square/double/add ladder (the reference's
    i=63 shortcut differs only by vertical-line factors, which the final
    exponentiation kills, so reduced pairings agree).
  * Line-vs-accumulator products use the sparse MulBy034/MulBy014
    specializations (towers/tower12.py SparseLineMixin — shared by
    Tower12 at the E2 level and Tower24 at the E4 level, matching
    e12_pairing.go:70-220 / e24_pairing.go:35-200), falling back to the
    dense product only where a tower lacks them.

Homogeneous projective double/add steps use the same formulas as the
reference (eprint 2013/722 §4.3; pairing.go:292,333,377).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gnark_crypto_tpu.curve.jacobian import Affine
from gnark_crypto_tpu.towers.tower12 import Tower12, _h2_inv, _h2_mul, get_tower


def naf(n: int) -> list[int]:
    """2-NAF digits little-endian (ecc.NafDecomposition)."""
    out = []
    while n:
        if n & 1:
            d = 2 - (n % 4)
            out.append(d)
            n -= d
        else:
            out.append(0)
        n >>= 1
    return out


class G2Proj(NamedTuple):
    x: jax.Array
    y: jax.Array
    z: jax.Array


class PairingCtx:
    """Per-curve pairing context (seed, loop counter, twist constants)."""

    def __init__(self, name: str, tower=None):
        """``tower``: inject an alternative tower implementation (e.g. the
        symbolic program-emitting SymTower12) in place of the device one."""
        self.name = name
        if name == "bn254":
            self.tower = tower or get_tower("bn254")
            self.family = "bn"
            self.seed = 4965661367192848881          # x0 (bn254.go:155)
            self.seed_neg = False
            self.loop = naf(6 * self.seed + 2)        # 66 digits (bn254.go:152)
            # b' = b/xi (D-twist; bn254.go:118)
            p = self.tower.p
            self.b_twist = _h2_mul(_h2_inv(self.tower.xi, p, self.tower.beta),
                                   (3, 0), p, self.tower.beta)
            self.twist_type = "D"
        elif name == "bls24_315":
            from gnark_crypto_tpu.towers.tower24 import get_tower24

            self.tower = tower or get_tower24(name)
            self.family = "bls24"
            self.seed = 3218079743        # |x0|, x0 < 0 (bls24-315.go:161;
            self.seed_neg = True          # Expt chain = x^(1+3*2^20-3*2^30))
            self.loop = naf(self.seed)    # NafDecomposition (bls24-315.go:158)
            p = self.tower.p
            # D-twist: b' = b / v = v^-1 = u*v/13 (bls24-315.go:113-115)
            self.b_twist = ((0, 0), (0, pow(13, -1, p)))
            self.twist_type = "D"
        elif name == "bls24_317":
            from gnark_crypto_tpu.towers.tower24 import get_tower24

            self.tower = tower or get_tower24(name)
            self.family = "bls24"
            self.seed = 3640754176        # x0 > 0 (bls24-317.go:149)
            self.seed_neg = False
            self.loop = naf(self.seed)
            # M-twist: b' = b * v = 4v (bls24-317.go:99-101), as nested
            # (B0, B1) E4 coordinates over E2
            self.b_twist = ((0, 0), (4, 0))
            self.twist_type = "M"
        elif name in ("bls12_381", "bls12_377"):
            self.tower = tower or get_tower(name)
            self.family = "bls12"
            if name == "bls12_381":
                self.seed = 15132376222941642752      # |x0|, x0 < 0
                self.seed_neg = True
                b = 4
            else:
                self.seed = 9586122913090633729       # bls12-377 x0 > 0
                self.seed_neg = False
                b = 1
            self.loop = [int(bit) for bit in bin(self.seed)[2:]][::-1]
            p = self.tower.p
            if name == "bls12_381":
                # M-twist: b' = b * xi (bls12-381.go:113)
                self.b_twist = _h2_mul((b, 0), self.tower.xi, p, self.tower.beta)
                self.twist_type = "M"
            else:
                # bls12-377 D-twist: b' = b / xi = 1/u (bls12-377.go)
                self.b_twist = _h2_inv(self.tower.xi, p, self.tower.beta)
                self.twist_type = "D"
        else:
            raise KeyError(name)
        e2 = self.tower.e2
        self._b_twist_dev = e2.from_int(self.b_twist)

    # -- coefficient-level helpers ------------------------------------------
    def _scale_e2(self, a, s):
        """Coefficient-level element scaled componentwise by an fp element
        (E2.MulByElement / E4.MulByElement) — works for any tower level."""
        from gnark_crypto_tpu.towers.tower24 import _scale_ext_by_fp

        return _scale_ext_by_fp(self.tower, a, s)

    def _mul_b_twist(self, a):
        e2 = self.tower.e2
        return e2.mul(a, e2.broadcast_to(self._b_twist_dev, e2.eshape(a)))

    # -- projective steps (pairing.go:292 doubleStep, :333 addMixedStep) ----
    def double_step(self, q: G2Proj):
        e2 = self.tower.e2
        A = e2.halve(e2.mul(q.x, q.y))
        B = e2.square(q.y)
        C = e2.square(q.z)
        D = e2.add(e2.double(C), C)
        E = self._mul_b_twist(D)
        F = e2.add(e2.double(E), E)
        G = e2.halve(e2.add(B, F))
        H = e2.sub(e2.square(e2.add(q.y, q.z)), e2.add(B, C))
        I = e2.sub(E, B)
        J = e2.square(q.x)
        EE = e2.square(E)
        K = e2.add(e2.double(EE), EE)
        x3 = e2.mul(e2.sub(B, F), A)
        y3 = e2.sub(e2.square(G), K)
        z3 = e2.mul(B, H)
        # line: r0 = -H, r1 = 3J, r2 = I
        return G2Proj(x3, y3, z3), (e2.neg(H), e2.add(e2.double(J), J), I)

    def add_mixed_step(self, q: G2Proj, a_x, a_y):
        e2 = self.tower.e2
        O = e2.sub(q.y, e2.mul(a_y, q.z))
        L = e2.sub(q.x, e2.mul(a_x, q.z))
        C = e2.square(O)
        D = e2.square(L)
        E = e2.mul(L, D)
        F = e2.mul(q.z, C)
        G = e2.mul(q.x, D)
        H = e2.sub(e2.add(E, F), e2.double(G))
        x3 = e2.mul(L, H)
        y3 = e2.sub(e2.mul(e2.sub(G, H), O), e2.mul(q.y, E))
        z3 = e2.mul(E, q.z)
        J = e2.sub(e2.mul(a_x, O), e2.mul(L, a_y))
        # line: r0 = L, r1 = -O, r2 = J
        return G2Proj(x3, y3, z3), (L, e2.neg(O), J)

    def line_compute(self, q: G2Proj, a_x, a_y):
        e2 = self.tower.e2
        O = e2.sub(q.y, e2.mul(a_y, q.z))
        L = e2.sub(q.x, e2.mul(a_x, q.z))
        J = e2.sub(e2.mul(a_x, O), e2.mul(L, a_y))
        return (L, e2.neg(O), J)

    # -- line -> sparse E12 (evaluated at P) --------------------------------
    def line_value(self, line, px, py):
        """Line (r0, r1, r2) evaluated at P -> full E12 element.

        D-twist (bn254/bls12-377): coefficients land at positions (0,3,4)
        i.e. C0B0 = r0*Py, C1B0 = r1*Px, C1B1 = r2 (pairing.go:153-156).
        M-twist (bls12-381): positions (0,1,4): C0B0=r0*Py? — the reference
        bls12-381 uses MulBy014 with C0B0=r2... see bls12-381/pairing.go:
        lines land at (c0, c1, c4) = (r0*Py? ...) — encoded below.
        """
        e2 = self.tower.e2
        zero = e2.zeros(e2.eshape(line[0]))
        r0, r1, r2 = line  # D-twist ordering (bn254 pairing.go:292-377)
        if self.twist_type == "D":
            # (0,3,4): C0B0 = r0*Py, C1B0 = r1*Px, C1B1 = r2
            # (bn254 pairing.go:153-156, bls12-377 pairing.go:147-149)
            c0 = self._scale_e2(r0, py)
            c3 = self._scale_e2(r1, px)
            return self.tower.from_coeffs6([c0, zero, zero, c3, r2, zero])
        else:
            # M-twist swaps the roles of r0 and r2 (bls12-381 doubleStep sets
            # r0=I, r2=-H; pairing.go:146-148): C0B0 = r2 (unscaled),
            # C0B1 = r1*Px, C1B1 = r0*Py.
            c1 = self._scale_e2(r1, px)
            c4 = self._scale_e2(r0, py)
            return self.tower.from_coeffs6([r2, c1, zero, zero, c4, zero])

    def line_prod(self, facc, line, px, py):
        """facc * line(P): sparse MulBy034 (D-twist) / MulBy014 (M-twist) —
        provided by SparseLineMixin for both Tower12 (E2 coefficients) and
        Tower24 (E4 coefficients, e24_pairing.go:35). Bit-identical to the
        dense product (kept as the fallback for towers without them)."""
        tw = self.tower
        r0, r1, r2 = line
        if self.twist_type == "D" and hasattr(tw, "mul_by_034"):
            return tw.mul_by_034(facc, self._scale_e2(r0, py),
                                 self._scale_e2(r1, px), r2)
        if self.twist_type == "M" and hasattr(tw, "mul_by_014"):
            return tw.mul_by_014(facc, r2, self._scale_e2(r1, px),
                                 self._scale_e2(r0, py))
        return tw.e12.mul(facc, self.line_value(line, px, py))

    # -- psi (untwist-Frobenius) endomorphism constants ---------------------
    @functools.lru_cache(maxsize=None)
    def _psi_dev(self, i: int):
        """Device constant for psi: gamma1[i] for a D-twist, gamma1[i]^-1
        for an M-twist (reference endo.u/v, bls12-381.go:141-144 — the
        untwist map direction flips the sign of the xi exponent)."""
        tw = self.tower
        g = tw.g1[i]
        if self.twist_type == "M":
            g = _h2_inv(g, tw.p, tw.beta)
        return tw.e2.from_int(g)

    def psi_coords(self, qx, qy):
        """Q1 = pi(Q) coordinates (pairing.go:259-261; g2.go psi)."""
        e2 = self.tower.e2
        g12 = e2.broadcast_to(self._psi_dev(2), e2.eshape(qx))
        g13 = e2.broadcast_to(self._psi_dev(3), e2.eshape(qx))
        return (e2.mul(e2.conjugate(qx), g12),
                e2.mul(e2.conjugate(qy), g13))

    def psi2_coords(self, qx, qy):
        """-pi^2(Q) coordinates (pairing.go:263-265)."""
        tw, e2 = self.tower, self.tower.e2
        g22 = e2.broadcast_to(tw._gdev(2, 2), e2.eshape(qx))
        g23 = e2.broadcast_to(tw._gdev(2, 3), e2.eshape(qx))
        return (e2.mul(qx, g22), e2.neg(e2.mul(qy, g23)))


@functools.lru_cache(maxsize=None)
def get_ctx(name: str) -> PairingCtx:
    return PairingCtx(name)


@functools.lru_cache(maxsize=None)
def _miller_kernels(ctx: PairingCtx):
    """Jitted (double-step, add-step) kernels for the eager Miller ladder."""
    tw = ctx.tower
    e12 = tw.e12

    def _lv(facc, line, px, py, infm):
        return e12.where(infm, facc, ctx.line_prod(facc, line, px, py))

    def dbl(facc, qp, px, py, infm):
        facc = e12.square(facc)
        qp, line = ctx.double_step(qp)
        return _lv(facc, line, px, py, infm), qp

    def add(facc, qp, ax, ay, px, py, infm):
        qp, line = ctx.add_mixed_step(qp, ax, ay)
        return _lv(facc, line, px, py, infm), qp

    return jax.jit(dbl), jax.jit(add)


def miller_loop(ctx: PairingCtx, P: Affine, QX, QY):
    """Batched multi-Miller loop: returns the product over all pairs.

    P: G1 affine batch (N,); QX/QY: E2 coordinate arrays (N,).
    Infinite pairs are neutralized (their line contribution forced to 1),
    matching the reference's filtering (pairing.go:118-126).
    """
    tw = ctx.tower
    e2, e12, f = tw.e2, tw.e12, tw.fp
    n = tw.fp.eshape(P.x)[0]

    inf_mask = (f.is_zero(P.x) & f.is_zero(P.y)) | \
        (e2.is_zero(QX) & e2.is_zero(QY))

    one2 = e2.broadcast_to(e2.ones(), (n,))
    q = G2Proj(QX, QY, one2)
    q_neg_y = e2.neg(QY)

    facc = e12.broadcast_to(e12.ones(), (n,))

    def line_mul(facc, line):
        return e12.where(inf_mask, facc,
                         ctx.line_prod(facc, line, P.x, P.y))

    digits = ctx.loop
    from gnark_crypto_tpu.utils import hostloop
    if not hostloop.is_tracing(P, QX, QY):
        # eager: digits are static Python ints — dispatch two small jitted
        # step kernels per digit and branch on the digit in Python (avoids
        # the giant fused scan body that segfaults XLA:CPU, hostloop.py;
        # also skips the masked add work on zero digits entirely)
        dblk, addk = _miller_kernels(ctx)
        qp = q
        for d in digits[-2::-1]:
            facc, qp = dblk(facc, qp, P.x, P.y, inf_mask)
            if d != 0:
                ay = q_neg_y if d == -1 else QY
                facc, qp = addk(facc, qp, QX, ay, P.x, P.y, inf_mask)
    else:
        # traced: lax.scan over the (static) digit array so the graph is
        # O(1) in loop length. The add-branch runs every iteration but is
        # select-masked — ~30% redundant lane work for constant control
        # flow (MSB is digits[-1] == 1).
        dig_arr = jnp.asarray(digits[-2::-1], jnp.int32)

        def body(state, d):
            facc, qp = state
            facc = e12.square(facc)
            qp, line = ctx.double_step(qp)
            facc = line_mul(facc, line)
            ay = e2.where(d == -1, q_neg_y, QY)
            qp_add, line_add = ctx.add_mixed_step(qp, QX, ay)
            has_add = d != 0
            facc_add = line_mul(facc, line_add)
            facc = e12.where(has_add, facc_add, facc)
            qp = G2Proj(*(e2.where(has_add, a, b)
                          for a, b in zip(qp_add, qp)))
            return (facc, qp), None

        (facc, qp), _ = jax.lax.scan(body, (facc, q), dig_arr)

    if ctx.family == "bn":
        # terminal lines with Q1 = pi(Q), Q2 = -pi^2(Q) (pairing.go:256-286)
        q1x, q1y = ctx.psi_coords(QX, QY)
        q2x, q2y = ctx.psi2_coords(QX, QY)
        qp, line = ctx.add_mixed_step(qp, q1x, q1y)
        facc = line_mul(facc, line)
        line = ctx.line_compute(qp, q2x, q2y)
        facc = line_mul(facc, line)
    elif ctx.seed_neg:
        # f_{-x} = conj(f_x) after final exp; reference conjugates here
        facc = tw.conjugate(facc)

    # product over pairs (pairwise tree)
    while facc.shape[0] > 1:
        m = facc.shape[0]
        half = m // 2
        red = e12.mul(facc[:half], facc[half : 2 * half])
        facc = (jnp.concatenate([red, facc[2 * half :]], 0)
                if m % 2 else red)
    return facc[0]


def final_exponentiation(ctx: PairingCtx, z):
    """Full-group exponentiation to the unique r-th power residue class
    ((p^k-1)/r; pairing.go:52 FinalExponentiation)."""
    tw = ctx.tower
    e12 = tw.e12
    # easy part: conj = p^(k/2) power; then (p^(k/4 or k/6...)+1) via the
    # family's even Frobenius
    t0 = tw.conjugate(z)
    zi = e12.inverse(z)
    t0 = e12.mul(t0, zi)
    if ctx.family == "bls24":
        # (p^12-1)(p^4+1) (bls24 pairing.go:64-69)
        r = e12.mul(tw.frobenius_quad(t0), t0)
    else:
        r = e12.mul(tw.frobenius_square(t0), t0)

    if ctx.family == "bn":
        return _hard_part_bn(ctx, r)
    if ctx.family == "bls24":
        return _hard_part_bls24(ctx, r)
    return _hard_part_bls12(ctx, r)


def _expt(ctx: PairingCtx, x):
    """x^|seed| in the cyclotomic subgroup (e12_pairing.go Expt)."""
    return ctx.tower.exp_cyclotomic(x, ctx.seed)


def _hard_part_bn(ctx: PairingCtx, result):
    """Fuentes et al. alg. 6 — exact sequence of pairing.go:79-105."""
    tw = ctx.tower
    e12 = tw.e12
    t0 = tw.conjugate(_expt(ctx, result))
    t0 = tw.cyclotomic_square(t0)
    t1 = tw.cyclotomic_square(t0)
    t1 = e12.mul(t0, t1)
    t2 = tw.conjugate(_expt(ctx, t1))
    t3 = tw.conjugate(t1)
    t1 = e12.mul(t2, t3)
    t3 = tw.cyclotomic_square(t2)
    t4 = _expt(ctx, t3)
    t4 = e12.mul(t1, t4)
    t3 = e12.mul(t0, t4)
    t0 = e12.mul(t2, t4)
    t0 = e12.mul(result, t0)
    t2 = tw.frobenius(t3)
    t0 = e12.mul(t2, t0)
    t2 = tw.frobenius_square(t4)
    t0 = e12.mul(t2, t0)
    t2 = tw.conjugate(result)
    t2 = e12.mul(t2, t3)
    t2 = tw.frobenius_cube(t2)
    return e12.mul(t2, t0)


def _hard_part_bls12(ctx: PairingCtx, result):
    """BLS12 hard part — Hayashida-Hayasaka-Teruya (eprint 2020/875);
    exact op sequence of bls12-381/pairing.go:76-96 (the reference's
    t1 = ExptHalf(result^2) there equals Expt(result), used uniformly here
    so odd seeds like bls12-377's work too)."""
    tw = ctx.tower
    e12 = tw.e12

    def expt_signed(x):
        # x^x0 including the seed sign (gnark Expt conjugates internally for
        # negative seeds, e12_pairing.go:36-38)
        y = _expt(ctx, x)
        return tw.conjugate(y) if ctx.seed_neg else y

    t0 = tw.cyclotomic_square(result)
    t1 = expt_signed(result)
    t2 = tw.conjugate(result)
    t1 = e12.mul(t1, t2)
    t2 = expt_signed(t1)
    t1 = tw.conjugate(t1)
    t1 = e12.mul(t1, t2)
    t2 = expt_signed(t1)
    t1 = tw.frobenius(t1)
    t1 = e12.mul(t1, t2)
    result = e12.mul(result, t0)
    t0 = expt_signed(t1)
    t2 = expt_signed(t0)
    t0 = tw.frobenius_square(t1)
    t1 = tw.conjugate(t1)
    t1 = e12.mul(t1, t2)
    t1 = e12.mul(t1, t0)
    return e12.mul(result, t1)


def pair(name: str, P: Affine, QX, QY):
    """Reduced pairing prod_i e(P_i, Q_i) (reference Pair, pairing.go:26).

    On TPU (eager) the whole pairing runs as 1-2 VM-kernel dispatches
    (pairing/vm_pairing.py) — the step-kernel ladder below is ~1500
    dispatch-latency-bound round trips through the tunnel. Escape hatch:
    GNARK_TPU_NO_VM_PAIRING=1."""
    import os

    from gnark_crypto_tpu.utils import hostloop
    if (name in ("bn254", "bls12_381", "bls12_377", "bls24_315",
                 "bls24_317")
            and jax.default_backend() == "tpu"
            and not hostloop.is_tracing(P, QX, QY)
            and os.environ.get("GNARK_TPU_NO_VM_PAIRING") != "1"):
        from gnark_crypto_tpu.pairing.vm_pairing import try_pair_vm
        out = try_pair_vm(name, P, QX, QY)
        if out is not None:
            return out   # else: VM compile failed, eager fallback below
    ctx = get_ctx(name)
    f = miller_loop(ctx, P, QX, QY)
    return final_exponentiation(ctx, f)


def pairing_check(name: str, P: Affine, QX, QY):
    """prod e(P_i, Q_i) == 1 (reference PairingCheck, pairing.go:38)."""
    ctx = get_ctx(name)
    g = pair(name, P, QX, QY)
    e12 = ctx.tower.e12
    one = e12.ones()
    return e12.equal(g, one)


def _hard_part_bls24(ctx: PairingCtx, result):
    """BLS24 hard part — Hayashida-Hayasaka-Teruya (eprint 2020/875):
    3(p^8-p^4+1)/r = (x-1)^2 (x+p)(x^2+p^2)(x^4+p^4-1) + 3
    (exact op sequence of bls24-315 pairing.go:77-105)."""
    tw = ctx.tower
    e24 = tw.e12

    def expt_signed(x):
        y = _expt(ctx, x)
        return tw.conjugate(y) if ctx.seed_neg else y

    t0 = tw.cyclotomic_square(result)
    t1 = expt_signed(result)
    t2 = tw.conjugate(result)
    t1 = e24.mul(t1, t2)
    t2 = expt_signed(t1)
    t1 = tw.conjugate(t1)
    t1 = e24.mul(t1, t2)
    t2 = expt_signed(t1)
    t1 = tw.frobenius(t1)
    t1 = e24.mul(t1, t2)
    result = e24.mul(result, t0)
    t0 = expt_signed(t1)
    t2 = expt_signed(t0)
    t0 = tw.frobenius_square(t1)
    t2 = e24.mul(t0, t2)
    t1 = expt_signed(t2)
    t1 = expt_signed(t1)
    t1 = expt_signed(t1)
    t1 = expt_signed(t1)
    t0 = tw.frobenius_quad(t2)
    t0 = e24.mul(t0, t1)
    t2 = tw.conjugate(t2)
    t0 = e24.mul(t0, t2)
    return e24.mul(result, t0)
