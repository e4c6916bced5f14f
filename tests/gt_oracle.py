"""Independent exact-arithmetic pairing oracle (pure Python big ints).

Purpose: prove the device pairing stack (Montgomery limb kernels, tower
engines, projective Miller loops, final-exp addition chains) bit-exact,
by re-computing each family's pairing in a COMPLETELY different way:

  * Fp^k is a single-variable polynomial ring Fp[w]/(m(w)) — no towers,
    no sparse lines, no lane packing;
  * Q is untwisted into E(Fp^k) via the canonical tower generator and the
    Miller loop runs in textbook affine coordinates over the ring;
  * the final exponentiation is ONE direct ``pow`` with the documented
    exponent d = s * (p^k - 1)/r (cofactors from the reference comments:
    bn254 pairing.go:48-51, bls12/bls24 pairing.go:49-51,
    bw6-761 pairing.go:58-61, bw6-633 pairing.go:49-51) — validating the
    Karabina/Fuentes/ElHousni hard-part chains against plain square-multiply.

Verticals and subfield normalization factors are omitted: any factor in
the half-degree subfield F_{p^{k/2}} dies in the easy part (x^{p^{k/2}-1}).

Pairing variants implemented (matching the reference's functions):
  * BN:    f_{6x+2,Q}(P) * l_{T,piQ}(P) * l_{T+piQ,-pi2Q}(P)
  * BLS:   f_{x,Q}(P)  (inverse for negative seeds; == conjugate after FE)
  * BW6:   f_{a0,Q}(P) * f_{a1,Q}(P)^p  with a0 + p*a1 == 0 mod r
           (the connecting line is vertical, hence dropped)
"""

from __future__ import annotations

import functools


# ---------------------------------------------------------------------------
# Fp[w]/(m(w)) — minimal dense polynomial quotient ring
# ---------------------------------------------------------------------------

class Ring:
    """Fp[w]/(m(w)) with m monic of degree k, given as {deg: coeff} for the
    non-leading terms (i.e. w^k = -sum coeff*w^deg)."""

    def __init__(self, p: int, k: int, m_tail: dict[int, int]):
        self.p = p
        self.k = k
        # w^k = red[deg] * w^deg summed
        self.red = {d: (-c) % p for d, c in m_tail.items()}
        self.one = self.el({0: 1})
        self.zero = (0,) * k

    def el(self, mono: dict[int, int]):
        v = [0] * self.k
        for d, c in mono.items():
            v[d] = c % self.p
        return tuple(v)

    def add(self, a, b):
        p = self.p
        return tuple((x + y) % p for x, y in zip(a, b))

    def sub(self, a, b):
        p = self.p
        return tuple((x - y) % p for x, y in zip(a, b))

    def neg(self, a):
        p = self.p
        return tuple((-x) % p for x in a)

    def scal(self, a, c: int):
        p = self.p
        c %= p
        return tuple((x * c) % p for x in a)

    def mul(self, a, b):
        p, k = self.p, self.k
        prod = [0] * (2 * k - 1)
        for i, ai in enumerate(a):
            if ai:
                for j, bj in enumerate(b):
                    prod[i + j] += ai * bj
        # reduce degrees >= k, highest first
        for d in range(2 * k - 2, k - 1, -1):
            c = prod[d] % p
            if c:
                for rd, rc in self.red.items():
                    prod[d - k + rd] += c * rc
            prod[d] = 0
        return tuple(x % p for x in prod[:k])

    def square(self, a):
        return self.mul(a, a)

    def inv(self, a):
        return self._inv_clean(a)

    def _inv_clean(self, a):
        """Extended Euclid in Fp[x] against m(x)."""
        p, k = self.p, self.k
        m = [(-self.red.get(d, 0)) % p for d in range(k)] + [1]

        def deg(f):
            for i in range(len(f) - 1, -1, -1):
                if f[i]:
                    return i
            return -1

        def trim(f):
            return [x % p for x in f]

        r0, r1 = trim(m), trim(list(a))
        t0, t1 = [0], [1]
        while True:
            d1 = deg(r1)
            if d1 < 0:
                raise ZeroDivisionError("not invertible")
            if d1 == 0:
                c = pow(r1[0], -1, p)
                out = [(x * c) % p for x in t1]
                out += [0] * (k - len(out))
                return tuple(out[:k])
            # r0 = q*r1 + r2
            d0 = deg(r0)
            q = [0] * (d0 - d1 + 1)
            r2 = list(r0)
            inv_lead = pow(r1[d1], -1, p)
            for d in range(d0, d1 - 1, -1):
                c = (r2[d] * inv_lead) % p
                if c:
                    q[d - d1] = c
                    for i in range(d1 + 1):
                        r2[i + d - d1] = (r2[i + d - d1] - c * r1[i]) % p
            # t2 = t0 - q*t1
            t2 = list(t0) + [0] * max(0, len(q) + len(t1) - 1 - len(t0))
            for i, qi in enumerate(q):
                if qi:
                    for j, tj in enumerate(t1):
                        t2[i + j] = (t2[i + j] - qi * tj) % p
            r0, r1 = r1, r2
            t0, t1 = t1, t2

    def pow(self, a, e: int):
        if e < 0:
            return self.pow(self._inv_clean(a), -e)
        r = self.one
        while e:
            if e & 1:
                r = self.mul(r, a)
            a = self.square(a)
            e >>= 1
        return r


# ---------------------------------------------------------------------------
# affine curve ops + Miller loop over the ring
# ---------------------------------------------------------------------------

def _ec_double(R: Ring, t):
    x, y = t
    lam = R.mul(R.scal(R.square(x), 3), R._inv_clean(R.scal(y, 2)))
    x3 = R.sub(R.square(lam), R.scal(x, 2))
    y3 = R.sub(R.mul(lam, R.sub(x, x3)), y)
    return (x3, y3), lam


def _ec_add(R: Ring, t, q):
    xt, yt = t
    xq, yq = q
    lam = R.mul(R.sub(yq, yt), R._inv_clean(R.sub(xq, xt)))
    x3 = R.sub(R.sub(R.square(lam), xt), xq)
    y3 = R.sub(R.mul(lam, R.sub(xt, x3)), yt)
    return (x3, y3), lam


def _line_val(R: Ring, point, lam, xp, yp):
    """(yP - yA) - lam*(xP - xA), the (non-vertical) line through A."""
    xa, ya = point
    return R.sub(R.sub(yp, ya), R.mul(lam, R.sub(xp, xa)))


def miller_f(R: Ring, n: int, q, xp, yp):
    """f_{n,Q}(P) for n > 0, textbook MSB double-and-add (no verticals);
    returns (f, [n]Q)."""
    assert n > 0
    t = q
    f = R.one
    for bit in bin(n)[3:]:
        (t2, lam) = _ec_double(R, t)
        f = R.mul(R.square(f), _line_val(R, t, lam, xp, yp))
        t = t2
        if bit == "1":
            (t2, lam) = _ec_add(R, t, q)
            f = R.mul(f, _line_val(R, t, lam, xp, yp))
            t = t2
    return f, t


# ---------------------------------------------------------------------------
# family configurations
# ---------------------------------------------------------------------------

def _cfg(name: str):
    """(ring, tower-basis monomials, untwist exponent sign, loop spec)."""
    from gnark_crypto_tpu.specs import curve as cs

    g1 = cs.get_curve(f"{name}_g1")
    p, r = g1.fp.modulus, g1.fr.modulus

    if name in ("bn254", "bls12_381", "bls12_377"):
        k = 12
        if name == "bn254":
            m_tail = {6: -18, 0: 82}       # (w^6-9)^2 = -1
            u_poly = {6: 1, 0: -9}
            x0, neg = 4965661367192848881, False
        elif name == "bls12_381":
            m_tail = {6: -2, 0: 2}         # (w^6-1)^2 = -1
            u_poly = {6: 1, 0: -1}
            x0, neg = 15132376222941642752, True
        else:
            m_tail = {0: 5}                # w^12 = -5 (u = w^6, u^2 = -5)
            u_poly = {6: 1}
            x0, neg = 9586122913090633729, False
        R = Ring(p, k, m_tail)
        u = R.el(u_poly)
        # tower monomial for coeff (c, b, a): w^c * (w^2)^b * u^a
        basis = []
        for c in range(2):
            for b in range(3):
                for a in range(2):
                    mono = R.el({c + 2 * b: 1})
                    if a:
                        mono = R.mul(mono, u)
                    basis.append(mono)
        # untwist: D-twist x*w^2, y*w^3; M-twist x/w^2, y/w^3
        tw = {"bn254": 1, "bls12_381": -1, "bls12_377": 1}[name]
        fam = "bn" if name == "bn254" else "bls"
        return R, basis, tw, dict(family=fam, x0=x0, neg=neg, p=p, r=r,
                                  s=(2 * x0 * (6 * x0 * x0 + 3 * x0 + 1)
                                     if fam == "bn" else 3))

    if name in ("bls24_315", "bls24_317"):
        k = 24
        if name == "bls24_315":
            m_tail = {0: -13}              # theta^24 = 13 (u^2 = 13)
            u_poly = {12: 1}
            x0, neg = 3218079743, True
            tw = 1                          # D-twist: z = theta
        else:
            m_tail = {12: -2, 0: 2}        # (theta^12-1)^2 = -1
            u_poly = {12: 1, 0: -1}
            x0, neg = 3640754176, False
            tw = -1                         # M-twist: z = 1/theta
        R = Ring(p, k, m_tail)
        u = R.el(u_poly)
        # coeff (d, c, b, a): theta^(d + 2c + 6b) * u^a
        basis = []
        for d in range(2):
            for c in range(3):
                for b in range(2):
                    for a in range(2):
                        mono = R.el({d + 2 * c + 6 * b: 1})
                        if a:
                            mono = R.mul(mono, u)
                        basis.append(mono)
        return R, basis, tw, dict(family="bls", x0=x0, neg=neg, p=p, r=r,
                                  s=3)

    if name in ("bw6_761", "bw6_633"):
        k = 6
        # a0 pairs with Q, a1 with the lambda endomorphism (the reference's
        # scaled-by-3 digit row carries the lambda component: bw6-761
        # j = 3*L1+L0, bw6-633 j = 3*L0+L1 — so the roles swap for 633)
        if name == "bw6_761":
            m_tail = {0: 4}                # v^6 = -4 (u^3 = -4, v^2 = u)
            x0 = 9586122913090633729
            a0, a1 = x0 + 1, x0 ** 3 - x0 ** 2 - x0
            s = x0 + 1
        else:
            m_tail = {0: -2}               # v^6 = 2 (u^3 = 2)
            x0 = -3218079743
            a0, a1 = x0 ** 5 - x0 ** 4 - x0, x0 + 1
            s = x0 ** 5 - x0 ** 4 - x0
        R = Ring(p, k, m_tail)
        # coeff (b, a): v^b * u^a = v^(b + 2a)
        basis = [R.el({b + 2 * a: 1}) for b in range(2) for a in range(3)]
        # both bw6 are M-twists with z = 1/v (z^6 = b/b')
        assert (a0 + p * a1) % r == 0, "optimal-ate relation"
        return R, basis, -1, dict(family="bw6", a0=a0, a1=a1, p=p, r=r, s=s)

    raise KeyError(name)


def tower_to_ring(R: Ring, basis, coeffs):
    out = R.zero
    for c, mono in zip(coeffs, basis):
        out = R.add(out, R.scal(mono, c))
    return out


@functools.lru_cache(maxsize=None)
def _basis_inv(name: str):
    """Gaussian-eliminated inverse of the tower-basis matrix mod p."""
    R, basis, _, _ = _cfg(name)
    p, k = R.p, R.k
    # columns = basis monomials in power coords
    mat = [[basis[j][i] for j in range(k)] + [1 if i == j2 else 0
           for j2 in range(k)] for i in range(k)]
    for col in range(k):
        piv = next(r for r in range(col, k) if mat[r][col] % p)
        mat[col], mat[piv] = mat[piv], mat[col]
        inv = pow(mat[col][col], -1, p)
        mat[col] = [(x * inv) % p for x in mat[col]]
        for r2 in range(k):
            if r2 != col and mat[r2][col]:
                c = mat[r2][col]
                mat[r2] = [(x - c * y) % p
                           for x, y in zip(mat[r2], mat[col])]
    return [row[k:] for row in mat]


def ring_to_tower(name: str, v):
    R, _, _, _ = _cfg(name)
    inv = _basis_inv(name)
    p, k = R.p, R.k
    return [sum(inv[i][j] * v[j] for j in range(k)) % p for i in range(k)]


# ---------------------------------------------------------------------------
# the oracle pairing
# ---------------------------------------------------------------------------

def untwist(name: str, q_coeffs_x, q_coeffs_y):
    """G2' tower coords -> affine point on E(Fp^k) via the canonical
    generator z (z = w for D twists, 1/w for M twists)."""
    R, basis, tw, _ = _cfg(name)
    d = R.k // 6  # sub-basis size per G2 coordinate (E2=2, E4=4, Fp=1)
    xb = [basis[i] for i in range(d)]
    x = tower_to_ring(R, xb, q_coeffs_x)
    y = tower_to_ring(R, xb, q_coeffs_y)
    w = R.el({1: 1})
    if tw < 0:
        w = R._inv_clean(w)
    return (R.mul(x, R.square(w)), R.mul(y, R.mul(w, R.square(w))))


def frobenius_point(R: Ring, pt, p: int):
    return (R.pow(pt[0], p), R.pow(pt[1], p))


def pair_oracle(name: str, p_xy, q_tower_xy):
    """e(P, Q): P = (x, y) ints on G1; Q = tower-coefficient int lists.
    Returns the GT element as flat tower coefficients (natural ravel)."""
    R, basis, _, par = _cfg(name)
    p, r = par["p"], par["r"]
    xp = R.el({0: p_xy[0]})
    yp = R.el({0: p_xy[1]})
    qt = untwist(name, q_tower_xy[0], q_tower_xy[1])

    if par["family"] == "bls":
        assert (par["x0"] * (-1 if par["neg"] else 1) - p) % r == 0
        f, _ = miller_f(R, par["x0"], qt, xp, yp)
        if par["neg"]:
            f = R._inv_clean(f)
    elif par["family"] == "bn":
        x0 = par["x0"]
        assert (6 * x0 + 2 + p - p * p + p ** 3) % r == 0
        f, t = miller_f(R, 6 * x0 + 2, qt, xp, yp)
        q1 = frobenius_point(R, qt, p)
        q2 = frobenius_point(R, q1, p)
        q2 = (q2[0], R.neg(q2[1]))
        (t2, lam) = _ec_add(R, t, q1)
        f = R.mul(f, _line_val(R, t, lam, xp, yp))
        (_, lam) = _ec_add(R, t2, q2)
        f = R.mul(f, _line_val(R, t2, lam, xp, yp))
    else:  # bw6
        a0, a1 = par["a0"], par["a1"]
        f0, _ = miller_f(R, abs(a0), qt, xp, yp)
        if a0 < 0:
            f0 = R._inv_clean(f0)
        f1, _ = miller_f(R, abs(a1), qt, xp, yp)
        if a1 < 0:
            f1 = R._inv_clean(f1)
        f = R.mul(f0, R.pow(f1, p))

    d = par["s"] * ((p ** R.k - 1) // r)
    z = R.pow(f, d)
    return ring_to_tower(name, z)
