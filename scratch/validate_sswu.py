"""Validate the SSWU isogeny tables: a point on the iso-curve
(y^2 = x^3 + A x + B) must map through the isogeny polynomials to a point
on the target curve (y'^2 = x'^3 + b').

Identity checked (exact python ints, y^2 substituted so no square roots):
    y2 * yn(x)^2 * xd(x)^3 == (xn(x)^3 + b' xd(x)^3) * yd(x)^2
with y2 = x^3 + A x + B, for random x. E2 arithmetic for the G2-over-Fp2
table. Usage: PYTHONPATH=/root/repo python scratch/validate_sswu.py
"""
import os
import random

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

from gnark_crypto_tpu.curve.g2 import g2_curve
from gnark_crypto_tpu.hashes import sswu_tables as st
from gnark_crypto_tpu.specs.curve import get_curve

# table name -> (curve, group, E2 nonresidue if the table is over Fp2)
CFG = {
    "BLS12_377_G2": ("bls12_377", 2, -5),
    "BLS24_315_G1": ("bls24_315", 1, None),
    "BLS24_317_G1": ("bls24_317", 1, None),
    "BW6_761_G1": ("bw6_761", 1, None),
    "BW6_761_G2": ("bw6_761", 2, None),  # bw6 G2 is over fp as well
    "BW6_633_G1": ("bw6_633", 1, None),
    "BW6_633_G2": ("bw6_633", 2, None),
}


class Fp:
    def __init__(self, p):
        self.p = p
        self.one = 1

    def add(self, a, b):
        return (a + b) % self.p

    def mul(self, a, b):
        return a * b % self.p


class E2:
    """Fp2 = Fp[u]/(u^2 - nr)."""

    def __init__(self, p, nr):
        self.p = p
        self.nr = nr % p
        self.one = (1, 0)

    def add(self, a, b):
        return ((a[0] + b[0]) % self.p, (a[1] + b[1]) % self.p)

    def mul(self, a, b):
        p, nr = self.p, self.nr
        return ((a[0] * b[0] + nr * a[1] * b[1]) % p,
                (a[0] * b[1] + a[1] * b[0]) % p)


def evalp(F, coeffs, x):
    acc = coeffs[-1]
    for c in reversed(coeffs[:-1]):
        acc = F.add(F.mul(acc, x), c)
    return acc


def target_b(curve, g, F, is_e2):
    """b' of the target curve, read off its generator: b' = y^2 - x^3."""
    if g == 1:
        spec = get_curve(f"{curve}_g1")
        return spec.b % spec.fp.modulus
    g2c = g2_curve(curve)
    gx = g2c.fp.to_int(g2c.generator_affine().x)
    gy = g2c.fp.to_int(g2c.generator_affine().y)
    if is_e2:
        gx, gy = tuple(gx), tuple(gy)
    neg = F.mul(F.mul(gx, gx), gx)
    y2 = F.mul(gy, gy)
    if is_e2:
        return ((y2[0] - neg[0]) % F.p, (y2[1] - neg[1]) % F.p)
    return (y2 - neg) % F.p


def validate(name):
    curve, g, nr = CFG[name]
    t = getattr(st, name)
    p = get_curve(f"{curve}_g1").fp.modulus
    is_e2 = nr is not None
    F = E2(p, nr) if is_e2 else Fp(p)
    bprime = target_b(curve, g, F, is_e2)
    A, B = t["A"], t["B"]
    assert isinstance(A, tuple) == is_e2, "table/config mismatch"

    rng = random.Random(7)
    for trial in range(4):
        if is_e2:
            x = (rng.randrange(p), rng.randrange(p))
        else:
            x = rng.randrange(p)
        y2 = F.add(F.add(F.mul(F.mul(x, x), x), F.mul(A, x)), B)
        xn = evalp(F, t["xnum"], x)
        xd = evalp(F, tuple(t["xden"]) + (F.one,), x)  # monic denominators
        yn = evalp(F, t["ynum"], x)
        yd = evalp(F, tuple(t["yden"]) + (F.one,), x)
        xd3 = F.mul(F.mul(xd, xd), xd)
        lhs = F.mul(F.mul(y2, F.mul(yn, yn)), xd3)
        rhs = F.mul(F.add(F.mul(F.mul(xn, xn), xn), F.mul(bprime, xd3)),
                    F.mul(yd, yd))
        assert lhs == rhs, (name, trial)
    print(f"{name}: isogeny identity holds (4 random points)")


for nm in CFG:
    validate(nm)
print("ALL SSWU TABLES VALID")
