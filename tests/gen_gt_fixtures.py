"""Generate golden GT fixtures from the independent exact-arithmetic oracle.

Writes tests/fixtures/gt_golden.json: for every pairing family, the gnark
``GT.Bytes()`` encoding of e(P, Q) for two vectors —
  v1: (G1 generator, G2 generator)
  v2: ([5]G1, [7]G2)
computed ENTIRELY in pure-Python big-int arithmetic (tests/gt_oracle.py:
single-variable quotient ring, textbook affine Miller loop, direct-pow
final exponentiation). The scalar multiples are computed on the UNTWISTED
curve inside the ring, so no device code is involved anywhere.

Run: PYTHONPATH=/root/repo python tests/gen_gt_fixtures.py
"""

from __future__ import annotations

import json
import os

from tests.gt_oracle import (Ring, _cfg, _ec_add, _ec_double, pair_oracle,
                             untwist)

FAMILIES = ("bn254", "bls12_381", "bls12_377", "bls24_315", "bls24_317",
            "bw6_761", "bw6_633")


def _g2_tower_coords(name):
    from gnark_crypto_tpu.specs import curve as cs

    if name.startswith("bw6"):
        s = cs.get_curve(f"{name}_g2")
        return [s.gx], [s.gy]
    from gnark_crypto_tpu.curve.g2 import _G2

    g = _G2[name]

    def flat(c):
        if isinstance(c[0], tuple):
            return [c[0][0], c[0][1], c[1][0], c[1][1]]
        return [c[0], c[1]]

    return flat(g["gx"]), flat(g["gy"])


def _ring_scalar_mul(R: Ring, pt, k: int):
    acc = None
    add = pt
    while k:
        if k & 1:
            acc = add if acc is None else _ec_add(R, acc, add)[0]
        add = _ec_double(R, add)[0]
        k >>= 1
    return acc


def _tower_bytes(name: str, coeffs) -> str:
    """Flat tower coefficient ints -> gnark GT byte encoding (hex)."""
    from gnark_crypto_tpu.io.gt_bytes import _GT_LAYOUT, _fp_spec

    n, natural = _GT_LAYOUT[name]
    spec = _fp_spec(name)
    nb = spec.n_bytes
    order = range(n) if natural else range(n - 1, -1, -1)
    return b"".join(coeffs[j].to_bytes(nb, "big") for j in order).hex()


def pair_oracle_points(name, p_pt, q_untwisted):
    """pair_oracle but with an already-untwisted (possibly multiplied) Q."""
    import tests.gt_oracle as go

    R, basis, _, par = _cfg(name)
    p, r = par["p"], par["r"]
    xp, yp = R.el({0: p_pt[0]}), R.el({0: p_pt[1]})

    if par["family"] == "bls":
        f, _ = go.miller_f(R, par["x0"], q_untwisted, xp, yp)
        if par["neg"]:
            f = R._inv_clean(f)
    elif par["family"] == "bn":
        x0 = par["x0"]
        f, t = go.miller_f(R, 6 * x0 + 2, q_untwisted, xp, yp)
        q1 = go.frobenius_point(R, q_untwisted, p)
        q2 = go.frobenius_point(R, q1, p)
        q2 = (q2[0], R.neg(q2[1]))
        (t2, lam) = go._ec_add(R, t, q1)
        f = R.mul(f, go._line_val(R, t, lam, xp, yp))
        (_, lam) = go._ec_add(R, t2, q2)
        f = R.mul(f, go._line_val(R, t2, lam, xp, yp))
    else:
        a0, a1 = par["a0"], par["a1"]
        f0, _ = go.miller_f(R, abs(a0), q_untwisted, xp, yp)
        if a0 < 0:
            f0 = R._inv_clean(f0)
        f1, _ = go.miller_f(R, abs(a1), q_untwisted, xp, yp)
        if a1 < 0:
            f1 = R._inv_clean(f1)
        f = R.mul(f0, R.pow(f1, p))

    d = par["s"] * ((p ** R.k - 1) // r)
    return go.ring_to_tower(name, R.pow(f, d))


def main():
    from gnark_crypto_tpu.specs import curve as cs

    out = {}
    for name in FAMILIES:
        R, basis, _, par = _cfg(name)
        g1 = cs.get_curve(f"{name}_g1")
        p = g1.fp.modulus
        qx, qy = _g2_tower_coords(name)
        gx, gy = g1.gx % p, g1.gy % p

        z1 = pair_oracle(name, (gx, gy), (qx, qy))
        v1 = _tower_bytes(name, z1)

        # v2: [5]P on G1 (ring-embedded), [7]Q on the untwisted curve
        p_pt = (R.el({0: gx}), R.el({0: gy}))
        p5 = _ring_scalar_mul(R, p_pt, 5)
        # [5]P stays in Fp: extract scalar coords
        assert all(c == 0 for c in p5[0][1:]) and \
            all(c == 0 for c in p5[1][1:])
        qt = untwist(name, qx, qy)
        q7 = _ring_scalar_mul(R, qt, 7)
        z2 = pair_oracle_points(name, (p5[0][0], p5[1][0]), q7)
        v2 = _tower_bytes(name, z2)

        out[name] = {"generator": v1, "p5_q7": v2}
        print(f"{name}: ok", flush=True)

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "gt_golden.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", path)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
