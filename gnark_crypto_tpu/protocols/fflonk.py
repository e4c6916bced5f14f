"""Fflonk: FFT-style polynomial folding + shplonk openings on extended root
sets (counterpart of ``ecc/<curve>/fflonk/fflonk.go``).

Fold(p) = sum_i P_i(X^t) X^i with t the smallest divisor of r-1 bounding
len(p) (fflonk.go:53); opening a pack on S becomes opening the folded
polynomial on <s, w s, ..., w^{t-1} s> for each s in S with w a t-th root of
unity (fflonk.go:131 extendSet).
"""

from __future__ import annotations

import dataclasses

from gnark_crypto_tpu.curve.jacobian import curve_ops
from gnark_crypto_tpu.protocols import shplonk
from gnark_crypto_tpu.protocols.shplonk import _peval
from gnark_crypto_tpu.specs import curve as cs


@dataclasses.dataclass
class OpeningProof:
    s_proof: shplonk.OpeningProof
    claimed_values: list[list[list[int]]]


def _fr(name):
    return curve_ops(cs.get_curve(f"{name}_g1")).spec.fr


def next_divisor_r_minus_one(name: str, i: int) -> int:
    """Smallest t >= i with t | r-1 (fflonk.go getNextDivisorRMinusOne)."""
    r1 = _fr(name).modulus - 1
    t = i
    while r1 % t:
        t += 1
    return t


def ith_root_one(name: str, i: int) -> int:
    """Generator of the order-i subgroup (fflonk.go:213 getIthRootOne)."""
    spec = _fr(name)
    r1 = spec.modulus - 1
    if r1 % i:
        raise ValueError("i does not divide r-1")
    return pow(spec.generator, r1 // i, spec.modulus)


def fold(name: str, polys: list[list[int]]) -> list[int]:
    """sum_i P_i(X^t) X^i (fflonk.go:53 Fold)."""
    t = next_divisor_r_minus_one(name, len(polys))
    size = max(len(p) for p in polys) * t
    buf = [0] * size
    for i, p in enumerate(polys):
        for j, c in enumerate(p):
            buf[j * t + i] = c
    return buf


def fold_and_commit(name: str, pk, polys: list[list[int]]):
    g1c = curve_ops(cs.get_curve(f"{name}_g1"))
    coeffs = fold(name, polys)
    return shplonk._commit_host(name, pk, coeffs, g1c.spec.fr.modulus, g1c)


def _extend_set(name: str, points: list[int], t: int) -> list[int]:
    """<s, ws, ..., w^{t-1}s> for each s (fflonk extendSet)."""
    r = _fr(name).modulus
    w = ith_root_one(name, t)
    out = []
    for s in points:
        cur = s
        for _ in range(t):
            out.append(cur)
            cur = cur * w % r
    return out


def batch_open(name: str, pk, packs: list[list[list[int]]], digests,
               points: list[list[int]]) -> OpeningProof:
    """fflonk.go:77 BatchOpen."""
    r = _fr(name).modulus
    claimed = []
    folded = []
    new_points = []
    for pack, si in zip(packs, points):
        t = next_divisor_r_minus_one(name, len(pack))
        powers = [pow(s, t, r) for s in si]
        cv = [[_peval(p, x, r) for x in powers] for p in pack]
        cv += [[0] * len(si) for _ in range(t - len(pack))]
        claimed.append(cv)
        folded.append(fold(name, pack))
        new_points.append(_extend_set(name, si, t))
    sp = shplonk.batch_open(name, pk, folded, digests, new_points)
    return OpeningProof(s_proof=sp, claimed_values=claimed)


def batch_verify(name: str, proof: OpeningProof, digests,
                 points: list[list[int]], vk) -> bool:
    """fflonk.go:146 BatchVerify: folding consistency + embedded shplonk."""
    r = _fr(name).modulus
    for i, cvs in enumerate(proof.claimed_values):
        t = len(cvs)
        w = ith_root_one(name, t)
        size_si = len(cvs[0])
        if t * size_si != len(proof.s_proof.claimed_values[i]):
            return False
        for j in range(size_si):
            col = [cvs[k][j] for k in range(t)]
            pt = points[i][j]
            for l in range(t):
                want = _peval(col, pt, r)
                if want != proof.s_proof.claimed_values[i][j * t + l]:
                    return False
                pt = pt * w % r
    extended = [_extend_set(name, points[i], len(proof.claimed_values[i]))
                for i in range(len(points))]
    import numpy as np

    return bool(np.asarray(shplonk.batch_verify(
        name, proof.s_proof, digests, extended, vk)))
