"""Shplonk: batch KZG openings at distinct point sets (eprint 2020/081).

Counterpart of ``ecc/<curve>/shplonk/shplonk.go``: same transcript layout
("gamma", "z" challenges bound to points/digests, shplonk.go:286), same W /
W' construction (shplonk.go:45 BatchOpen) and the
  e(F + z*W', G2) == e(W', [x]G2)
check (shplonk.go:267). Small-degree polynomial bookkeeping (vanishing
polys, interpolation — degree = #points) runs on the host with exact ints;
all commitments ride the device MSM.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from gnark_crypto_tpu.curve.jacobian import Affine, Jac, curve_ops
from gnark_crypto_tpu.hashes.fiat_shamir import Transcript
from gnark_crypto_tpu.msm.pippenger import msm
from gnark_crypto_tpu.pairing import api as pairing_api
from gnark_crypto_tpu.protocols import kzg
from gnark_crypto_tpu.specs import curve as cs


@dataclasses.dataclass
class OpeningProof:
    w: Affine
    w_prime: Affine
    claimed_values: list[list[int]]


# -- host polynomial helpers (coeff lists of ints mod r) ---------------------

def _pmul(a, b, r):
    out = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        if ai:
            for j, bj in enumerate(b):
                out[i + j] = (out[i + j] + ai * bj) % r
    return out


def _psub(a, b, r):
    n = max(len(a), len(b))
    return [((a[i] if i < len(a) else 0) - (b[i] if i < len(b) else 0)) % r
            for i in range(n)]


def _padd(a, b, r):
    n = max(len(a), len(b))
    return [((a[i] if i < len(a) else 0) + (b[i] if i < len(b) else 0)) % r
            for i in range(n)]


def _pscale(a, c, r):
    return [v * c % r for v in a]


def _peval(a, x, r):
    acc = 0
    for c in reversed(a):
        acc = (acc * x + c) % r
    return acc


def _vanishing(points, r):
    """prod (X - p) (shplonk buildVanishingPoly)."""
    poly = [1]
    for p in points:
        poly = _pmul(poly, [(-p) % r, 1], r)
    return poly


def _interpolate(xs, ys, r):
    """Lagrange interpolation (shplonk interpolate)."""
    poly = [0]
    for i, (xi, yi) in enumerate(zip(xs, ys)):
        li = [1]
        denom = 1
        for j, xj in enumerate(xs):
            if i == j:
                continue
            li = _pmul(li, [(-xj) % r, 1], r)
            denom = denom * (xi - xj) % r
        li = _pscale(li, yi * pow(denom, -1, r) % r, r)
        poly = _padd(poly, li, r)
    return poly


def _pdiv_exact(num, den, r):
    """Exact polynomial division (shplonk div)."""
    num = list(num)
    dd = len(den) - 1
    while len(den) > 1 and den[-1] == 0:
        den = den[:-1]
        dd -= 1
    inv_lead = pow(den[-1], -1, r)
    out = [0] * max(len(num) - dd, 1)
    for i in range(len(num) - 1, dd - 1, -1):
        c = num[i] * inv_lead % r
        out[i - dd] = c
        for j, dj in enumerate(den):
            num[i - dd + j] = (num[i - dd + j] - c * dj) % r
    return out


def _derive(name, t, r, points=None, digests=None, g1c=None, extra=b""):
    if points:
        for s in points:
            for p in s:
                t.bind(name, p.to_bytes(g1c.spec.fr.n_bytes, "big"))
    if digests:
        from gnark_crypto_tpu.io.marshal import PointCodec

        codec = PointCodec(g1c)
        for d in digests:
            t.bind(name, codec.to_bytes(d)[0])
    if extra:
        t.bind(name, extra)
    return int.from_bytes(t.compute_challenge(name), "big") % r


def _commit_host(name, pk, coeffs, r, g1c):
    c = g1c.fr.from_int([v % r for v in coeffs], mont=False)
    pts = Affine(pk.g1.x[: len(coeffs)], pk.g1.y[: len(coeffs)])
    res = msm(cs.get_curve(f"{name}_g1"), pts, c)
    return g1c.to_affine(Jac(*(x[None] for x in res)))


def batch_open(name: str, pk: kzg.ProvingKey, polynomials: list[list[int]],
               digests: list[Affine], points: list[list[int]]
               ) -> OpeningProof:
    """shplonk.go:45 BatchOpen (host-int polynomial arithmetic)."""
    g1c = curve_ops(cs.get_curve(f"{name}_g1"))
    r = g1c.spec.fr.modulus
    t = Transcript(challenge_ids=["gamma", "z"])
    gamma = _derive("gamma", t, r, points, digests, g1c)

    all_points = [p for s in points for p in s]
    zt = _vanishing(all_points, r)

    claimed = []
    ris = []
    zt_minus_si = []
    f = [0]
    acc_gamma = 1
    for i, (poly, si) in enumerate(zip(polynomials, points)):
        cv = [_peval(poly, p, r) for p in si]
        claimed.append(cv)
        others = [p for j, s in enumerate(points) if j != i for p in s]
        zmsi = _vanishing(others, r)
        zt_minus_si.append(zmsi)
        ri = _interpolate(si, cv, r)
        ris.append(ri)
        term = _pmul(_psub(poly, ri, r), zmsi, r)
        f = _padd(f, _pscale(term, acc_gamma, r), r)
        acc_gamma = acc_gamma * gamma % r

    w = _pdiv_exact(f, zt, r)
    w_com = _commit_host(name, pk, w, r, g1c)

    z = _derive("z", t, r, None, [w_com], g1c)

    # L = sum gamma^i Z_{T\Si}(z) (f_i - r_i(z)) - Z_T(z) W
    l = [0]
    acc_gamma = 1
    for i, poly in enumerate(polynomials):
        coeff = acc_gamma * _peval(zt_minus_si[i], z, r) % r
        fi = list(poly)
        fi[0] = (fi[0] - _peval(ris[i], z, r)) % r
        l = _padd(l, _pscale(fi, coeff, r), r)
        acc_gamma = acc_gamma * gamma % r
    ztz = _peval(zt, z, r)
    l = _psub(l, _pscale(w, ztz, r), r)
    w_prime = _pdiv_exact(l, [(-z) % r, 1], r)
    wp_com = _commit_host(name, pk, w_prime, r, g1c)
    return OpeningProof(w=w_com, w_prime=wp_com, claimed_values=claimed)


def batch_verify(name: str, proof: OpeningProof, digests: list[Affine],
                 points: list[list[int]], vk: kzg.VerifyingKey):
    """shplonk.go:180 BatchVerify."""
    g1c = curve_ops(cs.get_curve(f"{name}_g1"))
    r = g1c.spec.fr.modulus
    t = Transcript(challenge_ids=["gamma", "z"])
    gamma = _derive("gamma", t, r, points, digests, g1c)
    z = _derive("z", t, r, None, [proof.w], g1c)

    acc_gamma = 1
    coeffs = []
    sum_riz = 0
    for i, si in enumerate(points):
        others = [p for j, s in enumerate(points) if j != i for p in s]
        zmsi_z = _peval(_vanishing(others, r), z, r)
        c = acc_gamma * zmsi_z % r
        coeffs.append(c)
        ri = _interpolate(si, proof.claimed_values[i], r)
        sum_riz = (sum_riz + c * _peval(ri, z, r)) % r
        acc_gamma = acc_gamma * gamma % r

    # F = sum c_i * Com_i - [sum_riz]G1 - Z_T(z) W
    dx = jnp.concatenate([d.x for d in digests], axis=0)
    dy = jnp.concatenate([d.y for d in digests], axis=0)
    scal = g1c.fr.from_int(coeffs, mont=False)
    com_sum = msm(cs.get_curve(f"{name}_g1"), Affine(dx, dy), scal, c=4)
    g1gen = g1c.from_affine(vk.g1)
    riz_term = g1c.scalar_mul(g1gen, g1c.fr.from_int([sum_riz], mont=False))
    all_points = [p for s in points for p in s]
    ztz = _peval(_vanishing(all_points, r), z, r)
    ztw = g1c.scalar_mul(g1c.from_affine(proof.w),
                         g1c.fr.from_int([ztz], mont=False))
    f_pt = g1c.add(Jac(*(x[None] for x in com_sum)), g1c.neg_jac(riz_term))
    f_pt = g1c.add(f_pt, g1c.neg_jac(ztw))
    zwp = g1c.scalar_mul(g1c.from_affine(proof.w_prime),
                         g1c.fr.from_int([z], mont=False))
    f_pt = g1c.add(f_pt, zwp)
    f_aff = g1c.to_affine(g1c.neg_jac(f_pt))
    # e(-(F+zW'), G2) * e(W', [x]G2) == 1
    px = jnp.concatenate([f_aff.x, proof.w_prime.x], axis=0)
    py = jnp.concatenate([f_aff.y, proof.w_prime.y], axis=0)
    qx = jnp.concatenate([vk.g2.x, vk.alpha_g2.x], axis=0)
    qy = jnp.concatenate([vk.g2.y, vk.alpha_g2.y], axis=0)
    return pairing_api.pairing_check(name, Affine(px, py), qx, qy)
