"""Starkware Pedersen hash on the stark curve.

Counterpart of ``ecc/stark-curve/pedersen-hash/pedersen_hash.go``:
  H(a, b).x where the point is
  shift + [a mod 2^248]P0 + [a >> 248]P1 + [b mod 2^248]P2 + [b >> 248]P3
(the reference's nibble tables are just a fixed-base precompute of the same
scalar multiples). Batched: hashes N pairs per call via bit-ladder scans.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gnark_crypto_tpu.curve.jacobian import Affine, Jac, _sel, curve_ops
from gnark_crypto_tpu.specs.curve import get_curve

# constants from pedersen_hash.go init() (Starkware reference points)
SHIFT = (2089986280348253421170679821480865132823066470938446095505822317253594081284,
         1713931329540660377023406109199410414810705867260802078187082345529207694986)
P = [
    (996781205833008774514500082376783249102396023663454813447423147977397232763,
     1668503676786377725805489344771023921079126552019160156920634619255970485781),
    (2251563274489750535117886426533222435294046428347329203627021249169616184184,
     1798716007562728905295480679789526322175868328062420237419143593021674992973),
    (2138414695194151160943305727036575959195309218611738193261179310511854807447,
     113410276730064486255102093846540133784865286929052426931474106396135072156),
    (2379962749567351885752724891227938183011949129833673362440656643086021394946,
     776496453633298175483985398648758586525933812536653089401905292063708816422),
]

_MASK248 = (1 << 248) - 1


def _mul_int_scalars(curve, base_xy, ks: list[int], nbits: int) -> Jac:
    """[k]P for raw integer scalars (NOT reduced mod r) via a bit ladder."""
    f = curve.fp
    n = len(ks)
    base = curve.from_affine(Affine(
        f.broadcast_to(f.from_int(base_xy[0]), (n,)),
        f.broadcast_to(f.from_int(base_xy[1]), (n,))))
    bits = jnp.asarray(
        [[(k >> (nbits - 1 - i)) & 1 for k in ks] for i in range(nbits)],
        jnp.int32)
    acc0 = curve.inf_jac((n,))

    def body(acc, b):
        acc = curve.double(acc)
        return _sel(f, b == 1, curve.add(acc, base), acc), None

    acc, _ = jax.lax.scan(body, acc0, bits)
    return acc


def pedersen(a_vals: list[int], b_vals: list[int]) -> list[int]:
    """Batched Pedersen(a, b) -> x coordinates (ints). pedersen_hash.go:77."""
    curve = curve_ops(get_curve("stark_g1"))
    f = curve.fp
    n = len(a_vals)
    acc = curve.from_affine(Affine(
        f.broadcast_to(f.from_int(SHIFT[0]), (n,)),
        f.broadcast_to(f.from_int(SHIFT[1]), (n,))))
    parts = [
        ([a & _MASK248 for a in a_vals], P[0], 248),
        ([a >> 248 for a in a_vals], P[1], 4),
        ([b & _MASK248 for b in b_vals], P[2], 248),
        ([b >> 248 for b in b_vals], P[3], 4),
    ]
    for ks, base, nbits in parts:
        acc = curve.add(acc, _mul_int_scalars(curve, base, ks, nbits))
    aff = curve.to_affine(acc)
    return f.to_int(aff.x)


def pedersen_array(elems: list[int]) -> int:
    """PedersenArray: left fold + length absorption (pedersen_hash.go:64)."""
    d = 0
    for e in elems:
        d = pedersen([d], [e])[0]
    return pedersen([d], [len(elems)])[0]
