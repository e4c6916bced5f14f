"""Small-field extension towers (FRI-style soundness amplification).

Counterpart of ``field/{koalabear,babybear,goldilocks}/extensions``:
  koalabear:  E2 = F[u]/(u^2-3),  E4 = E2[v]/(v^2-u), E6 = E2[w]/(w^3-(1+u))
  babybear:   E2 = F[u]/(u^2-11), E4 = E2[v]/(v^2-u), E6 = E2[w]/(w^3-(1+u))
  goldilocks: E2 = F[u]/(u^2-7)
(non-residues read off the generated Mul/MulBy{Quadratic,Cubic}NonResidue
implementations: e2.go Mul + :220 sqrt beta). Built compositionally from the
generic Quad/Cubic extension engines — the vectorized E4 ops the reference
hand-writes in e4_amd64.s fall out of batching.
"""

from __future__ import annotations

import functools

from gnark_crypto_tpu.field.api import for_spec
from gnark_crypto_tpu.specs import field as fs
from gnark_crypto_tpu.towers.engine import CubicExtEngine, QuadExtEngine

_BETA = {"koalabear": 3, "babybear": 11, "goldilocks": 7}


@functools.lru_cache(maxsize=None)
def e2(field: str) -> QuadExtEngine:
    base = for_spec(fs.get_field(field))
    return QuadExtEngine(base, _BETA[field], tag=f"{field}_e2")


@functools.lru_cache(maxsize=None)
def e4(field: str) -> QuadExtEngine:
    """E4 = E2[v]/(v^2 - u): nr is u = (0, 1) in E2."""
    base = e2(field)

    def mul_by_u(a, _b=base):
        # (a0 + a1 u) * u = beta*a1 + a0 u
        a0, a1 = _b.coeff(a, 0), _b.coeff(a, 1)
        return _b.build([_b.mul_by_nr(a1), a0])

    return QuadExtEngine(base, (0, 1), mul_by_nr=mul_by_u,
                         tag=f"{field}_e4")


@functools.lru_cache(maxsize=None)
def e6(field: str) -> CubicExtEngine:
    """E6 = E2[w]/(w^3 - (1+u))."""
    base = e2(field)
    return CubicExtEngine(base, (1, 1), tag=f"{field}_e6")
