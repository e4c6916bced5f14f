"""Curve-dispatching pairing facade.

Protocols (KZG, Pedersen, MPC setup, Shplonk, ...) call pairings through
this module so every registered pairing family works: BN/BLS12/BLS24 via
the even-tower engine (pairing12) and BW6 via the direct sextic engine
(pairing6). Mirrors the reference's per-curve ``Pair``/``PairingCheck``
entry points (``ecc/<curve>/pairing.go``).
"""

from __future__ import annotations

from gnark_crypto_tpu.curve.jacobian import Affine
from gnark_crypto_tpu.pairing import pairing6, pairing12

_BW6 = ("bw6_761", "bw6_633")


def pair(name: str, P: Affine, QX, QY):
    if name in _BW6:
        return pairing6.pair(name, P, QX, QY)
    return pairing12.pair(name, P, QX, QY)


def pairing_check(name: str, P: Affine, QX, QY) -> bool:
    if name in _BW6:
        return pairing6.pairing_check(name, P, QX, QY)
    return pairing12.pairing_check(name, P, QX, QY)


def gt_engine(name: str):
    """The target-group (GT) extension engine for a curve."""
    if name in _BW6:
        return pairing6.get_ctx6(name).tower.e6
    return pairing12.get_ctx(name).tower.e12
