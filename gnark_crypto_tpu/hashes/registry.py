"""Hash registry — counterpart of ``hash/hashes.go`` (NewHash/RegisterHash).

Names mirror the reference enum (hash/hashes.go:62-98); constructors return
host hasher objects exposing the hashlib-style update/digest facade (backed
by device-batched permutations).
"""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, Callable] = {}


def register_hash(name: str, factory: Callable):
    """hash/hashes.go:48 RegisterHash."""
    _REGISTRY[name] = factory


def new_hash(name: str):
    """hash/hashes.go:29 NewHash."""
    try:
        return _REGISTRY[name]()
    except KeyError:
        raise KeyError(f"hash '{name}' not registered; known: "
                       f"{sorted(_REGISTRY)}") from None


def available() -> list[str]:
    return sorted(_REGISTRY)


def _mimc_factory(field_name):
    def make():
        from gnark_crypto_tpu.hashes.mimc import MiMC
        from gnark_crypto_tpu.specs.field import get_field

        return MiMC(get_field(field_name))

    return make


def _register_defaults():
    from gnark_crypto_tpu.hashes.mimc import PARAMS as MIMC_PARAMS

    for fname in MIMC_PARAMS:
        curve = fname.removesuffix("_fr").upper().replace("_", "-")
        register_hash(f"MIMC_{curve}", _mimc_factory(fname))
    # Poseidon2 Merkle-Damgard hashers (hash/hashes.go POSEIDON2_*)
    from gnark_crypto_tpu.hashes.poseidon2 import PARAMS as P2_PARAMS

    def _p2_factory(field_name):
        def make():
            from gnark_crypto_tpu.hashes.poseidon2 import (Poseidon2MD,
                                                           poseidon2)

            return Poseidon2MD(poseidon2(field_name))

        return make

    for fname in P2_PARAMS:
        tag = fname.removesuffix("_fr").upper().replace("_", "-")
        register_hash(f"POSEIDON2_{tag}", _p2_factory(fname))


_register_defaults()
