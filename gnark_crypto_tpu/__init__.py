"""gnark_crypto_tpu — a TPU-native cryptography framework with the
capabilities of Consensys/gnark-crypto, built from scratch on JAX/XLA.

Top-level facade mirroring the reference's ``ecc.ID`` registry
(``ecc/ecc.go:19-35``) and hash registry (``hash/hashes.go``): curve/field
specs are data, kernels are generic and specialize at trace time.

Layout (SURVEY.md §7 skeleton):
  specs/      field + curve constant registries (replaces Go codegen configs)
  field/      Montgomery limb engine (int32 lanes) + 31-bit engine
  towers/     generic quadratic/cubic extension engines, Fp12 pairing towers
  ntt/        radix-2 NTT domains + single-chip transforms
  curve/      short-Weierstrass group law, G2, twisted Edwards
  msm/        Pippenger multi-scalar multiplication
  pairing/    optimal-ate Miller loops + final exponentiation
  protocols/  KZG, Shplonk, Fflonk, Pedersen, IOP polynomials, MultiLin
  hashes/     MiMC, Poseidon2, Ring-SIS, hash-to-curve, Fiat-Shamir, Merkle
  signature/  ECDSA, EdDSA
  io/         gnark-compatible serialization
  dist/       device-mesh sharded MSM / 4-step NTT (the reference has no
              distributed tier; this is new, see SURVEY §5)
"""

# curve ID registry (ecc.ID analogue)
CURVES = (
    "bn254", "bls12_377", "bls12_381", "bls24_315", "bls24_317",
    "bw6_633", "bw6_761", "grumpkin", "secp256k1", "secp256r1", "stark",
)

# implementation status: all 7 pairing families have the full
# G1+G2+pairing+KZG stack (bls24 via the Fp4->Fp24 tower, bw6 via the
# Fp3->Fp6 direct tower); the 4 plain curves are G1-only by nature.
PAIRING_CURVES_IMPLEMENTED = (
    "bn254", "bls12_381", "bls12_377", "bls24_315", "bls24_317",
    "bw6_761", "bw6_633",
)
PLAIN_CURVES_IMPLEMENTED = ("grumpkin", "secp256k1", "secp256r1", "stark")

SMALL_FIELDS = ("goldilocks", "babybear", "koalabear")


def field(name: str):
    """FieldEngine by spec name (e.g. 'bn254_fr', 'koalabear')."""
    from gnark_crypto_tpu.field.api import for_field

    return for_field(name)


def curve(name: str):
    """G1 Curve ops by curve name (e.g. 'bn254_g1')."""
    from gnark_crypto_tpu.curve.jacobian import curve_ops
    from gnark_crypto_tpu.specs.curve import get_curve

    return curve_ops(get_curve(name))
