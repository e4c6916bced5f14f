"""Field specifications — the TPU-native replacement for gnark-crypto's codegen configs.

The reference generates per-field Go+asm packages from
``internal/generator/field/config/field_config.go`` (Montgomery constants, sqrt
parameters, addchains) and ``internal/generator/config/*.go`` (moduli). Here a
:class:`FieldSpec` carries the same data as plain Python ints, computed once at
registry time; kernels are generic over the spec and specialize when traced.

Limb representation: an element is ``int32[..., L]`` holding ``L`` limbs in base
``2**limb_bits`` (little-endian limb order), kept in Montgomery form w.r.t.
``R = 2**(limb_bits * L)``. ``limb_bits`` defaults to 12 so that lazy-carry
product-scan accumulation of ``2*L`` partial products stays below 2**31
(signed int32 lanes are the native VPU type on TPU).
"""

from __future__ import annotations

import dataclasses
import functools


def _inv_mod(a: int, m: int) -> int:
    return pow(a, -1, m)


def _two_adicity(n: int) -> int:
    s = 0
    while n % 2 == 0:
        n //= 2
        s += 1
    return s


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """All compile-time constants for one prime field (hashable → jit-static)."""

    name: str
    modulus: int
    limb_bits: int
    n_limbs: int
    # Montgomery constants for radix 2**(limb_bits*n_limbs)
    r: int            # R mod q
    r2: int           # R^2 mod q
    r_inv: int        # R^-1 mod q
    qinv_neg: int     # -q^-1 mod 2**limb_bits  (per-limb Montgomery factor)
    # multiplicative structure
    two_adicity: int          # s with q-1 = 2^s * t, t odd
    generator: int | None     # generator of F_q^* (matches gnark fftConfigs)
    two_adic_root: int | None  # generator of the 2^s-subgroup (gnark parity)
    n_bytes: int              # canonical byte length (gnark Element.Bytes)

    # ------------------------------------------------------------------ helpers
    @property
    def mask(self) -> int:
        return (1 << self.limb_bits) - 1

    @property
    def radix_bits(self) -> int:
        return self.limb_bits * self.n_limbs

    @property
    def bit_length(self) -> int:
        return self.modulus.bit_length()

    @functools.cached_property
    def q_limbs(self) -> tuple[int, ...]:
        return int_to_limbs(self.modulus, self.limb_bits, self.n_limbs)

    @functools.cached_property
    def r_limbs(self) -> tuple[int, ...]:
        return int_to_limbs(self.r, self.limb_bits, self.n_limbs)

    @functools.cached_property
    def r2_limbs(self) -> tuple[int, ...]:
        return int_to_limbs(self.r2, self.limb_bits, self.n_limbs)

    @functools.cached_property
    def one_limbs(self) -> tuple[int, ...]:
        """Montgomery form of 1 (== R mod q)."""
        return self.r_limbs

    @property
    def t_odd(self) -> int:
        """Odd part t of q-1 = 2^s * t."""
        return (self.modulus - 1) >> self.two_adicity

    def __repr__(self) -> str:  # keep reprs short in test output
        return f"FieldSpec({self.name}, {self.bit_length}b, {self.n_limbs}x{self.limb_bits})"


def int_to_limbs(x: int, limb_bits: int, n_limbs: int) -> tuple[int, ...]:
    mask = (1 << limb_bits) - 1
    return tuple((x >> (limb_bits * i)) & mask for i in range(n_limbs))


def limbs_to_int(limbs, limb_bits: int) -> int:
    x = 0
    for i, l in enumerate(limbs):
        x += int(l) << (limb_bits * i)
    return x


def make_field_spec(
    name: str,
    modulus: int,
    limb_bits: int | None = None,
    generator: int | None = None,
    two_adic_root: int | None = None,
    n_limbs: int | None = None,
) -> FieldSpec:
    """Derive all Montgomery/NTT constants from the modulus.

    Mirrors ``internal/generator/field/config/field_config.go`` (reference) but
    at runtime with exact Python ints instead of codegen.
    """
    nbits = modulus.bit_length()
    if limb_bits is None:
        # Default: 12-bit limbs for multi-limb fields — lazy-carry product-scan
        # accumulation of 2L partial products (each < 2^24) must stay < 2^31 in
        # int32 lanes, which holds for 2L <= 2^7, i.e. fields up to ~400 bits.
        # Very wide fields (bw6) drop to 11-bit limbs. 31-bit fields are a
        # single lane (dedicated engine in field/f31.py).
        if nbits <= 31:
            limb_bits = 31
        elif nbits <= 400:
            limb_bits = 12
        else:
            limb_bits = 11
    if n_limbs is None:
        if nbits <= limb_bits:
            n_limbs = 1
        else:
            # one headroom bit so values < 2q fit in L limbs (lazy reduction)
            n_limbs = -(-(nbits + 1) // limb_bits)
    radix = 1 << (limb_bits * n_limbs)
    r = radix % modulus
    r2 = (r * r) % modulus
    r_inv = _inv_mod(r, modulus)
    qinv_neg = (-_inv_mod(modulus, 1 << limb_bits)) % (1 << limb_bits)
    s = _two_adicity(modulus - 1)
    if two_adic_root is None and generator is not None:
        two_adic_root = pow(generator, (modulus - 1) >> s, modulus)
    return FieldSpec(
        name=name,
        modulus=modulus,
        limb_bits=limb_bits,
        n_limbs=n_limbs,
        r=r,
        r2=r2,
        r_inv=r_inv,
        qinv_neg=qinv_neg,
        two_adicity=s,
        generator=generator,
        two_adic_root=two_adic_root,
        n_bytes=(nbits + 7) // 8,
    )


# ---------------------------------------------------------------------------
# Registry: every field gnark-crypto ships (moduli from
# /root/reference/internal/generator/config/*.go; FFT generators from
# /root/reference/internal/generator/field/generator_fft.go:145-222).
# ---------------------------------------------------------------------------

_REGISTRY: dict[str, FieldSpec] = {}


def register(spec: FieldSpec) -> FieldSpec:
    _REGISTRY[spec.name] = spec
    return spec


def get_field(name: str) -> FieldSpec:
    return _REGISTRY[name]


def all_fields() -> dict[str, FieldSpec]:
    return dict(_REGISTRY)


# -- pairing-curve scalar/base fields (multi-limb) --------------------------

BN254_FR = register(make_field_spec(
    "bn254_fr",
    21888242871839275222246405745257275088548364400416034343698204186575808495617,
    generator=5,
))
BN254_FP = register(make_field_spec(
    "bn254_fp",
    21888242871839275222246405745257275088696311157297823662689037894645226208583,
    generator=3,  # not used for NTT (two-adicity 1); kept for completeness
))
BLS12_381_FR = register(make_field_spec(
    "bls12_381_fr",
    52435875175126190479447740508185965837690552500527637822603658699938581184513,
    generator=7,
))
BLS12_381_FP = register(make_field_spec(
    "bls12_381_fp",
    4002409555221667393417789825735904156556882819939007885332058136124031650490837864442687629129015664037894272559787,
))
BLS12_377_FR = register(make_field_spec(
    "bls12_377_fr",
    8444461749428370424248824938781546531375899335154063827935233455917409239041,
    generator=22,
))
BLS12_377_FP = register(make_field_spec(
    "bls12_377_fp",
    258664426012969094010652733694893533536393512754914660539884262666720468348340822774968888139573360124440321458177,
))
BLS24_315_FR = register(make_field_spec(
    "bls24_315_fr",
    11502027791375260645628074404575422495959608200132055716665986169834464870401,
    generator=7,
))
BLS24_315_FP = register(make_field_spec(
    "bls24_315_fp",
    39705142709513438335025689890408969744933502416914749335064285505637884093126342347073617133569,
))
BLS24_317_FR = register(make_field_spec(
    "bls24_317_fr",
    30869589236456844204538189757527902584594726589286811523515204428962673459201,
    generator=7,
))
BLS24_317_FP = register(make_field_spec(
    "bls24_317_fp",
    136393071104295911515099765908274057061945112121419593977210139303905973197232025618026156731051,
))
BW6_761_FR = register(make_field_spec(
    "bw6_761_fr",
    258664426012969094010652733694893533536393512754914660539884262666720468348340822774968888139573360124440321458177,
    generator=15,
))
BW6_761_FP = register(make_field_spec(
    "bw6_761_fp",
    6891450384315732539396789682275657542479668912536150109513790160209623422243491736087683183289411687640864567753786613451161759120554247759349511699125301598951605099378508850372543631423596795951899700429969112842764913119068299,
))
BW6_633_FR = register(make_field_spec(
    "bw6_633_fr",
    39705142709513438335025689890408969744933502416914749335064285505637884093126342347073617133569,
    generator=13,
))
BW6_633_FP = register(make_field_spec(
    "bw6_633_fp",
    20494478644167774678813387386538961497669590920908778075528754551012016751717791778743535050360001387419576570244406805463255765034468441182772056330021723098661967429339971741066259394985997,
))

# -- plain curves -----------------------------------------------------------

GRUMPKIN_FR = register(make_field_spec(  # == bn254_fp (2-cycle)
    "grumpkin_fr", BN254_FP.modulus, generator=3))
GRUMPKIN_FP = register(make_field_spec(  # == bn254_fr
    "grumpkin_fp", BN254_FR.modulus, generator=5))
SECP256K1_FR = register(make_field_spec(
    "secp256k1_fr",
    115792089237316195423570985008687907852837564279074904382605163141518161494337,
))
SECP256K1_FP = register(make_field_spec(
    "secp256k1_fp",
    115792089237316195423570985008687907853269984665640564039457584007908834671663,
))
SECP256R1_FR = register(make_field_spec(
    "secp256r1_fr",
    115792089210356248762697446949407573529996955224135760342422259061068512044369,
))
SECP256R1_FP = register(make_field_spec(
    "secp256r1_fp",
    115792089210356248762697446949407573530086143415290314195533631308867097853951,
))
STARK_FR = register(make_field_spec(
    "stark_fr",
    3618502788666131213697322783095070105526743751716087489154079457884512865583,
))
STARK_FP = register(make_field_spec(
    "stark_fp",
    3618502788666131213697322783095070105623107215331596699973092056135872020481,
))

# -- standalone small fields -------------------------------------------------
# (single int32 lane / uint32 pair; dedicated engines in field/f31.py and
# field/f64.py)

# limb_bits=32, n_limbs=2: uint32 [lo, hi] pair, Montgomery radix 2^64 —
# matching the reference's single-word representation
# (field/goldilocks/element.go:36); strict reduction needs no headroom limb.
GOLDILOCKS = register(make_field_spec(
    "goldilocks", 0xFFFFFFFF00000001, limb_bits=32, generator=7, n_limbs=2,
))
# limb_bits=32: single uint32 lane, Montgomery radix 2^32 (Plonky3-style —
# the reference's AVX-512 F31 kernels use the same radix,
# internal/generator/field/asm/amd64/element_vec_F31.go:253)
KOALABEAR = register(make_field_spec(
    "koalabear", 0x7F000001, limb_bits=32, generator=3,
))
BABYBEAR = register(make_field_spec(
    "babybear", 0x78000001, limb_bits=32, generator=31,
))
