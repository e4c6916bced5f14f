"""Curve specifications (G1 for now; G2/towers carry their own specs).

TPU-native replacement for the per-curve init blocks the reference generates
(e.g. ``ecc/bn254/bn254.go:46-160``): short Weierstrass y^2 = x^3 + ax + b
over fp, scalar field fr, generator, GLV endomorphism constants.
"""

from __future__ import annotations

import dataclasses
import functools

from gnark_crypto_tpu.specs import field as fs
from gnark_crypto_tpu.specs.field import FieldSpec


def _lattice_2d(r: int, lam: int):
    """Gauss-reduced basis of {(a, b) : a + b*lam == 0 mod r}.

    Mirrors ``ecc.PrecomputeLattice`` (/root/reference/ecc/utils.go:110-186):
    half-GCD style truncated Euclid on (r, lam) yielding two short vectors
    V1=(a1, -b1), V2=(a2, -b2) with a_i + b_i*lam ≡ 0 (mod r).
    """
    # truncated extended Euclid: stop when remainder < sqrt(r), then take one
    # extra step so both neighbors of the threshold are available (needed
    # when lam itself is already < sqrt(r), e.g. bls12 lambda = x^2 - 1)
    rs = [r, lam]
    ts = [0, 1]
    while rs[-1] * rs[-1] >= r:
        q = rs[-2] // rs[-1]
        rs.append(rs[-2] - q * rs[-1])
        ts.append(ts[-2] - q * ts[-1])
    q = rs[-2] // rs[-1]
    rs.append(rs[-2] - q * rs[-1])
    ts.append(ts[-2] - q * ts[-1])
    # vectors (r_i, -t_i) satisfy r_i ≡ t_i * lam (mod r); consecutive pairs
    # are independent (det = ±r)
    v1 = (rs[-2], -ts[-2])
    prev = (rs[-3], -ts[-3])
    nxt = (rs[-1], -ts[-1])
    v2 = prev if (prev[0] ** 2 + prev[1] ** 2
                  < nxt[0] ** 2 + nxt[1] ** 2) else nxt
    return v1, v2


@dataclasses.dataclass(frozen=True)
class CurveSpec:
    name: str
    fp: FieldSpec
    fr: FieldSpec
    a: int
    b: int
    gx: int
    gy: int
    cofactor: int = 1
    # GLV endomorphism phi(x,y) = (thirdRootOne * x, y), phi(P) = [lambda]P
    glv_lambda: int | None = None
    glv_third_root: int | None = None

    @functools.cached_property
    def glv_basis(self):
        if self.glv_lambda is None:
            return None
        return _lattice_2d(self.fr.modulus, self.glv_lambda)

    def __repr__(self):
        return f"CurveSpec({self.name})"


_REGISTRY: dict[str, CurveSpec] = {}


def register(spec: CurveSpec) -> CurveSpec:
    _REGISTRY[spec.name] = spec
    return spec


def get_curve(name: str) -> CurveSpec:
    return _REGISTRY[name]


def all_curves() -> dict[str, CurveSpec]:
    return dict(_REGISTRY)


# constants below are from each curve's init() in the reference
# (/root/reference/ecc/<curve>/<curve>.go)

BN254_G1 = register(CurveSpec(
    name="bn254_g1",
    fp=fs.BN254_FP,
    fr=fs.BN254_FR,
    a=0, b=3, gx=1, gy=2,
    glv_lambda=4407920970296243842393367215006156084916469457145843978461,
    glv_third_root=2203960485148121921418603742825762020974279258880205651966,
))

BLS12_381_G1 = register(CurveSpec(
    # ecc/bls12-381/bls12-381.go:106-138
    name="bls12_381_g1",
    fp=fs.BLS12_381_FP,
    fr=fs.BLS12_381_FR,
    a=0, b=4,
    gx=3685416753713387016781088315183077757961620795782546409894578378688607592378376318836054947676345821548104185464507,
    gy=1339506544944476473020471379941921221584933875938349620426543736416511423956333506472724655353366534992391756441569,
    glv_lambda=228988810152649578064853576960394133503,
    glv_third_root=4002409555221667392624310435006688643935503118305586438271171395842971157480381377015405980053539358417135540939436,
))

BLS12_377_G1 = register(CurveSpec(
    # ecc/bls12-377/bls12-377.go:109-137
    name="bls12_377_g1",
    fp=fs.BLS12_377_FP,
    fr=fs.BLS12_377_FR,
    a=0, b=1,
    gx=81937999373150964239938255573465948239988671502647976594219695644855304257327692006745978603320413799295628339695,
    gy=241266749859715473739788878240585681733927191168601896383759122102112907357779751001206799952863815012735208165030,
    glv_lambda=91893752504881257701523279626832445440,
    glv_third_root=80949648264912719408558363140637477264845294720710499478137287262712535938301461879813459410945,
))

GRUMPKIN_G1 = register(CurveSpec(
    # ecc/grumpkin/grumpkin.go:63-77: y^2 = x^3 - 17, gen (1, sqrt(-16))
    name="grumpkin_g1",
    fp=fs.GRUMPKIN_FP,
    fr=fs.GRUMPKIN_FR,
    a=0, b=-17, gx=1,
    gy=17631683881184975370165255887551781615748388533673675138860,
    glv_lambda=2203960485148121921418603742825762020974279258880205651966,
    glv_third_root=4407920970296243842393367215006156084916469457145843978461,
))


SECP256K1_G1 = register(CurveSpec(
    # ecc/secp256k1/secp256k1.go:62-76
    name="secp256k1_g1",
    fp=fs.SECP256K1_FP,
    fr=fs.SECP256K1_FR,
    a=0, b=7,
    gx=55066263022277343669578718895168534326250603453777594175500187360389116729240,
    gy=32670510020758816978083085130507043184471273380659243275938904335757337482424,
    glv_lambda=37718080363155996902926221483475020450927657555482586988616620542887997980018,
    glv_third_root=55594575648329892869085402983802832744385952214688224221778511981742606582254,
))

SECP256R1_G1 = register(CurveSpec(
    # ecc/secp256r1/secp256r1.go:43-47
    name="secp256r1_g1",
    fp=fs.SECP256R1_FP,
    fr=fs.SECP256R1_FR,
    a=-3,
    b=41058363725152142129326129780047268409114441015993725554835256314039467401291,
    gx=48439561293906451759052585252797914202762949526041747995844080717082404635286,
    gy=36134250956749795798585127919587881956611106672985015071877198253568414405109,
))

STARK_G1 = register(CurveSpec(
    # ecc/stark-curve/stark_curve.go:41-45
    name="stark_g1",
    fp=fs.STARK_FP,
    fr=fs.STARK_FR,
    a=1,
    b=3141592653589793238462643383279502884197169399375105820974944592307816406665,
    gx=874739451078007766457464989774322083649278607533249481151382481072868806602,
    gy=152666792071518830868575557812948353041420400780739481342941381225525861407,
))
