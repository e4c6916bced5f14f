"""RFC 9380 hash-to-curve: expand_message_xmd, hash_to_field, SVDW map.

Counterpart of ``field/hash/hashutils.go`` (ExpandMsgXmd), the per-field
``Hash`` (element.go:719, L = 16 + Bytes), and the generated SVDW maps
(``ecc/bn254/hash_to_g1.go`` straight-line svdw). The map itself runs
batched on device with masked selects (Legendre/sqrt based CMOVs).
"""

from __future__ import annotations

import hashlib

import jax.numpy as jnp
import numpy as np

from gnark_crypto_tpu.curve.jacobian import Affine, Curve, Jac, curve_ops
from gnark_crypto_tpu.specs.curve import CurveSpec
from gnark_crypto_tpu.specs.field import FieldSpec

# SVDW constants per curve: (Z, c1, c2, c3, c4) — from
# internal/generator/config/<curve>.go HashE1/HashE2 (decimal strings);
# G2 constants are E2 coefficient tuples (A0, A1).
SVDW = {
    "bn254_g1": (
        1,
        4,
        10944121435919637611123202872628637544348155578648911831344518947322613104291,
        8815841940592487685674414971303048083897117035520822607866,
        7296080957279758407415468581752425029565437052432607887563012631548408736189,
    ),
    "secp256k1_g1": (  # ecc/secp256k1/hash_to_g1.go:75-79 (decoded)
        1,
        8,
        57896044618658097711785492504343953926634992332820282019728792003954417335831,
        10388779673325959979325452626823788324994718367665745800388075445979975427086,
        77194726158210796949047323339125271902179989777093709359638389338605889781098,
    ),
    "stark_g1": (  # ecc/stark-curve/hash_to_g1.go (decoded)
        1,
        3141592653589793238462643383279502884197169399375105820974944592307816406667,
        1809251394333065606848661391547535052811553607665798349986546028067936010240,
        747120397548504753672821049844706693752799645928246271384591722031176001048,
        272520077186478842991245371323181269386250180546566216570369979330317493608,
    ),
    "grumpkin_g1": (  # ecc/grumpkin/hash_to_g1.go (decoded)
        1,
        21888242871839275222246405745257275088548364400416034343698204186575808495601,
        10944121435919637611123202872628637544274182200208017171849102093287904247808,
        17631683881184975371348829942606096167675058198229016842588,
        14592161914559516814830937163504850059032242933610689562465469457717205663766,
    ),
    "secp256r1_g1": (  # ecc/secp256r1/hash_to_g1.go (decoded; Z = -3)
        115792089210356248762697446949407573530086143415290314195533631308867097853948,
        41058363725152142129326129780047268409114441015993725554835256314039467401273,
        57896044605178124381348723474703786765043071707645157097766815654433548926977,
        29559845038651606638686404991023149843030623761509920602511548871339312549878,
        4490048234673595267206024985241738228247634851107048411448415824105088406854,
    ),
    "bn254_g2": (
        (1, 0),
        (19485874751759354771024239261021720505790618469301721065564631296452457478374,
         266929791119991161246907387137283842545076965332900288569378510910307636690),
        (10944121435919637611123202872628637544348155578648911831344518947322613104291,
         0),
        (18992192239972082890849143911285057164064277369389217330423471574879236301292,
         21819008332247140148575583693947636719449476128975323941588917397607662637108),
        (10499238450719652342378357227399831140106360636427411350395554762472100376473,
         6940174569119770192419592065569379906172001098655407502803841283667998553941),
    ),
    # bls24 G2: SVDW over E4, nested ((B0.A0, B0.A1), (B1.A0, B1.A1))
    # (ecc/bls24-315/hash_to_g2.go:20-36 — note c4 is never assigned there,
    # i.e. ZERO: replicated for bit parity; ecc/bls24-317/hash_to_g2.go:20-35)
    "bls24_315_g2": (
        ((1, 0), (1, 0)),
        ((1, 1),
         (2, 6108483493771298205388567675447533806912846525679192205394505462405828322019437284165171866703)),
        ((19852571354756719167512844945204484872466751208457374667532142752818942046563171173536808566784, 0),
         (19852571354756719167512844945204484872466751208457374667532142752818942046563171173536808566784, 0)),
        ((14181901575451930365156064137229663961789100070994427419777314377609453770227083005360995137239,
          38867788984497805540592493226397363174027239449768861944710564870925669104016488974244557160817),
         (7207770078990411004130237352587865513334954456592365258287987262730492706089979112564450405406,
          11314632945591044023254019576500732396578160594635551958097682961894415495755352199773541527735)),
        ((0, 0), (0, 0)),
    ),
    "bls24_317_g2": (
        ((1, 0), (1, 0)),
        ((4, 3), (8, 1)),
        ((68196535552147955757549882954137028530972556060709796988605069651952986598616012809013078365525, 0),
         (68196535552147955757549882954137028530972556060709796988605069651952986598616012809013078365525, 0)),
        ((25710473854271083900266173357439657657737168361084633536126117969329631844210973452609964652920,
          97726383423614678023078817471231282096435936120492353286347028233584612721291548146704405526838),
         (31017010388646627031356727289998252571046265059138887207088052022600004087627603083210545186274,
          74637498440051236880963727555084502172097851690589624852957691761203766904143491322222931488114)),
        ((136393071104295911515099765908274057061945112121419593977210139303905973197232025618026156731039,
          90928714069530607676733177272182704707963408080946395984806759535937315464821350412017437820690),
         (90928714069530607676733177272182704707963408080946395984806759535937315464821350412017437820710,
          90928714069530607676733177272182704707963408080946395984806759535937315464821350412017437820706)),
    ),
}


def expand_msg_xmd(msg: bytes, dst: bytes, n: int) -> bytes:
    """RFC 9380 expand_message_xmd with SHA-256 (hashutils.go:11)."""
    h = hashlib.sha256
    b_len = 32
    r_len = 64
    ell = -(-n // b_len)
    if ell > 255 or len(dst) > 255:
        raise ValueError("invalid expand_msg_xmd parameters")
    dst_prime = dst + bytes([len(dst)])
    b0 = h(b"\x00" * r_len + msg + n.to_bytes(2, "big") + b"\x00"
           + dst_prime).digest()
    bi = h(b0 + b"\x01" + dst_prime).digest()
    out = bi
    for i in range(2, ell + 1):
        strxor = bytes(a ^ b for a, b in zip(b0, bi))
        bi = h(strxor + bytes([i]) + dst_prime).digest()
        out += bi
    return out[:n]


def hash_to_field(spec: FieldSpec, msg: bytes, dst: bytes, count: int
                  ) -> list[int]:
    """count field elements from msg (element.go:719 Hash; L = 16+Bytes)."""
    L = 16 + spec.n_bytes
    pr = expand_msg_xmd(msg, dst, count * L)
    return [int.from_bytes(pr[i * L : (i + 1) * L], "big") % spec.modulus
            for i in range(count)]


def map_to_curve_svdw(curve: Curve, u, svdw_key: str | None = None):
    """Shallue–van de Woestijne map, batched (hash_to_g1.go:63 MapToCurve1).

    Generic over the coordinate engine — the same code maps to G1 (Fp) and
    G2 (Fp2, reference MapToCurve2). u: coordinate-field batch (Montgomery).
    """
    f = curve.fp
    consts = SVDW[svdw_key or curve.spec.name]
    z, c1, c2, c3, c4 = (f.broadcast_to(f.from_int(c), f.eshape(u))
                         for c in consts)
    one = f.broadcast_to(f.ones(), f.eshape(u))
    b = f.broadcast_to(f.from_int(curve.spec.b), f.eshape(u))

    def g(x):
        """g(x) = x^3 + a*x + b (a != 0 for e.g. stark-curve, secp256r1)."""
        rhs = f.add(f.mul(f.square(x), x), b)
        if not curve.a_is_zero:
            a = f.broadcast_to(f.from_int(curve.spec.a), f.eshape(u))
            rhs = f.add(rhs, f.mul(a, x))
        return rhs

    tv1 = f.mul(f.square(u), c1)
    tv2 = f.add(one, tv1)
    tv1 = f.sub(one, tv1)
    tv3 = f.inverse(f.mul(tv1, tv2))        # inv0
    tv4 = f.mul(f.mul(f.mul(u, tv1), tv3), c3)
    x1 = f.sub(c2, tv4)
    gx1 = g(x1)
    x2 = f.add(c2, tv4)
    gx2 = g(x2)
    x3 = f.add(f.mul(f.square(f.mul(f.square(tv2), tv3)), c4), z)

    gx1_square = f.is_square(gx1)
    gx2_square = f.is_square(gx2)
    x = f.select(gx1_square, x1, x3)
    x = f.select(gx2_square & ~gx1_square, x2, x)
    gx = g(x)
    y, _ = f.sqrt(gx)
    # select sign: sgn0(y) must equal sgn0(u)
    y = f.select(f.sgn0(u) == f.sgn0(y), y, f.neg(y))
    return Affine(x, y)


_SSWU_G1 = ("bls12_381_g1", "bls12_377_g1", "bls24_315_g1", "bls24_317_g1",
            "bw6_761_g1", "bw6_633_g1")


def map_to_g1(name_or_spec, u) -> Affine:
    curve = _curve(name_or_spec)
    if curve.spec.name in _SSWU_G1:
        from gnark_crypto_tpu.hashes import sswu
        return sswu.map_to_curve_sswu(curve.fp, u, curve.spec.name)
    res = map_to_curve_svdw(curve, u)
    # bn254/grumpkin G1 cofactor is 1: no clearing needed (config
    # CofactorCleaning=false); curves needing it get it with their specs.
    return res


def _clear_cofactor_g1(curve: Curve, pts: Affine) -> Affine:
    name = curve.spec.name
    from gnark_crypto_tpu.hashes import sswu
    if name == "bls12_381_g1":
        return sswu.clear_cofactor_g1_bls12_381(curve, pts)
    if name == "bls12_377_g1":
        return sswu.clear_cofactor_g1_bls12_377(curve, pts)
    if name in ("bls24_315_g1", "bls24_317_g1"):
        return sswu.clear_cofactor_g1_bls24(curve, pts, name[:-3])
    if name == "bw6_761_g1":
        return sswu.clear_cofactor_bw6_761(curve, pts, g2=False)
    if name == "bw6_633_g1":
        return sswu.clear_cofactor_bw6_633(curve, pts, g2=False)
    return pts  # cofactor-1 curves (bn254, grumpkin, ...)


def _curve(name_or_spec) -> Curve:
    if isinstance(name_or_spec, CurveSpec):
        return curve_ops(name_or_spec)
    from gnark_crypto_tpu.specs.curve import all_curves, get_curve
    if name_or_spec not in all_curves():
        name_or_spec = f"{name_or_spec}_g1"  # "bls12_381" -> its G1 group
    return curve_ops(get_curve(name_or_spec))


def encode_to_g1(name: str, msg: bytes, dst: bytes) -> Affine:
    """EncodeToG1 (hash_to_g1.go:24): one field element, non-uniform."""
    curve = _curve(name)
    u = hash_to_field(curve.spec.fp, msg, dst, 1)
    pt = map_to_g1(curve.spec, curve.fp.from_int(u))
    return _clear_cofactor_g1(curve, pt)


def hash_to_g1(name: str, msg: bytes, dst: bytes) -> Affine:
    """HashToG1 (hash_to_g1.go:42): two map evaluations added."""
    curve = _curve(name)
    u = hash_to_field(curve.spec.fp, msg, dst, 2)
    pts = map_to_g1(curve.spec, curve.fp.from_int(u))
    q0 = Jac(*(c[:1] for c in curve.from_affine(pts)))
    q1 = Jac(*(c[1:] for c in curve.from_affine(pts)))
    return _clear_cofactor_g1(curve, curve.to_affine(curve.add(q0, q1)))


# ---------------------------------------------------------------------------
# G2 (bn254): SVDW over Fp2 + psi-based cofactor clearing
# ---------------------------------------------------------------------------

def hash_to_field_e2(name: str, msg: bytes, dst: bytes, count: int):
    """count coordinate-field elements for G2 (fptower.Hash): E2 pairs,
    E4 nested pairs (bls24), or plain fp (bw6)."""
    from gnark_crypto_tpu.curve.g2 import g2_curve

    g2 = g2_curve(name)
    base_spec = g2.spec.fp
    if not hasattr(g2.fp, "degree"):       # bw6: G2 over fp
        return hash_to_field(base_spec, msg, dst, count)
    deg = 1
    f = g2.fp
    while hasattr(f, "degree"):
        deg *= f.degree
        f = f.base
    flat = hash_to_field(base_spec, msg, dst, deg * count)
    if deg == 2:
        return [(flat[2 * i], flat[2 * i + 1]) for i in range(count)]
    assert deg == 4  # bls24: E4 nested ((B0.A0, B0.A1), (B1.A0, B1.A1))
    return [((flat[4 * i], flat[4 * i + 1]),
             (flat[4 * i + 2], flat[4 * i + 3])) for i in range(count)]


def _psi(name: str, pts: Affine) -> Affine:
    """Untwist-Frobenius endomorphism on G2 affine points (g2.go psi)."""
    from gnark_crypto_tpu.pairing.pairing12 import get_ctx

    ctx = get_ctx(name)
    x, y = ctx.psi_coords(pts.x, pts.y)
    return Affine(x, y)


def clear_cofactor_g2(name: str, pts: Affine) -> Affine:
    """bn254 G2 ClearCofactor (g2.go: Fuentes et al., cacr2011-26 §6.1):
    [x]P + psi(3[x]P) + psi^2([x]P) + psi^3(P).
    bls12-381 uses the eprint 2017/419 §4.1 formula (sswu module)."""
    from gnark_crypto_tpu.curve.g2 import g2_curve
    from gnark_crypto_tpu.pairing.pairing12 import get_ctx

    from gnark_crypto_tpu.hashes import sswu

    if name == "bls12_381":
        return sswu.clear_cofactor_g2_bls12_381(g2_curve(name), pts)
    if name == "bls12_377":
        # same eprint 2017/419 §4.1 formula, positive seed
        # (ecc/bls12-377/g2.go:935-960)
        from gnark_crypto_tpu.pairing.pairing12 import get_ctx as _gc
        from gnark_crypto_tpu.specs.curve import get_curve

        g2 = g2_curve(name)
        ctx = _gc(name)
        w = get_curve("bls12_377_g1").glv_third_root

        def psi2_x_mul(d):
            e2, fp = g2.fp, g2.fp.base
            wc = fp.broadcast_to(fp.from_int(w), fp.eshape(e2.coeff(d.x, 0)))
            wx = e2.build([fp.mul(e2.coeff(d.x, 0), wc),
                           fp.mul(e2.coeff(d.x, 1), wc)])
            return Jac(wx, d.y, d.z)

        return sswu.clear_cofactor_g2_2017_419(
            g2, pts, ctx.seed, False, lambda t: _psi(name, t), psi2_x_mul)
    if name in ("bls24_315", "bls24_317"):
        return sswu.clear_cofactor_g2_bls24(name, g2_curve(name), pts)
    if name == "bw6_761":
        return sswu.clear_cofactor_bw6_761(g2_curve(name), pts, g2=True)
    if name == "bw6_633":
        return sswu.clear_cofactor_bw6_633(g2_curve(name), pts, g2=True)

    g2 = g2_curve(name)
    ctx = get_ctx(name)
    xq = g2.to_affine(g2.scalar_mul(
        g2.from_affine(pts),
        g2.fr.from_int([ctx.seed] * pts.x.shape[0], mont=False),
        nbits=ctx.seed.bit_length()))
    xq_j = g2.from_affine(xq)
    t3 = g2.add(g2.double(xq_j), xq_j)  # 3[x]P
    p1 = _psi(name, g2.to_affine(t3))
    p2 = _psi(name, _psi(name, xq))
    p3 = _psi(name, _psi(name, _psi(name, pts)))
    acc = g2.add(xq_j, g2.from_affine(p1))
    acc = g2.add(acc, g2.from_affine(p2))
    acc = g2.add(acc, g2.from_affine(p3))
    return g2.to_affine(acc)


def map_to_g2(name: str, u) -> Affine:
    from gnark_crypto_tpu.curve.g2 import g2_curve

    g2 = g2_curve(name)
    if name in ("bls12_381", "bls12_377", "bw6_761", "bw6_633"):
        from gnark_crypto_tpu.hashes import sswu
        return sswu.map_to_curve_sswu(g2.fp, u, f"{name}_g2")
    return map_to_curve_svdw(g2, u, svdw_key=f"{name}_g2")


def encode_to_g2(name: str, msg: bytes, dst: bytes) -> Affine:
    """EncodeToG2: one map + cofactor clearing."""
    from gnark_crypto_tpu.curve.g2 import g2_curve

    g2 = g2_curve(name)
    u = hash_to_field_e2(name, msg, dst, 1)
    pt = map_to_g2(name, g2.fp.from_int(u))
    return clear_cofactor_g2(name, pt)


def hash_to_g2(name: str, msg: bytes, dst: bytes) -> Affine:
    """HashToG2: two maps, add, clear cofactor (hash_to_g2.go)."""
    from gnark_crypto_tpu.curve.g2 import g2_curve

    g2 = g2_curve(name)
    u = hash_to_field_e2(name, msg, dst, 2)
    pts = map_to_g2(name, g2.fp.from_int(u))
    q0 = Jac(*(c[:1] for c in g2.from_affine(pts)))
    q1 = Jac(*(c[1:] for c in g2.from_affine(pts)))
    summed = g2.to_affine(g2.add(q0, q1))
    return clear_cofactor_g2(name, summed)
