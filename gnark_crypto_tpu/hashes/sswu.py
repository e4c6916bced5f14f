"""Simplified SWU map with isogeny for BLS12-381 G1/G2 (RFC 9380 §6.6.2-6.6.3).

Counterpart of the reference's generated ``ecc/bls12-381/hash_to_g1.go`` /
``hash_to_g2.go`` (MapToCurve1/2 + isogeny) and
``ecc/bls12-381/hash_to_curve/g1.go,g2.go`` (constants). The constant tables
below are the published RFC 9380 isogeny coefficients (11-isogeny for G1,
3-isogeny for G2), stored as plain integers / E2 pairs; the reference stores
the same values as Montgomery limb arrays.

The map runs batched on device: one fused masked-select program per batch
(is_square / sqrt CMOVs), matching the framework's SVDW map style.
"""

from __future__ import annotations

from gnark_crypto_tpu.curve.jacobian import Affine, Jac

# -- constants: iso-curve coefficients + isogeny polynomials -----------------
# bls12-381 G1: E': y^2 = x^3 + A'x + B', Z = 11; 11-isogeny E' -> E.
# (hash_to_curve/g1.go:17-21, decoded from Montgomery form.)
_G1_A = 12190336318893619529228877361869031420615612348429846051986726275283378313155663745811710833465465981901188123677
_G1_B = 2906670324641927570491258158026293881577086121416628140204402091718288198173574630967936031029026176254968826637280
_G1_Z = 11

# isogeny polynomial coefficients, ascending order (index 0 = constant term);
# denominators are monic — the leading x^deg term is implied
# (hash_to_curve/g1.go:36-100 g1Isogeny*Map, g1EvalPolynomial).
_G1_XNUM = (
    2712959285290305970661081772124144179193819192423276218370281158706191519995889425075952244140278856085036081760695,
    3564859427549639835253027846704205725951033235539816243131874237388832081954622352624080767121604606753339903542203,
    2051387046688339481714726479723076305756384619135044672831882917686431912682625619320120082313093891743187631791280,
    3612713941521031012780325893181011392520079402153354595775735142359240110423346445050803899623018402874731133626465,
    2247053637822768981792833880270996398470828564809439728372634811976089874056583714987807553397615562273407692740057,
    3415427104483187489859740871640064348492611444552862448295571438270821994900526625562705192993481400731539293415811,
    2067521456483432583860405634125513059912765526223015704616050604591207046392807563217109432457129564962571408764292,
    3650721292069012982822225637849018828271936405382082649291891245623305084633066170122780668657208923883092359301262,
    1239271775787030039269460763652455868148971086016832054354147730155061349388626624328773377658494412538595239256855,
    3479374185711034293956731583912244564891370843071137483962415222733470401948838363051960066766720884717833231600798,
    2492756312273161536685660027440158956721981129429869601638362407515627529461742974364729223659746272460004902959995,
    1058488477413994682556770863004536636444795456512795473806825292198091015005841418695586811009326456605062948114985,
)
_G1_XDEN = (
    1353092447850172218905095041059784486169131709710991428415161466575141675351394082965234118340787683181925558786844,
    2822220997908397120956501031591772354860004534930174057793539372552395729721474912921980407622851861692773516917759,
    1717937747208385987946072944131378949849282930538642983149296304709633281382731764122371874602115081850953846504985,
    501624051089734157816582944025690868317536915684467868346388760435016044027032505306995281054569109955275640941784,
    3025903087998593826923738290305187197829899948335370692927241015584233559365859980023579293766193297662657497834014,
    2224140216975189437834161136818943039444741035168992629437640302964164227138031844090123490881551522278632040105125,
    1146414465848284837484508420047674663876992808692209238763293935905506532411661921697047880549716175045414621825594,
    3179090966864399634396993677377903383656908036827452986467581478509513058347781039562481806409014718357094150199902,
    1549317016540628014674302140786462938410429359529923207442151939696344988707002602944342203885692366490121021806145,
    1442797143427491432630626390066422021593505165588630398337491100088557278058060064930663878153124164818522816175370,
)
_G1_YNUM = (
    1393399195776646641963150658816615410692049723305861307490980409834842911816308830479576739332720113414154429643571,
    2968610969752762946134106091152102846225411740689724909058016729455736597929366401532929068084731548131227395540630,
    122933100683284845219599644396874530871261396084070222155796123161881094323788483360414289333111221370374027338230,
    303251954782077855462083823228569901064301365507057490567314302006681283228886645653148231378803311079384246777035,
    1353972356724735644398279028378555627591260676383150667237975415318226973994509601413730187583692624416197017403099,
    3443977503653895028417260979421240655844034880950251104724609885224259484262346958661845148165419691583810082940400,
    718493410301850496156792713845282235942975872282052335612908458061560958159410402177452633054233549648465863759602,
    1466864076415884313141727877156167508644960317046160398342634861648153052436926062434809922037623519108138661903145,
    1536886493137106337339531461344158973554574987550750910027365237255347020572858445054025958480906372033954157667719,
    2171468288973248519912068884667133903101171670397991979582205855298465414047741472281361964966463442016062407908400,
    3915937073730221072189646057898966011292434045388986394373682715266664498392389619761133407846638689998746172899634,
    3802409194827407598156407709510350851173404795262202653149767739163117554648574333789388883640862266596657730112910,
    1707589313757812493102695021134258021969283151093981498394095062397393499601961942449581422761005023512037430861560,
    349697005987545415860583335313370109325490073856352967581197273584891698473628451945217286148025358795756956811571,
    885704436476567581377743161796735879083481447641210566405057346859953524538988296201011389016649354976986251207243,
    3370924952219000111210625390420697640496067348723987858345031683392215988129398381698161406651860675722373763741188,
)
_G1_YDEN = (
    3396434800020507717552209507749485772788165484415495716688989613875369612529138640646200921379825018840894888371137,
    3907278185868397906991868466757978732688957419873771881240086730384895060595583602347317992689443299391009456758845,
    854914566454823955479427412036002165304466268547334760894270240966182605542146252771872707010378658178126128834546,
    3496628876382137961119423566187258795236027183112131017519536056628828830323846696121917502443333849318934945158166,
    1828256966233331991927609917644344011503610008134915752990581590799656305331275863706710232159635159092657073225757,
    1362317127649143894542621413133849052553333099883364300946623208643344298804722863920546222860227051989127113848748,
    3443845896188810583748698342858554856823966611538932245284665132724280883115455093457486044009395063504744802318172,
    3484671274283470572728732863557945897902920439975203610275006103818288159899345245633896492713412187296754791689945,
    3755735109429418587065437067067640634211015783636675372165599470771975919172394156249639331555277748466603540045130,
    3459661102222301807083870307127272890283709299202626530836335779816726101522661683404130556379097384249447658110805,
    742483168411032072323733249644347333168432665415341249073150659015707795549260947228694495111018381111866512337576,
    1662231279858095762833829698537304807741442669992646287950513237989158777254081548205552083108208170765474149568658,
    1668238650112823419388205992952852912407572045257706138925379268508860023191233729074751042562151098884528280913356,
    369162719928976119195087327055926326601627748362769544198813069133429557026740823593067700396825489145575282378487,
    2164195715141237148945939585099633032390257748382945597506236650132835917087090097395995817229686247227784224263055,
)

# bls12-381 G2: E'': y^2 = x^3 + A''x + B'' over Fp2, Z = -(2+u); 3-isogeny.
# (hash_to_curve/g2.go constants, decoded; E2 values as (A0, A1) pairs.)
_P381 = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
_G2_A = (0, 240)
_G2_B = (1012, 1012)
_G2_Z = (_P381 - 2, _P381 - 1)  # -(2 + u)
_G2_XNUM = (
    (889424345604814976315064405719089812568196182208668418962679585805340366775741747653930584250892369786198727235542,
     889424345604814976315064405719089812568196182208668418962679585805340366775741747653930584250892369786198727235542),
    (0,
     2668273036814444928945193217157269437704588546626005256888038757416021100327225242961791752752677109358596181706522),
    (2668273036814444928945193217157269437704588546626005256888038757416021100327225242961791752752677109358596181706526,
     1334136518407222464472596608578634718852294273313002628444019378708010550163612621480895876376338554679298090853261),
    (3557697382419259905260257622876359250272784728834673675850718343221361467102966990615722337003569479144794908942033,
     0),
)
_G2_XDEN = (
    (0,
     4002409555221667393417789825735904156556882819939007885332058136124031650490837864442687629129015664037894272559715),
    (12,
     4002409555221667393417789825735904156556882819939007885332058136124031650490837864442687629129015664037894272559775),
)
_G2_YNUM = (
    (3261222600550988246488569487636662646083386001431784202863158481286248011511053074731078808919938689216061999863558,
     3261222600550988246488569487636662646083386001431784202863158481286248011511053074731078808919938689216061999863558),
    (0,
     889424345604814976315064405719089812568196182208668418962679585805340366775741747653930584250892369786198727235518),
    (2668273036814444928945193217157269437704588546626005256888038757416021100327225242961791752752677109358596181706524,
     1334136518407222464472596608578634718852294273313002628444019378708010550163612621480895876376338554679298090853263),
    (2816510427748580758331037284777117739799287910327449993381818688383577828123182200904113516794492504322962636245776,
     0),
)
_G2_YDEN = (
    (4002409555221667393417789825735904156556882819939007885332058136124031650490837864442687629129015664037894272559355,
     4002409555221667393417789825735904156556882819939007885332058136124031650490837864442687629129015664037894272559355),
    (0,
     4002409555221667393417789825735904156556882819939007885332058136124031650490837864442687629129015664037894272559571),
    (18,
     4002409555221667393417789825735904156556882819939007885332058136124031650490837864442687629129015664037894272559769),
)


# bls12-377 G1: 2-isogeny (hash_to_curve/g1.go, decoded from Montgomery
# form; host-validated: iso-curve points map onto E: y^2 = x^3 + 1).
_B377_A = 258664426012969092796408009721202742408018065645352501567204841856062976176281513834280849065051431927238430294002
_B377_B = 22
_B377_Z = 5
_B377_XNUM = (
    193998319509726820447277314072485610595876362210707887456279225959507476652652651634192264150953923683470146535424,
    40474824132456359704279181570318738632422647360355249739068643631356267969150730939906729705473,
    193998319509726820507989550271170150152295134566185995404913197000040351261255617081226666104680020093330241093633,
)
_B377_XDEN = (
    161899296529825438817116726281274954529690589441420998956274574525425071876602923759626918821892,
)
_B377_YNUM = (
    193998319509726820507989550271170150152295134566185995404913197000040351261255617081226666104680020093330241093631,
    32333053251621136903112182208573040583096119983059602439070460434672245065050016464457115901761911040205276577794,
    129332213006484547066038603046131306324615528732935438218576102373893108782773376834518846023512776472080255287298,
    226331372761347957259321141983031841844344323660550327972398729833380409804798219928097777122126690108885281275905,
)
_B377_YDEN = (
    258664426012969094010652733694893533536393512754914660539884262666720468348340822774968888139573360124440321458169,
    971395779178952632902700357687649727178143536648525993737647447152550431259617542557761512931340,
    485697889589476316451350178843824863589071768324262996868823723576275215629808771278880756465676,
)

from gnark_crypto_tpu.hashes import sswu_tables as _tab

SSWU = {
    "bls12_381_g1": dict(A=_G1_A, B=_G1_B, Z=_G1_Z, xnum=_G1_XNUM,
                         xden=_G1_XDEN, ynum=_G1_YNUM, yden=_G1_YDEN),
    "bls12_381_g2": dict(A=_G2_A, B=_G2_B, Z=_G2_Z, xnum=_G2_XNUM,
                         xden=_G2_XDEN, ynum=_G2_YNUM, yden=_G2_YDEN),
    "bls12_377_g1": dict(A=_B377_A, B=_B377_B, Z=_B377_Z, xnum=_B377_XNUM,
                         xden=_B377_XDEN, ynum=_B377_YNUM, yden=_B377_YDEN),
    "bls12_377_g2": _tab.BLS12_377_G2,
    "bls24_315_g1": _tab.BLS24_315_G1,
    "bls24_317_g1": _tab.BLS24_317_G1,
    "bw6_761_g1": _tab.BW6_761_G1,
    "bw6_761_g2": _tab.BW6_761_G2,
    "bw6_633_g1": _tab.BW6_633_G1,
    "bw6_633_g2": _tab.BW6_633_G2,
}


def _eval_poly(f, coeffs, x, monic: bool):
    """Horner over device constants; ``monic`` adds the implied leading x^deg
    (reference g1EvalPolynomial, hash_to_curve/g1.go:142)."""
    sh = f.eshape(x)
    acc = f.broadcast_to(f.from_int(coeffs[-1]), sh)
    if monic:
        acc = f.add(acc, x)
    for c in reversed(coeffs[:-1]):
        acc = f.add(f.mul(acc, x), f.broadcast_to(f.from_int(c), sh))
    return acc


def map_to_curve_sswu(f, u, key: str) -> Affine:
    """Simplified SWU onto the isogenous curve, then the isogeny map
    (reference MapToCurve1, hash_to_g1.go:71; RFC 9380 F.2 + E.2).

    ``f`` is the coordinate-field engine (fp for G1, the E2 engine for G2);
    ``u`` a batch of field elements (Montgomery).
    """
    c = SSWU[key]
    sh = f.eshape(u)
    A = f.broadcast_to(f.from_int(c["A"]), sh)
    B = f.broadcast_to(f.from_int(c["B"]), sh)
    Z = f.broadcast_to(f.from_int(c["Z"]), sh)
    one = f.broadcast_to(f.ones(), sh)

    # x1 = (-B/A) * (1 + 1/(Z^2 u^4 + Z u^2)); fallback B/(Z A) when the
    # denominator vanishes (u = 0 or Z u^2 a root of t^2 + t).
    tv1 = f.mul(Z, f.square(u))            # Z u^2
    tv2 = f.add(f.square(tv1), tv1)        # Z^2 u^4 + Z u^2
    tv2_zero = f.is_zero(tv2)
    x1num = f.mul(B, f.add(tv2, one))
    x1num = f.select(tv2_zero, B, x1num)
    x1den = f.neg(f.mul(A, tv2))
    x1den = f.select(tv2_zero, f.mul(Z, A), x1den)
    x1 = f.mul(x1num, f.inverse(x1den))

    gx1 = f.add(f.mul(f.add(f.square(x1), A), x1), B)  # x1^3 + A x1 + B
    x2 = f.mul(tv1, x1)                                # Z u^2 x1
    gx2 = f.add(f.mul(f.add(f.square(x2), A), x2), B)

    sq1 = f.is_square(gx1)
    x = f.select(sq1, x1, x2)
    gx = f.select(sq1, gx1, gx2)
    y, _ = f.sqrt(gx)
    y = f.select(f.sgn0(u) == f.sgn0(y), y, f.neg(y))

    # isogeny E' -> E (reference G1Isogeny / G2Isogeny; denominators monic)
    xn = _eval_poly(f, c["xnum"], x, monic=False)
    xd = _eval_poly(f, c["xden"], x, monic=True)
    yn = _eval_poly(f, c["ynum"], x, monic=False)
    yd = _eval_poly(f, c["yden"], x, monic=True)
    inv = f.batch_inverse(f.mul(xd, yd))
    xo = f.mul(xn, f.mul(inv, yd))                 # xn / xd
    yo = f.mul(y, f.mul(yn, f.mul(inv, xd)))       # y * yn / yd
    return Affine(xo, yo)


# -- cofactor clearing --------------------------------------------------------

_BLS12_381_SEED_ABS = 0xD201000000010000  # seed x = -0xd201000000010000


def clear_cofactor_g1_bls12_381(curve, pts: Affine) -> Affine:
    """[1 - x]P via one ladder (reference g1.go ClearCofactor: mulBySeed + add,
    eprint 2019/403 §5; x negative so |x|P + P = (1-x)P)."""
    k = curve.fr.from_int([_BLS12_381_SEED_ABS + 1] * pts.x.shape[0],
                          mont=False)
    res = curve.scalar_mul(curve.from_affine(pts), k,
                           nbits=(_BLS12_381_SEED_ABS + 1).bit_length())
    return curve.to_affine(res)


def clear_cofactor_g2_bls12_381(g2, pts: Affine) -> Affine:
    """Efficient G2 cofactor clearing (reference g2.go ClearCofactor,
    eprint 2017/419 §4.1):

        res = [x^2]P - [x]P - P + psi([x]P - P) - psi2([2]P)

    with x the (negative) seed; psi2 is X *= thirdRootOneG1.
    """
    from gnark_crypto_tpu.pairing.pairing12 import get_ctx
    from gnark_crypto_tpu.specs.curve import get_curve

    ctx = get_ctx("bls12_381")
    n = pts.x.shape[0]

    def mul_by_x(q_aff: Affine) -> Affine:
        # [x]Q = -[|x|]Q (seed negative)
        k = g2.fr.from_int([_BLS12_381_SEED_ABS] * n, mont=False)
        r = g2.scalar_mul(g2.from_affine(q_aff), k,
                          nbits=_BLS12_381_SEED_ABS.bit_length())
        return g2.to_affine(g2.neg_jac(r))

    xg = mul_by_x(pts)          # [x]P
    xxg = mul_by_x(xg)          # [x^2]P

    res = g2.add(g2.from_affine(xxg),
                 g2.neg_jac(g2.from_affine(xg)))       # x^2 P - x P
    res = g2.add(res, g2.neg_jac(g2.from_affine(pts)))  # ... - P

    # psi([x]P - P)
    t = g2.to_affine(g2.add(g2.from_affine(xg),
                            g2.neg_jac(g2.from_affine(pts))))
    tx, ty = ctx.psi_coords(t.x, t.y)
    res = g2.add(res, g2.from_affine(Affine(tx, ty)))

    # psi2([2]P): X *= thirdRootOneG1 (an fp scalar on the E2 X coordinate)
    g1_spec = get_curve("bls12_381_g1")
    w = g1_spec.glv_third_root
    d = g2.double(g2.from_affine(pts))
    e2, fp = g2.fp, g2.fp.base
    wc = fp.broadcast_to(fp.from_int(w), fp.eshape(e2.coeff(d.x, 0)))
    wx = e2.build([fp.mul(e2.coeff(d.x, 0), wc),
                   fp.mul(e2.coeff(d.x, 1), wc)])
    res = g2.add(res, g2.neg_jac(Jac(wx, d.y, d.z)))
    return g2.to_affine(res)


_BLS12_377_SEED = 9586122913090633729  # x0 > 0 (bls12-377.go)


def clear_cofactor_g1_bls12_377(curve, pts: Affine) -> Affine:
    """[1 - x0]P = P - [x0]P (reference g1.go ClearCofactor:
    mulBySeed.Neg.AddAssign, eprint 2019/403 §5)."""
    k = curve.fr.from_int([_BLS12_377_SEED] * pts.x.shape[0], mont=False)
    xq = curve.scalar_mul(curve.from_affine(pts), k,
                          nbits=_BLS12_377_SEED.bit_length())
    res = curve.add(curve.neg_jac(xq), curve.from_affine(pts))
    return curve.to_affine(res)


# ---------------------------------------------------------------------------
# generic small-multiple helpers (host-int scalars, device ladders)
# ---------------------------------------------------------------------------

def _mul_int(g, p: Jac, k: int) -> Jac:
    """[|k|]P with sign (mulWindowed / mulBySeed analogue)."""
    if k == 0:
        return g.inf_jac(g.fp.eshape(p.x))
    sh = g.fp.eshape(p.x)
    n = sh[0] if sh else 1
    r = g.scalar_mul(p, g.fr.from_int([abs(k)] * n, mont=False),
                     nbits=abs(k).bit_length())
    return g.neg_jac(r) if k < 0 else r


def clear_cofactor_g2_2017_419(g2, pts: Affine, seed: int, seed_neg: bool,
                               psi_fn, psi2_x_mul) -> Affine:
    """Shared eprint 2017/419 §4.1 G2 clearing (bls12-381 AND bls12-377,
    reference g2.go ClearCofactor):

        res = [x^2]P - [x]P - P + psi([x]P - P) - psi2([2]P)

    ``psi_fn(Affine) -> Affine``; ``psi2_x_mul(Jac) -> Jac`` applies the
    X *= thirdRootOneG1 psi^2 shortcut."""
    x_signed = -seed if seed_neg else seed

    def mul_by_x(q: Affine) -> Affine:
        return g2.to_affine(_mul_int(g2, g2.from_affine(q), x_signed))

    xg = mul_by_x(pts)
    xxg = mul_by_x(xg)
    res = g2.add(g2.from_affine(xxg), g2.neg_jac(g2.from_affine(xg)))
    res = g2.add(res, g2.neg_jac(g2.from_affine(pts)))
    t = g2.to_affine(g2.add(g2.from_affine(xg),
                            g2.neg_jac(g2.from_affine(pts))))
    res = g2.add(res, g2.from_affine(psi_fn(t)))
    res = g2.add(res, g2.neg_jac(psi2_x_mul(
        g2.double(g2.from_affine(pts)))))
    return g2.to_affine(res)


# ---------------------------------------------------------------------------
# BLS24: G1 clearing + psi-based G2 clearing over E4
# ---------------------------------------------------------------------------

_BLS24_SEED = {"bls24_315": 3218079743, "bls24_317": 3640754176}
# sign of the curve seed x0 (bls24-315: x0 < 0; bls24-317: x0 > 0). The
# reference's generated ClearCofactor bodies differ exactly by Neg calls
# after each mulBySeed — both reduce to the same signed-[x] formulas.
_BLS24_SEED_SIGN = {"bls24_315": -1, "bls24_317": 1}

# psi endomorphism constants (bls24-315.go:153-154 / bls24-317.go:139-142),
# nested E4 = ((B0.A0, B0.A1), (B1.A0, B1.A1))
_BLS24_ENDO = {
    "bls24_315": (
        ((17432737665785421589107433512831558061649422754130449334965277047994983947893909429238815314776, 0), (0, 0)),
        ((13266452002786802757645810648664867986567631927642464177452792960815113608167203350720036682455, 0), (0, 0)),
    ),
    "bls24_317": (
        ((100835231576138384070271140557450756773581004948002542492497192760544145876107391019725843007951,
          100835231576138384070271140557450756773581004948002542492497192760544145876107391019725843007951), (0, 0)),
        ((0, 0),
         (65063930028143676778466901566890018271632055221368035552739808236464024322431728149960968101,
          65063930028143676778466901566890018271632055221368035552739808236464024322431728149960968101)),
    ),
}


def clear_cofactor_g1_bls24(curve, pts: Affine, name: str) -> Affine:
    """[1-x]P: res = -[x]P + P with signed seed x (eprint 2019/403 §5).
    Reference bls24-315/g1.go:834 (x<0: mulBySeed(P)+P) and
    bls24-317/g1.go:818 (x>0: mulBySeed(P).Neg()+P)."""
    res = _mul_int(curve, curve.from_affine(pts), _BLS24_SEED[name])
    if _BLS24_SEED_SIGN[name] > 0:
        res = curve.neg_jac(res)
    return curve.to_affine(curve.add(res, curve.from_affine(pts)))


def _psi_bls24(name: str, g2, p: Jac) -> Jac:
    """psi(Q) on E4-coordinate G2 Jacobians: Frobenius on each coordinate
    (tower24._phi device map) times endo.u/v (bls24 g2.go psi)."""
    from gnark_crypto_tpu.towers.tower24 import get_tower24

    tw = get_tower24(name)
    e4 = g2.fp
    u, v = _BLS24_ENDO[name]
    sh = e4.eshape(p.x)
    x = e4.mul(tw._phi(p.x, 1), e4.broadcast_to(e4.from_int(u), sh))
    y = e4.mul(tw._phi(p.y, 1), e4.broadcast_to(e4.from_int(v), sh))
    z = tw._phi(p.z, 1)
    return Jac(x, y, z)


def clear_cofactor_g2_bls24(name: str, g2, pts: Affine) -> Affine:
    """Reference bls24 g2.go ClearCofactor (eprint 2017/419 §4.2), in
    signed-seed form: xg = [x]q - q, x{k}g = [x]x{k-1}g. The reference's
    generated bodies differ by Neg calls per seed sign (bls24-315/g2.go:829
    negates each mulBySeed since x0 < 0; bls24-317/g2.go:827 does not)."""
    seed = _BLS24_SEED[name]
    q = g2.from_affine(pts)
    psi = lambda t: _psi_bls24(name, g2, t)

    def mulx(t):  # signed [x0]t
        m = _mul_int(g2, t, seed)
        return g2.neg_jac(m) if _BLS24_SEED_SIGN[name] < 0 else m

    xg = g2.add(mulx(q), g2.neg_jac(q))               # [x]q - q
    xxg = mulx(xg)
    xxxg = mulx(xxg)
    xxxxg = mulx(xxxg)

    res = g2.add(xxxxg, g2.neg_jac(q))
    t = psi(xxxg)
    res = g2.add(t, res)
    t = psi(psi(xxg))
    res = g2.add(t, res)
    t = psi(psi(psi(xg)))
    res = g2.add(t, res)
    t = psi(psi(psi(psi(g2.double(q)))))
    res = g2.add(t, res)
    return g2.to_affine(res)


# ---------------------------------------------------------------------------
# BW6: phi-based G1/G2 clearing (both groups over fp)
# ---------------------------------------------------------------------------

_BW6_SEED = {"bw6_761": 9586122913090633729, "bw6_633": 3218079743}
_BW6_THIRD_ROOT_G1 = {
    "bw6_761": 1968985824090209297278610739700577151397666382303825728450741611566800370218827257750865013421937292370006175842381275743914023380727582819905021229583192207421122272650305267822868639090213645505120388400344940985710520836292650,
    "bw6_633": 4098895725012429242072311240482566844345873033931481129362557724405008256668293241245050359832461015092695507587185678086043587575438449040313411246717257958467499181450742260777082884928318,
}


def _phi_bw6(curve, p: Jac, name: str, g2: bool) -> Jac:
    """phi: X *= thirdRootOneG1 (G1) / thirdRootOneG2 = root^2 (G2)
    (bw6 g1.go:755 / g2.go:760)."""
    f = curve.fp
    q = curve.spec.fp.modulus
    w = _BW6_THIRD_ROOT_G1[name]
    if g2:
        w = w * w % q
    wc = f.broadcast_to(f.from_int(w), f.eshape(p.x))
    return Jac(f.mul(p.x, wc), p.y, p.z)


def clear_cofactor_bw6_761(curve, pts: Affine, g2: bool) -> Affine:
    """bw6-761 ClearCofactor (eprint 2020/351; g1.go/g2.go transcription)."""
    seed = _BW6_SEED["bw6_761"]
    q = curve.from_affine(pts)
    pt0 = q
    pt1 = _mul_int(curve, pt0, seed)
    pt2 = _mul_int(curve, pt1, seed)
    pt3 = _mul_int(curve, pt2, seed)

    def mw(p, k):
        return _mul_int(curve, p, k)

    if not g2:
        p1 = mw(pt3, 103)
        p1 = curve.add(p1, g2_neg(curve, mw(pt2, 83)))
        p1 = curve.add(p1, g2_neg(curve, mw(pt1, 40)))
        p1 = curve.add(p1, mw(pt0, 136))
        p2 = mw(pt2, 7)
        p2 = curve.add(p2, mw(pt1, 89))
        p2 = curve.add(p2, mw(pt0, 130))
    else:
        p1 = mw(pt3, 103)
        p1 = curve.add(p1, g2_neg(curve, mw(pt2, 83)))
        p1 = curve.add(p1, g2_neg(curve, mw(pt1, 143)))
        p1 = curve.add(p1, mw(pt0, 27))       # Triple^3 = [27]P
        p2 = mw(pt2, 7)                       # Triple.Double.Add = [7]P
        p2 = curve.add(p2, g2_neg(curve, mw(pt1, 117)))
        p2 = curve.add(p2, g2_neg(curve, mw(pt0, 109)))
    p2 = _phi_bw6(curve, p2, "bw6_761", g2)
    if g2:
        p2 = _phi_bw6(curve, p2, "bw6_761", g2)
    return curve.to_affine(curve.add(p1, p2))


def g2_neg(curve, p: Jac) -> Jac:
    return curve.neg_jac(p)


def clear_cofactor_bw6_633(curve, pts: Affine, g2: bool) -> Affine:
    """bw6-633 ClearCofactor (g1.go/g2.go transcription; xGen = |x0|,
    x0 < 0 — signs follow the reference's inline comments)."""
    seed = _BW6_SEED["bw6_633"]
    q = curve.from_affine(pts)
    x = seed  # |x0|

    def mw(p, k):
        return _mul_int(curve, p, k)

    if not g2:
        # G1: uP = -[x]q; vP = [v](q - uP), v = (x^2+1)(x+1);
        # wP = -[x-1]vP + uP; L0 = [13]wP + [7]vP + [2]q;
        # L1 = [13](uP + q) + [5]vP + [7]q; res = phi(L1) + L0
        u_p = g2_neg(curve, mw(q, x))
        v_scalar = (x * x + 1) * (x + 1)
        v_p = mw(curve.add(q, g2_neg(curve, u_p)), v_scalar)
        w_p = curve.add(g2_neg(curve, mw(v_p, x - 1)), u_p)
        l0 = mw(w_p, 13)
        l0 = curve.add(l0, mw(v_p, 7))
        l0 = curve.add(l0, curve.double(q))
        l1 = mw(curve.add(u_p, q), 13)
        l1 = curve.add(l1, mw(v_p, 5))
        l1 = curve.add(l1, mw(q, 7))
        res = curve.add(_phi_bw6(curve, l1, "bw6_633", g2), l0)
    else:
        # G2 (g2.go): chains of mulBySeed with tracked signs
        u_p = mw(q, x)                       # semantically -x q
        u2_p = mw(u_p, x)
        u3_p = mw(u2_p, x)
        u4_p = mw(u3_p, x)
        u5_p = mw(u4_p, x)
        v_p = curve.add(u2_p, u_p)
        v_p = curve.add(v_p, u3_p)
        v_p = curve.double(v_p)
        v_p = curve.add(v_p, u4_p)
        v_p = curve.add(v_p, q)
        w_p = curve.add(u_p, g2_neg(curve, u4_p))
        w_p = curve.add(w_p, g2_neg(curve, u5_p))
        x_p = curve.add(q, v_p)
        l0 = mw(curve.add(u_p, g2_neg(curve, q)), 13)
        l0 = curve.add(l0, mw(x_p, 5))
        l0 = curve.add(l0, g2_neg(curve, mw(q, 7)))
        l1 = mw(w_p, 13)
        l1 = curve.add(l1, mw(v_p, 7))
        l1 = curve.add(l1, mw(q, 5))
        res = curve.add(_phi_bw6(curve, l1, "bw6_633", g2), l0)
    return curve.to_affine(res)
