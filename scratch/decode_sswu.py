"""Regenerate gnark_crypto_tpu/hashes/sswu_tables.py from the reference.

Parses the Montgomery-form fp.Element / fptower.E2 literals in
/root/reference/ecc/<curve>/hash_to_curve/g{1,2}.go and decodes them to
integers (v = limbs_as_int * R^-1 mod p, R = 2^(64*words)).

Usage:
    python scratch/decode_sswu.py          # verify vs the committed module
    python scratch/decode_sswu.py --emit   # print a fresh sswu_tables body
"""
import re
import sys

REF = "/root/reference/ecc"


def _fp_modulus(curve):
    from gnark_crypto_tpu.specs.field import get_field
    return get_field(curve.replace("-", "_") + "_fp").modulus


MODULI = {}
WORDS = {}
for _c in ("bls12-377", "bls24-315", "bls24-317", "bw6-761", "bw6-633"):
    MODULI[_c] = _fp_modulus(_c)
    WORDS[_c] = -(-MODULI[_c].bit_length() // 64)

# python table name -> (curve dir, group)
TABLES = {
    "BLS12_377_G2": ("bls12-377", 2),
    "BLS24_315_G1": ("bls24-315", 1),
    "BLS24_317_G1": ("bls24-317", 1),
    "BW6_761_G1": ("bw6-761", 1),
    "BW6_761_G2": ("bw6-761", 2),
    "BW6_633_G1": ("bw6-633", 1),
    "BW6_633_G2": ("bw6-633", 2),
}

# fp.Element{...} literals AND the bare {...} element literals used inside
# []fp.Element{ {..}, {..} } slices
ELEM_RE = re.compile(r"(?:fp\.Element)?\{([0-9,\s]+)\}")


def _decode(limbs, curve):
    p = MODULI[curve]
    v = 0
    for i, l in enumerate(limbs):
        v += l << (64 * i)
    r_inv = pow(1 << (64 * WORDS[curve]), -1, p)
    return v * r_inv % p


def _elems_in(text, curve):
    out = []
    for m in ELEM_RE.finditer(text):
        limbs = [int(x) for x in m.group(1).replace("\n", " ").split(",")
                 if x.strip()]
        assert len(limbs) <= WORDS[curve], (curve, len(limbs))
        limbs += [0] * (WORDS[curve] - len(limbs))  # Go zero-fills literals
        out.append(_decode(limbs, curve))
    return out


def _block(src, start_pat):
    """Text from start_pat to the matching closing of its opening brace."""
    i = src.index(start_pat)
    j = src.index("{", i)
    depth, k = 0, j
    while True:
        if src[k] == "{":
            depth += 1
        elif src[k] == "}":
            depth -= 1
            if depth == 0:
                return src[i:k + 1]
        k += 1


def parse_table(curve, g):
    path = f"{REF}/{curve}/hash_to_curve/g{g}.go"
    src = open(path).read()
    is_e2 = f"g{g}sswuCurveACoeff = fptower.E2" in src
    pre = f"g{g}"

    def grab(pat):
        vals = _elems_in(_block(src, pat), curve)
        if is_e2:
            assert len(vals) % 2 == 0
            return tuple((vals[i], vals[i + 1])
                         for i in range(0, len(vals), 2))
        return tuple(vals)

    def one(pat):
        v = grab(pat)
        assert len(v) == 1
        return v[0]

    return dict(
        A=one(f"{pre}sswuCurveACoeff"),
        B=one(f"{pre}sswuCurveBCoeff"),
        Z=one(f"{pre}sswuCurveZ"),
        xnum=grab(f"{pre}IsogenyXNumeratorMap"),
        xden=grab(f"{pre}IsogenyXDenominatorMap"),
        ynum=grab(f"{pre}IsogenyYNumeratorMap"),
        yden=grab(f"{pre}IsogenyYDenominatorMap"),
    )


def main():
    import gnark_crypto_tpu.hashes.sswu_tables as st

    emit = "--emit" in sys.argv
    for name, (curve, g) in TABLES.items():
        got = parse_table(curve, g)
        if emit:
            print(f"{name} = dict(")
            for k, v in got.items():
                print(f"    {k}={v!r},")
            print(")\n")
            continue
        committed = getattr(st, name)
        for k in ("A", "B", "Z", "xnum", "xden", "ynum", "yden"):
            assert tuple(committed[k]) == tuple(got[k]) if isinstance(
                committed[k], (tuple, list)) else committed[k] == got[k], \
                (name, k)
        print(f"{name}: matches committed table")
    if not emit:
        print("ALL TABLES REPRODUCED")


if __name__ == "__main__":
    main()
