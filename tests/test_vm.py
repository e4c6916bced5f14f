"""Straight-line-program VM kernel + symbolic tower tests (interpret mode).

The VM (field/pallas/vm.py) is the TPU-native analogue of the reference's
generated straight-line assembly; the symbolic engines (towers/symbolic.py)
re-run the SAME tower formulas to emit programs. Differential oracles:
the device field/tower engines, and pairing12.pair for the full pairing.
"""

import numpy as np
import pytest

from gnark_crypto_tpu.field import mont
from gnark_crypto_tpu.field.pallas import vm
from gnark_crypto_tpu.specs import field as fs

SPEC = fs.BN254_FR


def _rand(rng, n, spec=SPEC):
    return mont.from_int(
        spec, [int.from_bytes(rng.bytes(31), "big") % spec.modulus
               for _ in range(n)])


def test_vm_ops_vs_mont():
    asm = vm.Asm(SPEC)
    x, y = asm.input("x"), asm.input("y")
    c7 = asm.const(7)
    t = asm.mul(x, y)
    u = asm.add(t, c7)
    v = asm.halve(u)
    w = asm.sub(v, x)
    r = asm.rot(w, 3)
    prog = asm.build({"w": w, "r": r}, max_regs=16)

    rng = np.random.default_rng(0)
    n = 9
    xa, ya = _rand(rng, n), _rand(rng, n)
    out = vm.execute(prog, {"x": xa, "y": ya}, n, interpret=True)

    t_ = mont.mul(SPEC, xa, ya)
    u_ = mont.add(SPEC, t_, mont.from_int(SPEC, [7] * n))
    v_ = mont.halve(SPEC, u_)
    w_ = mont.sub(SPEC, v_, xa)
    assert np.array_equal(np.asarray(out["w"]), np.asarray(w_))
    wi = [mont.to_int(SPEC, w_[i]) for i in range(n)]
    ri = [mont.to_int(SPEC, out["r"][i]) for i in range(n)]
    assert all(ri[i] == wi[i + 3] for i in range(n - 3))


def test_vm_register_reuse_and_padding():
    """Many temporaries -> register reuse; program padded to CHUNK."""
    asm = vm.Asm(SPEC)
    x = asm.input("x")
    acc = x
    for _ in range(40):
        acc = asm.mul(acc, acc)
        acc = asm.add(acc, x)
    prog = asm.build({"acc": acc}, max_regs=8)
    assert prog.code.shape[0] % vm.CHUNK == 0

    rng = np.random.default_rng(1)
    n = 3
    xa = _rand(rng, n)
    out = vm.execute(prog, {"x": xa}, n, interpret=True)
    ref = xa
    for _ in range(40):
        ref = mont.mul(SPEC, ref, ref)
        ref = mont.add(SPEC, ref, xa)
    assert np.array_equal(np.asarray(out["acc"]), np.asarray(ref))


def test_symbolic_tower_vs_device_engine():
    from gnark_crypto_tpu.towers.symbolic import SymTower12
    from gnark_crypto_tpu.towers.tower12 import TOWER12_PARAMS, get_tower

    name = "bn254"
    spec = TOWER12_PARAMS[name][0]
    asm = vm.Asm(spec)
    stw = SymTower12(name, asm)
    f = stw.fp
    a = np.asarray([f.input(f"a{i}") for i in range(12)],
                   np.int32).reshape(2, 3, 2)
    b = np.asarray([f.input(f"b{i}") for i in range(12)],
                   np.int32).reshape(2, 3, 2)
    z = stw.e12.mul(a, b)
    z = stw.cyclotomic_square(z)
    z = stw.frobenius(z)
    z = stw.e12.inverse(z)
    prog = asm.build(
        {f"z{i}": int(v) for i, v in enumerate(np.asarray(z).ravel())})

    tw = get_tower(name)
    rng = np.random.default_rng(3)
    n = 4
    def rnd12():
        return tw.e12.from_int(
            [tuple(tuple(tuple(
                int.from_bytes(rng.bytes(31), "big") % tw.p
                for _ in range(2)) for _ in range(3)) for _ in range(2))
             for _ in range(n)])
    A, B = rnd12(), rnd12()
    Z = tw.e12.inverse(tw.frobenius(tw.cyclotomic_square(tw.e12.mul(A, B))))

    L = spec.n_limbs
    inputs = {}
    fa = np.asarray(A).reshape(n, 12, L)
    fb = np.asarray(B).reshape(n, 12, L)
    for i in range(12):
        inputs[f"a{i}"] = fa[:, i]
        inputs[f"b{i}"] = fb[:, i]
    out = vm.execute(prog, inputs, n, interpret=True)
    got = np.stack([np.asarray(out[f"z{i}"]) for i in range(12)],
                   1).reshape(n, 2, 3, 2, L)
    assert np.array_equal(got, np.asarray(Z))


def test_vm_product_program():
    """The 'product' variant (multi-tile fold building block) matches the
    device-engine E12 product of the live rows, identity on pad rows."""
    from gnark_crypto_tpu.pairing.vm_pairing import build_program
    from gnark_crypto_tpu.towers.tower12 import get_tower

    name = "bn254"
    tw = get_tower(name)
    prog = build_program(name, "product")
    rng = np.random.default_rng(5)
    n_live = 5
    vals = [tuple(tuple(tuple(
        int.from_bytes(rng.bytes(31), "big") % tw.p
        for _ in range(2)) for _ in range(3)) for _ in range(2))
        for _ in range(n_live)]
    A = tw.e12.from_int(vals)                      # (n, 2, 3, 2, L)
    fa = np.asarray(A).reshape(n_live, 12, -1)
    L = fa.shape[-1]
    one = np.asarray(tw.e12.ones(())).reshape(12, L)
    inputs = {}
    for i in range(12):
        col = np.concatenate(
            [fa[:, i], np.broadcast_to(one[i], (vm.TILE - n_live, L))], 0)
        inputs[f"f{i}"] = col
    out = vm.execute(prog, inputs, vm.TILE, interpret=True)
    got = np.stack([np.asarray(out[f"g{i}"][0]) for i in range(12)],
                   0).reshape(2, 3, 2, L)
    acc = A[0]
    for i in range(1, n_live):
        acc = tw.e12.mul(acc, A[i])
    assert np.array_equal(got, np.asarray(acc))


@pytest.mark.parametrize("name,variants", [
    ("bls12_377", ("full", "miller", "product", "reduce")),
    ("bls24_315", ("full",)),
    ("bls24_317", ("full",)),
    ("bw6_761", ("full",)),
    ("bw6_633", ("full", "miller", "product", "reduce")),
])
def test_vm_pairing_program_builds(name, variants):
    """Register allocation + symbolic trace succeed for every VM family
    (a spill or formula mismatch would otherwise first surface on-device;
    ADVICE r3). Build-only: no execution."""
    from gnark_crypto_tpu.pairing.vm_pairing import build_program
    for variant in variants:
        prog = build_program(name, variant)
        assert prog.n_instrs > 0


def _vm_pair_case(name):
    from gnark_crypto_tpu.curve.jacobian import Affine, curve_ops
    from gnark_crypto_tpu.pairing import api as papi
    from gnark_crypto_tpu.specs import curve as cs

    g1 = curve_ops(cs.get_curve(f"{name}_g1"))
    if name.startswith("bw6"):
        g2 = curve_ops(cs.get_curve(f"{name}_g2"))
    else:
        from gnark_crypto_tpu.curve.g2 import g2_curve

        g2 = g2_curve(name)
    gp, gq = g1.generator_affine(), g2.generator_affine()
    n = 3
    P = Affine(g1.fp.broadcast_to(gp.x, (n,)),
               g1.fp.broadcast_to(gp.y, (n,)))
    QX = g2.fp.broadcast_to(gq.x, (n,))
    QY = g2.fp.broadcast_to(gq.y, (n,))
    sc = g1.fr.from_int([2, 0, 3], mont=False)
    Pa = g1.to_affine(g1.scalar_mul(g1.from_affine(P), sc, nbits=3))
    return papi, Affine(Pa.x, Pa.y), QX, QY


@pytest.mark.slow
@pytest.mark.parametrize(
    "name", ["bn254", "bls12_381", "bls12_377", "bls24_317", "bw6_633"])
def test_vm_pairing_vs_reference_path(name):
    """Full VM pairing (miller+product+finalexp, one program) against the
    step-kernel pairing path, with one infinite pair exercising the lane
    masks. Interpret-mode: minutes-scale, marked slow."""
    from gnark_crypto_tpu.pairing import vm_pairing

    papi, P, QX, QY = _vm_pair_case(name)
    ref = papi.pair(name, P, QX, QY)
    got = vm_pairing.pair_vm(name, P, QX, QY, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_try_pair_vm_fallback(monkeypatch):
    """A VM compile failure marks the family and returns None (callers
    fall back to the eager ladder); later calls skip the retry."""
    from gnark_crypto_tpu.pairing import vm_pairing

    calls = []

    def boom(name, P, QX, QY, interpret=False):
        calls.append(name)
        raise RuntimeError("tpu_compile_helper subprocess exit code 1")

    monkeypatch.setattr(vm_pairing, "pair_vm", boom)
    monkeypatch.setattr(vm_pairing, "_VM_DISABLED", set())
    with pytest.warns(UserWarning, match="falling back"):
        out = vm_pairing.try_pair_vm("bls12_381", None, None, None)
    assert out is None
    out2 = vm_pairing.try_pair_vm("bls12_381", None, None, None)
    assert out2 is None
    assert calls == ["bls12_381"]  # no second compile attempt
