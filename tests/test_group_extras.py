"""Joint/batched scalar multiplication, Fold, batch subgroup checks, MiMC
state save/restore (reference g1.go:873/:1316/:215, multiexp.go:321,
mimc.go:279)."""

import random

import numpy as np
import pytest

from gnark_crypto_tpu.curve.jacobian import Affine, curve_ops
from gnark_crypto_tpu.msm import pippenger
from gnark_crypto_tpu.specs import curve as cs
from tests.test_curve_g1 import affine_to_ints, pts_to_device, rand_points


def _gen_batch(curve, n):
    g = curve.generator_affine()
    return Affine(curve.fp.broadcast_to(g.x, (n,)),
                  curve.fp.broadcast_to(g.y, (n,)))


def test_joint_scalar_mul():
    """[k1]P + [k2]Q == separate ladders (JointScalarMultiplication)."""
    curve = curve_ops(cs.get_curve("bn254_g1"))
    r = curve.spec.fr.modulus
    rng = random.Random(7)
    pts1 = pts_to_device(curve, rand_points(curve, 3, 51))
    pts2 = pts_to_device(curve, rand_points(curve, 3, 52))
    k1 = [0, 1, rng.randrange(r)]
    k2 = [rng.randrange(r), 0, rng.randrange(r)]
    P, Q = curve.from_affine(pts1), curve.from_affine(pts2)
    got = curve.joint_scalar_mul(P, Q,
                                 curve.fr.from_int(k1, mont=False),
                                 curve.fr.from_int(k2, mont=False))
    expect = curve.add(
        curve.scalar_mul(P, curve.fr.from_int(k1, mont=False)),
        curve.scalar_mul(Q, curve.fr.from_int(k2, mont=False)))
    assert affine_to_ints(curve, curve.to_affine(got)) == \
        affine_to_ints(curve, curve.to_affine(expect))


def test_batch_scalar_mul():
    """One-base batch mul == per-lane ladder (BatchScalarMultiplicationG1)."""
    curve = curve_ops(cs.get_curve("bn254_g1"))
    r = curve.spec.fr.modulus
    rng = random.Random(8)
    ks = [0, 1, 2, r - 1] + [rng.randrange(r) for _ in range(4)]
    base = curve.generator_affine()
    scalars = curve.fr.from_int(ks, mont=False)
    got = pippenger.batch_scalar_mul(curve.spec, base, scalars)
    expect = curve.scalar_mul(curve.from_affine(_gen_batch(curve, len(ks))),
                              scalars)
    assert affine_to_ints(curve, curve.to_affine(got)) == \
        affine_to_ints(curve, curve.to_affine(expect))


def test_fold():
    """Fold == MSM with powers of the combination coefficient."""
    curve = curve_ops(cs.get_curve("bn254_g1"))
    r = curve.spec.fr.modulus
    pts = pts_to_device(curve, rand_points(curve, 4, 53))
    coeff = 0xABCDEF987654321
    got = curve.to_affine(pippenger.fold(curve.spec, pts, coeff))
    ks = [pow(coeff, i, r) for i in range(4)]
    expect = curve.to_affine(pippenger.msm_naive(
        curve.spec, pts, curve.fr.from_int(ks, mont=False)))
    f = curve.fp
    assert (f.to_int(got.x), f.to_int(got.y)) == \
        (f.to_int(expect.x), f.to_int(expect.y))


@pytest.mark.parametrize("n", [8, 96])
def test_is_in_subgroup_batch(n):
    """Deterministic (n<80) and probabilistic (n>=80) batch membership."""
    from gnark_crypto_tpu.curve import subgroup
    from gnark_crypto_tpu.hashes import hash_to_curve as h2c

    fam = "bls12_381"
    curve = curve_ops(cs.get_curve(f"{fam}_g1"))
    f = curve.fp
    good1 = h2c.hash_to_g1(fam, b"batch-member", b"BATCH-DST")
    good = Affine(f.tile_lead(good1.x, n), f.tile_lead(good1.y, n))
    rnd = random.Random(9).randbytes
    assert subgroup.is_in_subgroup_batch(curve, good, rand_bytes=rnd)
    # plant one non-member (on-curve, full E(Fp))
    u = h2c.hash_to_field(curve.spec.fp, b"bad", b"BATCH-DST", 1)
    raw = h2c.map_to_g1(curve.spec, curve.fp.from_int(u))
    import jax.numpy as jnp
    bad = Affine(
        jnp.concatenate([good.x[: n - 1], raw.x], axis=0),
        jnp.concatenate([good.y[: n - 1], raw.y], axis=0))
    assert not subgroup.is_in_subgroup_batch(curve, bad, rand_bytes=rnd)


def test_mimc_state_roundtrip():
    """State/SetState: resuming from a saved state matches one-shot
    hashing (mimc.go:279/:295)."""
    from gnark_crypto_tpu.hashes.mimc import MiMC
    from gnark_crypto_tpu.specs import field as fs

    nb = fs.BN254_FR.n_bytes
    a = (123456789).to_bytes(nb, "big")
    b = (987654321).to_bytes(nb, "big")

    h1 = MiMC(fs.BN254_FR)
    h1.write(a + b)
    oneshot = h1.sum()

    h2 = MiMC(fs.BN254_FR)
    h2.write(a)
    saved = h2.state()
    h3 = MiMC(fs.BN254_FR)
    h3.set_state(saved)
    h3.write(b)
    assert h3.sum() == oneshot
    # sum is idempotent after flush
    assert h3.sum() == oneshot
    # invalid states rejected
    import pytest as _pt
    with _pt.raises(ValueError):
        h3.set_state(b"\xff" * nb)
    with _pt.raises(ValueError):
        h3.set_state(b"\x00")
