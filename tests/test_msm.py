"""MSM vs Python oracle (reference: multiexp_test.go MSM-vs-naive)."""

import random

import numpy as np
import pytest

from gnark_crypto_tpu.curve.jacobian import curve_ops
from gnark_crypto_tpu.msm import pippenger
from gnark_crypto_tpu.specs import curve as cs
from tests.test_curve_g1 import (affine_to_ints, oracle_add, oracle_mul,
                                 pts_to_device, rand_points)


def test_signed_digits_reconstruct():
    curve = curve_ops(cs.get_curve("bn254_g1"))
    r = curve.spec.fr.modulus
    rng = random.Random(5)
    vals = [0, 1, r - 1] + [rng.randrange(r) for _ in range(13)]
    for c in (3, 8, 13):
        k = curve.fr.from_int(vals, mont=False)
        mags, negs = pippenger.signed_digits(curve, k, c)
        mags = np.asarray(mags)
        negs = np.asarray(negs)
        for i, v in enumerate(vals):
            acc = 0
            for w in range(mags.shape[0]):
                d = int(mags[w, i]) * (-1 if negs[w, i] else 1)
                assert abs(d) <= 1 << (c - 1)
                acc += d << (c * w)
            assert acc == v, (c, i)


@pytest.mark.parametrize("n,c", [(16, 3), (64, None)])
def test_msm_vs_oracle(n, c):
    spec = cs.get_curve("bn254_g1")
    curve = curve_ops(spec)
    p = curve.spec.fp.modulus
    a = curve.spec.a % p
    r = curve.spec.fr.modulus
    pts = rand_points(curve, n, seed=n)
    rng = random.Random(n + 1)
    ks = [rng.randrange(r) for _ in range(n)]
    ks[0] = 0  # edge: zero scalar
    pts[1] = None  # edge: point at infinity

    P = pts_to_device(curve, pts)
    k_dev = curve.fr.from_int(ks, mont=False)
    got = pippenger.msm(spec, P, k_dev, c=c)
    got_aff = affine_to_ints(
        curve, curve.to_affine(jax_tree_index(got)))[0]

    expect = None
    for pt, k in zip(pts, ks):
        if pt is None:
            continue
        expect = oracle_add(expect, oracle_mul(pt, k, p, a), p, a)
    assert got_aff == expect


def jax_tree_index(jac):
    """Wrap a scalar Jac into a batch of one for affine conversion."""
    import jax

    return jax.tree.map(lambda x: x[None], jac)


def test_msm_g2_vs_oracle():
    """MSM over G2 (extension-field points) — multiexp.go G2 variant."""
    import random

    import jax.numpy as jnp

    from gnark_crypto_tpu.curve.g2 import g2_curve
    from gnark_crypto_tpu.curve.jacobian import Affine

    g2 = g2_curve("bn254")
    rng = random.Random(5)
    n = 8
    g = g2.generator_affine()
    gb = Affine(g2.fp.broadcast_to(g.x, (1,)), g2.fp.broadcast_to(g.y, (1,)))
    ks = [rng.randrange(1, 1000) for _ in range(n)]
    pts_j = [g2.scalar_mul(g2.from_affine(gb),
                           g2.fr.from_int([k], mont=False), nbits=10)
             for k in ks]
    pts = g2.to_affine(type(pts_j[0])(
        *(jnp.concatenate([getattr(p, f) for p in pts_j])
          for f in ("x", "y", "z"))))
    scalars = [rng.randrange(g2.spec.fr.modulus) for _ in range(n)]
    res = pippenger.msm(g2, pts, g2.fr.from_int(scalars, mont=False))
    want = sum(k * s for k, s in zip(ks, scalars)) % g2.spec.fr.modulus
    oracle = g2.scalar_mul(g2.from_affine(gb),
                           g2.fr.from_int([want], mont=False))
    assert bool(np.asarray(g2.eq_jac(res, oracle)).ravel()[0])


def test_msm_phase1_affine_levels_vs_oracle(monkeypatch):
    """Force the phase-1 batch-affine compaction levels (normally gated
    behind GNARK_MSM_BOT_W = 2^14, so CPU-size tests never enter them):
    exercises the dense-emission bucket rebuild (argsort + tiny scatter)."""
    monkeypatch.setenv("GNARK_MSM_BOT_W", "8")
    spec = cs.get_curve("bn254_g1")
    curve = curve_ops(spec)
    r = curve.spec.fr.modulus
    n = 64
    pts = rand_points(curve, n, seed=77)
    rng = random.Random(78)
    ks = [rng.randrange(r) for _ in range(n)]
    ks[0] = 0
    pts[3] = None
    pts[5] = pts[6]  # duplicate point: forces a doubling inside a run
    P = pts_to_device(curve, pts)
    k_dev = curve.fr.from_int(ks, mont=False)
    got = pippenger.msm(spec, P, k_dev, c=4)
    exp = pippenger.msm_naive(spec, P, k_dev)
    got_a = affine_to_ints(curve, curve.to_affine(
        __import__("jax").tree.map(lambda x: x[None], got)))
    exp_a = affine_to_ints(curve, curve.to_affine(
        __import__("jax").tree.map(lambda x: x[None], exp)))
    assert got_a == exp_a


def test_msm_autotune_c(monkeypatch, tmp_path):
    """GNARK_MSM_AUTOTUNE: picks a candidate c, persists it, and the tuned
    MSM still matches the oracle (multiexp.go:76-141 bestC counterpart)."""
    tune = tmp_path / "tune.json"
    monkeypatch.setenv("GNARK_MSM_AUTOTUNE", "1")
    monkeypatch.setenv("GNARK_MSM_TUNE_FILE", str(tune))
    spec = cs.get_curve("bn254_g1")
    curve = curve_ops(spec)
    r = curve.spec.fr.modulus
    n = 1 << 11
    pts = rand_points(curve, 8, seed=91)
    P8 = pts_to_device(curve, pts)
    import jax.numpy as jnp
    P = type(P8)(jnp.tile(P8.x, (n // 8, 1)), jnp.tile(P8.y, (n // 8, 1)))
    rng = random.Random(92)
    ks = [rng.randrange(r) for _ in range(n)]
    k_dev = curve.fr.from_int(ks, mont=False)
    got = pippenger.msm(spec, P, k_dev)
    assert tune.exists()
    import json
    cache = json.load(open(tune))
    assert len(cache) == 1
    # repeat: cache hit (no new entries), same result
    got2 = pippenger.msm(spec, P, k_dev)
    import jax
    ga = affine_to_ints(curve, curve.to_affine(
        jax.tree.map(lambda x: x[None], got)))
    gb = affine_to_ints(curve, curve.to_affine(
        jax.tree.map(lambda x: x[None], got2)))
    assert ga == gb
    exp = pippenger.msm(spec, P, k_dev, c=8)
    ea = affine_to_ints(curve, curve.to_affine(
        jax.tree.map(lambda x: x[None], exp)))
    assert ga == ea
