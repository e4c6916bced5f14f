"""Multi-chip (virtual 8-device CPU mesh) tests: 4-step NTT + sharded MSM."""

import random

import jax
import numpy as np
import pytest

from gnark_crypto_tpu.curve.jacobian import curve_ops
from gnark_crypto_tpu.dist.mesh import make_mesh, shard_leading
from gnark_crypto_tpu.dist.msm import msm_sharded
from gnark_crypto_tpu.dist.ntt import DistDomain
from gnark_crypto_tpu.msm import pippenger
from gnark_crypto_tpu.ntt import fft as fftm
from gnark_crypto_tpu.ntt.domain import Domain
from gnark_crypto_tpu.specs import curve as cs
from gnark_crypto_tpu.specs import field as fs
from tests.test_curve_g1 import affine_to_ints, pts_to_device, rand_points


def test_dist_fft_matches_single_chip():
    assert len(jax.devices()) >= 8, "needs the 8-device virtual mesh"
    mesh = make_mesh(8, axis="sp")
    spec = fs.BN254_FR
    n = 1 << 10
    dd = DistDomain(spec, n, mesh, axis="sp")
    eng = dd.eng
    rng = random.Random(1)
    vals = [rng.randrange(spec.modulus) for _ in range(n)]
    a = eng.from_int(vals)
    got = dd.fft(shard_leading(mesh, a, "sp"))

    dom = Domain(spec, n, with_coset=False)
    expect = fftm.bit_reverse(fftm.fft(dom, a, fftm.DIF))
    assert dd.generator_int == dom.generator_int
    assert np.array_equal(np.asarray(got), np.asarray(expect))


def test_dist_msm_matches_single_chip():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8, axis="dp")
    spec = cs.get_curve("bn254_g1")
    curve = curve_ops(spec)
    n = 32
    pts = rand_points(curve, n, seed=11)
    rng = random.Random(12)
    ks = [rng.randrange(curve.spec.fr.modulus) for _ in range(n)]
    P = pts_to_device(curve, pts)
    k_dev = curve.fr.from_int(ks, mont=False)

    got = msm_sharded(spec, mesh, P, k_dev, c=4)
    expect = pippenger.msm(spec, P, k_dev, c=4)
    got_a = affine_to_ints(curve, curve.to_affine(
        jax.tree.map(lambda x: x[None], got)))
    exp_a = affine_to_ints(curve, curve.to_affine(
        jax.tree.map(lambda x: x[None], expect)))
    assert got_a == exp_a


def test_dist_msm_2d_matches_single_chip():
    """{points x windows} 2D mesh MSM == single-chip (window-axis sharding,
    the reference's goroutine-per-chunk axis mapped to chips)."""
    from gnark_crypto_tpu.dist.mesh import make_mesh_2d
    from gnark_crypto_tpu.dist.msm import msm_sharded_2d

    assert len(jax.devices()) >= 8
    mesh = make_mesh_2d((2, 4), axes=("dp", "win"))
    spec = cs.get_curve("bn254_g1")
    curve = curve_ops(spec)
    n = 16
    pts = rand_points(curve, n, seed=21)
    rng = random.Random(22)
    ks = [rng.randrange(curve.spec.fr.modulus) for _ in range(n)]
    P = pts_to_device(curve, pts)
    k_dev = curve.fr.from_int(ks, mont=False)

    got = msm_sharded_2d(spec, mesh, P, k_dev, c=4)
    expect = pippenger.msm(spec, P, k_dev, c=4)
    got_a = affine_to_ints(curve, curve.to_affine(
        jax.tree.map(lambda x: x[None], got)))
    exp_a = affine_to_ints(curve, curve.to_affine(
        jax.tree.map(lambda x: x[None], expect)))
    assert got_a == exp_a
