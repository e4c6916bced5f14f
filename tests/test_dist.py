"""Multi-chip (virtual 8-device CPU mesh) tests: 4-step NTT + sharded MSM."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnark_crypto_tpu.curve.jacobian import Affine, curve_ops
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


def test_dist_fft_coset_and_inverse_parity():
    """Coset forward + natural-order inverse vs the single-chip engine
    (fft.go:44-82 coset semantics), plus plain/coset roundtrips."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8, axis="sp")
    spec = fs.BN254_FR
    n = 1 << 10
    dd = DistDomain(spec, n, mesh, axis="sp", with_coset=True)
    eng = dd.eng
    rng = random.Random(31)
    vals = [rng.randrange(spec.modulus) for _ in range(n)]
    a = eng.from_int(vals)
    a_sh = shard_leading(mesh, a, "sp")

    dom = Domain(spec, n)  # with_coset=True default, same shift
    assert dd.shift_int == dom.shift_int

    # coset forward parity
    got = dd.fft(a_sh, coset=True)
    expect = fftm.bit_reverse(fftm.fft(dom, a, fftm.DIF, coset=True))
    assert np.array_equal(np.asarray(got), np.asarray(expect))

    # inverse parity: natural-order X -> coefficients
    X = dd.fft(a_sh)
    back = dd.ifft(X)
    assert np.array_equal(np.asarray(back), np.asarray(a))
    inv_single = fftm.fft_inverse(dom, fftm.bit_reverse(np.asarray(X)),
                                  fftm.DIT)
    assert np.array_equal(np.asarray(dd.ifft(X)), np.asarray(inv_single))

    # coset roundtrip
    back_c = dd.ifft(dd.fft(a_sh, coset=True), coset=True)
    assert np.array_equal(np.asarray(back_c), np.asarray(a))


def test_dist_fft_2_14_coset_roundtrip():
    """North-star-scale sanity on the virtual mesh: koalabear 2^14
    coset roundtrip through the 4-step distributed program."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8, axis="sp")
    spec = fs.KOALABEAR
    n = 1 << 14
    dd = DistDomain(spec, n, mesh, axis="sp", with_coset=True)
    eng = dd.eng
    rng = random.Random(41)
    vals = [rng.randrange(spec.modulus) for _ in range(n)]
    a = eng.from_int(vals)
    a_sh = shard_leading(mesh, a, "sp")
    back = dd.ifft(dd.fft(a_sh, coset=True), coset=True)
    assert np.array_equal(np.asarray(back), np.asarray(a))


def test_dist_kzg_batch_commit_open():
    """Polynomial-partition KZG: sharded batch commit/open == per-poly
    single-chip kzg (kzg.go:160,181)."""
    from gnark_crypto_tpu.dist.kzg import batch_commit, batch_open
    from gnark_crypto_tpu.protocols import kzg

    assert len(jax.devices()) >= 8
    mesh = make_mesh(8, axis="pp")
    name = "bn254"
    nd = 16
    srs = kzg.new_srs(name, nd, alpha=0xC0FFEE)
    g1c = curve_ops(cs.get_curve(f"{name}_g1"))
    fr = g1c.fr
    rng = random.Random(51)
    B = 8
    polys_i = [[rng.randrange(g1c.spec.fr.modulus) for _ in range(nd)]
               for _ in range(B)]
    polys = jnp.stack([fr.from_int(p, mont=False) for p in polys_i])

    cms = batch_commit(name, srs.pk, polys, mesh, axis="pp")
    point = fr.from_int([rng.randrange(1 << 61)], mont=False)
    hs, vals = batch_open(name, srs.pk, polys, point, mesh, axis="pp")

    for i in range(B):
        cm1 = kzg.commit(name, srs.pk, polys[i])
        assert g1c.fp.to_int(cms.x[i]) == g1c.fp.to_int(cm1.x[0])
        assert g1c.fp.to_int(cms.y[i]) == g1c.fp.to_int(cm1.y[0])
        pr = kzg.open_poly(name, srs.pk, polys[i], point)
        assert g1c.fp.to_int(hs.x[i]) == g1c.fp.to_int(pr.h.x[0])
        assert fr.to_int(vals[i], mont=False) == fr.to_int(
            pr.claimed_value[0], mont=False)
        ok = kzg.verify(name, Affine(cms.x[i][None], cms.y[i][None]),
                        kzg.OpeningProof(
                            h=Affine(hs.x[i][None], hs.y[i][None]),
                            claimed_value=vals[i][None]),
                        point, srs.vk)
        assert bool(np.asarray(ok))


def test_dist_msm_2_10_points():
    """Sharded MSM at 2^10 points (the VERDICT r3 scale ask): tiled base
    points, random scalars, vs the single-chip engine."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8, axis="dp")
    spec = cs.get_curve("bn254_g1")
    curve = curve_ops(spec)
    nb = 16
    base = rand_points(curve, nb, seed=61)
    n = 1 << 10
    pts = base * (n // nb)
    rng = random.Random(62)
    ks = [rng.randrange(curve.spec.fr.modulus) for _ in range(n)]
    P = pts_to_device(curve, pts)
    k_dev = curve.fr.from_int(ks, mont=False)

    got = msm_sharded(spec, mesh, P, k_dev, c=8)
    expect = pippenger.msm(spec, P, k_dev, c=8)
    got_a = affine_to_ints(curve, curve.to_affine(
        jax.tree.map(lambda x: x[None], got)))
    exp_a = affine_to_ints(curve, curve.to_affine(
        jax.tree.map(lambda x: x[None], expect)))
    assert got_a == exp_a
