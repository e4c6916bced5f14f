"""Unit tests for the batch-affine MSM building blocks (round 3).

These are covered end-to-end by test_msm.py; the point here is small fast
cases that pin each primitive against an independent oracle, so a
regression localizes immediately (mirrors the reference's per-primitive
property tests, SURVEY §4.1).
"""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnark_crypto_tpu.curve.jacobian import Affine, Jac, curve_ops
from gnark_crypto_tpu.field.api import for_spec
from gnark_crypto_tpu.msm import pippenger as pp
from gnark_crypto_tpu.specs import curve as cs
from gnark_crypto_tpu.specs import field as fs


def test_log_batch_inverse_matches_fermat():
    f = for_spec(fs.BN254_FR)
    rng = random.Random(1)
    q = fs.BN254_FR.modulus
    vals = [1, q - 1] + [rng.randrange(1, q) for _ in range(37)]  # pad path
    x = f.from_int(vals)
    got = pp._log_batch_inverse(f, x)
    expect = f.inverse(x)
    assert np.array_equal(np.asarray(got), np.asarray(expect))


def test_log_batch_inverse_tower():
    from gnark_crypto_tpu.towers.tower12 import get_tower

    e2 = get_tower("bn254").e2
    rng = random.Random(2)
    q = fs.BN254_FP.modulus
    vals = [(rng.randrange(1, q), rng.randrange(q)) for _ in range(8)]
    x = e2.from_int(vals)
    got = pp._log_batch_inverse(e2, x)
    expect = e2.inverse(x)
    assert np.array_equal(np.asarray(got), np.asarray(expect))


def test_affine_add_complete_vs_jacobian():
    """Masked-complete affine add vs the Jacobian group law on every edge
    case: P+Q, P+P, P+(-P), inf+Q, P+inf, inf+inf, 2-torsion-free dbl."""
    from tests.test_curve_g1 import pts_to_device, rand_points

    curve = curve_ops(cs.get_curve("bn254_g1"))
    p = curve.spec.fp.modulus
    pts1 = rand_points(curve, 4, 31)
    pts2 = rand_points(curve, 4, 32)
    pts1 += [pts1[0], pts1[1], None, pts1[2], None]
    pts2 += [pts1[0], (pts1[1][0], (-pts1[1][1]) % p), pts2[0], None, None]
    P = pts_to_device(curve, pts1)
    Q = pts_to_device(curve, pts2)
    got = pp._affine_add_complete(curve, P, Q)
    expect = curve.to_affine(
        curve.add(curve.from_affine(P), curve.from_affine(Q)))
    assert np.array_equal(np.asarray(got.x), np.asarray(expect.x))
    assert np.array_equal(np.asarray(got.y), np.asarray(expect.y))


def test_affine_add_complete_nonzero_a():
    """a != 0 doubling branch (secp256r1 a = -3)."""
    from tests.test_curve_g1 import pts_to_device, rand_points

    curve = curve_ops(cs.get_curve("secp256r1_g1"))
    pts = rand_points(curve, 5, 33)
    P = pts_to_device(curve, pts)
    got = pp._affine_add_complete(curve, P, P)  # all-doubling batch
    expect = curve.to_affine(curve.double(curve.from_affine(P)))
    assert np.array_equal(np.asarray(got.x), np.asarray(expect.x))
    assert np.array_equal(np.asarray(got.y), np.asarray(expect.y))


def test_strided_scan_add_tree_and_suffix():
    """Flat strided reductions vs plain per-window sums."""
    from tests.test_curve_g1 import pts_to_device, rand_points

    curve = curve_ops(cs.get_curve("bn254_g1"))
    nwin, S = 3, 8
    pts = rand_points(curve, nwin * S - 2, 34) + [None, None]
    random.Random(4).shuffle(pts)
    P = curve.from_affine(pts_to_device(curve, pts))

    tree = pp._strided_scan_add(curve, P, S, suffix=False)
    suf = pp._strided_scan_add(curve, P, S, suffix=True)

    def seq_add(idxs):
        acc = curve.inf_jac(())
        for i in idxs:
            acc = curve.add(acc, Jac(*jax.tree.map(lambda a: a[i], P)))
        return acc

    for w in range(nwin):
        tot = seq_add(range(w * S, (w + 1) * S))
        got = Jac(*jax.tree.map(lambda a: a[w * S], tree))
        assert bool(curve.eq_jac(got, tot)), ("tree", w)
        for k in (0, 3, S - 1):
            sfx = seq_add(range(w * S + k, (w + 1) * S))
            got = Jac(*jax.tree.map(lambda a: a[w * S + k], suf))
            assert bool(curve.eq_jac(got, sfx)), ("suffix", w, k)


def test_window_totals_matches_bucket_oracle():
    """_window_totals vs a host-side bucket model over small digits."""
    curve = curve_ops(cs.get_curve("bn254_g1"))
    rng = np.random.default_rng(6)
    n, c, nwin = 13, 4, 2
    half = 1 << (c - 1)
    from tests.test_curve_g1 import pts_to_device, rand_points

    pts = rand_points(curve, n, 35)
    P = pts_to_device(curve, pts)
    mags = rng.integers(0, half + 1, size=(nwin, n)).astype(np.int32)
    negs = rng.integers(0, 2, size=(nwin, n)).astype(bool)

    totals = pp._window_totals(curve, P, jnp.asarray(mags),
                               jnp.asarray(negs), c)

    for w in range(nwin):
        acc = curve.inf_jac(())
        for j in range(1, half + 1):
            bucket = curve.inf_jac(())
            for i in range(n):
                if mags[w, i] == j:
                    pt = Jac(*jax.tree.map(lambda a: a[i],
                                           curve.from_affine(P)))
                    if negs[w, i]:
                        pt = curve.neg_jac(pt)
                    bucket = curve.add(bucket, pt)
            for _ in range(j):
                acc = curve.add(acc, bucket)
        got = Jac(*jax.tree.map(lambda a: a[w], totals))
        assert bool(curve.eq_jac(got, acc)), w


def test_fused_level_kernels_match_xla_level():
    """affine_prep + affine_finish (interpret mode) vs the XLA level body
    (the complete affine add + tree selects) on edge-case-rich inputs."""
    from gnark_crypto_tpu.field.pallas.point_add import (affine_finish,
                                                         affine_prep)
    from tests.test_curve_g1 import pts_to_device, rand_points

    curve = curve_ops(cs.get_curve("bn254_g1"))
    f = curve.fp
    p = curve.spec.fp.modulus
    base = rand_points(curve, 6, 41)
    # l_suf + r_pre covering add / dbl / inverse / infinities
    ls_pts = base[:4] + [base[0], base[1], None, base[2], None, base[3]]
    rp_pts = base[2:6] + [base[0], (base[1][0], (-base[1][1]) % p),
                          base[4], None, None, base[3]]
    n = len(ls_pts)
    lp_pts = rand_points(curve, n, 42)
    rs_pts = rand_points(curve, n, 43)
    l_pre = pts_to_device(curve, lp_pts)
    l_suf = pts_to_device(curve, ls_pts)
    r_pre = pts_to_device(curve, rp_pts)
    r_suf = pts_to_device(curve, rs_pts)

    rng = np.random.default_rng(44)
    eq = jnp.asarray(rng.integers(0, 2, size=(n,)) == 1)
    l_single = jnp.asarray(rng.integers(0, 2, size=(n,)) == 1)
    r_single = jnp.asarray(rng.integers(0, 2, size=(n,)) == 1)

    # ---- oracle: the XLA level body
    mid = pp._affine_add_complete(curve, l_suf, r_pre)
    pt_a = pp._sel2(f, eq, mid, l_suf)
    exp_pre = pp._sel2(f, l_single & eq, mid, l_pre)
    exp_suf = pp._sel2(f, r_single & eq, mid, r_suf)
    exp_za = f.where(curve.is_inf_affine(pt_a), f.zeros((n,)),
                     f.broadcast_to(f.ones(), (n,)))

    # ---- fused kernels (interpret)
    den, num, mbits = affine_prep(curve.spec.fp, curve.spec.a,
                                  l_suf.x, l_suf.y, r_pre.x, r_pre.y,
                                  interpret=True)
    dinv = pp._log_batch_inverse(f, den)
    tb = (eq.astype(jnp.int32) + (l_single.astype(jnp.int32) << 1)
          + (r_single.astype(jnp.int32) << 2))
    prex, prey, sufx, sufy, pax, pay, za = affine_finish(
        curve.spec.fp, curve.spec.a,
        l_pre.x, l_pre.y, l_suf.x, l_suf.y,
        r_pre.x, r_pre.y, r_suf.x, r_suf.y,
        num, dinv, mbits, tb, interpret=True)

    for name, got, exp in [("pre.x", prex, exp_pre.x),
                           ("pre.y", prey, exp_pre.y),
                           ("suf.x", sufx, exp_suf.x),
                           ("suf.y", sufy, exp_suf.y),
                           ("pta.x", pax, pt_a.x),
                           ("pta.y", pay, pt_a.y),
                           ("z_a", za, exp_za)]:
        assert np.array_equal(np.asarray(got), np.asarray(exp)), name


@pytest.mark.parametrize("name", ["bn254", "bls12_377"])
def test_fused_level_kernels_fp2_match_xla_level(name):
    """Fp2 affine_prep2 + affine_finish2 (interpret mode) vs the XLA tower
    level body, covering add / dbl / inverse / infinity lanes. bls12_377
    exercises the nr = -5 small-mul path."""
    from gnark_crypto_tpu.curve.g2 import g2_curve
    from gnark_crypto_tpu.field.pallas.point_add2 import (affine_finish2,
                                                          affine_prep2)

    g2 = g2_curve(name)
    f = g2.fp
    g = g2.generator_affine()
    gb = Affine(f.broadcast_to(g.x, (1,)), f.broadcast_to(g.y, (1,)))
    pts = [g2.to_affine(g2.scalar_mul(
        g2.from_affine(gb), g2.fr.from_int([k], mont=False), nbits=5))
        for k in (1, 2, 3, 5, 7, 11)]

    def neg(a):
        return Affine(a.x, f.neg(a.y))

    inf = Affine(f.zeros((1,)), f.zeros((1,)))
    ls = [pts[0], pts[1], pts[2], pts[0], pts[3], inf, pts[4], inf]
    rp = [pts[2], pts[3], pts[2], neg(pts[0]), pts[3], pts[1], inf, inf]
    n = len(ls)
    lp = [pts[i % 6] for i in range(n)]
    rs = [pts[(i + 2) % 6] for i in range(n)]

    def batch(ps):
        return Affine(jnp.concatenate([p.x for p in ps], axis=0),
                      jnp.concatenate([p.y for p in ps], axis=0))

    l_pre, l_suf, r_pre, r_suf = batch(lp), batch(ls), batch(rp), batch(rs)
    rng = np.random.default_rng(45)
    eq = jnp.asarray(rng.integers(0, 2, size=(n,)) == 1)
    l_single = jnp.asarray(rng.integers(0, 2, size=(n,)) == 1)
    r_single = jnp.asarray(rng.integers(0, 2, size=(n,)) == 1)

    # ---- oracle: the XLA tower level body
    mid = pp._affine_add_complete(g2, l_suf, r_pre)
    pt_a = pp._sel2(f, eq, mid, l_suf)
    exp_pre = pp._sel2(f, l_single & eq, mid, l_pre)
    exp_suf = pp._sel2(f, r_single & eq, mid, r_suf)
    exp_za = f.where(g2.is_inf_affine(pt_a), f.zeros((n,)),
                     f.broadcast_to(f.ones(), (n,)))

    # ---- fused Fp2 kernels (interpret)
    den, num, mbits = affine_prep2(g2.spec.fp, f.nr,
                                   l_suf.x, l_suf.y, r_pre.x, r_pre.y,
                                   interpret=True)
    dinv = pp._log_batch_inverse(f, den)
    tb = (eq.astype(jnp.int32) + (l_single.astype(jnp.int32) << 1)
          + (r_single.astype(jnp.int32) << 2))
    prex, prey, sufx, sufy, pax, pay, za = affine_finish2(
        g2.spec.fp, f.nr,
        l_pre.x, l_pre.y, l_suf.x, l_suf.y,
        r_pre.x, r_pre.y, r_suf.x, r_suf.y,
        num, dinv, mbits, tb, interpret=True)

    for cname, got, exp in [("pre.x", prex, exp_pre.x),
                            ("pre.y", prey, exp_pre.y),
                            ("suf.x", sufx, exp_suf.x),
                            ("suf.y", sufy, exp_suf.y),
                            ("pta.x", pax, pt_a.x),
                            ("pta.y", pay, pt_a.y),
                            ("z_a", za, exp_za)]:
        assert np.array_equal(np.asarray(got), np.asarray(exp)), cname
