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
