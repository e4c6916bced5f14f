"""BW6-761: Fp6 direct tower algebra + optimal ate pairing."""

import random

import numpy as np
import pytest

from gnark_crypto_tpu.curve.jacobian import Affine, curve_ops
from gnark_crypto_tpu.pairing import pairing6
from gnark_crypto_tpu.specs import curve as cs
from gnark_crypto_tpu.towers.tower6 import get_tower6


def rand_e6(tw, n, seed):
    rng = random.Random(seed)
    p = tw.p
    vals = [tuple(tuple(rng.randrange(p) for _ in range(3))
                  for _ in range(2)) for _ in range(n)]
    import jax.numpy as jnp
    return jnp.stack([tw.e6.from_int(v) for v in vals])


def test_e6_field_laws():
    tw = get_tower6("bw6_761")
    e6 = tw.e6
    x = rand_e6(tw, 2, 1)
    y = rand_e6(tw, 2, 2)
    z = rand_e6(tw, 2, 3)
    assert np.array_equal(np.asarray(e6.mul(x, e6.mul(y, z))),
                          np.asarray(e6.mul(e6.mul(x, y), z)))
    one = e6.broadcast_to(e6.ones(), (2,))
    assert np.array_equal(np.asarray(e6.mul(x, e6.inverse(x))),
                          np.asarray(one))


def test_e6_frobenius():
    tw = get_tower6("bw6_761")
    e6 = tw.e6
    x = rand_e6(tw, 1, 4)
    assert np.array_equal(np.asarray(tw.frobenius(x)),
                          np.asarray(e6.exp_const(x, tw.p)))
    # conjugate == x^(p^3): check via frobenius applied three times
    f3 = tw.frobenius(tw.frobenius(tw.frobenius(x)))
    assert np.array_equal(np.asarray(tw.conjugate(x)), np.asarray(f3))


def scaled_gen(curve, k):
    g = curve.generator_affine()
    g = Affine(curve.fp.broadcast_to(g.x, (1,)),
               curve.fp.broadcast_to(g.y, (1,)))
    kk = curve.fr.from_int([k], mont=False)
    return curve.to_affine(curve.scalar_mul(curve.from_affine(g), kk,
                                            nbits=max(8, k.bit_length())))


@pytest.mark.parametrize("name", ["bw6_761", "bw6_633"])
def test_bw6_pairing_bilinear(name):
    g1 = curve_ops(cs.get_curve(f"{name}_g1"))
    g2 = curve_ops(cs.get_curve(f"{name}_g2"))
    ctx = pairing6.get_ctx6(name)
    tw, e6 = ctx.tower, ctx.tower.e6

    a, b = 5, 7
    P = scaled_gen(g1, 1)
    Q = scaled_gen(g2, 1)
    Pa = scaled_gen(g1, a)
    Qb = scaled_gen(g2, b)

    base = pairing6.pair(name, P, Q.x, Q.y)
    lhs = pairing6.pair(name, Pa, Qb.x, Qb.y)
    rhs = tw.exp_cyclotomic(base, a * b)
    assert np.array_equal(np.asarray(lhs), np.asarray(rhs)), "bilinearity"

    one = e6.broadcast_to(e6.ones(), (1,))
    assert not bool(np.asarray(e6.equal(base, one)))
    r = g1.spec.fr.modulus
    assert bool(np.asarray(e6.equal(tw.exp_cyclotomic(base, r), one)))


def test_bw6_761_kzg_roundtrip():
    """KZG commit/open/verify over BW6-761 via the pairing facade."""
    import random as _r

    from gnark_crypto_tpu.protocols import kzg

    name = "bw6_761"
    srs = kzg.new_srs(name, 8, 1234567)
    g1c = curve_ops(cs.get_curve(f"{name}_g1"))
    fr = g1c.fr
    rng = _r.Random(9)
    r = g1c.spec.fr.modulus
    poly = fr.from_int([rng.randrange(r) for _ in range(8)], mont=False)
    com = kzg.commit(name, srs.pk, poly)
    point = fr.from_int([424242], mont=False)
    proof = kzg.open_poly(name, srs.pk, poly, point)
    assert bool(np.asarray(kzg.verify(name, com, proof, point, srs.vk)))
    bad = kzg.OpeningProof(
        h=proof.h,
        claimed_value=fr.add_plain(proof.claimed_value, fr.from_int([1], mont=False))
        if hasattr(fr, "add_plain") else
        fr.from_mont(fr.add(fr.to_mont(proof.claimed_value),
                            fr.to_mont(fr.from_int([1], mont=False)))))
    assert not bool(np.asarray(kzg.verify(name, com, bad, point, srs.vk)))


@pytest.mark.parametrize("name", ["bw6_761", "bw6_633"])
def test_bw6_pair_fixed_q_matches_pair(name):
    """PrecomputeLines + PairFixedQ == Pair (reference bw6-761
    pairing.go:408,838), batch of 2 distinct pairs + an infinity P."""
    from gnark_crypto_tpu.pairing import lines as ln

    g1 = curve_ops(cs.get_curve(f"{name}_g1"))
    g2 = curve_ops(cs.get_curve(f"{name}_g2"))

    P, P2 = scaled_gen(g1, 5), scaled_gen(g1, 11)
    Q, Q2 = scaled_gen(g2, 7), scaled_gen(g2, 3)
    Pb = Affine(*(np.concatenate([np.asarray(a), np.asarray(b)])
                  for a, b in zip(P, P2)))
    QX = np.concatenate([np.asarray(Q.x), np.asarray(Q2.x)])
    QY = np.concatenate([np.asarray(Q.y), np.asarray(Q2.y)])

    want = pairing6.pair(name, Pb, QX, QY)
    tabs = ln.precompute_lines(name, QX, QY)
    got = ln.pair_fixed_q(name, Pb, tabs)
    assert np.array_equal(np.asarray(got), np.asarray(want))

    # infinity P contributes 1 (1/0 == 0 convention, pairing.go:845-858)
    zero = np.zeros_like(np.asarray(P.x))
    Pinf = Affine(np.concatenate([np.asarray(P.x), zero]),
                  np.concatenate([np.asarray(P.y), zero]))
    got2 = ln.pair_fixed_q(name, Pinf, tabs)
    want2 = pairing6.pair(name, P, Q.x, Q.y)
    assert np.array_equal(np.asarray(got2), np.asarray(want2))
