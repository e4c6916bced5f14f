"""MPC powers-of-tau ceremony tests (kzg/mpcsetup.go flow)."""

import numpy as np
import pytest

from gnark_crypto_tpu.protocols import mpcsetup


def test_kzg_ceremony_two_contributions():
    name = "bn254"
    s0 = mpcsetup.initialize_setup(name, 6)
    s1 = mpcsetup.contribute(s0, tau=0x1234567)
    assert mpcsetup.verify_setup(s0, s1)
    s2 = mpcsetup.contribute(s1, tau=0xFEDCBA9)
    assert mpcsetup.verify_setup(s1, s2)
    # final powers == [ (tau1*tau2)^i ] G1
    from gnark_crypto_tpu.curve.jacobian import Affine, curve_ops
    from gnark_crypto_tpu.specs import curve as cs

    g1c = curve_ops(cs.get_curve("bn254_g1"))
    r = g1c.spec.fr.modulus
    tau = 0x1234567 * 0xFEDCBA9 % r
    g = g1c.generator_affine()
    base = g1c.from_affine(Affine(
        g1c.fp.broadcast_to(g.x, (6,)), g1c.fp.broadcast_to(g.y, (6,))))
    expect = g1c.to_affine(g1c.scalar_mul(
        base, g1c.fr.from_int([pow(tau, i, r) for i in range(6)],
                              mont=False)))
    assert np.array_equal(np.asarray(s2.g1_powers.x), np.asarray(expect.x))

    # tampered chain is rejected
    import jax.numpy as jnp

    bad = mpcsetup.KzgMpcSetup(
        name=name,
        g1_powers=Affine(
            jnp.concatenate([s2.g1_powers.x[:3], s2.g1_powers.x[2:5]]),
            jnp.concatenate([s2.g1_powers.y[:3], s2.g1_powers.y[2:5]])),
        g2_tau=s2.g2_tau, proof=s2.proof, challenge=s2.challenge)
    assert not mpcsetup.verify_setup(s1, bad)
