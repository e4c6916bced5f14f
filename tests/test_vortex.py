"""Vortex commitment scheme roundtrip (field/koalabear/vortex flow)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from gnark_crypto_tpu.protocols import vortex
from gnark_crypto_tpu.specs import field as fs
from gnark_crypto_tpu.towers.smallfield import e4 as e4_engine


def _row_eval_at(p, row_vals, x4):
    """Evaluate a row (Lagrange on the small domain) at an E4 point."""
    from gnark_crypto_tpu.ntt import fft as fftm

    eng = p.eng
    m = eng.to_mont(eng.from_int(row_vals, mont=False))
    coeffs = eng.from_mont(
        fftm.bit_reverse(fftm.fft_inverse(p.dom_small, m, fftm.DIF)))
    c4 = vortex._base_to_e4_plain(p, coeffs)
    return vortex._e4_horner(p, c4, x4)


def test_vortex_commit_open_verify():
    q = fs.KOALABEAR.modulus
    rng = random.Random(9)
    nb_cols, rows_n = 16, 4
    p = vortex.new_params(nb_cols, rows_n, num_selected_columns=4)
    e4 = p.e4

    rows_vals = [[rng.randrange(q) for _ in range(nb_cols)]
                 for _ in range(rows_n)]
    rows = p.eng.from_int([v for r in rows_vals for v in r],
                          mont=False).reshape(rows_n, nb_cols)
    ps = vortex.commit(p, rows)

    alpha = tuple((rng.randrange(q), rng.randrange(q)) for _ in range(2))
    x = tuple((rng.randrange(q), rng.randrange(q)) for _ in range(2))
    ps = vortex.open_lincomb(ps, alpha)

    selected = [0, 3, 17, 30]
    proof = vortex.open_columns(ps, selected)

    x4 = e4.from_int(x)
    claimed = []
    for rv in rows_vals:
        val = _row_eval_at(p, rv, x4)  # (2, 2) montgomery
        vals = [p.eng.to_int(jnp.ravel(val)[i][None])[0] for i in range(4)]
        claimed.append(((vals[0], vals[1]), (vals[2], vals[3])))

    assert vortex.verify(p, ps.root, proof, selected, alpha, x, claimed)

    # tampered column fails
    bad = vortex.Proof(
        ualpha=proof.ualpha,
        opened_columns=proof.opened_columns.at[0, 0].add(1),
        merkle_paths=proof.merkle_paths)
    assert not vortex.verify(p, ps.root, bad, selected, alpha, x, claimed)

    # tampered claim fails
    bad_claim = list(claimed)
    c0 = bad_claim[0]
    bad_claim[0] = (((c0[0][0] + 1) % q, c0[0][1]), c0[1])
    assert not vortex.verify(p, ps.root, proof, selected, alpha, x,
                             bad_claim)
