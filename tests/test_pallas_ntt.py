"""Pallas NTT passes (interpret mode) vs the XLA reference path."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnark_crypto_tpu.field.api import for_spec
from gnark_crypto_tpu.ntt import fft as fft_mod
from gnark_crypto_tpu.ntt.domain import Domain
from gnark_crypto_tpu.ntt.pallas_ntt import run_stages_pallas
from gnark_crypto_tpu.specs import field as fs

N = 512  # k=9: two tile-aligned stages (half=256,128) + full 7-stage tail


@pytest.fixture(scope="module")
def dom():
    return Domain(fs.BN254_FR, N)


@pytest.fixture(scope="module")
def data(dom):
    eng = for_spec(fs.BN254_FR)
    rng = random.Random(7)
    vals = [rng.randrange(fs.BN254_FR.modulus) for _ in range(N)]
    return eng.from_int(vals)


@pytest.mark.parametrize("decimation", ["DIF", "DIT"])
@pytest.mark.parametrize("inverse", [False, True])
def test_pallas_stages_match_xla(dom, data, decimation, inverse):
    eng = dom.eng
    tw = lambda s: dom.stage_twiddles(s, inverse=inverse)
    if decimation == "DIF":
        ref = fft_mod._dif_stages(eng, data, tw, dom.k)
    else:
        ref = fft_mod._dit_stages(eng, data, tw, dom.k)
    got = run_stages_pallas(dom, data, decimation, inverse, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


# -- four-step (per-tile-constant twiddles) ---------------------------------

N4 = 1 << 14  # smallest size with S1 = S2 = 128


@pytest.fixture(scope="module")
def dom4():
    return Domain(fs.BN254_FR, N4, with_coset=False)


@pytest.fixture(scope="module")
def data4(dom4):
    eng = for_spec(fs.BN254_FR)
    rng = random.Random(13)
    return eng.from_int([rng.randrange(fs.BN254_FR.modulus)
                         for _ in range(N4)])


def test_four_step_dif_forward(dom4, data4):
    from gnark_crypto_tpu.ntt.pallas_ntt4 import run_stages_four_step

    eng = dom4.eng
    tw = lambda s: dom4.stage_twiddles(s, inverse=False)
    ref = fft_mod._dif_stages(eng, data4, tw, dom4.k)
    got = run_stages_four_step(dom4, data4, "DIF", False, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_four_step_dit_inverse_scale_folded(dom4, data4):
    from gnark_crypto_tpu.ntt.pallas_ntt4 import run_stages_four_step

    eng = dom4.eng
    spec = fs.BN254_FR
    tw = lambda s: dom4.stage_twiddles(s, inverse=True)
    ref = fft_mod._dit_stages(eng, data4, tw, dom4.k)
    n_inv = eng.broadcast_to(eng.from_int(pow(N4, -1, spec.modulus)), (N4,))
    ref = eng.mul(ref, n_inv)  # four-step folds 1/n into the untwist table
    got = run_stages_four_step(dom4, data4, "DIT", True, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


# -- f31 (koalabear) --------------------------------------------------------

N31 = 4096  # k=12: two lane-aligned stages + full 10-stage fused tail


@pytest.fixture(scope="module")
def dom31():
    return Domain(fs.KOALABEAR, N31)


@pytest.fixture(scope="module")
def data31(dom31):
    eng = for_spec(fs.KOALABEAR)
    rng = random.Random(11)
    return eng.from_int([rng.randrange(fs.KOALABEAR.modulus)
                         for _ in range(N31)])


@pytest.mark.parametrize("decimation", ["DIF", "DIT"])
@pytest.mark.parametrize("inverse", [False, True])
def test_pallas_f31_stages_match_xla(dom31, data31, decimation, inverse):
    from gnark_crypto_tpu.ntt.pallas_ntt_f31 import run_stages_pallas_f31

    eng = dom31.eng
    tw = lambda s: dom31.stage_twiddles(s, inverse=inverse)
    if decimation == "DIF":
        ref = fft_mod._dif_stages(eng, data31, tw, dom31.k)
    else:
        ref = fft_mod._dit_stages(eng, data31, tw, dom31.k)
    got = run_stages_pallas_f31(dom31, data31, decimation, inverse,
                                interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


# -- radix-4 fused stage pairs ----------------------------------------------

def test_four_step_radix4_dif_forward(dom4, data4, monkeypatch):
    """Fused radix-4 stage pairs (GNARK_NTT_RADIX4=1) == radix-2 path."""
    from gnark_crypto_tpu.ntt.pallas_ntt4 import run_stages_four_step

    ref = run_stages_four_step(dom4, data4, "DIF", False, interpret=True)
    monkeypatch.setenv("GNARK_NTT_RADIX4", "1")
    got = run_stages_four_step(dom4, data4, "DIF", False, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_four_step_radix4_dit_inverse(dom4, data4, monkeypatch):
    from gnark_crypto_tpu.ntt.pallas_ntt4 import run_stages_four_step

    ref = run_stages_four_step(dom4, data4, "DIT", True, interpret=True)
    monkeypatch.setenv("GNARK_NTT_RADIX4", "1")
    got = run_stages_four_step(dom4, data4, "DIT", True, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_four_step_radix4_odd_stages(monkeypatch):
    """n = 2^15 -> k1 = 8, k2 = 7: exercises the odd-stage leftover
    radix-2 pass reading through the radix-4 block permutation."""
    from gnark_crypto_tpu.ntt import fft as fft_mod
    from gnark_crypto_tpu.ntt.pallas_ntt4 import run_stages_four_step

    n = 1 << 15
    dom = Domain(fs.BN254_FR, n, with_coset=False)
    eng = dom.eng
    rng = random.Random(15)
    data = eng.from_int([rng.randrange(fs.BN254_FR.modulus)
                         for _ in range(n)])
    ref = run_stages_four_step(dom, data, "DIF", False, interpret=True)
    monkeypatch.setenv("GNARK_NTT_RADIX4", "1")
    got = run_stages_four_step(dom, data, "DIF", False, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("n,decim,inv", [
    (4096, "DIF", False),    # 2 big stages: one fused pair, no leftover
    (8192, "DIF", False),    # 3 big stages: pair + leftover radix-2
    (4096, "DIT", True),     # inverse direction, pending-perm final gather
    (8192, "DIT", True),
])
def test_f31_radix4_matches_radix2(n, decim, inv, monkeypatch):
    from gnark_crypto_tpu.ntt.pallas_ntt_f31 import run_stages_pallas_f31

    dom = Domain(fs.KOALABEAR, n)
    eng = for_spec(fs.KOALABEAR)
    rng = random.Random(n)
    data = eng.from_int([rng.randrange(fs.KOALABEAR.modulus)
                         for _ in range(n)])
    ref = run_stages_pallas_f31(dom, data, decim, inv, interpret=True)
    monkeypatch.setenv("GNARK_NTT_RADIX4", "1")
    got = run_stages_pallas_f31(dom, data, decim, inv, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


# -- f64 (goldilocks) --------------------------------------------------------

N64 = 4096


@pytest.fixture(scope="module")
def dom64():
    return Domain(fs.GOLDILOCKS, N64)


@pytest.fixture(scope="module")
def data64(dom64):
    eng = for_spec(fs.GOLDILOCKS)
    rng = random.Random(13)
    return eng.from_int([rng.randrange(fs.GOLDILOCKS.modulus)
                         for _ in range(N64)])


@pytest.mark.parametrize("decimation", ["DIF", "DIT"])
@pytest.mark.parametrize("inverse", [False, True])
def test_pallas_f64_stages_match_xla(dom64, data64, decimation, inverse):
    from gnark_crypto_tpu.ntt.pallas_ntt_f64 import (run_stages_pallas_f64,
                                                     supported)

    assert supported(dom64, data64)
    eng = dom64.eng
    tw = lambda s: dom64.stage_twiddles(s, inverse=inverse)
    if decimation == "DIF":
        ref = fft_mod._dif_stages(eng, data64, tw, dom64.k)
    else:
        ref = fft_mod._dit_stages(eng, data64, tw, dom64.k)
    got = run_stages_pallas_f64(dom64, data64, decimation, inverse,
                                interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_batch_small_f31_matches_vmapped_fft():
    """run_batch_small_f31 (the fused SIS batch-NTT pass) == vmapped
    per-row fft, forward DIF and inverse DIT, degree 512 (the sis512_16
    shape) and 64."""
    import random as _random

    from gnark_crypto_tpu.ntt.pallas_ntt_f31 import run_batch_small_f31

    for n, B in ((512, 24), (64, 16)):
        dom = Domain(fs.KOALABEAR, n, with_coset=False)
        rng = _random.Random(n)
        q = fs.KOALABEAR.modulus
        a = jnp.asarray(
            np.asarray([[rng.randrange(q) for _ in range(n)]
                        for _ in range(B)], np.uint32))
        want = jax.vmap(lambda p: fft_mod.fft(dom, p, fft_mod.DIF))(a)
        got = run_batch_small_f31(dom, a, fft_mod.DIF, False,
                                  interpret=True)
        assert np.array_equal(np.asarray(got), np.asarray(want)), (n, B)
        # inverse (DIT, no 1/n fold — run_batch is the raw stage pass)
        want_i = jax.vmap(
            lambda p: fft_mod.fft_inverse(dom, p, fft_mod.DIT))(want)
        got_i = run_batch_small_f31(dom, got, fft_mod.DIT, True,
                                    interpret=True)
        eng = dom.eng
        got_i = eng.mul(got_i, jnp.broadcast_to(
            jnp.asarray(dom.cardinality_inv), got_i.shape))
        assert np.array_equal(np.asarray(got_i), np.asarray(want_i)), n


def test_batch_small_f64_matches_vmapped_fft():
    """run_batch_small_f64 (goldilocks batched SIS tail) == vmapped
    per-row fft, forward + inverse, degree 512."""
    import random as _random

    from gnark_crypto_tpu.ntt.pallas_ntt_f64 import run_batch_small_f64

    n, B = 512, 16
    dom = Domain(fs.GOLDILOCKS, n, with_coset=False)
    rng = _random.Random(77)
    q = fs.GOLDILOCKS.modulus
    eng = dom.eng
    vals = [rng.randrange(q) for _ in range(B * n)]
    a = eng.from_int(vals).reshape(B, n, 2)
    want = jax.vmap(lambda p: fft_mod.fft(dom, p, fft_mod.DIF))(a)
    got = run_batch_small_f64(dom, a, fft_mod.DIF, False, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(want))
    want_i = jax.vmap(
        lambda p: fft_mod.fft_inverse(dom, p, fft_mod.DIT))(want)
    got_i = run_batch_small_f64(dom, got, fft_mod.DIT, True,
                                interpret=True)
    got_i = eng.mul(got_i, jnp.broadcast_to(
        jnp.asarray(dom.cardinality_inv), got_i.shape))
    assert np.array_equal(np.asarray(got_i), np.asarray(want_i))
