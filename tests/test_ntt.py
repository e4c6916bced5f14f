"""NTT tests vs a Python-int DFT oracle (reference semantics: fft.go)."""

import functools
import random

import numpy as np
import pytest

from gnark_crypto_tpu.field.api import for_spec
from gnark_crypto_tpu.ntt import fft as fftm
from gnark_crypto_tpu.ntt.domain import Domain
from gnark_crypto_tpu.specs import field as fs


@functools.lru_cache(maxsize=None)
def get_domain(spec, n):
    return Domain(spec, n)


@functools.lru_cache(maxsize=None)
def get_fft(spec, n, decimation, coset, inverse):
    return fftm.make_fft_fn(get_domain(spec, n), decimation, coset, inverse)


def naive_dft(vals, w, q):
    n = len(vals)
    return [sum(vals[j] * pow(w, i * j, q) for j in range(n)) % q
            for i in range(n)]


@pytest.mark.parametrize("spec", [fs.BN254_FR, fs.GOLDILOCKS, fs.KOALABEAR],
                         ids=lambda s: s.name)
def test_fft_matches_dft(spec):
    n = 32
    q = spec.modulus
    d = get_domain(spec, n)
    eng = d.eng
    rng = random.Random(42)
    vals = [rng.randrange(q) for _ in range(n)]
    a = eng.from_int(vals)
    expect = naive_dft(vals, d.generator_int, q)

    out_dif = fftm.bit_reverse(get_fft(spec, n, fftm.DIF, False, False)(a))
    assert eng.to_int(out_dif) == expect

    out_dit = get_fft(spec, n, fftm.DIT, False, False)(fftm.bit_reverse(a))
    assert eng.to_int(out_dit) == expect


def test_fft_coset_matches_shifted_dft():
    spec = fs.BN254_FR
    q = spec.modulus
    n = 32
    d = get_domain(spec, n)
    eng = d.eng
    rng = random.Random(1)
    vals = [rng.randrange(q) for _ in range(n)]
    a = eng.from_int(vals)
    # coset DIF evaluates poly at u*g^i == DFT of (vals[j] * u^j)
    shifted = [(v * pow(d.shift_int, j, q)) % q for j, v in enumerate(vals)]
    expect = naive_dft(shifted, d.generator_int, q)
    out = fftm.bit_reverse(get_fft(spec, n, fftm.DIF, True, False)(a))
    assert eng.to_int(out) == expect
    out2 = get_fft(spec, n, fftm.DIT, True, False)(fftm.bit_reverse(a))
    assert eng.to_int(out2) == expect


@pytest.mark.parametrize("spec", [fs.BN254_FR, fs.KOALABEAR],
                         ids=lambda s: s.name)
@pytest.mark.parametrize("coset", [False, True])
def test_fft_roundtrip(spec, coset):
    n = 64
    d = get_domain(spec, n)
    eng = d.eng
    rng = random.Random(7)
    vals = [rng.randrange(spec.modulus) for _ in range(n)]
    a = eng.from_int(vals)
    # DIF forward (bit-reversed out) + DIT inverse (bit-reversed in) -> natural
    fwd = get_fft(spec, n, fftm.DIF, coset, False)(a)
    back = get_fft(spec, n, fftm.DIT, coset, True)(fwd)
    assert eng.to_int(back) == vals
    # and the transposed pairing
    fwd2 = get_fft(spec, n, fftm.DIT, coset, False)(fftm.bit_reverse(a))
    back2 = get_fft(spec, n, fftm.DIF, coset, True)(fwd2)
    assert eng.to_int(fftm.bit_reverse(back2)) == vals


def test_domain_constants_match_reference_layout():
    # twiddles[stage][j] == w^(j*2^stage) (domain.go buildTwiddles)
    spec = fs.BN254_FR
    q = spec.modulus
    d = get_domain(spec, 16)
    eng = d.eng
    for s in range(3):
        tw = eng.to_int(d.stage_twiddles(s))
        assert tw == [pow(d.generator_int, j * (1 << s), q)
                      for j in range(16 >> (s + 1))]
    ct = eng.to_int(d.coset_table)
    assert ct[:4] == [pow(d.shift_int, j, q) for j in range(4)]
    assert d.shift_int == 5  # bn254 FrMultiplicativeGen (generator_fft.go:168)


def test_bit_reverse_matches_reference():
    # utils/bitreverse.go:14 semantics
    eng = for_spec(fs.KOALABEAR)
    got = eng.to_int(fftm.bit_reverse(eng.from_int(list(range(8)))))
    assert got == [0, 4, 2, 6, 1, 5, 3, 7]


def test_domain_serialization_gnark_wire_format():
    """Domain.to_bytes/domain_from_bytes match the reference's WriteTo
    layout (fft/domain.go:348): uint64-BE cardinality, 5 canonical fr
    elements, precompute flag."""
    import pytest

    from gnark_crypto_tpu.ntt.domain import Domain, domain_from_bytes
    from gnark_crypto_tpu.specs import field as fs

    spec = fs.BN254_FR
    dom = Domain(spec, 64)
    buf = dom.to_bytes()
    nb = spec.n_bytes
    assert len(buf) == 8 + 5 * nb + 1
    # layout spot checks
    assert int.from_bytes(buf[:8], "big") == 64
    assert int.from_bytes(buf[8 + nb : 8 + 2 * nb], "big") == \
        dom.generator_int
    assert buf[-1] == 1
    back = domain_from_bytes(spec, buf)
    assert back.generator_int == dom.generator_int
    assert back.shift_int == dom.shift_int
    # corruption detection: flip a byte of the generator
    bad = bytearray(buf)
    bad[8 + nb] ^= 1
    with pytest.raises(ValueError):
        domain_from_bytes(spec, bytes(bad))


def test_fft_batch_rows_matches_per_row():
    """fft_batch (vmapped rows) vs per-row fft, both engines."""
    import numpy as np
    import jax.numpy as jnp

    from gnark_crypto_tpu.ntt import fft as fftm
    from gnark_crypto_tpu.ntt.domain import Domain
    from gnark_crypto_tpu.specs import field as fs

    rng = np.random.default_rng(11)
    for spec, shape in ((fs.BN254_FR, (3, 64, fs.BN254_FR.n_limbs)),
                        (fs.KOALABEAR, (3, 64))):
        dom = Domain(spec, 64, with_coset=True)
        if spec.n_limbs == 1:
            a = jnp.asarray(rng.integers(0, spec.modulus, size=shape,
                                         dtype=np.uint32))
        else:  # canonical (< q) elements — the transform contract
            from gnark_crypto_tpu.field import mont
            B, n = shape[0], shape[1]
            vals = [int(rng.integers(0, 1 << 62)) for _ in range(B * n)]
            a = mont.from_int(spec, vals).reshape(B, n, spec.n_limbs)
        got = fftm.fft_batch(dom, a, fftm.DIF, coset=True)
        exp = jnp.stack([fftm.fft(dom, a[i], fftm.DIF, coset=True)
                         for i in range(a.shape[0])])
        assert np.array_equal(np.asarray(got), np.asarray(exp)), spec.name
        gi = fftm.fft_batch(dom, got, fftm.DIT, coset=True, inverse=True)
        assert np.array_equal(np.asarray(gi), np.asarray(a)), spec.name
