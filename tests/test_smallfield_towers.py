"""Small-field extension towers (koalabear/babybear E2-E4-E6, goldilocks E2)
+ extension-vector NTT."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from gnark_crypto_tpu.ntt import fft as fftm
from gnark_crypto_tpu.ntt.domain import Domain
from gnark_crypto_tpu.ntt.fftext import fft_ext, fft_inverse_ext
from gnark_crypto_tpu.specs import field as fs
from gnark_crypto_tpu.towers import smallfield as sf


@pytest.mark.parametrize("field,maker,deg", [
    ("koalabear", sf.e2, 2), ("koalabear", sf.e4, 4), ("koalabear", sf.e6, 6),
    ("babybear", sf.e2, 2), ("babybear", sf.e4, 4),
    ("goldilocks", sf.e2, 2),
])
def test_field_laws(field, maker, deg):
    eng = maker(field)
    q = fs.get_field(field).modulus
    rng = random.Random(deg)

    def rand_elem():
        def rec(e):
            if hasattr(e, "degree"):
                return tuple(rec(e.base) for _ in range(e.degree))
            return rng.randrange(q)
        return rec(eng)

    xs = jnp.stack([eng.from_int(rand_elem()) for _ in range(3)])
    ys = jnp.stack([eng.from_int(rand_elem()) for _ in range(3)])
    zs = jnp.stack([eng.from_int(rand_elem()) for _ in range(3)])
    lhs = eng.mul(xs, eng.mul(ys, zs))
    rhs = eng.mul(eng.mul(xs, ys), zs)
    assert np.array_equal(np.asarray(lhs), np.asarray(rhs))
    lhs = eng.mul(xs, eng.add(ys, zs))
    rhs = eng.add(eng.mul(xs, ys), eng.mul(xs, zs))
    assert np.array_equal(np.asarray(lhs), np.asarray(rhs))
    assert np.array_equal(np.asarray(eng.square(xs)),
                          np.asarray(eng.mul(xs, xs)))
    one = eng.broadcast_to(eng.ones(), (3,))
    assert np.array_equal(np.asarray(eng.mul(xs, eng.inverse(xs))),
                          np.asarray(one))


def test_fft_ext_linearity():
    spec = fs.KOALABEAR
    n = 32
    dom = Domain(spec, n, with_coset=False)
    e4 = sf.e4("koalabear")
    rng = random.Random(5)
    q = spec.modulus
    vals = [tuple(tuple(rng.randrange(q) for _ in range(2)) for _ in range(2))
            for _ in range(n)]
    a = jnp.stack([e4.from_int(v) for v in vals])  # (n, 2, 2) mont
    out = fft_ext(dom, a)
    back = fft_inverse_ext(dom, out, fftm.DIT)
    # DIF out + DIT inverse with bitrev pairing == identity
    assert np.array_equal(np.asarray(back), np.asarray(a))
    # slot consistency: transform of slot (0,0) equals base-field transform
    base_out = fftm.fft(dom, a[:, 0, 0], fftm.DIF)
    assert np.array_equal(np.asarray(out[:, 0, 0]), np.asarray(base_out))
