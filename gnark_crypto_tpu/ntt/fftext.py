"""NTT over extension-field vectors (counterpart of
``field/<f>/fft/fftext.go`` / ``fftext6.go``).

The DFT is base-field linear, so a transform of an E2/E4/E6 vector is d
independent base-field transforms over the coefficient slots — expressed as
one vmap over the flattened coefficient axes (the reference generates
dedicated fftext kernels per extension).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gnark_crypto_tpu.ntt import fft as fftm
from gnark_crypto_tpu.ntt.domain import Domain


def _flatten_ext(domain: Domain, a):
    n = domain.n
    base_dims = domain.eng.elem_dims  # trailing dims of a base element
    ext_shape = a.shape[1 : a.ndim - base_dims]
    d = 1
    for s in ext_shape:
        d *= s
    flat = a.reshape(n, d, *a.shape[a.ndim - base_dims:])
    return flat, ext_shape, d


def fft_ext(domain: Domain, a, decimation=fftm.DIF, coset: bool = False):
    """a: (n, *ext_dims, *base_elem_dims) Montgomery -> same shape."""
    flat, ext_shape, d = _flatten_ext(domain, a)
    out = jax.vmap(lambda v: fftm.fft(domain, v, decimation, coset),
                   in_axes=1, out_axes=1)(flat)
    return out.reshape(a.shape)


def fft_inverse_ext(domain: Domain, a, decimation=fftm.DIF,
                    coset: bool = False):
    flat, ext_shape, d = _flatten_ext(domain, a)
    out = jax.vmap(lambda v: fftm.fft_inverse(domain, v, decimation, coset),
                   in_axes=1, out_axes=1)(flat)
    return out.reshape(a.shape)
