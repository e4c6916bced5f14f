"""Uniform field-engine facade over the limb engine (mont) and f31 engine.

gnark-crypto gets one generated package per field with an identical API
(Element, Vector); here one :class:`FieldEngine` object per spec exposes the
same op set regardless of representation:

  * multi-limb fields: ``int32[..., L]`` (field/mont.py), elem_dims=1
  * 31-bit fields:     ``uint32[...]``   (field/f31.py),  elem_dims=0
  * goldilocks:        ``uint32[..., 2]`` (field/f64.py), elem_dims=1

Engines are created once per spec (identity-cached) so they are safe to use
as jit static arguments.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from gnark_crypto_tpu.field import f31, f64, mont
from gnark_crypto_tpu.specs.field import FieldSpec

_DELEGATED = [
    "from_int", "to_int", "zeros", "ones", "add", "sub", "neg", "double",
    "halve", "mul", "square", "to_mont", "from_mont", "mul_const", "is_zero",
    "equal", "select", "exp_const", "inverse", "batch_inverse", "legendre",
    "sqrt", "sum_reduce", "inner_product", "to_bytes_host", "from_bytes_host",
]


class FieldEngine:
    def __init__(self, spec: FieldSpec, impl):
        self.spec = spec
        self._impl = impl
        # trailing element dims: limb axis (mont) / [lo, hi] pair (f64)
        self.elem_dims = 0 if impl is f31 else 1
        for name in _DELEGATED:
            fn = getattr(impl, name, None)
            if fn is not None:
                setattr(self, name, functools.partial(fn, spec))

    # --- shape helpers: "element shape" = array shape minus limb dims -------
    def eshape(self, x) -> tuple[int, ...]:
        nd = x.ndim - self.elem_dims
        return tuple(x.shape[:nd])

    def reshape(self, x, shape):
        return x.reshape(*shape, *x.shape[x.ndim - self.elem_dims:])

    def broadcast_to(self, x, shape):
        return jnp.broadcast_to(x, (*shape, *x.shape[x.ndim - self.elem_dims:]))

    def tile_lead(self, x, reps: int):
        """Tile along the leading element axis."""
        return jnp.tile(x, (reps,) + (1,) * (x.ndim - 1))

    def where(self, cond, x, y):
        """Select with cond shaped like the element shape."""
        if self.elem_dims:
            cond = cond[..., None]
        return jnp.where(cond, x, y)

    def is_square(self, x):
        """QR mask via Euler criterion (legendre in {0, 1, q-1})."""
        leg = self.legendre(x)
        one = self.broadcast_to(self.ones(), self.eshape(x))
        return self.equal(leg, one) | self.is_zero(x)

    def sgn0(self, x):
        """RFC 9380 sgn0: parity of the canonical value (on device)."""
        plain = self.from_mont(x)
        if self.elem_dims:
            return plain[..., 0] & 1
        return (plain & 1).astype(jnp.int32)

    def __repr__(self):
        return f"FieldEngine({self.spec.name})"

    def __hash__(self):
        return hash(("FieldEngine", self.spec))

    def __eq__(self, other):
        return isinstance(other, FieldEngine) and other.spec == self.spec


@functools.lru_cache(maxsize=None)
def for_spec(spec: FieldSpec) -> FieldEngine:
    if spec.n_limbs == 1 and spec.limb_bits == 32:
        return FieldEngine(spec, f31)
    if spec.n_limbs == 2 and spec.limb_bits == 32:
        return FieldEngine(spec, f64)
    return FieldEngine(spec, mont)


def for_field(name: str) -> FieldEngine:
    from gnark_crypto_tpu.specs.field import get_field
    return for_spec(get_field(name))
