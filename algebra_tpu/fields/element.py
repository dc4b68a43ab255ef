"""Ergonomic operator-overloaded wrapper around (field kind, value) pairs.

Gives tests and user code an arkworks-like surface (``a * b + c.inverse()``)
over the batched pytree values used by the kernels.  Registered as a pytree
so wrapped elements can cross jit boundaries; the field kind is static
aux data.
"""

from __future__ import annotations

import jax

from .field import Field


@jax.tree_util.register_pytree_node_class
class Felt:
    """A (possibly batched) field element."""

    __slots__ = ("field", "value")

    def __init__(self, field: Field, value):
        self.field = field
        self.value = value

    # pytree protocol — field kind is static
    def tree_flatten(self):
        return (self.value,), self.field

    @classmethod
    def tree_unflatten(cls, field, children):
        return cls(field, children[0])

    def _coerce(self, other):
        if isinstance(other, Felt):
            return other.value
        if isinstance(other, int):
            return self.field.from_int(other)
        return other

    def __add__(self, other):
        return Felt(self.field, self.field.add(self.value, self._coerce(other)))

    def __radd__(self, other):
        return self.__add__(other)

    def __sub__(self, other):
        return Felt(self.field, self.field.sub(self.value, self._coerce(other)))

    def __rsub__(self, other):
        return Felt(self.field, self.field.sub(self._coerce(other), self.value))

    def __mul__(self, other):
        return Felt(self.field, self.field.mul(self.value, self._coerce(other)))

    def __rmul__(self, other):
        return self.__mul__(other)

    def __neg__(self):
        return Felt(self.field, self.field.neg(self.value))

    def __pow__(self, e: int):
        return Felt(self.field, self.field.pow_int(self.value, e))

    def __truediv__(self, other):
        other_v = self._coerce(other)
        return Felt(self.field, self.field.mul(self.value, self.field.inverse(other_v)))

    def __eq__(self, other):
        import numpy as np

        return bool(np.all(np.asarray(self.field.equal(self.value, self._coerce(other)))))

    __hash__ = None  # batched elements are not hashable

    def square(self):
        return Felt(self.field, self.field.square(self.value))

    def double(self):
        return Felt(self.field, self.field.double(self.value))

    def inverse(self):
        return Felt(self.field, self.field.inverse(self.value))

    def frobenius(self, power: int = 1):
        return Felt(self.field, self.field.frobenius(self.value, power))

    def is_zero(self):
        import numpy as np

        return bool(np.all(np.asarray(self.field.is_zero(self.value))))

    def to_int(self):
        return self.field.to_int(self.value)

    def __repr__(self):
        try:
            return f"Felt({self.field.name}, {self.to_int()})"
        except Exception:
            return f"Felt({self.field.name}, <traced>)"
