"""GT as an additive group: the reference's ``PairingOutput`` wrapper
(ec/src/pairing.rs:134-348), which gives the pairing target group
additive notation plus ``ScalarMul``/``VariableBaseMSM`` support.

TPU-native form: a *group kind* over a pairing target field's
cyclotomic subgroup — zero is 1_GT, addition is the field multiply,
negation is the cyclotomic inverse (conjugation), doubling is the
cyclotomic square, and scalar multiplication is exponentiation.  All
operations are batched over lanes like the curve kinds, so a GT "MSM"
is one batched exponentiation scan + a product fold.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..curves.sw import scalar_bits_le


class GTGroup:
    """Additive-notation group kind over a cyclotomic subgroup."""

    def __init__(self, field, scalar_modulus: int):
        self.field = field
        self.scalar_modulus = int(scalar_modulus)

    # ------------------------------------------------------------ basics
    def zero(self, batch_shape=()):
        return self.field.one(batch_shape)

    def batch_shape(self, g):
        return self.field.batch_shape(g)

    def add(self, g, h):
        return self.field.mul(g, h)

    def neg(self, g):
        return self.field.cyclotomic_inverse(g)

    def sub(self, g, h):
        return self.add(g, self.neg(h))

    def double(self, g):
        return self.field.cyclotomic_square(g)

    def equal(self, g, h):
        return self.field.equal(g, h)

    def is_zero(self, g):
        return self.field.equal(g, self.field.one(self.batch_shape(g)))

    def select(self, mask, g, h):
        return self.field.select(mask, g, h)

    def index(self, g, idx):
        return jax.tree_util.tree_map(lambda a: a[..., idx], g)

    # -------------------------------------------------------- scalar mul
    def mul_int(self, g, k: int):
        """g * k for a host-constant scalar (cyclotomic NAF exp)."""
        return self.field.cyclotomic_exp(g, int(k) % self.scalar_modulus)

    def scalar_mul(self, g, scalars: jnp.ndarray):
        """g * scalar for traced per-lane scalars (uint32[Ls, *batch]
        canonical limb-major 16-bit limbs) — the PairingOutput
        ``mul_bigint``, as a square-and-multiply scan."""
        F = self.field
        shape = self.batch_shape(g)
        bits = scalar_bits_le(scalars)  # [nbits, *batch] LE

        def body(res, bit):
            res = F.cyclotomic_square(res)
            res = F.select(
                jnp.broadcast_to(bit, shape), F.mul(res, g), res
            )
            return res, None

        res, _ = jax.lax.scan(body, F.one(shape), bits[::-1])
        return res

    def msm(self, gs, scalars: jnp.ndarray):
        """sum_i scalars[i] * gs[i] (= prod_i gs[i]^scalars[i]): the
        reference's ``VariableBaseMSM for PairingOutput``
        (ec/src/pairing.rs:328-348).  One batched exponentiation scan
        over all lanes, then a product fold along the batch axis."""
        F = self.field
        powered = self.scalar_mul(gs, scalars)  # [.., n] batch
        moved = jax.tree_util.tree_map(
            lambda a: jnp.moveaxis(a, -1, 0), powered
        )
        rest = self.batch_shape(gs)[:-1]

        def body(acc, p):
            return F.mul(acc, p), None

        total, _ = jax.lax.scan(body, F.one(rest), moved)
        return total
