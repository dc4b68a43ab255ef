"""Field "kind" objects — the TPU-native analogue of the reference traits.

The reference expresses fields as Rust traits over element types
(``Field``/``PrimeField``/``FftField``, reference: ff/src/fields/mod.rs:94,
prime.rs:27).  Here a *field kind* is a lightweight singleton object whose
methods act on batched pytree *values*:

  * prime field element batch  = uint32[..., L] limb array (Montgomery form)
  * quadratic extension batch  = (c0, c1) tuple of base values
  * cubic extension batch      = (c0, c1, c2)

Values are plain pytrees, so they pass freely through jit / scan / shard_map;
the kind objects are static and closed over at trace time.  An ergonomic
operator-overloaded wrapper lives in fields/element.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_select(mask, a, b):
    """Select between two equal-structure values; mask over batch dims.

    Limb-major layout: leaves are [L, *batch], so a batch-shaped mask
    broadcasts right-aligned with no reshaping."""
    return jax.tree_util.tree_map(lambda x, y: jnp.where(mask, x, y), a, b)


def tree_broadcast_to(value, batch_shape):
    batch_shape = tuple(batch_shape)

    def bc(x):
        missing = len(batch_shape) + 1 - x.ndim
        if missing > 0:
            x = x.reshape(x.shape[:1] + (1,) * missing + x.shape[1:])
        return jnp.broadcast_to(x, x.shape[:1] + batch_shape)

    return jax.tree_util.tree_map(bc, value)


class Field:
    """Abstract field kind. Subclasses: PrimeField, QuadExtField, CubicExtField."""

    name: str

    # --- constants -------------------------------------------------------
    def zero(self, batch_shape=()):
        raise NotImplementedError

    def one(self, batch_shape=()):
        raise NotImplementedError

    def characteristic(self) -> int:
        raise NotImplementedError

    def extension_degree(self) -> int:
        raise NotImplementedError

    def order(self) -> int:
        return self.characteristic() ** self.extension_degree()

    def prime_kind(self):
        """The PrimeField kind at the bottom of the tower."""
        k = self
        while hasattr(k, "base"):
            k = k.base
        return k

    def dot(self, terms):
        """sum of s * (a * b) over terms = [(s:int, a, b[, a_mask, b_mask])],
        fused into one prime-field kernel when the tower has an integer
        multiplication tensor (see fields/dot.py); falls back to the
        generic mul/add path otherwise."""
        from . import dot as dot_mod

        out = dot_mod.dot(self, terms)
        if out is not None:
            return out
        acc = None
        for term in terms:
            s, a, b = term[0], term[1], term[2]
            if s == 0:
                continue
            t0 = self.mul(a, b)
            if s < 0:
                t0 = self.neg(t0)
                s = -s
            t = t0
            for _ in range(s - 1):  # small scales; fallback kinds only
                t = self.add(t, t0)
            acc = t if acc is None else self.add(acc, t)
        return acc

    # --- arithmetic --------------------------------------------------------
    def add(self, a, b):
        raise NotImplementedError

    def sub(self, a, b):
        raise NotImplementedError

    def neg(self, a):
        raise NotImplementedError

    def mul(self, a, b):
        raise NotImplementedError

    def square(self, a):
        return self.mul(a, a)

    def double(self, a):
        return self.add(a, a)

    def inverse(self, a):
        """Multiplicative inverse; maps 0 to 0 (caller checks is_zero)."""
        raise NotImplementedError

    def frobenius(self, a, power: int = 1):
        raise NotImplementedError

    # --- predicates ---------------------------------------------------------
    def is_zero(self, a):
        raise NotImplementedError

    def equal(self, a, b):
        raise NotImplementedError

    def is_one(self, a):
        return self.equal(a, self.one(self.batch_shape(a)))

    def select(self, mask, a, b):
        return tree_select(mask, a, b)

    # --- structure ----------------------------------------------------------
    # Leaves are limb-major [L, *batch]; ``axis`` arguments below index the
    # BATCH axes (axis=0 = leading batch axis = leaf array axis 1).
    def batch_shape(self, a) -> tuple:
        leaf = jax.tree_util.tree_leaves(a)[0]
        return leaf.shape[1:]

    def broadcast_to(self, a, batch_shape):
        return tree_broadcast_to(a, batch_shape)

    def stack(self, values, axis=0):
        ax = axis + 1 if axis >= 0 else axis
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=ax), *values)

    def concatenate(self, values, axis=0):
        ax = axis + 1 if axis >= 0 else axis
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=ax), *values
        )

    def index(self, a, idx):
        """Slice/gather along the batch axes (idx skips the limb axis)."""
        if not isinstance(idx, tuple):
            idx = (idx,)
        full = (slice(None),) + idx
        return jax.tree_util.tree_map(lambda x: x[full], a)

    # --- host conversions -----------------------------------------------------
    def from_int(self, x, batch_shape=()):
        """Host int (or nested list matching batch_shape) -> device value."""
        raise NotImplementedError

    def to_int(self, a):
        """Device value -> host int / nested list (canonical representation)."""
        raise NotImplementedError

    def random(self, rng, batch_shape=()):
        """Uniform random value, sampled host-side from a random.Random."""
        raise NotImplementedError

    # --- generic exponentiation ----------------------------------------------
    def pow_int(self, a, e: int):
        """a^e for a host-constant exponent, via an on-device bit scan."""
        e = int(e)
        if e < 0:
            return self.pow_int(self.inverse(a), -e)
        shape = self.batch_shape(a)
        one = self.one(shape)
        if e == 0:
            return one
        nbits = e.bit_length()
        if nbits <= 4:
            res = one
            for bit in bin(e)[2:]:
                res = self.square(res)
                if bit == "1":
                    res = self.mul(res, a)
            return res
        bits = jnp.asarray(
            [(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.bool_
        )

        def body(res, bit):
            res = self.square(res)
            res = self.select(
                jnp.broadcast_to(bit, shape), self.mul(res, a), res
            )
            return res, None

        res, _ = jax.lax.scan(body, one, bits)
        return res

    def pow_with_table(self, powers_of_2, e: int):
        """a^e from a precomputed table [a, a^2, a^4, ...] — skips the
        squarings (reference: ff/src/fields/mod.rs:301-309).  Returns
        None when the table is too short for e's bit length."""
        e = int(e)
        if e < 0:
            raise ValueError("negative exponent")
        res = None
        bit = 0
        while e:
            if e & 1:
                if bit >= len(powers_of_2):
                    return None
                t = powers_of_2[bit]
                res = t if res is None else self.mul(res, t)
            e >>= 1
            bit += 1
        if res is None:
            shape = self.batch_shape(powers_of_2[0]) if powers_of_2 else ()
            return self.one(shape)
        return res

    def pow_table(self, a, n_bits: int):
        """Build the [a, a^2, a^4, ...] table for pow_with_table."""
        table = [a]
        for _ in range(n_bits - 1):
            table.append(self.square(table[-1]))
        return table

    def sum(self, a, axis=0):
        """Field sum along a batch axis via a work-efficient tree reduction."""
        ax = axis + 1 if axis >= 0 else axis
        # pairwise tree reduction in log2 rounds
        n = jax.tree_util.tree_leaves(a)[0].shape[ax]
        val = a
        while n > 1:
            half = n // 2
            lo = jax.tree_util.tree_map(
                lambda x: jax.lax.slice_in_dim(x, 0, half, axis=ax), val
            )
            hi = jax.tree_util.tree_map(
                lambda x: jax.lax.slice_in_dim(x, half, 2 * half, axis=ax), val
            )
            combined = self.add(lo, hi)
            if n % 2:
                last = jax.tree_util.tree_map(
                    lambda x: jax.lax.slice_in_dim(x, n - 1, n, axis=ax), val
                )
                combined = jax.tree_util.tree_map(
                    lambda c, l: jnp.concatenate([c, l], axis=ax), combined, last
                )
                n = half + 1
            else:
                n = half
            val = combined
        return jax.tree_util.tree_map(lambda x: jnp.squeeze(x, axis=ax), val)
