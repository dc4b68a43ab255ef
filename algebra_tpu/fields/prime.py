"""Prime field kind over a FieldSpec (reference: ff/src/fields/prime.rs:27,
ff/src/fields/models/fp/mod.rs:112).

Element batches are uint32[..., L] limb arrays in Montgomery form; all
arithmetic dispatches to the vectorized kernels in ops/mont.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..bigint import batch_int_to_limbs, int_to_limbs, limbs_to_int
from ..ops import mont
from ..utils.jit import jit_method
from .field import Field
from .spec import FieldSpec, field_spec


class PrimeField(Field):
    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.name = spec.name

    # --- constants ---------------------------------------------------------
    # Values are limb-major uint32[L, *batch] (see ops/mont.py).
    def zero(self, batch_shape=()):
        return jnp.zeros((self.spec.n_limbs,) + tuple(batch_shape), jnp.uint32)

    def one(self, batch_shape=()):
        return mont.bconst(self.spec.one_mont_limbs, batch_shape)

    def constant(self, x: int, batch_shape=()):
        """Embed a host integer constant (canonical) as a Montgomery value."""
        v = int_to_limbs(self.spec.to_mont(x % self.spec.modulus), self.spec.n_limbs)
        return mont.bconst(v, batch_shape)

    def characteristic(self) -> int:
        return self.spec.modulus

    def extension_degree(self) -> int:
        return 1

    # --- arithmetic ---------------------------------------------------------
    def add(self, a, b):
        return mont.add(self.spec, a, b)

    def sub(self, a, b):
        return mont.sub(self.spec, a, b)

    def neg(self, a):
        return mont.neg(self.spec, a)

    def mul(self, a, b):
        return mont.mul(self.spec, a, b)

    def square(self, a):
        return mont.square(self.spec, a)

    def inverse(self, a):
        """Inverse; 0 -> 0.  Large TPU batches amortize through the
        blocked Montgomery-trick kernel (~3 muls/lane,
        ops/mont_pallas.batch_inverse); otherwise a per-lane Fermat
        ladder.  Both produce the unique canonical inverse."""
        import numpy as np

        from .. import config

        batch = a.shape[1:]
        nb = int(np.prod(batch)) if batch else 1
        if config.pallas_enabled() and nb >= config.pallas_min_batch:
            from ..ops import mont_pallas

            return mont_pallas.batch_inverse(self.spec, a)
        return mont.inv(self.spec, a)

    def batch_inverse(self, a, axis=0):
        return mont.batch_inverse(self.spec, a, axis=axis)

    def frobenius(self, a, power: int = 1):
        return a  # x^p == x in Fp

    def mul_by_u32(self, a, k: int):
        return mont.mul_by_u32(self.spec, a, k)

    # --- predicates ----------------------------------------------------------
    def is_zero(self, a):
        return mont.is_zero(self.spec, a)

    def equal(self, a, b):
        return mont.equal(self.spec, a, b)

    # --- square roots / legendre ---------------------------------------------
    @jit_method
    def legendre(self, a):
        """Returns int8 batch: 0 for zero, 1 for QR, -1 for non-QR
        (reference: ff/src/fields/mod.rs legendre via sqrt.rs:13)."""
        s = mont.pow_fixed(self.spec, a, self.spec.modulus_minus_one_div_two)
        one = self.one(self.batch_shape(a))
        is_one = self.equal(s, one)
        is_z = self.is_zero(a)
        return jnp.where(is_z, 0, jnp.where(is_one, 1, -1)).astype(jnp.int8)

    @jit_method
    def sqrt(self, a):
        """Batched square root. Returns (ok_mask, root).

        ok is False where ``a`` is a non-residue (root is garbage there).
        The returned root is the one produced by the precomputation —
        matching the reference's SqrtPrecomputation::{Case3Mod4,
        TonelliShanks} (reference: ff/src/fields/sqrt.rs:67-148) so that
        downstream sign conventions agree.
        """
        spec = self.spec
        if spec.sqrt_mode == "case3mod4":
            root = mont.pow_fixed(spec, a, spec.sqrt_exp)
        else:
            root = self._tonelli_shanks(a)
        ok = self.equal(self.square(root), a)
        return ok, root

    def _tonelli_shanks(self, a):
        """Constant-shape Tonelli-Shanks (s^2/2 squarings, no data-dependent
        control flow — the TPU version of sqrt.rs:67-115).  Expressed with
        nested fori_loops so the compiled program is O(1) in s."""
        import jax

        spec = self.spec
        s = spec.two_adicity
        if spec.two_adic_root_of_unity is None:
            raise ValueError(f"{spec.name}: no generator known; cannot sqrt")
        # w = a^((t-1)/2); x = a*w; b = x*w = a^t
        w = mont.pow_fixed(spec, a, (spec.trace - 1) // 2)
        x = self.mul(a, w)
        b = self.mul(x, w)
        z = self.constant(spec.two_adic_root_of_unity, self.batch_shape(a))
        one = self.one(self.batch_shape(a))

        def outer(j, state):
            x, b, z = state
            i = s - j  # i runs s, s-1, ..., 2
            t = jax.lax.fori_loop(0, i - 2, lambda _, v: self.square(v), b)
            flag = jnp.logical_not(self.equal(t, one))
            x = self.select(flag, self.mul(x, z), x)
            z = self.square(z)
            b = self.select(flag, self.mul(b, z), b)
            return (x, b, z)

        x, b, z = jax.lax.fori_loop(0, s - 1, outer, (x, b, z))
        return x

    # --- host conversions -------------------------------------------------------
    def from_int(self, x, batch_shape=None):
        if isinstance(x, (int, np.integer)):
            v = int_to_limbs(
                self.spec.to_mont(int(x) % self.spec.modulus), self.spec.n_limbs
            )
            arr = jnp.asarray(v, jnp.uint32)
            if batch_shape:
                arr = mont.bconst(v, batch_shape)
            return arr
        # nested list
        flat = np.asarray(x, dtype=object)
        shape = flat.shape
        vals = [self.spec.to_mont(int(v) % self.spec.modulus) for v in flat.reshape(-1)]
        limbs = batch_int_to_limbs(vals, self.spec.n_limbs)  # [L, n]
        return jnp.asarray(limbs.reshape((self.spec.n_limbs,) + shape))

    @jit_method
    def _from_mont(self, a):
        return mont.from_mont(self.spec, a)

    def to_int(self, a):
        canon = np.asarray(self._from_mont(a))
        if canon.ndim == 1:
            return limbs_to_int(canon)
        shape = canon.shape[1:]
        flat = canon.reshape(canon.shape[0], -1)
        out = np.empty((flat.shape[1],), dtype=object)
        for i in range(flat.shape[1]):
            out[i] = limbs_to_int(flat[:, i])
        return out.reshape(shape).tolist()

    def random(self, rng, batch_shape=()):
        n = int(np.prod(batch_shape)) if batch_shape else 1
        vals = [rng.randrange(self.spec.modulus) for _ in range(n)]
        arr = self.from_int(np.asarray(vals, dtype=object).reshape(batch_shape or ()))
        return arr

    def from_le_bytes_mod_order(self, data: bytes):
        """Host-side byte -> field element reduction
        (reference: ff/src/fields/prime.rs from_le_bytes_mod_order)."""
        return self.from_int(int.from_bytes(data, "little") % self.spec.modulus)

    def from_be_bytes_mod_order(self, data: bytes):
        return self.from_int(int.from_bytes(data, "big") % self.spec.modulus)

    # canonical (non-Montgomery) limb access, for serialization
    def to_canonical_limbs(self, a):
        return mont.from_mont(self.spec, a)

    def from_canonical_limbs(self, limbs):
        return mont.to_mont(self.spec, limbs)

    def __repr__(self):
        return f"PrimeField({self.spec.name})"


_prime_cache: dict[int, PrimeField] = {}


def prime_field(spec: FieldSpec) -> PrimeField:
    key = id(spec)
    if key not in _prime_cache:
        _prime_cache[key] = PrimeField(spec)
    return _prime_cache[key]
