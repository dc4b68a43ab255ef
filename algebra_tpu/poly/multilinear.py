"""Multilinear extensions (dense and sparse) over a field kind.

TPU-native re-design of the reference's MLE types
(poly/src/evaluations/multivariate/multilinear/{mod,dense,sparse}.rs):

  * ``DenseMultilinearExtension``: 2^n evaluations on the Boolean
    hypercube, stored as a field value with leading axis 2^n.
    ``fix_variables`` folds halves (dense.rs:85-135) — one vectorized
    lerp per fixed variable; ``evaluate`` fixes all variables.
    Index convention matches the reference: evaluation index i has its
    LOWEST bit = x_0 (the first variable), i.e. fixing x_0 combines
    adjacent pairs.
  * ``SparseMultilinearExtension``: (index, value) pairs;
    ``fix_variables`` is the dynamic-programming pass over nonzeros
    (sparse.rs), vectorized with a segment-sum over halved indices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.field import Field


class DenseMultilinearExtension:
    def __init__(self, field: Field, num_vars: int, evals):
        self.field = field
        self.num_vars = num_vars
        self.evals = evals  # batch axis 2^num_vars

    @classmethod
    def from_ints(cls, field: Field, num_vars: int, evals):
        import numpy as np

        assert len(evals) == 1 << num_vars
        return cls(field, num_vars, field.from_int(np.asarray(evals, dtype=object)))

    @classmethod
    def rand(cls, field: Field, num_vars: int, rng):
        return cls(field, num_vars, field.random(rng, (1 << num_vars,)))

    # ------------------------------------------------------------ arithmetic
    def add(self, other):
        return DenseMultilinearExtension(
            self.field, self.num_vars, self.field.add(self.evals, other.evals)
        )

    def sub(self, other):
        return DenseMultilinearExtension(
            self.field, self.num_vars, self.field.sub(self.evals, other.evals)
        )

    def neg(self):
        return DenseMultilinearExtension(
            self.field, self.num_vars, self.field.neg(self.evals)
        )

    # ----------------------------------------------------------- evaluation
    def fix_variables(self, partial_point):
        """Fix the first k variables to the given field values (each batch
        shape ()); returns an MLE in num_vars - k variables
        (dense.rs fix_variables: fold adjacent halves)."""
        F = self.field
        evals = self.evals
        nv = self.num_vars
        for x in partial_point:
            n = 1 << nv
            # pairs (evals[2i], evals[2i+1]): reshape to [n/2, 2]
            pairs = jax.tree_util.tree_map(
                lambda a: a.reshape(a.shape[:1] + (n // 2, 2)), evals
            )
            lo = jax.tree_util.tree_map(lambda a: a[:, :, 0], pairs)
            hi = jax.tree_util.tree_map(lambda a: a[:, :, 1], pairs)
            diff = F.sub(hi, lo)
            xb = F.broadcast_to(x, (n // 2,))
            evals = F.add(lo, F.mul(diff, xb))
            nv -= 1
        return DenseMultilinearExtension(F, nv, evals)

    def evaluate(self, point):
        """Evaluate at a full point (list of num_vars field scalars)."""
        assert len(point) == self.num_vars
        fixed = self.fix_variables(point)
        return self.field.index(fixed.evals, 0)

    def relabel(self, a: int, b: int, k: int):
        """Swap variable blocks [a, a+k) and [b, b+k)
        (dense.rs relabel: permutes evaluation indices by bit swaps)."""
        import numpy as np

        n = 1 << self.num_vars
        idx = np.arange(n)
        bits_a = (idx >> a) & ((1 << k) - 1)
        bits_b = (idx >> b) & ((1 << k) - 1)
        cleared = idx & ~(((1 << k) - 1) << a) & ~(((1 << k) - 1) << b)
        swapped = cleared | (bits_b << a) | (bits_a << b)
        perm = jnp.asarray(swapped)
        return DenseMultilinearExtension(
            self.field, self.num_vars, self.field.index(self.evals, perm)
        )

    def to_ints(self):
        return self.field.to_int(self.evals)


class SparseMultilinearExtension:
    """Hashmap-backed in the reference (sparse.rs); here a static-size
    (indices, values) pair — indices int32[m], values field batch [m]."""

    def __init__(self, field: Field, num_vars: int, indices, values):
        self.field = field
        self.num_vars = num_vars
        self.indices = indices
        self.values = values

    @classmethod
    def from_pairs(cls, field: Field, num_vars: int, pairs):
        """pairs: list of (index:int, value:int) tuples."""
        import numpy as np

        idx = jnp.asarray([int(i) for i, _ in pairs], jnp.int32)
        vals = field.from_int(np.asarray([v for _, v in pairs], dtype=object))
        return cls(field, num_vars, idx, vals)

    def to_dense(self) -> DenseMultilinearExtension:
        F = self.field
        n = 1 << self.num_vars
        dense = F.zero((n,))
        # indices are unique (hashmap-backed in the reference), so set().
        dense = jax.tree_util.tree_map(
            lambda d, v: d.at[:, self.indices].set(v), dense, self.values
        )
        return DenseMultilinearExtension(F, self.num_vars, dense)

    def fix_variables(self, partial_point):
        """DP over nonzero entries (sparse.rs fix_variables): each fixed
        variable scales entries by (1-x) or x according to the low index
        bit and halves the index."""
        F = self.field
        idx = self.indices
        vals = self.values
        nv = self.num_vars
        m = idx.shape[0]
        for x in partial_point:
            shape = (m,)
            xb = F.broadcast_to(x, shape)
            one = F.one(shape)
            low = (idx & 1) == 1
            factor = F.select(low, xb, F.sub(one, xb))
            vals = F.mul(vals, factor)
            idx = idx >> 1
            nv -= 1
        return SparseMultilinearExtension(F, nv, idx, vals)

    def evaluate(self, point):
        """Full evaluation: DP then sum of surviving entries (duplicate
        halved indices all collapse to index 0 at the end)."""
        fixed = self.fix_variables(point)
        return self.field.sum(fixed.values, axis=0)

    def to_ints(self):
        import numpy as np

        return list(zip(np.asarray(self.indices).tolist(), self.field.to_int(self.values)))
