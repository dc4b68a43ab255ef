"""Sparse multivariate polynomials
(poly/src/polynomial/multivariate/{mod,sparse}.rs).

A term is a host-side list of (variable, power) pairs (the reference's
``SparseTerm``, multivariate/mod.rs:19); a polynomial is a list of terms
plus a batched field value of coefficients.  Evaluation is vectorized
over a batch of points: each point is a field value batch of shape
[num_vars] (or a list of scalars).
"""

from __future__ import annotations

import numpy as np

from ..fields.field import Field


def _normalize_term(term) -> tuple:
    """Merge duplicate variables, drop zero powers, sort by variable."""
    acc: dict[int, int] = {}
    for var, pow_ in term:
        if pow_ > 0:
            acc[int(var)] = acc.get(int(var), 0) + int(pow_)
    return tuple(sorted(acc.items()))


class SparseTerm:
    """Host-side monomial: product of vars^powers."""

    def __init__(self, pairs):
        self.pairs = _normalize_term(pairs)

    def degree(self) -> int:
        return sum(p for _, p in self.pairs)

    def __eq__(self, other):
        return self.pairs == other.pairs

    def __hash__(self):
        return hash(self.pairs)

    def __repr__(self):
        return f"SparseTerm({list(self.pairs)})"


class SparseMultivariatePolynomial:
    def __init__(self, field: Field, num_vars: int, terms, coeffs):
        self.field = field
        self.num_vars = num_vars
        self.terms = [t if isinstance(t, SparseTerm) else SparseTerm(t) for t in terms]
        self.coeffs = coeffs  # field batch [len(terms)]

    @classmethod
    def from_pairs(cls, field: Field, num_vars: int, pairs):
        """pairs: [(int coeff, term-pairs)] (multivariate/sparse.rs
        from_coefficients); merges duplicate terms."""
        p = field.characteristic()
        merged: dict[tuple, int] = {}
        for c, term in pairs:
            key = _normalize_term(term)
            merged[key] = (merged.get(key, 0) + int(c)) % p
        items = sorted((k, v) for k, v in merged.items() if v != 0)
        if not items:
            items = [((), 0)]
        terms = [SparseTerm(list(k)) for k, _ in items]
        coeffs = field.from_int(np.asarray([v for _, v in items], dtype=object))
        return cls(field, num_vars, terms, coeffs)

    def total_degree(self) -> int:
        return max((t.degree() for t in self.terms), default=0)

    def evaluate(self, point):
        """point: list of num_vars field scalars (each batch shape S).
        Returns the value with batch shape S."""
        F = self.field
        shape = F.batch_shape(point[0]) if self.num_vars else ()
        # per-variable square tables up to the max power used
        max_pow = {}
        for t in self.terms:
            for var, pw in t.pairs:
                max_pow[var] = max(max_pow.get(var, 0), pw)
        sq_tables = {}
        for var, mx in max_pow.items():
            sq = [point[var]]
            while (1 << len(sq)) <= mx:
                sq.append(F.square(sq[-1]))
            sq_tables[var] = sq
        acc = None
        for i, t in enumerate(self.terms):
            val = F.broadcast_to(F.index(self.coeffs, i), shape)
            for var, pw in t.pairs:
                j = 0
                while pw:
                    if pw & 1:
                        val = F.mul(val, sq_tables[var][j])
                    pw >>= 1
                    j += 1
            acc = val if acc is None else F.add(acc, val)
        return acc

    def add(self, other):
        F = self.field
        merged: dict[tuple, list] = {}
        for i, t in enumerate(self.terms):
            merged.setdefault(t.pairs, []).append(F.index(self.coeffs, i))
        for j, t in enumerate(other.terms):
            merged.setdefault(t.pairs, []).append(F.index(other.coeffs, j))
        keys = sorted(merged)
        parts = []
        for k in keys:
            vals = merged[k]
            acc = vals[0]
            for v in vals[1:]:
                acc = F.add(acc, v)
            parts.append(acc)
        return SparseMultivariatePolynomial(
            F,
            max(self.num_vars, other.num_vars),
            [SparseTerm(list(k)) for k in keys],
            F.stack(parts, axis=0),
        )

    def neg(self):
        return SparseMultivariatePolynomial(
            self.field, self.num_vars, self.terms, self.field.neg(self.coeffs)
        )

    def to_pairs(self):
        return [
            (c, list(t.pairs))
            for c, t in zip(self.field.to_int(self.coeffs), self.terms)
        ]
