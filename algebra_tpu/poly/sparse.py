"""Sparse univariate polynomials (poly/src/polynomial/univariate/sparse.rs).

Static-shape (degrees, coeffs) representation: degrees is a host numpy
int array (degrees are structural — they select which powers are
computed), coeffs a batched field value.  Evaluation computes x^d for
each stored degree with a shared square-chain; arithmetic merges terms
host-side (degree lists are host data, as in the reference where they are
the BTreeMap keys).
"""

from __future__ import annotations

import numpy as np

from ..fields.field import Field


class SparsePolynomial:
    def __init__(self, field: Field, degrees, coeffs):
        self.field = field
        self.degrees = [int(d) for d in degrees]
        self.coeffs = coeffs  # field batch [len(degrees)]

    @classmethod
    def from_pairs(cls, field: Field, pairs):
        """pairs: [(degree, int coeff)]; merges duplicate degrees."""
        merged: dict[int, int] = {}
        p = field.characteristic()
        for d, c in pairs:
            merged[int(d)] = (merged.get(int(d), 0) + int(c)) % p
        items = sorted((d, c) for d, c in merged.items() if c != 0)
        if not items:
            items = [(0, 0)]
        degs = [d for d, _ in items]
        coeffs = field.from_int(np.asarray([c for _, c in items], dtype=object))
        return cls(field, degs, coeffs)

    def degree(self) -> int:
        return max(self.degrees)

    # ------------------------------------------------------------ evaluation
    def evaluate(self, x):
        """Batched evaluation: sum_i c_i * x^{d_i} with one shared
        addition-chain over the binary expansions (sparse.rs evaluate)."""
        F = self.field
        shape = F.batch_shape(x)
        max_d = max(self.degrees)
        # powers x^(2^j)
        sq = [x]
        while (1 << len(sq)) <= max_d:
            sq.append(F.square(sq[-1]))
        acc = None
        for d, i in zip(self.degrees, range(len(self.degrees))):
            c = F.broadcast_to(F.index(self.coeffs, i), shape)
            term = c
            j = 0
            while d:
                if d & 1:
                    term = F.mul(term, sq[j])
                d >>= 1
                j += 1
            acc = term if acc is None else F.add(acc, term)
        return acc

    def evaluate_over_domain(self, domain):
        """Evaluations over a domain: c_i * (elements^{d_i}) summed —
        each power of the element table via the domain generator."""
        F = self.field
        elements = domain.elements()  # [L, n] Montgomery
        n = domain.size
        acc = F.zero((n,))
        for i, d in enumerate(self.degrees):
            # element^(d) table: g^(i*d) = table of g^d powers — compute by
            # repeated-squaring on the whole table
            powd = _pow_table(F, elements, d)
            c = F.broadcast_to(F.index(self.coeffs, i), (n,))
            acc = F.add(acc, F.mul(c, powd))
        from .evaluations import Evaluations

        return Evaluations(F, domain, acc)

    # ------------------------------------------------------------ arithmetic
    def mul(self, other: "SparsePolynomial") -> "SparsePolynomial":
        """Term-by-term product (host degree pairs, device coeff products)."""
        F = self.field
        degs = []
        coeff_parts = []
        for i, di in enumerate(self.degrees):
            ci = F.index(self.coeffs, i)
            for j, dj in enumerate(other.degrees):
                cj = F.index(other.coeffs, j)
                degs.append(di + dj)
                coeff_parts.append(F.mul(ci, cj))
        # merge duplicates host-side by degree
        order = np.argsort(np.asarray(degs, dtype=np.int64), kind="stable")
        merged_degs = []
        merged_coeffs = []
        for k in order:
            d = degs[k]
            if merged_degs and merged_degs[-1] == d:
                merged_coeffs[-1] = F.add(merged_coeffs[-1], coeff_parts[k])
            else:
                merged_degs.append(d)
                merged_coeffs.append(coeff_parts[k])
        return SparsePolynomial(F, merged_degs, F.stack(merged_coeffs, axis=0))

    def add(self, other: "SparsePolynomial") -> "SparsePolynomial":
        F = self.field
        degs = []
        parts = []
        i = j = 0
        while i < len(self.degrees) or j < len(other.degrees):
            di = self.degrees[i] if i < len(self.degrees) else None
            dj = other.degrees[j] if j < len(other.degrees) else None
            if dj is None or (di is not None and di < dj):
                degs.append(di)
                parts.append(F.index(self.coeffs, i))
                i += 1
            elif di is None or dj < di:
                degs.append(dj)
                parts.append(F.index(other.coeffs, j))
                j += 1
            else:
                degs.append(di)
                parts.append(
                    F.add(F.index(self.coeffs, i), F.index(other.coeffs, j))
                )
                i += 1
                j += 1
        return SparsePolynomial(F, degs, F.stack(parts, axis=0))

    def to_dense(self):
        from .dense import DensePolynomial

        F = self.field
        n = self.degree() + 1
        import jax

        out = F.zero((n,))
        for i, d in enumerate(self.degrees):
            c = F.index(self.coeffs, i)
            out = jax.tree_util.tree_map(lambda o, v: o.at[:, d].set(v), out, c)
        return DensePolynomial(F, out)

    def to_pairs(self):
        return list(zip(self.degrees, self.field.to_int(self.coeffs)))


def _pow_table(field: Field, table, d: int):
    """Elementwise table^d via square-and-multiply (host-constant d)."""
    shape = field.batch_shape(table)
    result = field.one(shape)
    base = table
    if d == 0:
        return result
    while d:
        if d & 1:
            result = field.mul(result, base)
        d >>= 1
        if d:
            base = field.square(base)
    return result
