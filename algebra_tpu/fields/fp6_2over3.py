"""Fp6 = quadratic over cubic (2-over-3) with pairing sparse ops.

Re-design of the reference's fp6_2over3 specializations
(ff/src/fields/models/fp6_2over3.rs:60-118): the BW6/MNT6 target field
Fp6 = Fp3[w]/(w^2 - v), with BW6's sparse line multiplications
``mul_by_014`` / ``mul_by_034`` whose inputs are *base prime field*
scalars.  All ops batched; cyclotomic exp comes from the generic
QuadExtField NAF scan.
"""

from __future__ import annotations

from .cubic import CubicExtField
from .quadratic import QuadExtField


class Fp6Over3Field(QuadExtField):
    """base must be a CubicExtField over the prime field (Fp3)."""

    def __init__(self, fp3: CubicExtField, frobenius_coeffs_c1_host, name="Fp6_2over3"):
        def mul_by_v(_base, x):
            # (c0, c1, c2) * v = (nr3 * c2, c0, c1) in Fp3
            return (fp3.mul_by_nonresidue(x[2]), x[0], x[1])

        super().__init__(
            fp3,
            (0, 1, 0),  # v, the Fp3 cubic generator
            frobenius_coeffs_c1_host,
            name,
            mul_by_nonresidue_fn=mul_by_v,
        )
        self.fp3 = fp3
        self.fp = fp3.base  # prime field

    # --- sparse multiplications (fp6_2over3.rs:60-118) ----------------------
    def mul_by_014(self, f, c0, c1, c4):
        """f * sparse(c0 + c1*v + c4*w) with c_i in the PRIME field."""
        F = self.fp
        (z0, z1, z2), (z3, z4, z5) = f
        t1 = self._nr_scalar(c1)
        t2 = self._nr_scalar(c4)
        n0 = F.add(F.add(F.mul(c0, z0), F.mul(t1, z2)), F.mul(t2, z4))
        n1 = F.add(F.add(F.mul(c0, z1), F.mul(c1, z0)), F.mul(t2, z5))
        n2 = F.add(F.add(F.mul(c0, z2), F.mul(c1, z1)), F.mul(c4, z3))
        n3 = F.add(F.add(F.mul(c0, z3), F.mul(t1, z5)), F.mul(t2, z2))
        n4 = F.add(F.add(F.mul(c0, z4), F.mul(c1, z3)), F.mul(c4, z0))
        n5 = F.add(F.add(F.mul(c0, z5), F.mul(c1, z4)), F.mul(c4, z1))
        return ((n0, n1, n2), (n3, n4, n5))

    def mul_by_034(self, f, c0, c3, c4):
        """f * sparse(c0 + c3*w + c4*v*w) with c_i in the PRIME field."""
        F = self.fp
        (z0, z1, z2), (z3, z4, z5) = f
        t1 = self._nr_scalar(c3)
        t2 = self._nr_scalar(c4)
        n0 = F.add(F.add(F.mul(c0, z0), F.mul(t1, z5)), F.mul(t2, z4))
        n1 = F.add(F.add(F.mul(c0, z1), F.mul(c3, z3)), F.mul(t2, z5))
        n2 = F.add(F.add(F.mul(c0, z2), F.mul(c3, z4)), F.mul(c4, z3))
        n3 = F.add(F.add(F.mul(c0, z3), F.mul(c3, z0)), F.mul(t2, z2))
        n4 = F.add(F.add(F.mul(c0, z4), F.mul(c3, z1)), F.mul(c4, z0))
        n5 = F.add(F.add(F.mul(c0, z5), F.mul(c3, z2)), F.mul(c4, z1))
        return ((n0, n1, n2), (n3, n4, n5))

    def _nr_scalar(self, x):
        """prime-field batch * Fp3 nonresidue (a prime-field constant)."""
        F = self.fp
        nr = self.fp3.nonresidue_host
        return F.mul(x, F.constant(nr, F.batch_shape(x)))
