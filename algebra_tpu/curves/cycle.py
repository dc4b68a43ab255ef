"""Curve cycles (reference: ec/src/lib.rs:275-300).

A *cycle* of curves is a pair (E1, E2) where E1's base field is E2's
scalar field and vice versa — the structure underlying recursive proof
composition (e.g. the MNT4-753 / MNT6-753 cycle).  The reference encodes
the constraint in trait bounds; here it is validated at construction.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class CurveCycle:
    """E1, E2: SWCurve kinds with swapped base/scalar fields."""

    e1: object
    e2: object

    def __post_init__(self):
        p1 = self.e1.base.characteristic()
        r1 = self.e1.scalar_modulus
        p2 = self.e2.base.characteristic()
        r2 = self.e2.scalar_modulus
        if not (p1 == r2 and r1 == p2):
            raise ValueError(
                "not a cycle: E1 base/scalar fields must equal E2 "
                "scalar/base fields (ec/src/lib.rs:275-285)"
            )


@dataclass(frozen=True)
class PairingFriendlyCycle(CurveCycle):
    """A cycle where both halves carry pairing engines whose G1 is the
    cycle curve (ec/src/lib.rs:288-300)."""

    engine1: object = None
    engine2: object = None

    def __post_init__(self):
        super().__post_init__()
        if self.engine1 is None or self.engine2 is None:
            raise ValueError("both engines are required")
        if self.engine1.g1 is not self.e1 or self.engine2.g1 is not self.e2:
            raise ValueError("engine G1 must be the cycle curve")


def toy_cycle() -> CurveCycle:
    """A brute-force-verified toy cycle for tests: |E1/F_1009| = 1039 and
    |E2/F_1039| = 1009 (exhaustive point counts; both orders prime).

    The production-scale analogue is the MNT4-753 / MNT6-753 cycle; the
    reference ships only the MNT6-753 field tower (test-curves/src/
    mnt6_753 has fq/fq3/fr but no g1), so the cycle structure itself is
    validated here at toy scale."""
    from .sw import SWCurve
    from ..fields.prime import prime_field
    from ..fields.spec import field_spec

    f1 = prime_field(field_spec(1009, generator=11, name="cycle_p1009"))
    f2 = prime_field(field_spec(1039, generator=3, name="cycle_p1039"))
    e1 = SWCurve(f1, a_host=1, b_host=15, generator_host=(0, 32),
                 cofactor=1, scalar_modulus=1039, name="toy_cycle.E1")
    e2 = SWCurve(f2, a_host=1, b_host=6, generator_host=(1, 221),
                 cofactor=1, scalar_modulus=1009, name="toy_cycle.E2")
    return CurveCycle(e1, e2)
