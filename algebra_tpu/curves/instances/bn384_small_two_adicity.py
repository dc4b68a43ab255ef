"""BN384 with small two-adicity (reference:
test-curves/src/bn384_small_two_adicity/*): fields with small-subgroup
(mixed-radix) constants and the G1 curve y^2 = x^3 + 17.
"""

from __future__ import annotations

import functools

from ...fields.prime import prime_field
from ...fields.spec import field_spec
from ..sw import SWCurve

P = 5945877603251831796258517492029536515488649313567122628447476625319762940580461319088175968449723373773214087057409
R = 5945877603251831796258517492029536515488649313567122628445038208291596545947608789992834434053176523624102324539393

fq_spec = field_spec(P, generator=7, small_subgroup_base=3,
                     small_subgroup_power=2, name="bn384.Fq")
fr_spec = field_spec(R, generator=5, small_subgroup_base=3,
                     small_subgroup_power=2, name="bn384.Fr")

Fq = prime_field(fq_spec)
Fr = prime_field(fr_spec)

G1_GENERATOR_X = P - 1  # -1
G1_GENERATOR_Y = 4


@functools.cache
def g1() -> SWCurve:
    return SWCurve(
        Fq,
        a_host=0,
        b_host=17,
        generator_host=(G1_GENERATOR_X, G1_GENERATOR_Y),
        cofactor=1,
        scalar_modulus=R,
        name="bn384.G1",
    )
