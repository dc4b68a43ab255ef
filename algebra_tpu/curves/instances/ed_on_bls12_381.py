"""ed-on-BLS12-381 (Jubjub): twisted Edwards curve over BLS12-381's Fr.

Parameters as instantiated by the reference at
test-curves/src/ed_on_bls12_381/{fr.rs,g.rs}: a = -1,
d = 10240/10241, cofactor 8, plus the birationally equivalent Montgomery
curve (A, B) = (40962, -40964).
"""

from __future__ import annotations

import functools

from ...fields.prime import prime_field
from ...fields.spec import field_spec
from ..te import TECurve
from .bls12_381 import R as FQ_MODULUS, fr_spec as fq_spec

# scalar field of the Edwards subgroup
FR_MODULUS = 6554484396890773809930967563523245729705921265872317281365359162392183254199
fr_spec = field_spec(FR_MODULUS, generator=6, name="ed_on_bls12_381.Fr")

Fq = prime_field(fq_spec)  # == bls12_381.Fr
Fr = prime_field(fr_spec)

COEFF_A = FQ_MODULUS - 1  # -1
COEFF_D = 19257038036680949359750312669786877991949435402254120286184196891950884077233
COFACTOR = 8

GENERATOR_X = 8076246640662884909881801758704306714034609987455869804520522091855516602923
GENERATOR_Y = 13262374693698910701929044844600465831413122818447359594527400194675274060458

MONT_COEFF_A = 40962
MONT_COEFF_B = FQ_MODULUS - 40964


@functools.cache
def curve() -> TECurve:
    return TECurve(
        Fq,
        a_host=COEFF_A,
        d_host=COEFF_D,
        generator_host=(GENERATOR_X, GENERATOR_Y),
        cofactor=COFACTOR,
        scalar_modulus=FR_MODULUS,
        name="ed_on_bls12_381",
        montgomery_coeffs=(MONT_COEFF_A, MONT_COEFF_B),
    )
