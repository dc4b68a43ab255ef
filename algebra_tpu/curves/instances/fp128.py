"""Fp128 = Z/(2^127 - 1) (reference: test-curves/src/fp128.rs):
a standalone Mersenne-prime field used for fast generic field tests."""

from __future__ import annotations

from ...fields.prime import prime_field
from ...fields.spec import field_spec

P = 170141183460469231731687303715884105727  # 2^127 - 1

fq_spec = field_spec(P, generator=43, name="Fp128")
Fq = prime_field(fq_spec)
