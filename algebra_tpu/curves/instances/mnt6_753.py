"""MNT6-753 (reference: test-curves/src/mnt6_753/*): the other half of
the MNT4/MNT6-753 curve cycle — Fq here IS mnt4_753.Fr and vice versa
(mnt6_753/fq.rs, fr.rs) — plus the Fq3 cubic tower with nonresidue 11
(fq3.rs:15) used by the mixed-radix FFT tests.
"""

from __future__ import annotations

import functools

from ...fields.cubic import CubicExtField
from ...fields.host_tower import HostPrime, frobenius_coeffs_cubic
from .mnt4_753 import Fq as _mnt4_fq
from .mnt4_753 import Fr as _mnt4_fr
from .mnt4_753 import P as _mnt4_p
from .mnt4_753 import R as _mnt4_r
from .mnt4_753 import fq_spec as _mnt4_fq_spec
from .mnt4_753 import fr_spec as _mnt4_fr_spec

# curve cycle: MNT6's base field is MNT4's scalar field and vice versa
P = _mnt4_r
R = _mnt4_p
fq_spec = _mnt4_fr_spec
fr_spec = _mnt4_fq_spec
Fq = _mnt4_fr
Fr = _mnt4_fq

FQ3_NONRESIDUE = 11


@functools.cache
def fq3() -> CubicExtField:
    host_fq = HostPrime(P)
    c1, c2 = frobenius_coeffs_cubic(host_fq, FQ3_NONRESIDUE, P, 3)
    return CubicExtField(
        Fq, FQ3_NONRESIDUE, c1, c2, name="mnt6_753.Fq3"
    )
