"""Toy MNT6-family curve: engine validation at tiny field size.

The reference ships the MNT6 family model only (ec/src/models/mnt6/*;
its concrete MNT6-753 pairing constants live in the downstream curves
repo, and the published 753-bit curve coefficient b is not derivable
from p and r alone).  To validate the MNT6 engine (pairing/mnt.py with
an Fp3 coefficient field and the Fp6 = 2-over-3 target) end-to-end —
flipped Miller loop, twisted preparation, two-chunk final exponentiation
— this module pins a small embedding-degree-6 curve found by exhaustive
point counting:

    p = 29803 (p ≡ 1 mod 3),  E: y^2 = x^3 + 5374 x + 18506 over Fp
    #E = 29703 = 3 * 9901,  r = 9901 prime,  trace t = 101
    r | p^2 - p + 1  (embedding degree exactly 6)

Every pairing constant (twist order, cofactors, w0/w1 chunks) is derived
with the same code paths the big instances use, so this doubles as a
fast CPU regression for that derivation machinery.
"""

from __future__ import annotations

import functools

from ...fields.cubic import CubicExtField
from ...fields.fp6_2over3 import Fp6Over3Field
from ...fields.host_tower import HostCubicExt, HostPrime, frobenius_coeffs_cubic
from ...fields.prime import prime_field
from ...fields.spec import field_spec
from ..sw import SWCurve
from . import _derive

P = 29803
R = 9901
COEFF_A = 5374
COEFF_B = 18506
TRACE = 101
N = P + 1 - TRACE

assert N % R == 0 and (P * P - P + 1) % R == 0 and P % 3 == 1

FQ3_NONRESIDUE = 7
assert pow(FQ3_NONRESIDUE, (P - 1) // 3, P) != 1


def _smallest_qnr(p: int) -> int:
    g = 2
    while pow(g, (p - 1) // 2, p) == 1:
        g += 1
    return g


fq_spec = field_spec(P, generator=_smallest_qnr(P), name="mnt6_toy.Fq")
fr_spec = field_spec(R, generator=_smallest_qnr(R), name="mnt6_toy.Fr")
Fq = prime_field(fq_spec)
Fr = prime_field(fr_spec)

host_fq = HostPrime(P)
host_fq3 = HostCubicExt(host_fq, FQ3_NONRESIDUE)


@functools.cache
def fq3() -> CubicExtField:
    c1, c2 = frobenius_coeffs_cubic(host_fq, FQ3_NONRESIDUE, P, 3)
    return CubicExtField(Fq, FQ3_NONRESIDUE, c1, c2, name="mnt6_toy.Fq3")


@functools.cache
def fq6() -> Fp6Over3Field:
    v = (0, 1, 0)
    coeffs = [host_fq3.pow(v, (P**i - 1) // 2) for i in range(6)]
    return Fp6Over3Field(fq3(), coeffs, name="mnt6_toy.Fq6")


@functools.cache
def g1() -> SWCurve:
    cofactor = N // R
    c = SWCurve(
        Fq,
        a_host=COEFF_A,
        b_host=COEFF_B,
        generator_host=(0, 0),  # placeholder, replaced below
        cofactor=cofactor,
        scalar_modulus=R,
        name="mnt6_toy.G1",
    )
    c.generator_host = _derive.derive_subgroup_generator(c, cofactor, R, P)
    return c


# quadratic twist by u (u^3 = 7): a' = a*u^2 = (0,0,a), b' = b*u^3 = 7b
TWIST = (0, 1, 0)
TWIST_COEFF_A = (0, 0, COEFF_A)
TWIST_COEFF_B = (FQ3_NONRESIDUE * COEFF_B % P, 0, 0)


@functools.cache
def g2() -> SWCurve:
    order = _derive.quadratic_twist_order(P, TRACE, 3)
    assert order % R == 0
    cofactor = order // R
    c = SWCurve(
        fq3(),
        a_host=TWIST_COEFF_A,
        b_host=TWIST_COEFF_B,
        generator_host=((0,) * 3, (0,) * 3),  # placeholder, replaced below
        cofactor=cofactor,
        scalar_modulus=R,
        name="mnt6_toy.G2",
    )
    c.generator_host = _derive.derive_subgroup_generator(c, cofactor, R, P**3)
    return c


@functools.cache
def pairing():
    """Toy MNT6 ate pairing context (flipped Miller loop, Fp6 target)."""
    from ...pairing.mnt import MNT6

    loop = abs(TRACE - 1)
    digits = [int(b) for b in bin(loop)[2:]]
    h = (P * P - P + 1) // R
    assert h * R == P * P - P + 1
    return MNT6(
        g1(),
        g2(),
        fq6(),
        twist_host=TWIST,
        twist_coeff_a_host=TWIST_COEFF_A,
        ate_loop_count=digits,
        ate_is_loop_count_neg=(TRACE - 1) < 0,
        final_exponent_last_chunk_1=h // P,
        final_exponent_last_chunk_w0_abs=h % P,
        final_exponent_last_chunk_w0_is_neg=False,
    )
