"""MNT4-753 (reference: test-curves/src/mnt4_753/*): 753-bit fields with
small-subgroup base 5 (mixed-radix FFT domains) and the G1 curve
y^2 = x^3 + 2x + b.
"""

from __future__ import annotations

import functools

from ...fields.host_tower import HostPrime, HostQuadExt, frobenius_coeffs_quad
from ...fields.prime import prime_field
from ...fields.quadratic import QuadExtField
from ...fields.spec import field_spec
from ..sw import SWCurve
from . import _derive

P = 41898490967918953402344214791240637128170709919953949071783502921025352812571106773058893763790338921418070971888253786114353726529584385201591605722013126468931404347949840543007986327743462853720628051692141265303114721689601
R = 41898490967918953402344214791240637128170709919953949071783502921025352812571106773058893763790338921418070971888458477323173057491593855069696241854796396165721416325350064441470418137846398469611935719059908164220784476160001

fq_spec = field_spec(P, generator=17, small_subgroup_base=5,
                     small_subgroup_power=2, name="mnt4_753.Fq")
fr_spec = field_spec(R, generator=17, small_subgroup_base=5,
                     small_subgroup_power=2, name="mnt4_753.Fr")

Fq = prime_field(fq_spec)
Fr = prime_field(fr_spec)

COEFF_A = 2
COEFF_B = 28798803903456388891410036793299405764940372360099938340752576406393880372126970068421383312482853541572780087363938442377933706865252053507077543420534380486492786626556269083255657125025963825610840222568694137138741554679540

G1_GENERATOR_X = 7790163481385331313124631546957228376128961350185262705123068027727518350362064426002432450801002268747950550964579198552865939244360469674540925037890082678099826733417900510086646711680891516503232107232083181010099241949569
G1_GENERATOR_Y = 6913648190367314284606685101150155872986263667483624713540251048208073654617802840433842931301128643140890502238233930290161632176167186761333725658542781350626799660920481723757654531036893265359076440986158843531053720994648


@functools.cache
def g1() -> SWCurve:
    return SWCurve(
        Fq,
        a_host=COEFF_A,
        b_host=COEFF_B,
        generator_host=(G1_GENERATOR_X, G1_GENERATOR_Y),
        cofactor=1,
        scalar_modulus=R,
        name="mnt4_753.G1",
    )


# --------------------------------------------------------- pairing tower
# MNT4-753 is prime-order, so the trace is fixed by p and r alone; every
# G2/pairing constant below is derived from (p, r, a, b) and the Fq2
# nonresidue — the reference family model is ec/src/models/mnt4/mod.rs
# (concrete constants live in the downstream curves repo).
TRACE = P + 1 - R  # negative: r > p on this half of the cycle
FQ2_NONRESIDUE = 13
assert pow(FQ2_NONRESIDUE, (P - 1) // 2, P) != 1, "13 is a QR mod p"

host_fq = HostPrime(P)
host_fq2 = HostQuadExt(host_fq, FQ2_NONRESIDUE)


@functools.cache
def fq2() -> QuadExtField:
    coeffs = frobenius_coeffs_quad(host_fq, FQ2_NONRESIDUE, P, 2)
    return QuadExtField(Fq, FQ2_NONRESIDUE, coeffs, name="mnt4_753.Fq2")


@functools.cache
def fq4() -> QuadExtField:
    # Fp4 = Fp2[w]/(w^2 - u): w^(p^i) = u^((p^i - 1)/2) * w
    u = (0, 1)
    coeffs = [host_fq2.pow(u, (P**i - 1) // 2) for i in range(4)]

    def mul_by_u(fq2_kind, x):
        # (c0 + c1 u) * u = nr*c1 + c0 u in Fq2
        return (fq2_kind.mul_by_nonresidue(x[1]), x[0])

    return QuadExtField(
        fq2(), u, coeffs, name="mnt4_753.Fq4", mul_by_nonresidue_fn=mul_by_u
    )


# quadratic twist by u: a' = a*u^2 = 13a, b' = b*u^3 = 13b*u
TWIST = (0, 1)
TWIST_COEFF_A = (FQ2_NONRESIDUE * COEFF_A % P, 0)
TWIST_COEFF_B = (0, FQ2_NONRESIDUE * COEFF_B % P)


@functools.cache
def g2() -> SWCurve:
    order = _derive.quadratic_twist_order(P, TRACE, 2)
    assert order % R == 0, "twist order not divisible by r"
    cofactor = order // R
    c = SWCurve(
        fq2(),
        a_host=TWIST_COEFF_A,
        b_host=TWIST_COEFF_B,
        generator_host=((0, 0), (0, 0)),  # placeholder, replaced below
        cofactor=cofactor,
        scalar_modulus=R,
        name="mnt4_753.G2",
    )
    c.generator_host = _derive.derive_subgroup_generator(c, cofactor, R, P * P)
    return c


@functools.cache
def pairing():
    """MNT4-753 ate pairing context (flipped Miller loop, Fp4 target)."""
    from ...pairing.mnt import MNT4

    loop = abs(TRACE - 1)
    digits = [int(b) for b in bin(loop)[2:]]  # big-endian, leading 1
    # hard part (p^2 + 1)/r decomposed as w1*p + w0
    h = (P * P + 1) // R
    assert h * R == P * P + 1
    return MNT4(
        g1(),
        g2(),
        fq4(),
        twist_host=TWIST,
        twist_coeff_a_host=TWIST_COEFF_A,
        ate_loop_count=digits,
        ate_is_loop_count_neg=(TRACE - 1) < 0,
        final_exponent_last_chunk_1=h // P,
        final_exponent_last_chunk_w0_abs=h % P,
        final_exponent_last_chunk_w0_is_neg=False,
    )
