"""BN254 (alt_bn128): the standard EIP-196/197 Barreto–Naehrig curve.

Concrete instantiation of the BN pairing family (pairing/bn.py; the
reference's family model is ec/src/models/bn/mod.rs:26-170 — its concrete
BN254 parameters live in the downstream curves repo).  Parameters here are
the published EIP-196/197 constants; every derived quantity (Frobenius
twist coefficients, G2 cofactor, ate NAF digits) is recomputed on the host
from p, r, and the BN seed, and the generators are verified on-curve and
in-subgroup at import time.

Family equations (Barreto–Naehrig, eprint 2005/133):
    p(x) = 36x^4 + 36x^3 + 24x^2 + 6x + 1
    r(x) = 36x^4 + 36x^3 + 18x^2 + 6x + 1
    t(x) = 6x^2 + 1, with the optimal-ate loop over 6x + 2.
"""

from __future__ import annotations

import functools

from ...fields.cubic import CubicExtField
from ...fields.fp12 import Fp12Field
from ...fields.host_tower import (
    HostPrime,
    HostQuadExt,
    frobenius_coeffs_cubic,
    frobenius_coeffs_quad,
)
from ...fields.prime import prime_field
from ...fields.quadratic import QuadExtField
from ...fields.spec import field_spec
from ..sw import SWCurve
from . import _derive

# ------------------------------------------------------------------- seed
X = 4965661367192848881  # BN parameter; 6X + 2 is the ate loop length
P = 36 * X**4 + 36 * X**3 + 24 * X**2 + 6 * X + 1
R = 36 * X**4 + 36 * X**3 + 18 * X**2 + 6 * X + 1
T = 6 * X**2 + 1  # trace of Frobenius: #E(Fp) = p + 1 - t = r

assert P == 21888242871839275222246405745257275088696311157297823662689037894645226208583
assert R == 21888242871839275222246405745257275088548364400416034343698204186575808495617
assert P + 1 - T == R

G1_GENERATOR = (1, 2)

# Standard G2 generator (EIP-197 encoding order: x = x0 + x1*u).
G2_GENERATOR_X = (
    10857046999023057135944570762232829481370756359578518086990519993285655852781,
    11559732032986387107991004021392285783925812861821192530917403151452391805634,
)
G2_GENERATOR_Y = (
    8495653923123431417604973247489272438418190587263600148770280649306958101930,
    4082367875863433681332203403145435568316851327593401208105741076214120093531,
)

# ------------------------------------------------------------------- fields
fq_spec = field_spec(P, generator=3, name="bn254.Fq")
fr_spec = field_spec(R, generator=5, name="bn254.Fr")
Fq = prime_field(fq_spec)
Fr = prime_field(fr_spec)

host_fq = HostPrime(P)
FQ2_NONRESIDUE = P - 1  # u^2 = -1
host_fq2 = HostQuadExt(host_fq, FQ2_NONRESIDUE)
FQ6_NONRESIDUE = (9, 1)  # xi = 9 + u


def _mul_fq_by_neg1(base, x):
    return base.neg(x)


def _mul_fq2_by_xi(fq2_kind, x):
    """(c0 + c1 u)(9 + u) = (9 c0 - c1) + (c0 + 9 c1) u  (u^2 = -1)."""
    fq = fq2_kind.base

    def times9(v):
        v2 = fq.double(v)
        v4 = fq.double(v2)
        return fq.add(fq.double(v4), v)

    c0, c1 = x
    return (fq.sub(times9(c0), c1), fq.add(c0, times9(c1)))


@functools.cache
def fq2():
    coeffs = frobenius_coeffs_quad(host_fq, FQ2_NONRESIDUE, P, 2)
    return QuadExtField(
        Fq, FQ2_NONRESIDUE, coeffs, name="bn254.Fq2",
        mul_by_nonresidue_fn=_mul_fq_by_neg1,
    )


@functools.cache
def fq6():
    c1, c2 = frobenius_coeffs_cubic(host_fq2, FQ6_NONRESIDUE, P, 6)
    return CubicExtField(
        fq2(), FQ6_NONRESIDUE, c1, c2, name="bn254.Fq6",
        mul_by_nonresidue_fn=_mul_fq2_by_xi,
    )


@functools.cache
def fq12():
    coeffs = [
        host_fq2.pow(FQ6_NONRESIDUE, (pow(P, i) - 1) // 6) for i in range(12)
    ]
    return Fp12Field(fq6(), coeffs, name="bn254.Fq12")


# ------------------------------------------------------------------- curves
@functools.cache
def g1() -> SWCurve:
    c = SWCurve(
        Fq,
        a_host=0,
        b_host=3,
        generator_host=G1_GENERATOR,
        cofactor=1,
        scalar_modulus=R,
        name="bn254.G1",
    )
    _assert_on_curve_prime(G1_GENERATOR, 3)
    return c


@functools.cache
def g2() -> SWCurve:
    # D-twist: E'/Fq2: y^2 = x^3 + b/xi
    b_twist = host_fq2.mul(
        host_fq2.from_base_prime(3), host_fq2.inv(FQ6_NONRESIDUE)
    )
    order = _derive.pick_twist_order(_derive.sextic_twist_orders(P, T), R)
    cofactor = order // R
    c = SWCurve(
        fq2(),
        a_host=(0, 0),
        b_host=b_twist,
        generator_host=(G2_GENERATOR_X, G2_GENERATOR_Y),
        cofactor=cofactor,
        scalar_modulus=R,
        name="bn254.G2",
    )
    # verify the published generator: on-curve and in the r-torsion
    gx, gy = G2_GENERATOR_X, G2_GENERATOR_Y
    lhs = host_fq2.mul(gy, gy)
    rhs = host_fq2.add(
        host_fq2.mul(host_fq2.mul(gx, gx), gx), b_twist
    )
    assert host_fq2.equal(lhs, rhs), "BN254 G2 generator not on twist"
    assert c.host_mul_raw((gx, gy), R) is None, "G2 generator not r-torsion"
    return c


def _assert_on_curve_prime(pt, b):
    x, y = pt
    assert (y * y - (x * x * x + b)) % P == 0


@functools.cache
def pairing():
    """BN254 pairing context (D-twist, positive seed)."""
    from ...pairing.bn import Bn

    loop = 6 * X + 2
    ate_digits = _derive.naf_digits_le(loop)
    twist_mul_by_q_x = host_fq2.pow(FQ6_NONRESIDUE, (P - 1) // 3)
    twist_mul_by_q_y = host_fq2.pow(FQ6_NONRESIDUE, (P - 1) // 2)
    return Bn(
        g1(),
        g2(),
        fq12(),
        x_abs=X,
        x_is_negative=False,
        ate_loop_count=ate_digits,
        twist_mul_by_q_x_host=twist_mul_by_q_x,
        twist_mul_by_q_y_host=twist_mul_by_q_y,
        twist_type="D",
    )
