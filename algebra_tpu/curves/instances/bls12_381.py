"""BLS12-381: fields tower, G1/G2 curves, pairing parameters.

Parameters are the standard public BLS12-381 constants (as instantiated by
the reference at test-curves/src/bls12_381/*: fr.rs:3-9, fq.rs:3-6,
fq2.rs:13, g1.rs:20-54, g2.rs).  All derived tables (Montgomery constants,
Frobenius coefficients) are recomputed from first principles by the field
compiler / host tower — nothing is transcribed from the reference's
generated tables.
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

# ---------------------------------------------------------------- constants
P = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
R = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001

# BLS parameter X: p, r, and the curve family are generated from it
# (ec/src/models/bls12/mod.rs: Bls12Config::X).  X = -0xd201000000010000.
X_ABS = 0xD201000000010000
X_IS_NEGATIVE = True

G1_COFACTOR = 0x396C8C005555E1568C00AAAB0000AAAB
# (x-1): the effective cofactor for G1 clearing (eprint 2019/403 §5).
G1_H_EFF = 0xD201000000010001

G2_COFACTOR = 0x5D543A95414E7F1091D50792876A202CD91DE4547085ABAA68A205B2E5A7DDFA628F1CB4D9E82EF21537E293A6691AE1616EC6E786F0C70CF1C38E31C7238E5

G1_GENERATOR_X = 3685416753713387016781088315183077757961620795782546409894578378688607592378376318836054947676345821548104185464507
G1_GENERATOR_Y = 1339506544944476473020471379941921221584933875938349620426543736416511423956333506472724655353366534992391756441569

G2_GENERATOR_X_C0 = 0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8
G2_GENERATOR_X_C1 = 0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E
G2_GENERATOR_Y_C0 = 0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801
G2_GENERATOR_Y_C1 = 0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE


# ------------------------------------------------------------------- fields
fq_spec = field_spec(P, generator=2, name="bls12_381.Fq")
fr_spec = field_spec(
    R, generator=7, small_subgroup_base=3, small_subgroup_power=1, name="bls12_381.Fr"
)

Fq = prime_field(fq_spec)
Fr = prime_field(fr_spec)

# host tower mirrors (for constant derivation)
host_fq = HostPrime(P)
FQ2_NONRESIDUE = P - 1  # -1
host_fq2 = HostQuadExt(host_fq, FQ2_NONRESIDUE)
FQ6_NONRESIDUE = (1, 1)  # u + 1

# Endomorphism constants for the fast subgroup checks, derived on host.
# G1_BETA: the nontrivial cube root of unity in Fq whose GLV eigenvalue on
# the r-subgroup is -X^2 (the 2^((p-1)/3) branch; pinned by the
# sigma(P) == -[X^2]P identity, verified in tests/test_subgroup_checks.py).
G1_BETA = pow(2, (P - 1) // 3, P)
# G2 psi (untwist-Frobenius-twist) coefficients: (u+1)^(-(p-1)/3) and
# (u+1)^(-(p-1)/2) — match the reference's published
# P_POWER_ENDOMORPHISM_COEFF_{0,1} (test-curves/src/bls12_381/g2.rs:104-125).
G2_PSI_X = host_fq2.inv(host_fq2.pow(FQ6_NONRESIDUE, (P - 1) // 3))
G2_PSI_Y = host_fq2.inv(host_fq2.pow(FQ6_NONRESIDUE, (P - 1) // 2))


def _mul_fq_by_neg1(base, x):
    """Fast nonresidue multiply for Fq2: nr == -1 (fq2.rs:13)."""
    return base.neg(x)


def _mul_fq2_by_u_plus_1(fq2_kind, x):
    """Fast nonresidue multiply for Fq6: (c0 + c1 u)(1 + u) =
    (c0 - c1) + (c0 + c1) u.  ``fq2_kind`` is the Fq2 field; the
    subtraction/addition happen in the Fq coordinates."""
    fq = fq2_kind.base
    c0, c1 = x
    return (fq.sub(c0, c1), fq.add(c0, c1))


@functools.cache
def fq2():
    coeffs = frobenius_coeffs_quad(host_fq, FQ2_NONRESIDUE, P, 2)
    return QuadExtField(
        Fq,
        FQ2_NONRESIDUE,
        coeffs,
        name="bls12_381.Fq2",
        mul_by_nonresidue_fn=_mul_fq_by_neg1,
    )


@functools.cache
def fq6():
    c1, c2 = frobenius_coeffs_cubic(host_fq2, FQ6_NONRESIDUE, P, 6)
    return CubicExtField(
        fq2(),
        FQ6_NONRESIDUE,
        c1,
        c2,
        name="bls12_381.Fq6",
        mul_by_nonresidue_fn=_mul_fq2_by_u_plus_1,
    )


@functools.cache
def fq12():
    # w^2 = v, v^3 = u+1  =>  frobenius coeff c1[i] = (u+1)^((p^i - 1) / 6)
    # as an Fq2 value (the reference's FROBENIUS_COEFF_FP12_C1).
    coeffs = [host_fq2.pow(FQ6_NONRESIDUE, (pow(P, i) - 1) // 6) for i in range(12)]
    return Fp12Field(fq6(), coeffs, name="bls12_381.Fq12")


# ------------------------------------------------------------------- curves
@functools.cache
def g1() -> SWCurve:
    c = SWCurve(
        Fq,
        a_host=0,
        b_host=4,
        generator_host=(G1_GENERATOR_X, G1_GENERATOR_Y),
        cofactor=G1_COFACTOR,
        scalar_modulus=R,
        name="bls12_381.G1",
    )

    # Fast cofactor clearing by the effective cofactor x-1
    # (g1.rs:45-54, eprint 2019/403 §5).
    def clear_cofactor(P_):
        return c.mul_int(P_, G1_H_EFF)

    c.clear_cofactor = clear_cofactor

    # Fast subgroup check via the GLV endomorphism sigma(x, y) = (BETA*x, y):
    # P is in the r-subgroup iff sigma(P) == -[X^2]P (eprint 2021/1130 §6;
    # BETA is the cube root of unity whose subgroup eigenvalue is -X^2 mod r,
    # pinned by construction below).  Two 64-bit scalar muls instead of one
    # 255-bit mul-by-r (the reference's default short_weierstrass/mod.rs:50).
    def check_host(curve, pt):
        sigma = (G1_BETA * pt[0] % P, pt[1])
        x2p = curve.host_mul_raw(curve.host_mul_raw(pt, X_ABS), X_ABS)
        if x2p is None:
            return False
        return sigma == (x2p[0], (P - x2p[1]) % P)

    def check_device(curve, Pt):
        beta = Fq.constant(G1_BETA, Fq.batch_shape(Pt[0]))
        sigma = (Fq.mul(beta, Pt[0]), Pt[1], Pt[2])
        x2p = curve.mul_int(curve.mul_int(Pt, X_ABS), X_ABS)
        return curve.equal(sigma, curve.neg(x2p))

    c.subgroup_check_host = check_host
    c.subgroup_check_device = check_device
    return c


@functools.cache
def pairing():
    """BLS12-381 pairing context (M-twist, X = -0xd201000000010000)."""
    from ...pairing.bls12 import Bls12

    return Bls12(g1(), g2(), fq12(), X_ABS, X_IS_NEGATIVE, twist_type="M")


@functools.cache
def g2() -> SWCurve:
    F2 = fq2()
    c = SWCurve(
        F2,
        a_host=(0, 0),
        b_host=(4, 4),  # 4 * (u + 1)
        generator_host=(
            (G2_GENERATOR_X_C0, G2_GENERATOR_X_C1),
            (G2_GENERATOR_Y_C0, G2_GENERATOR_Y_C1),
        ),
        cofactor=G2_COFACTOR,
        scalar_modulus=R,
        name="bls12_381.G2",
    )

    # Fast subgroup check via the p-power endomorphism psi (untwist-
    # Frobenius-twist): Q is in the r-subgroup iff psi(Q) == [x]Q
    # (eprint 2021/1130 §4; reference g2.rs:61-74).  psi(x, y) =
    # (frob(x) * PSI_X, frob(y) * PSI_Y) with PSI_X = (u+1)^(-(p-1)/3),
    # PSI_Y = (u+1)^(-(p-1)/2), derived on the host below.
    def psi_host(pt):
        def frob(v):
            return (v[0], (P - v[1]) % P)

        return (
            host_fq2.mul(frob(pt[0]), G2_PSI_X),
            host_fq2.mul(frob(pt[1]), G2_PSI_Y),
        )

    def check_host(curve, pt):
        xq = curve.host_mul_raw(pt, X_ABS)
        if xq is None:
            return False
        return psi_host(pt) == (xq[0], host_fq2.neg(xq[1]))  # x negative

    def check_device(curve, Qt):
        # psi acts on affine coordinates (Jacobian z would need its own
        # Frobenius); normalize first.
        ax, ay, inf = curve.to_affine(Qt)
        shape = F2.base.batch_shape(ax[0])
        psi_aff = (
            F2.mul(F2.frobenius(ax, 1), F2.constant(G2_PSI_X, shape)),
            F2.mul(F2.frobenius(ay, 1), F2.constant(G2_PSI_Y, shape)),
            inf,
        )
        xq = curve.mul_int(curve.from_affine((ax, ay, inf)), X_ABS)
        return curve.equal(curve.from_affine(psi_aff), curve.neg(xq))

    c.subgroup_check_host = check_host
    c.subgroup_check_device = check_device
    return c
