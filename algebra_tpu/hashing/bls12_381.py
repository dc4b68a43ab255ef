"""BLS12-381 hash-to-curve instantiations (IETF suites
BLS12381G1_XMD:SHA-256_SSWU_RO_ and BLS12381G2_XMD:SHA-256_SSWU_RO_),
matching the reference's WBConfig instantiations
(test-curves/src/bls12_381/{g1,g2}_swu_iso.rs, g1.rs:45-54 fast G1
clearing, g2.rs:78-104 psi-endomorphism G2 clearing).
"""

from __future__ import annotations

import functools

from ..curves.instances.bls12_381 import (
    G1_H_EFF,
    P,
    X_ABS,
    g1,
    g2,
    host_fq2,
)
from . import bls12_381_iso as iso
from .map_to_curve import MapToCurveHasher, WBMap


# ---------------------------------------------------------------------- G1
@functools.cache
def g1_hasher(dst: bytes = b"QUUX-V01-CS02-with-BLS12381G1_XMD:SHA-256_SSWU_RO_"):
    curve = g1()
    wb = WBMap(
        curve,
        iso.G1_ISO_A,
        iso.G1_ISO_B,
        iso.G1_ZETA,
        iso.G1_X_MAP_NUMERATOR,
        iso.G1_X_MAP_DENOMINATOR,
        iso.G1_Y_MAP_NUMERATOR,
        iso.G1_Y_MAP_DENOMINATOR,
    )
    return MapToCurveHasher(curve, wb, dst, ext_degree=1,
                            clear_cofactor=G1_H_EFF)


# ---------------------------------------------------------------------- G2
# psi endomorphism constants: for the M-twist w^6 = u+1,
#   psi(x, y) = (frob(x) * (u+1)^(-(p-1)/3), frob(y) * (u+1)^(-(p-1)/2))
PSI_X = host_fq2.inv(host_fq2.pow((1, 1), (P - 1) // 3))
PSI_Y = host_fq2.inv(host_fq2.pow((1, 1), (P - 1) // 2))


def _frob2(a):
    """Fq2 frobenius: conjugation."""
    return (a[0], (P - a[1]) % P)


PSI2_X = host_fq2.mul(_frob2(PSI_X), PSI_X)  # omega_x^(1+p)
PSI2_Y = host_fq2.mul(_frob2(PSI_Y), PSI_Y)


def g2_psi(pt):
    """psi(P) on G2 host affine points (g2.rs p_power_endomorphism)."""
    if pt is None:
        return None
    x, y = pt
    return (host_fq2.mul(_frob2(x), PSI_X), host_fq2.mul(_frob2(y), PSI_Y))


def g2_psi2(pt):
    """psi^2(P) (g2.rs double_p_power_endomorphism)."""
    if pt is None:
        return None
    x, y = pt
    return (host_fq2.mul(x, PSI2_X), host_fq2.mul(y, PSI2_Y))


def g2_clear_cofactor(pt):
    """[h_eff]P via [x^2-x-1]P + [x-1]psi(P) + psi^2(2P)
    (eprint 2017/419 §4.1; g2.rs:78-104).  x = -X_ABS."""
    c = g2()
    neg = lambda q: None if q is None else (q[0], host_fq2.neg(q[1]))
    x_p = neg(c.host_mul_raw(pt, X_ABS))  # [x]P
    psi_p = g2_psi(pt)
    psi2_p2 = g2_psi2(c.host_add(pt, pt))  # psi^2(2P)
    tmp = neg(c.host_mul_raw(c.host_add(x_p, psi_p), X_ABS))  # [x^2]P+[x]psiP
    acc = c.host_add(psi2_p2, tmp)
    acc = c.host_add(acc, neg(x_p))
    acc = c.host_add(acc, neg(psi_p))
    return c.host_add(acc, neg(pt))


class _G2Hasher(MapToCurveHasher):
    def hash(self, msg: bytes):
        u0, u1 = self.hash_to_field(msg, 2)
        p0 = self.map.map_to_curve(u0)
        p1 = self.map.map_to_curve(u1)
        return g2_clear_cofactor(self.curve.host_add(p0, p1))


@functools.cache
def g2_hasher(dst: bytes = b"QUUX-V01-CS02-with-BLS12381G2_XMD:SHA-256_SSWU_RO_"):
    curve = g2()
    wb = WBMap(
        curve,
        iso.G2_ISO_A,
        iso.G2_ISO_B,
        iso.G2_ZETA,
        iso.G2_X_MAP_NUMERATOR,
        iso.G2_X_MAP_DENOMINATOR,
        iso.G2_Y_MAP_NUMERATOR,
        iso.G2_Y_MAP_DENOMINATOR,
    )
    return _G2Hasher(curve, wb, dst, ext_degree=2)
