"""Device-batched SWU/WB map-to-curve.

The host pipeline in map_to_curve.py serves golden-vector validation;
this module is the throughput path: hash_to_field stays on host (SHA-2
is host work, SURVEY.md §3.5), the field elements upload once, and the
map (SWU + isogeny + cofactor clearing) runs batched on device with the
existing vectorized sqrt/legendre/batch-inverse kernels — thousands of
BLS signature hashes per launch.

Bit-compatible with the host pipeline (same IETF parity convention).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..fields.prime import PrimeField


def _parity_device(field, x):
    """IETF sgn0: parity of the first nonzero prime coefficient
    (coefficients walked little-endian, matching the host pipeline's
    map_to_curve._parity and swu/mod.rs parity)."""
    if isinstance(field, PrimeField):
        canonical = field.to_canonical_limbs(x)
        return (canonical[0] & 1).astype(jnp.bool_)
    parity = None
    seen_nonzero = None
    for c in x:
        pc = _parity_device(field.base, c)
        nz = jnp.logical_not(field.base.is_zero(c))
        pc = jnp.logical_and(pc, nz)  # all-zero coefficient contributes 0
        if parity is None:
            parity, seen_nonzero = pc, nz
        else:
            parity = jnp.where(seen_nonzero, parity, pc)
            seen_nonzero = jnp.logical_or(seen_nonzero, nz)
    return parity


class DeviceSWUMap:
    """Simplified SWU on device (a*b != 0); works over any field kind
    with batched sqrt (prime or quadratic extension — G1 and G2)."""

    def __init__(self, field, a_host, b_host, zeta_host):
        self.F = field
        self.a_host = _lift_host(field, a_host)
        self.b_host = _lift_host(field, b_host)
        self.zeta_host = _lift_host(field, zeta_host)

    def map_to_curve(self, u):
        """u: field batch -> (x, y) affine batch on the iso curve."""
        F = self.F
        shape = F.batch_shape(u)
        A = F.constant(self.a_host, shape)
        Bc = F.constant(self.b_host, shape)
        Z = F.constant(self.zeta_host, shape)
        one = F.one(shape)

        zeta_u2 = F.mul(Z, F.square(u))
        ta = F.add(F.square(zeta_u2), zeta_u2)
        num_x1 = F.mul(Bc, F.add(ta, one))
        ta_zero = F.is_zero(ta)
        div = F.mul(A, F.select(ta_zero, Z, F.neg(ta)))
        num2_x1 = F.square(num_x1)
        div2 = F.square(div)
        div3 = F.mul(div2, div)
        num_gx1 = F.add(
            F.mul(F.add(num2_x1, F.mul(A, div2)), num_x1), F.mul(Bc, div3)
        )
        num_x2 = F.mul(zeta_u2, num_x1)

        gx1 = F.mul(num_gx1, F.inverse(div3))
        gx1_square, y1a = F.sqrt(gx1)
        _, y1b = F.sqrt(F.mul(Z, gx1))
        y1 = F.select(gx1_square, y1a, y1b)

        y2 = F.mul(F.mul(zeta_u2, u), y1)
        num_x = F.select(gx1_square, num_x1, num_x2)
        y = F.select(gx1_square, y1, y2)

        x_aff = F.mul(num_x, F.inverse(div))
        flip = _parity_device(F, y) != _parity_device(F, u)
        y_aff = F.select(flip, F.neg(y), y)
        return x_aff, y_aff


def _lift_host(field, v):
    """Host constant (int or coefficient tuple, possibly negative /
    unreduced) -> canonical host value for ``field.constant``."""
    p = field.characteristic()
    if isinstance(field, PrimeField):
        if isinstance(v, tuple):
            raise TypeError("tuple constant for a prime field")
        return int(v) % p
    if isinstance(v, int):  # base-prime embedding
        from ..fields.cubic import CubicExtField

        arity = 3 if isinstance(field, CubicExtField) else 2
        return tuple(
            _lift_host(field.base, v if i == 0 else 0) for i in range(arity)
        )
    return tuple(_lift_host(field.base, c) for c in v)


class DeviceWBMap:
    """SWU on the isogenous curve + rational isogeny map, batched."""

    def __init__(self, curve, iso_a, iso_b, zeta, x_num, x_den, y_num, y_den):
        self.curve = curve
        self.F = curve.base
        self.swu = DeviceSWUMap(self.F, iso_a, iso_b, zeta)
        lift = lambda coeffs: [_lift_host(self.F, c) for c in coeffs]
        self.x_num = lift(x_num)
        self.x_den = lift(x_den)
        self.y_num = lift(y_num)
        self.y_den = lift(y_den)

    def _poly_eval(self, coeffs, x):
        F = self.F
        shape = F.batch_shape(x)
        acc = F.constant(coeffs[-1], shape)
        for c in reversed(coeffs[:-1]):
            acc = F.add(F.mul(acc, x), F.constant(c, shape))
        return acc

    def map_to_curve(self, u):
        F = self.F
        x, y = self.swu.map_to_curve(u)
        xd = self._poly_eval(self.x_den, x)
        yd = self._poly_eval(self.y_den, x)
        if isinstance(F, PrimeField):
            inv = F.batch_inverse(F.stack([xd, yd]), axis=0)
            xd_i = F.index(inv, 0)
            yd_i = F.index(inv, 1)
        else:  # extension fields: norm-based inverse, already cheap
            xd_i = F.inverse(xd)
            yd_i = F.inverse(yd)
        img_x = F.mul(self._poly_eval(self.x_num, x), xd_i)
        img_y = F.mul(F.mul(self._poly_eval(self.y_num, x), y), yd_i)
        return img_x, img_y


def g1_hash_batch(messages, dst=b"QUUX-V01-CS02-with-BLS12381G1_XMD:SHA-256_SSWU_RO_"):
    """Batched BLS12-381 G1 hash: host hash_to_field, device map + clear.

    Returns the affine batch (x, y, inf) of hashed points.
    """
    from ..bigint import batch_int_to_limbs
    from ..curves.instances import bls12_381
    from . import bls12_381_iso as iso
    from .hash_to_field import hash_to_field

    curve = bls12_381.g1()
    spec = bls12_381.fq_spec
    us = []
    for msg in messages:
        us.extend(hash_to_field(msg, dst, bls12_381.P, 2, 1))
    u_arr = jnp.asarray(batch_int_to_limbs(
        [spec.to_mont(u) for u in us], spec.n_limbs))

    wb = DeviceWBMap(
        curve, iso.G1_ISO_A, iso.G1_ISO_B, iso.G1_ZETA,
        iso.G1_X_MAP_NUMERATOR, iso.G1_X_MAP_DENOMINATOR,
        iso.G1_Y_MAP_NUMERATOR, iso.G1_Y_MAP_DENOMINATOR,
    )

    @jax.jit
    def run(u):
        x, y = wb.map_to_curve(u)
        n2 = x.shape[1]
        inf = jnp.zeros((n2,), jnp.bool_)
        pts = curve.from_affine((x, y, inf))
        p0 = curve.index_point(pts, slice(0, n2, 2))
        p1 = curve.index_point(pts, slice(1, n2, 2))
        summed = curve.add(p0, p1)
        cleared = curve.mul_int(summed, bls12_381.G1_H_EFF)
        return curve.to_affine(cleared)

    return run(u_arr)


def g2_hash_batch(messages, dst=b"QUUX-V01-CS02-with-BLS12381G2_XMD:SHA-256_SSWU_RO_"):
    """Batched BLS12-381 G2 hash: host hash_to_field, device SWU +
    isogeny over Fq2, device psi-endomorphism cofactor clearing
    (eprint 2017/419 §4.1; reference g2.rs:78-104 — the same chain the
    validated host pipeline uses).

    Returns the affine batch (x, y, inf) of hashed G2 points.
    """
    from ..curves.instances import bls12_381
    from . import bls12_381_iso as iso
    from .bls12_381 import PSI_X, PSI_Y
    from .hash_to_field import hash_to_field

    curve = bls12_381.g2()
    F2 = curve.base
    us = []
    for msg in messages:
        us.extend(hash_to_field(msg, dst, bls12_381.P, 2, 2))
    n = len(us)
    u_dev = (
        F2.base.from_int([u[0] for u in us]),
        F2.base.from_int([u[1] for u in us]),
    )

    wb = DeviceWBMap(
        curve, iso.G2_ISO_A, iso.G2_ISO_B, iso.G2_ZETA,
        iso.G2_X_MAP_NUMERATOR, iso.G2_X_MAP_DENOMINATOR,
        iso.G2_Y_MAP_NUMERATOR, iso.G2_Y_MAP_DENOMINATOR,
    )
    psi_x_c = F2.constant(_lift_host(F2, PSI_X))
    psi_y_c = F2.constant(_lift_host(F2, PSI_Y))

    def psi(P):
        """Jacobian psi: frobenius each coordinate (Fq2 conjugation),
        scale X by PSI_X and Y by PSI_Y (untwist-frobenius-twist)."""
        X, Y, Z = P
        return (
            F2.mul(F2.frobenius(X), psi_x_c),
            F2.mul(F2.frobenius(Y), psi_y_c),
            F2.frobenius(Z),
        )

    @jax.jit
    def run(u):
        x, y = wb.map_to_curve(u)
        shape = F2.batch_shape(x)
        inf = jnp.zeros(shape, jnp.bool_)
        pts = curve.from_affine((x, y, inf))
        p0 = curve.index_point(pts, slice(0, None, 2))
        p1 = curve.index_point(pts, slice(1, None, 2))
        P = curve.add(p0, p1)
        # h_eff chain: [x^2-x-1]P + [x-1]psi(P) + psi^2(2P), x = -X_ABS
        x_p = curve.neg(curve.mul_int(P, bls12_381.X_ABS))  # [x]P
        psi_p = psi(P)
        psi2_p2 = psi(psi(curve.double(P)))
        tmp = curve.neg(
            curve.mul_int(curve.add(x_p, psi_p), bls12_381.X_ABS)
        )  # [x^2]P + [x]psi(P)
        acc = curve.add(psi2_p2, tmp)
        acc = curve.add(acc, curve.neg(x_p))
        acc = curve.add(acc, curve.neg(psi_p))
        acc = curve.add(acc, curve.neg(P))
        return curve.to_affine(acc)

    return run(u_dev)
