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
    """IETF sgn0 for prime fields: lowest canonical bit."""
    canonical = field.to_canonical_limbs(x)
    return (canonical[0] & 1).astype(jnp.bool_)


class DeviceSWUMap:
    """Simplified SWU on device for prime-field curves (a*b != 0)."""

    def __init__(self, field: PrimeField, a_host: int, b_host: int, zeta_host: int):
        self.F = field
        self.a_host = a_host
        self.b_host = b_host
        self.zeta_host = zeta_host

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


class DeviceWBMap:
    """SWU on the isogenous curve + rational isogeny map, batched."""

    def __init__(self, curve, iso_a, iso_b, zeta, x_num, x_den, y_num, y_den):
        self.curve = curve
        self.F = curve.base
        self.swu = DeviceSWUMap(self.F, iso_a, iso_b, zeta)
        self.x_num = [int(c) for c in x_num]
        self.x_den = [int(c) for c in x_den]
        self.y_num = [int(c) for c in y_num]
        self.y_den = [int(c) for c in y_den]

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
        inv = F.batch_inverse(F.stack([xd, yd]), axis=0)
        xd_i = F.index(inv, 0)
        yd_i = F.index(inv, 1)
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
