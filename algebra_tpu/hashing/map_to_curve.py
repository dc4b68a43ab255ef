"""SWU and Wahby–Boneh map-to-curve + the full RO hash-to-curve pipeline.

Host-side re-design of the reference's hashing stack
(ec/src/hashing/{mod,map_to_curve_hasher}.rs, curve_maps/{swu,wb}/mod.rs):
``MapToCurveHasher.hash(msg)`` = 2x hash-to-field -> 2x map-to-curve ->
add -> clear cofactor, bit-compatible with the IETF draft suites
(validated against the JSON vectors shipped with the reference).

The maps work on host tower values via the host field mirrors; a
device-batched SWU exists for bulk hashing (hash_to_field stays on host —
SHA-2 is host work in the TPU design, SURVEY.md §3.5).
"""

from __future__ import annotations

from ..curves.sw import _host_field_of
from ..fields.host_tower import HostPrime
from ..hostmath import host_sqrt, legendre_prime
from .hash_to_field import hash_to_field


def _parity(hf, element) -> bool:
    """First nonzero base-prime coefficient is odd
    (swu/mod.rs parity / IETF sgn0)."""
    if isinstance(hf, HostPrime):
        return bool(element % hf.p & 1)
    for coord in element:
        if not hf.base.equal(coord, hf.base.zero()):
            return _parity(hf.base, coord)
    return False


def _is_qr(hf, x) -> bool:
    if isinstance(hf, HostPrime):
        return legendre_prime(x, hf.p) >= 0
    # norm-based for quadratic extensions
    return host_sqrt(hf, x) is not None


class SWUMap:
    """Simplified SWU for y^2 = x^3 + a x + b with a*b != 0
    (curve_maps/swu/mod.rs:57-150)."""

    def __init__(self, base_field_kind, a_host, b_host, zeta_host):
        self.hf = _host_field_of(base_field_kind)
        hf = self.hf

        def lift(v):
            return hf.from_base_prime(v) if isinstance(v, int) else v

        self.a = lift(a_host)
        self.b = lift(b_host)
        self.zeta = lift(zeta_host)

    def map_to_curve(self, u):
        hf = self.hf
        one = hf.one()
        zeta_u2 = hf.mul(self.zeta, hf.mul(u, u))
        ta = hf.add(hf.mul(zeta_u2, zeta_u2), zeta_u2)
        num_x1 = hf.mul(self.b, hf.add(ta, one))
        if hf.equal(ta, hf.zero()):
            div = hf.mul(self.a, self.zeta)
        else:
            div = hf.mul(self.a, hf.neg(ta))
        num2_x1 = hf.mul(num_x1, num_x1)
        div2 = hf.mul(div, div)
        div3 = hf.mul(div2, div)
        num_gx1 = hf.add(
            hf.mul(hf.add(num2_x1, hf.mul(self.a, div2)), num_x1),
            hf.mul(self.b, div3),
        )
        num_x2 = hf.mul(zeta_u2, num_x1)

        gx1 = hf.mul(num_gx1, hf.inv(div3))
        if _is_qr(hf, gx1):
            gx1_square = True
            y1 = host_sqrt(hf, gx1)
        else:
            gx1_square = False
            y1 = host_sqrt(hf, hf.mul(self.zeta, gx1))
        assert y1 is not None

        y2 = hf.mul(hf.mul(zeta_u2, u), y1)
        num_x = num_x1 if gx1_square else num_x2
        y = y1 if gx1_square else y2

        x_affine = hf.mul(num_x, hf.inv(div))
        if _parity(hf, y) != _parity(hf, u):
            y = hf.neg(y)
        return (x_affine, y)


class WBMap:
    """SWU on an isogenous curve + rational isogeny map
    (curve_maps/wb/mod.rs:31-113)."""

    def __init__(self, curve, iso_a, iso_b, zeta, x_num, x_den, y_num, y_den):
        self.curve = curve
        self.hf = _host_field_of(curve.base)
        self.swu = SWUMap(curve.base, iso_a, iso_b, zeta)
        hf = self.hf

        def lift_list(coeffs):
            return [
                hf.from_base_prime(c) if isinstance(c, int) else c for c in coeffs
            ]

        self.x_num = lift_list(x_num)
        self.x_den = lift_list(x_den)
        self.y_num = lift_list(y_num)
        self.y_den = lift_list(y_den)

    def _poly_eval(self, coeffs, x):
        hf = self.hf
        acc = hf.zero()
        for c in reversed(coeffs):
            acc = hf.add(hf.mul(acc, x), c)
        return acc

    def map_to_curve(self, u):
        hf = self.hf
        x, y = self.swu.map_to_curve(u)
        xd = self._poly_eval(self.x_den, x)
        yd = self._poly_eval(self.y_den, x)
        img_x = hf.mul(self._poly_eval(self.x_num, x), hf.inv(xd))
        img_y = hf.mul(hf.mul(self._poly_eval(self.y_num, x), y), hf.inv(yd))
        return (img_x, img_y)


class MapToCurveHasher:
    """Full IETF RO hash-to-curve (map_to_curve_hasher.rs:17-70)."""

    def __init__(self, curve, map_obj, dst: bytes, ext_degree: int = 1,
                 hash_name: str = "sha256", clear_cofactor=None):
        self.curve = curve
        self.map = map_obj
        self.dst = dst
        self.ext_degree = ext_degree
        self.hash_name = hash_name
        self._clear_cofactor_int = clear_cofactor  # effective cofactor int

    def hash_to_field(self, msg: bytes, count: int = 2):
        p = self.curve.base.characteristic()
        return hash_to_field(
            msg, self.dst, p, count, self.ext_degree, self.hash_name
        )

    def hash(self, msg: bytes):
        """msg -> affine host point on the target curve."""
        u0, u1 = self.hash_to_field(msg, 2)
        p0 = self.map.map_to_curve(u0)
        p1 = self.map.map_to_curve(u1)
        summed = self.curve.host_add(p0, p1)
        h = self._clear_cofactor_int or self.curve.cofactor
        return self.curve.host_mul_raw(summed, h)
