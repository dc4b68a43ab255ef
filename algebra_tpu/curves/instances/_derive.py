"""Host-side derivation helpers for pairing-curve instantiation.

The reference ships G2/pairing constants as source tables generated
offline (the downstream curves repo); here every derived quantity —
twist orders, G2 cofactors, G2 subgroup generators, Frobenius twist
coefficients — is recomputed from first principles (p, r, the curve
equation, and the tower nonresidues) with Python big ints at module
construction time, then verified (order checks) before use.

Conventions: "host" field elements are the nested-int representation of
fields/host_tower.py; curves are SWCurve kinds whose host group law
(curves/sw.py host_add/host_mul_raw) works over any host tower field.
"""

from __future__ import annotations

from ...fields.host_tower import HostCubicExt, HostPrime, HostQuadExt
from ...hostmath import host_sqrt, legendre_prime


# --------------------------------------------------------------------------
# generic Tonelli–Shanks over an arbitrary host field of known order q
# (used for Fp3 and deeper towers, where hostmath's structured two-case
# quadratic sqrt does not apply; mirrors ff/src/fields/sqrt.rs:67-148)
# --------------------------------------------------------------------------


def sqrt_generic(hf, a, q: int):
    """Square root of ``a`` in a host field of order ``q``; None if NQR."""
    if hf.equal(a, hf.zero()):
        return hf.zero()
    if not hf.equal(hf.pow(a, (q - 1) // 2), hf.one()):
        return None
    if q % 4 == 3:
        return hf.pow(a, (q + 1) // 4)
    s, t = 0, q - 1
    while t % 2 == 0:
        s += 1
        t //= 2
    # deterministic search for a quadratic non-residue
    z = _nqr_search(hf, q)
    m, c = s, hf.pow(z, t)
    u, r = hf.pow(a, t), hf.pow(a, (t + 1) // 2)
    while not hf.equal(u, hf.one()):
        i, v = 0, u
        while not hf.equal(v, hf.one()):
            v = hf.mul(v, v)
            i += 1
        b = c
        for _ in range(m - i - 1):
            b = hf.mul(b, b)
        m = i
        c = hf.mul(b, b)
        u = hf.mul(u, c)
        r = hf.mul(r, b)
    return r


def _nqr_search(hf, q: int):
    for cand in _element_stream(hf):
        if hf.equal(cand, hf.zero()):
            continue
        if not hf.equal(hf.pow(cand, (q - 1) // 2), hf.one()):
            return cand
    raise RuntimeError("no quadratic non-residue found")


def _element_stream(hf):
    """Deterministic stream of small host field elements."""
    if isinstance(hf, HostPrime):
        k = 2
        while True:
            yield k % hf.p
            k += 1
    else:
        arity = 3 if isinstance(hf, HostCubicExt) else 2
        k = 1
        while True:
            for pos in range(arity):
                coords = [hf.base.zero()] * arity
                coords[pos] = hf.base.from_base_prime(k)
                coords[0] = hf.base.add(coords[0], hf.base.from_base_prime(1))
                yield tuple(coords)
            k += 1


def field_order(p: int, hf) -> int:
    return p ** hf.degree_over_prime


# --------------------------------------------------------------------------
# twist orders (standard point-counting relations over extension fields)
# --------------------------------------------------------------------------


def trace_power(t: int, p: int, k: int) -> int:
    """Trace of Frobenius of E(F_{p^k}) from the base trace t:
    t_k satisfies the Lucas recurrence t_{i+1} = t * t_i - p * t_{i-1}."""
    t_prev, t_cur = 2, t  # t_0 = 2, t_1 = t
    for _ in range(k - 1):
        t_prev, t_cur = t_cur, t * t_cur - p * t_prev
    return t_cur


def quadratic_twist_order(p: int, t: int, k: int) -> int:
    """#E'(F_{p^k}) of the quadratic twist of E over F_{p^k}."""
    tk = trace_power(t, p, k)
    return p**k + 1 + tk


def sextic_twist_orders(p: int, t: int) -> list[int]:
    """The six possible orders of sextic twists of E over F_{p^2}
    (Hess–Smart–Vercauteren): computed from t2, f2 with
    t2^2 - 4 p^2 = -3 f2^2."""
    t2 = t * t - 2 * p
    d = 4 * p * p - t2 * t2
    assert d % 3 == 0
    f2_sq = d // 3
    f2 = _isqrt_exact(f2_sq)
    q = p * p
    return [
        q + 1 - t2,
        q + 1 + t2,
        q + 1 - (t2 + 3 * f2) // 2,
        q + 1 - (t2 - 3 * f2) // 2,
        q + 1 + (t2 + 3 * f2) // 2,
        q + 1 + (t2 - 3 * f2) // 2,
    ]


def _isqrt_exact(n: int) -> int:
    import math

    r = math.isqrt(n)
    assert r * r == n, "not a perfect square"
    return r


def pick_twist_order(orders, r: int) -> int:
    """The unique candidate order divisible by r."""
    hits = [o for o in orders if o % r == 0]
    assert hits, "no twist order divisible by r"
    return hits[0]


# --------------------------------------------------------------------------
# G2 generator derivation: deterministic point + cofactor clearing
# --------------------------------------------------------------------------


def find_curve_point(curve, q: int):
    """Deterministic affine point on ``curve`` (host search over x)."""
    hf = _host_field(curve)
    for x in _element_stream(hf):
        rhs = hf.add(
            hf.mul(hf.mul(x, x), x),
            hf.add(
                hf.mul(_embed(hf, curve.a_host), x), _embed(hf, curve.b_host)
            ),
        )
        y = (
            host_sqrt(hf, rhs)
            if isinstance(hf, (HostPrime, HostQuadExt))
            else sqrt_generic(hf, rhs, q)
        )
        if y is not None:
            return (x, y)
    raise RuntimeError("no point found")


def derive_subgroup_generator(curve, cofactor: int, r: int, q: int):
    """Deterministic r-torsion generator: cofactor * (first point on the
    curve); verified to be nonzero with [r]G == infinity."""
    pt = find_curve_point(curve, q)
    g = curve.host_mul_raw(pt, cofactor)
    assert g is not None, "cofactor clearing annihilated the point"
    assert curve.host_mul_raw(g, r) is None, "generator not in r-torsion"
    return g


def _embed(hf, v):
    if isinstance(hf, HostPrime):
        return v % hf.p
    return v


def _host_field(curve):
    from ..sw import _host_field_of

    return _host_field_of(curve.base)


def naf_digits_le(n: int) -> list[int]:
    """Non-adjacent form of n (little-endian digits in {-1, 0, 1})."""
    assert n > 0
    out = []
    while n:
        if n & 1:
            d = 2 - (n % 4)
            out.append(d)
            n -= d
        else:
            out.append(0)
        n >>= 1
    return out
