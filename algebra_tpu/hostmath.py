"""Host-side (python big-int) number theory helpers.

Square roots and Legendre symbols over the host tower representation,
used by the serializers (point decompression) and test oracles.  Mirrors
the algorithms of the reference's sqrt framework
(ff/src/fields/sqrt.rs:13-148, quadratic_extension.rs:377) but runs on
Python ints, entirely host-side.
"""

from __future__ import annotations

from .fields.host_tower import HostCubicExt, HostPrime, HostQuadExt


def legendre_prime(a: int, p: int) -> int:
    a %= p
    if a == 0:
        return 0
    return 1 if pow(a, (p - 1) // 2, p) == 1 else -1


def sqrt_prime(a: int, p: int) -> int | None:
    """Tonelli–Shanks / (p+1)/4 square root mod p; None if non-residue."""
    a %= p
    if a == 0:
        return 0
    if legendre_prime(a, p) != 1:
        return None
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    # Tonelli–Shanks
    s, t = 0, p - 1
    while t % 2 == 0:
        s += 1
        t //= 2
    # find a non-residue
    z = 2
    while legendre_prime(z, p) != -1:
        z += 1
    m = s
    c = pow(z, t, p)
    u = pow(a, t, p)
    r = pow(a, (t + 1) // 2, p)
    while u != 1:
        # find least i with u^(2^i) == 1
        i, v = 0, u
        while v != 1:
            v = (v * v) % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m = i
        c = (b * b) % p
        u = (u * c) % p
        r = (r * b) % p
    return r


def host_sqrt(hf, a):
    """Square root in a host tower field; None if no root exists."""
    if isinstance(hf, HostPrime):
        return sqrt_prime(a, hf.p)
    if isinstance(hf, HostQuadExt):
        return _sqrt_quad(hf, a)
    raise TypeError(f"host sqrt not implemented for {type(hf)}")


def _sqrt_quad(hf: HostQuadExt, a):
    """Two-case quadratic-extension sqrt (quadratic_extension.rs:377)."""
    base = hf.base
    a0, a1 = a
    zero, one = base.zero(), base.one()
    if base.equal(a1, zero):
        # a = a0: either sqrt(a0) in base, or sqrt(a0/nr)*u
        r = host_sqrt(base, a0)
        if r is not None:
            return (r, zero)
        r = host_sqrt(base, base.mul(a0, base.inv(hf.nr)))
        if r is None:
            return None
        return (zero, r)
    # alpha = norm(a) = a0^2 - nr*a1^2 must be a QR in base
    alpha = base.sub(base.mul(a0, a0), base.mul(hf.nr, base.mul(a1, a1)))
    alpha_sqrt = host_sqrt(base, alpha)
    if alpha_sqrt is None:
        return None
    two_inv = base.inv(base.add(one, one))
    delta = base.mul(base.add(a0, alpha_sqrt), two_inv)
    if _is_qr(base, delta) is False:
        delta = base.mul(base.sub(a0, alpha_sqrt), two_inv)
    c0 = host_sqrt(base, delta)
    if c0 is None:
        return None
    c0_inv = base.inv(c0)
    c1 = base.mul(base.mul(a1, c0_inv), two_inv)
    root = (c0, c1)
    # verify (handles edge cases of the two-case split)
    if hf.equal(hf.mul(root, root), a):
        return root
    return None


def _is_qr(base, x):
    if isinstance(base, HostPrime):
        return legendre_prime(x, base.p) >= 0
    return host_sqrt(base, x) is not None
