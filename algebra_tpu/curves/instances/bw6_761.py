"""BW6-761: the Brezing–Weng/Cocks–Pinch curve over BLS12-377's base field.

Concrete instantiation of the BW6 pairing family (pairing/bw6.py; family
model: /root/reference/ec/src/models/bw6/mod.rs — the concrete BW6-761
parameters live in the downstream curves repo).  NOTHING here is
transcribed: the 761-bit prime is re-derived at import time from the
public construction (El Housni–Guillevic, eprint 2020/351):

    r   = p_{BLS12-377}(u),  u = 0x8508c00000000001
    z   = primitive 6th root of unity mod r,  t0 = z + 1,
    y0  = (t0 - 2)/sqrt(-3) mod r
    t   = t0 + 13 r,  y = y0 + 9 r          (ht = 13, hy = 9)
    p   = (t^2 + 3 y^2) / 4                 (761-bit prime)

E/Fp: y^2 = x^3 - 1 with r | #E = p + 1 - t; G2 is the sextic twist
y^2 = x^3 + 4 over Fp (twist class of the Fp3 nonresidue -4); the target
is Fp6 = Fp3[w]/(w^2 - v), v^3 = -4.  Generators are derived
deterministically (first curve point, cleared by the cofactor) and
verified in-subgroup.  Miller loops: f_{u+1,Q} and f_{u^3-u^2-u,Q}
(Alg. 5); hard part fixed for (ht, hy) = (13, 9) (Alg. 6).
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

# ------------------------------------------------------------- construction
U = 0x8508C00000000001  # BLS12-377 seed
R = ((U - 1) ** 2 * (U**4 - U**2 + 1)) // 3 + U  # = p of BLS12-377
HT, HY = 13, 9


def _sqrt_mod(a: int, p: int) -> int:
    from ...hostmath import sqrt_prime

    root = sqrt_prime(a, p)
    assert root is not None
    return root


def _derive_p():
    s3 = _sqrt_mod(R - 3, R)
    # fix the branch: choose the sqrt(-3) representative that yields the
    # 761-bit prime with (ht, hy) = (13, 9); both branches give the same p.
    for s in (s3, R - s3):
        z = (1 + s) * pow(2, -1, R) % R
        t0 = (z + 1) % R
        y0 = (t0 - 2) * pow(s, -1, R) % R
        for y0s in (y0, R - y0):
            t = t0 + HT * R
            y = y0s + HY * R
            v = t * t + 3 * y * y
            if v % 4:
                continue
            p = v // 4
            if p.bit_length() == 761 and (p + 1 - t) % R == 0 and _is_prime(p):
                return p, t, y
    raise RuntimeError("BW6-761 construction failed")


def _is_prime(n: int, k: int = 40) -> bool:
    import random

    if n < 2:
        return False
    for sp in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % sp == 0:
            return n == sp
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    rng = random.Random(0xB86)
    for _ in range(k):
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


P, TRACE, _Y_CM = _derive_p()
assert hex(P).startswith("0x122e824f") and hex(P).endswith("8b")

# ------------------------------------------------------------------- fields
def _smallest_qnr(p: int) -> int:
    g = 2
    while pow(g, (p - 1) // 2, p) == 1:
        g += 1
    return g


fq_spec = field_spec(P, generator=_smallest_qnr(P), name="bw6_761.Fq")
# Fr == BLS12-377's base field (2-adicity 46)
fr_spec = field_spec(R, generator=_smallest_qnr(R), name="bw6_761.Fr")
Fq = prime_field(fq_spec)
Fr = prime_field(fr_spec)

host_fq = HostPrime(P)
FQ3_NONRESIDUE = P - 4  # v^3 = -4 (verified non-cube below)
assert pow(FQ3_NONRESIDUE, (P - 1) // 3, P) != 1, "-4 is a cube mod p"
host_fq3 = HostCubicExt(host_fq, FQ3_NONRESIDUE)


@functools.cache
def fq3() -> CubicExtField:
    c1, c2 = frobenius_coeffs_cubic(host_fq, FQ3_NONRESIDUE, P, 3)
    return CubicExtField(Fq, FQ3_NONRESIDUE, c1, c2, name="bw6_761.Fq3")


@functools.cache
def fq6() -> Fp6Over3Field:
    # Frobenius on w (w^2 = v): w^(p^i) = v^((p^i - 1)/2) * w
    v = (0, 1, 0)
    coeffs = [host_fq3.pow(v, (P**i - 1) // 2) for i in range(6)]
    return Fp6Over3Field(fq3(), coeffs, name="bw6_761.Fq6")


# ------------------------------------------------------------------- curves
@functools.cache
def g1() -> SWCurve:
    n = P + 1 - TRACE
    assert n % R == 0
    cofactor = n // R
    c = SWCurve(
        Fq,
        a_host=0,
        b_host=P - 1,  # y^2 = x^3 - 1
        generator_host=(0, 0),  # placeholder, replaced below
        cofactor=cofactor,
        scalar_modulus=R,
        name="bw6_761.G1",
    )
    c.generator_host = _derive.derive_subgroup_generator(c, cofactor, R, P)
    return c


@functools.cache
def g2() -> SWCurve:
    # sextic twist y^2 = x^3 + 4 (twist class of -4); its order is the
    # unique r-divisible candidate among the six sextic twist orders.
    cands = set()
    t, y = TRACE, _Y_CM
    for tw in (t, -t, (t + 3 * y) // 2, (t - 3 * y) // 2,
               -(t + 3 * y) // 2, -(t - 3 * y) // 2):
        cands.add(P + 1 - tw)
    orders = [o for o in cands if o % R == 0]
    assert orders, "no sextic twist order divisible by r"
    c = SWCurve(
        Fq,
        a_host=0,
        b_host=4,
        generator_host=(0, 0),  # placeholder, replaced below
        cofactor=1,  # fixed up below once the true order is confirmed
        scalar_modulus=R,
        name="bw6_761.G2",
    )
    # pin the actual order of THIS twist empirically: the sample point
    # must vanish under [order] for exactly one candidate.
    pt = _derive.find_curve_point(c, P)
    order = None
    for o in orders:
        if c.host_mul_raw(pt, o) is None:
            order = o
            break
    assert order is not None, "y^2 = x^3 + 4 is not the r-divisible twist"
    c.cofactor = order // R
    c.cofactor_inv = pow(c.cofactor, -1, R)
    c.generator_host = _derive.derive_subgroup_generator(c, c.cofactor, R, P)
    return c


@functools.cache
def pairing():
    """BW6-761 pairing context (Alg. 5 loops over u+1 and u^3-u^2-u)."""
    from ...pairing.bw6 import BW6

    loop2 = U**3 - U**2 - U
    return BW6(
        g1(),
        g2(),
        fq6(),
        x_abs=U,
        x_is_negative=False,
        ate_loop_count_1=U + 1,
        ate_loop_count_1_is_neg=False,
        ate_loop_count_2=_derive.naf_digits_le(loop2),
        ate_loop_count_2_is_neg=False,
        twist_type="M",
    )
