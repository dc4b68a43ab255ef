"""Extension-tower field tests vs the host big-int tower oracle
(mirrors the tower parts of test-templates/src/fields.rs: arithmetic
laws, frobenius vs pow, sparse muls, inverses, sqrt)."""

import random

import jax.numpy as jnp
import pytest

from algebra_tpu.curves.instances import bls12_381 as inst
from algebra_tpu.fields.host_tower import HostCubicExt, HostPrime, HostQuadExt

P = inst.P


@pytest.fixture(scope="module")
def rng():
    return random.Random(808)


def host_fields():
    fq = HostPrime(P)
    fq2 = HostQuadExt(fq, P - 1)
    fq6 = HostCubicExt(fq2, (1, 1))
    return fq, fq2, fq6


def rand2(rng):
    return (rng.randrange(P), rng.randrange(P))


def rand6(rng):
    return (rand2(rng), rand2(rng), rand2(rng))


def rand12(rng):
    return (rand6(rng), rand6(rng))


def test_fq2_mul_square_inv(rng):
    F2 = inst.fq2()
    _, h2, _ = host_fields()
    xs = [rand2(rng) for _ in range(4)]
    ys = [rand2(rng) for _ in range(4)]
    a, b = F2.from_int(xs), F2.from_int(ys)
    got = F2.to_int(F2.mul(a, b))
    assert got == [h2.mul(x, y) for x, y in zip(xs, ys)]
    assert F2.to_int(F2.square(a)) == [h2.mul(x, x) for x in xs]
    inv = F2.to_int(F2.inverse(a))
    assert inv == [h2.inv(x) for x in xs]


def test_fq2_frobenius(rng):
    F2 = inst.fq2()
    _, h2, _ = host_fields()
    xs = [rand2(rng) for _ in range(3)]
    a = F2.from_int(xs)
    got = F2.to_int(F2.frobenius(a, 1))
    assert got == [h2.pow(x, P) for x in xs]


def test_fq6_mul_inv(rng):
    F6 = inst.fq6()
    _, _, h6 = host_fields()
    xs = [rand6(rng) for _ in range(3)]
    ys = [rand6(rng) for _ in range(3)]
    a, b = F6.from_int(xs), F6.from_int(ys)
    assert F6.to_int(F6.mul(a, b)) == [h6.mul(x, y) for x, y in zip(xs, ys)]
    assert F6.to_int(F6.square(a)) == [h6.mul(x, x) for x in xs]
    prod = F6.mul(a, F6.inverse(a))
    ones = F6.one((3,))
    assert bool(F6.equal(prod, ones).all())


def test_fq12_mul_inv_frobenius(rng):
    F12 = inst.fq12()
    xs = [rand12(rng) for _ in range(2)]
    ys = [rand12(rng) for _ in range(2)]
    a, b = F12.from_int(xs), F12.from_int(ys)
    # ring laws: (a*b)*a^-1 == b
    prod = F12.mul(F12.mul(a, b), F12.inverse(a))
    assert bool(F12.equal(prod, b).all())
    # frobenius^12 == id
    f = a
    for _ in range(12):
        f = F12.frobenius(f, 1)
    assert bool(F12.equal(f, a).all())
    # frobenius(x) == x^p on a sample
    hq = HostPrime(P)
    h2 = HostQuadExt(hq, P - 1)
    h6 = HostCubicExt(h2, (1, 1))

    class H12:
        def __init__(s):
            s.h6 = h6

        def mul(s, x, y):
            # (c0 + c1 w)^2 with w^2 = v: done via explicit poly mult
            c0 = h6.add(h6.mul(x[0], y[0]), _mul_by_v(h6, h6.mul(x[1], y[1])))
            c1 = h6.add(h6.mul(x[0], y[1]), h6.mul(x[1], y[0]))
            return (c0, c1)

    def _mul_by_v(h6, z):
        nr = (1, 1)
        return (h2.mul(nr, z[2]), z[0], z[1])

    h12 = H12()
    x = xs[0]
    one12 = (h6.one(), h6.zero())
    acc = one12
    for bit in bin(P)[2:]:
        acc = h12.mul(acc, acc)
        if bit == "1":
            acc = h12.mul(acc, x)
    got = F12.to_int(F12.frobenius(a, 1))[0]
    assert got == acc


def test_fq12_sparse_mul_by_014(rng):
    F12 = inst.fq12()
    x = [rand12(rng)]
    c0h, c1h, c4h = rand2(rng), rand2(rng), rand2(rng)
    F2 = inst.fq2()
    a = F12.from_int(x)
    c0 = F2.from_int([c0h])
    c1 = F2.from_int([c1h])
    c4 = F2.from_int([c4h])
    got = F12.to_int(F12.mul_by_014(a, c0, c1, c4))
    # oracle: full multiply by the sparse element (c0 + c1 v + c4 v w)
    sparse = ((c0h, c1h, (0, 0)), (((0, 0)), c4h, (0, 0)))
    b = F12.from_int([sparse])
    want = F12.to_int(F12.mul(a, b))
    assert got == want


def test_fq12_cyclotomic_square_consistency(rng):
    """cyclotomic_square == square on norm-1 elements (cyclotomic.rs)."""
    F12 = inst.fq12()
    x = [rand12(rng)]
    a = F12.from_int(x)
    # project into the cyclotomic subgroup (order Phi_12(p)):
    # b = a^((p^6-1)(p^2+1)) — the pairing easy part
    t = F12.mul(F12.conjugate(a), F12.inverse(a))  # a^(p^6-1)
    b = F12.mul(F12.frobenius(t, 2), t)
    s1 = F12.square(b)
    s2 = F12.cyclotomic_square(b)
    assert bool(F12.equal(s1, s2).all())
