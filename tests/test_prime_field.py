"""PrimeField kind tests: sqrt, legendre, conversions, Felt ergonomics."""

import numpy as np
import pytest

from algebra_tpu.fields.element import Felt
from algebra_tpu.fields.prime import prime_field
from algebra_tpu.fields.spec import field_spec

BLS12_381_FR = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
BLS12_381_FQ = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB

FR = prime_field(field_spec(BLS12_381_FR, generator=7, name="Fr"))
FQ = prime_field(field_spec(BLS12_381_FQ, generator=2, name="Fq"))


def test_roundtrip_int(rng):
    xs = [rng.randrange(FR.spec.modulus) for _ in range(10)]
    assert FR.to_int(FR.from_int(xs)) == xs
    assert FR.to_int(FR.from_int(xs[0])) == xs[0]


def test_legendre(rng):
    p = FR.spec.modulus
    squares = [pow(rng.randrange(1, p), 2, p) for _ in range(4)]
    leg = FR.legendre(FR.from_int(squares + [0]))
    assert list(np.asarray(leg)) == [1, 1, 1, 1, 0]


@pytest.mark.parametrize("F", [FR, FQ], ids=["Fr_tonelli_shanks", "Fq_3mod4"])
def test_sqrt(F, rng):
    p = F.spec.modulus
    roots = [rng.randrange(1, p) for _ in range(6)]
    squares = [pow(r, 2, p) for r in roots]
    ok, s = F.sqrt(F.from_int(squares))
    assert bool(np.all(np.asarray(ok)))
    got = F.to_int(s)
    for g, sq in zip(got, squares):
        assert (g * g) % p == sq
    # non-residue detection: find a non-square
    g = F.spec.generator
    nonsq = pow(g, 1, p)
    while pow(nonsq, (p - 1) // 2, p) == 1:
        nonsq = (nonsq * g) % p
    ok2, _ = F.sqrt(F.from_int([nonsq]))
    assert not bool(np.asarray(ok2)[0])


def test_felt_ops(rng):
    p = FR.spec.modulus
    x, y = rng.randrange(p), rng.randrange(p)
    a, b = Felt(FR, FR.from_int(x)), Felt(FR, FR.from_int(y))
    assert (a + b).to_int() == (x + y) % p
    assert (a - b).to_int() == (x - y) % p
    assert (a * b).to_int() == (x * y) % p
    assert (-a).to_int() == (-x) % p
    assert (a / b).to_int() == (x * pow(y, -1, p)) % p
    assert (a**5).to_int() == pow(x, 5, p)
    assert a.square().to_int() == (x * x) % p
    assert (a * b) == (b * a)


def test_bytes_mod_order():
    data = bytes(range(1, 64))
    x = FR.to_int(FR.from_le_bytes_mod_order(data))
    assert x == int.from_bytes(data, "little") % FR.spec.modulus
    y = FR.to_int(FR.from_be_bytes_mod_order(data))
    assert y == int.from_bytes(data, "big") % FR.spec.modulus


def test_get_root_of_unity():
    p = FR.spec.modulus
    for n in [1, 2, 1 << 10, 1 << 32]:
        w = FR.spec.get_root_of_unity(n)
        assert w is not None
        assert pow(w, n, p) == 1
        if n > 1:
            assert pow(w, n // 2, p) != 1
    assert FR.spec.get_root_of_unity(1 << 33) is None
    # small-subgroup (mixed radix) domain sizes: 3 * 2^k supported for Fr
    fr_ss = field_spec(
        BLS12_381_FR, generator=7, small_subgroup_base=3, small_subgroup_power=1,
        name="Fr_ss",
    )
    w = fr_ss.get_root_of_unity(3 * (1 << 5))
    assert w is not None and pow(w, 3 * (1 << 5), p) == 1
