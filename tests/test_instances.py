"""Coverage for the instance modules with no dedicated suite:
bn384_small_two_adicity, mnt6_753, fp128.

Mirrors the reference's per-curve test entry points
(test-curves/src/lib.rs feature gates; constants from
test-curves/src/bn384_small_two_adicity/*.rs, mnt6_753/*.rs,
fp128.rs).  Checks are host-math-heavy (constants re-derived with
Python ints) plus one tiny device batch per field so every module is
actually executed, without adding XLA compile load to the suite.
"""

import random

import pytest

from algebra_tpu.bigint import batch_int_to_limbs, batch_limbs_to_int
from algebra_tpu.ops import mont


@pytest.fixture(scope="module")
def rng():
    return random.Random(777)


def _check_spec(spec):
    """Re-derive two-adicity and root-of-unity orders from the modulus."""
    p = spec.modulus
    t = p - 1
    s = 0
    while t % 2 == 0:
        t //= 2
        s += 1
    assert spec.two_adicity == s
    root = spec.two_adic_root_of_unity
    assert pow(root, 1 << s, p) == 1
    assert pow(root, 1 << (s - 1), p) != 1


def _device_mul_matches(spec, rng):
    xs = [rng.randrange(spec.modulus) for _ in range(4)]
    ys = [rng.randrange(spec.modulus) for _ in range(4)]
    a = batch_int_to_limbs([spec.to_mont(x) for x in xs], spec.n_limbs)
    b = batch_int_to_limbs([spec.to_mont(y) for y in ys], spec.n_limbs)
    out = batch_limbs_to_int(mont.from_mont(spec, mont.mul(spec, a, b)))
    assert [int(v) for v in out] == [x * y % spec.modulus for x, y in zip(xs, ys)]


def test_bn384_field_constants():
    from algebra_tpu.curves.instances import bn384_small_two_adicity as inst

    _check_spec(inst.fq_spec)
    _check_spec(inst.fr_spec)
    # small-subgroup (mixed-radix) roots: order 3^2 * 2^s sizes exist
    for spec in (inst.fq_spec, inst.fr_spec):
        n = 3 * (1 << 2)
        w = spec.get_root_of_unity(n)
        assert w is not None and pow(w, n, spec.modulus) == 1


def test_bn384_g1(rng):
    from algebra_tpu.curves.instances import bn384_small_two_adicity as inst

    g1 = inst.g1()
    x, y = inst.G1_GENERATOR_X, inst.G1_GENERATOR_Y
    assert (y * y - x * x * x - 17) % inst.P == 0
    # generator has order R (cofactor 1)
    assert g1.host_mul_raw((x, y), inst.R) is None
    k = rng.randrange(1, 1 << 30)
    assert g1.host_mul((x, y), k) == g1.host_mul_raw((x, y), k)


def test_bn384_device_mul(rng):
    from algebra_tpu.curves.instances import bn384_small_two_adicity as inst

    _device_mul_matches(inst.fq_spec, rng)


def test_mnt6_753_cycle_relation():
    from algebra_tpu.curves.instances import mnt4_753, mnt6_753

    assert mnt6_753.P == mnt4_753.R
    assert mnt6_753.R == mnt4_753.P
    _check_spec(mnt6_753.fq_spec)


def test_mnt6_753_fq3_tower(rng):
    from algebra_tpu.curves.instances import mnt6_753 as inst
    from algebra_tpu.fields.host_tower import HostCubicExt, HostPrime

    F3 = inst.fq3()
    host = HostCubicExt(HostPrime(inst.P), inst.FQ3_NONRESIDUE)
    a_i = tuple(rng.randrange(inst.P) for _ in range(3))
    b_i = tuple(rng.randrange(inst.P) for _ in range(3))
    a = F3.from_int(a_i, batch_shape=())
    b = F3.from_int(b_i, batch_shape=())
    got = F3.to_int(F3.mul(a, b))
    assert got == host.mul(a_i, b_i)
    # frobenius^3 == identity, frobenius is a field automorphism
    fr = F3.frobenius(a)
    got_fr = F3.to_int(F3.frobenius(F3.frobenius(fr)))
    assert got_fr == a_i


def test_fp128_mersenne(rng):
    from algebra_tpu.curves.instances import fp128 as inst

    assert inst.P == (1 << 127) - 1
    _check_spec(inst.fq_spec)
    _device_mul_matches(inst.fq_spec, rng)
    # generator 43 is a QNR (required of a multiplicative generator's
    # 2-part for two-adicity 1)
    assert pow(43, (inst.P - 1) // 2, inst.P) == inst.P - 1
