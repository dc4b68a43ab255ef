"""Field-law and oracle tests for the batched Montgomery core.

Mirrors the reference's macro-generated field suites
(test-templates/src/fields.rs:52-524): arithmetic laws on random batches,
edge cases near the modulus, and recomputation of every Montgomery
constant from the modulus with an independent host-side big-int oracle.
"""

import random

import jax
import numpy as np
import pytest

from algebra_tpu.bigint import batch_int_to_limbs, batch_limbs_to_int
from algebra_tpu.fields.spec import field_spec
from algebra_tpu.ops import mont

BLS12_381_FR = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
BLS12_381_FQ = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
SECP256K1_FQ = 2**256 - 2**32 - 977
MNT4_753_FQ = 0x01C4C62D92C41110229022EEE2CDADB7F997505B8FAFED5EB7E8F96C97D87307FDB925E8A0ED8D99D124D9A15AF79DB117E776F218059DB80F0DA5CB537E38685ACCE9767254A4638810719AC425F0E39D54522CDD119F5E9063DE245E8001

SPECS = {
    "bls12_381_fr": field_spec(BLS12_381_FR, generator=7, small_subgroup_base=3,
                               small_subgroup_power=1, name="bls12_381_Fr"),
    "bls12_381_fq": field_spec(BLS12_381_FQ, generator=2, name="bls12_381_Fq"),
    "secp256k1_fq": field_spec(SECP256K1_FQ, generator=3, name="secp256k1_Fq"),
    "mnt4_753_fq": field_spec(MNT4_753_FQ, generator=17, name="mnt4_753_Fq"),
}

mul_j = jax.jit(mont.mul, static_argnums=0)
add_j = jax.jit(mont.add, static_argnums=0)
sub_j = jax.jit(mont.sub, static_argnums=0)
neg_j = jax.jit(mont.neg, static_argnums=0)
from_mont_j = jax.jit(mont.from_mont, static_argnums=0)
to_mont_j = jax.jit(mont.to_mont, static_argnums=0)


def sample(spec, rng, n, edge=True):
    p = spec.modulus
    xs = [rng.randrange(p) for _ in range(n)]
    if edge:
        xs[: min(4, n)] = [0, 1, p - 1, (p - 1) // 2][: min(4, n)]
    return xs


def to_dev(spec, xs):
    return batch_int_to_limbs([spec.to_mont(x) for x in xs], spec.n_limbs)


def to_host(spec, arr):
    return batch_limbs_to_int(from_mont_j(spec, arr))


@pytest.mark.parametrize("name", list(SPECS))
def test_spec_constants_vs_oracle(name):
    """Recompute all Montgomery constants independently
    (mirrors test-templates/src/fields.rs mont constant checks)."""
    spec = SPECS[name]
    p = spec.modulus
    bits = 16 * spec.n_limbs
    assert bits % 64 == 0
    assert spec.R == pow(2, bits, p)
    assert spec.R2 == pow(2, 2 * bits, p)
    assert (spec.inv16 * p) % (1 << 16) == (1 << 16) - 1
    assert (1 << spec.two_adicity) * spec.trace == p - 1
    assert spec.trace % 2 == 1
    if spec.generator is not None:
        root = spec.two_adic_root_of_unity
        assert pow(root, 1 << spec.two_adicity, p) == 1
        assert pow(root, 1 << (spec.two_adicity - 1), p) == p - 1


def test_known_bls12_381_constants():
    """Cross-check vs constants published in the reference's unit tests
    (test-curves/src/bls12_381/fq.rs)."""
    fq = SPECS["bls12_381_fq"]
    assert fq.modulus_bit_size == 381
    assert fq.R == 3380320199399472671518931668520476396067793891014375699959770179129436917079669831430077592723774664465579537268733
    fr = SPECS["bls12_381_fr"]
    # INV for 64-bit limbs is 0xffff_fffe_ffff_ffff; ours is mod 2^16.
    assert fr.inv16 == 0xFFFF_FFFE_FFFF_FFFF % (1 << 16)
    assert fr.two_adicity == 32


@pytest.mark.parametrize("name", list(SPECS))
def test_mul_add_sub_neg_vs_oracle(name, rng):
    spec = SPECS[name]
    p = spec.modulus
    n = 32
    xs, ys = sample(spec, rng, n), sample(spec, rng, n)
    a, b = to_dev(spec, xs), to_dev(spec, ys)
    assert to_host(spec, mul_j(spec, a, b)) == [(x * y) % p for x, y in zip(xs, ys)]
    assert to_host(spec, add_j(spec, a, b)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert to_host(spec, sub_j(spec, a, b)) == [(x - y) % p for x, y in zip(xs, ys)]
    assert to_host(spec, neg_j(spec, a)) == [(-x) % p for x in xs]


@pytest.mark.parametrize("name", ["bls12_381_fr", "secp256k1_fq"])
def test_field_laws(name, rng):
    spec = SPECS[name]
    n = 16
    a = to_dev(spec, sample(spec, rng, n))
    b = to_dev(spec, sample(spec, rng, n, edge=False))
    c = to_dev(spec, sample(spec, rng, n, edge=False))
    # commutativity / associativity / distributivity
    assert np.array_equal(mul_j(spec, a, b), mul_j(spec, b, a))
    assert np.array_equal(add_j(spec, a, b), add_j(spec, b, a))
    assert np.array_equal(
        mul_j(spec, mul_j(spec, a, b), c), mul_j(spec, a, mul_j(spec, b, c))
    )
    lhs = mul_j(spec, a, add_j(spec, b, c))
    rhs = add_j(spec, mul_j(spec, a, b), mul_j(spec, a, c))
    assert np.array_equal(lhs, rhs)
    # identities (limb-major: broadcast the [L] constant over the batch)
    one = np.broadcast_to(np.asarray(spec.one_mont_limbs)[:, None], a.shape)
    zero = np.zeros_like(a)
    assert np.array_equal(mul_j(spec, a, one), a)
    assert np.array_equal(add_j(spec, a, zero), a)


@pytest.mark.parametrize("name", ["bls12_381_fr", "bls12_381_fq", "secp256k1_fq"])
def test_inverse(name, rng):
    spec = SPECS[name]
    p = spec.modulus
    xs = sample(spec, rng, 8)[1:]  # drop 0
    a = to_dev(spec, xs)
    inv = jax.jit(mont.inv, static_argnums=0)(spec, a)
    assert to_host(spec, inv) == [pow(x, -1, p) for x in xs]
    # inv(0) == 0 convention
    z = jax.jit(mont.inv, static_argnums=0)(spec, to_dev(spec, [0]))
    assert to_host(spec, z) == [0]


def test_batch_inverse(rng):
    spec = SPECS["bls12_381_fr"]
    p = spec.modulus
    xs = [0] + sample(spec, rng, 31, edge=False)
    a = to_dev(spec, xs)
    out = jax.jit(mont.batch_inverse, static_argnums=0)(spec, a)
    want = [0 if x == 0 else pow(x, -1, p) for x in xs]
    assert to_host(spec, out) == want


def test_pow_fixed(rng):
    spec = SPECS["bls12_381_fr"]
    p = spec.modulus
    xs = sample(spec, rng, 4)
    a = to_dev(spec, xs)
    for e in [0, 1, 2, 3, 65537, spec.trace]:
        out = jax.jit(mont.pow_fixed, static_argnums=(0, 2))(spec, a, e)
        assert to_host(spec, out) == [pow(x, e, p) for x in xs]


def test_sum_of_products(rng):
    spec = SPECS["bls12_381_fr"]
    p = spec.modulus
    n = 8
    ass = [sample(spec, rng, n, edge=False) for _ in range(3)]
    bss = [sample(spec, rng, n, edge=False) for _ in range(3)]
    out = mont.sum_of_products(
        spec, [to_dev(spec, a) for a in ass], [to_dev(spec, b) for b in bss]
    )
    want = [
        sum(a[i] * b[i] for a, b in zip(ass, bss)) % p for i in range(n)
    ]
    assert to_host(spec, out) == want


def test_near_modulus_edge_cases():
    """sum-of-products / add chains near the modulus boundary
    (mirrors fields.rs sum_of_products edge-case test)."""
    spec = SPECS["secp256k1_fq"]  # no spare bit: exercises the carry path
    p = spec.modulus
    xs = [p - 1, p - 1, p - 2, 1]
    ys = [p - 1, 1, p - 1, p - 1]
    a, b = to_dev(spec, xs), to_dev(spec, ys)
    assert to_host(spec, mul_j(spec, a, b)) == [(x * y) % p for x, y in zip(xs, ys)]
    assert to_host(spec, add_j(spec, a, b)) == [(x + y) % p for x, y in zip(xs, ys)]


def test_mul_by_u32(rng):
    spec = SPECS["bls12_381_fr"]
    p = spec.modulus
    xs = sample(spec, rng, 8)
    a = to_dev(spec, xs)
    for k in [0, 1, 2, 3, 9, 11]:
        out = mont.mul_by_u32(spec, a, k)
        assert to_host(spec, out) == [(x * k) % p for x in xs]
