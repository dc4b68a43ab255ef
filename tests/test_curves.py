"""Group-law tests for SW (BLS12-381 G1/G2, secp256k1) and TE
(ed-on-BLS12-381) curves against host big-int oracles.

Mirrors the reference's macro-generated group suites
(test-templates/src/groups.rs:3-361): add/double/scalar-mul laws, affine
round trips, mixed addition, on-curve checks — but batched, with the host
(python int) group law as the independent oracle.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from algebra_tpu.bigint import batch_int_to_limbs
from algebra_tpu.curves.instances import bls12_381, ed_on_bls12_381, secp256k1


def sw_curves():
    return [
        pytest.param(bls12_381.g1(), id="bls12_381.G1"),
        pytest.param(bls12_381.g2(), id="bls12_381.G2"),
        pytest.param(secp256k1.g1(), id="secp256k1.G1"),
    ]


N = 8  # batch size


@pytest.fixture(scope="module")
def rng():
    return random.Random(2024)


@pytest.mark.parametrize("curve", sw_curves())
def test_sw_generator_on_curve(curve):
    aff = curve.generator_affine()
    assert bool(curve.is_on_curve(aff))


@pytest.mark.parametrize("curve", sw_curves())
def test_sw_add_matches_host(curve, rng):
    pts = curve.random_host(rng, N)
    qts = curve.random_host(rng, N)
    P = curve.from_affine(curve.from_host(pts))
    Q = curve.from_affine(curve.from_host(qts))
    want = [curve.host_add(p, q) for p, q in zip(pts, qts)]
    got = curve.to_host(curve.add(P, Q))
    assert got == want


@pytest.mark.parametrize("curve", sw_curves())
def test_sw_double_matches_host(curve, rng):
    pts = curve.random_host(rng, N)
    P = curve.from_affine(curve.from_host(pts))
    want = [curve.host_double(p) for p in pts]
    got = curve.to_host(curve.double(P))
    assert got == want


@pytest.mark.parametrize("curve", sw_curves())
def test_sw_add_edge_cases(curve, rng):
    pts = curve.random_host(rng, 2)
    # P + P (doubling through add), P + (-P) = inf, P + inf, inf + P
    p = pts[0]
    P = curve.from_affine(curve.from_host([p, p, p, None]))
    neg_p = (p[0], _neg_host(curve, p[1]))
    Q = curve.from_affine(curve.from_host([p, neg_p, None, p]))
    got = curve.to_host(curve.add(P, Q))
    want = [curve.host_double(p), None, p, p]
    assert got == want


@pytest.mark.parametrize("curve", sw_curves())
def test_sw_mixed_add_matches_add(curve, rng):
    pts = curve.random_host(rng, N)
    qts = curve.random_host(rng, N)
    P = curve.from_affine(curve.from_host(pts))
    aff_q = curve.from_host(qts)
    got = curve.to_host(curve.add_mixed(P, aff_q))
    want = [curve.host_add(p, q) for p, q in zip(pts, qts)]
    assert got == want


@pytest.mark.parametrize("curve", sw_curves())
def test_sw_scalar_mul_matches_host(curve, rng):
    pts = curve.random_host(rng, 4)
    ks = [rng.randrange(curve.scalar_modulus) for _ in pts]
    P = curve.from_affine(curve.from_host(pts))
    n_limbs = (curve.scalar_modulus.bit_length() + 15) // 16
    scalars = jnp.asarray(batch_int_to_limbs(ks, n_limbs))
    got = curve.to_host(curve.scalar_mul(P, scalars))
    want = [curve.host_mul(p, k) for p, k in zip(pts, ks)]
    assert got == want


@pytest.mark.parametrize("curve", sw_curves())
def test_sw_affine_round_trip(curve, rng):
    pts = curve.random_host(rng, N) + [None]
    aff = curve.from_host(pts)
    P = curve.from_affine(aff)
    # scale Z to a nontrivial representative: P + P - P
    P2 = curve.add(curve.double(P), curve.neg(P))
    assert curve.to_host(P2) == pts


def _neg_host(curve, y):
    from algebra_tpu.curves.sw import _host_field_of

    return _host_field_of(curve.base).neg(y)


# ------------------------------------------------------------------ TE curve


def test_te_generator_on_curve():
    c = ed_on_bls12_381.curve()
    assert bool(c.is_on_curve(c.generator_affine()))


def test_te_add_matches_host(rng):
    c = ed_on_bls12_381.curve()
    pts = c.random_host(rng, N)
    qts = c.random_host(rng, N)
    P = c.from_affine(c.from_host(pts))
    Q = c.from_affine(c.from_host(qts))
    want = [c.host_add(p, q) for p, q in zip(pts, qts)]
    got = c.to_host(c.add(P, Q))
    assert got == want


def test_te_double_equals_add(rng):
    c = ed_on_bls12_381.curve()
    pts = c.random_host(rng, N)
    P = c.from_affine(c.from_host(pts))
    d1 = c.to_host(c.double(P))
    d2 = c.to_host(c.add(P, P))
    assert d1 == d2
    assert d1 == [c.host_add(p, p) for p in pts]


def test_te_scalar_mul_matches_host(rng):
    c = ed_on_bls12_381.curve()
    pts = c.random_host(rng, 4)
    ks = [rng.randrange(c.scalar_modulus) for _ in pts]
    P = c.from_affine(c.from_host(pts))
    n_limbs = (c.scalar_modulus.bit_length() + 15) // 16
    scalars = jnp.asarray(batch_int_to_limbs(ks, n_limbs))
    got = c.to_host(c.scalar_mul(P, scalars))
    want = [c.host_mul(p, k) for p, k in zip(pts, ks)]
    assert got == want


def test_te_identity_and_neg(rng):
    c = ed_on_bls12_381.curve()
    pts = c.random_host(rng, N)
    P = c.from_affine(c.from_host(pts))
    Z = c.add(P, c.neg(P))
    assert bool(jnp.all(c.is_zero(Z)))
    I = c.add(P, c.zero(c.batch_shape(P)))
    assert bool(jnp.all(c.equal(I, P)))
