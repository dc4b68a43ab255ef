"""Pairing tests (mirrors test-templates/src/pairing.rs:2-60):
bilinearity, non-degeneracy, multi_pairing == product of pairings.

Kept tiny (batch 2, CPU backend): a Miller loop compile is the largest
program in the suite.
"""

import random

import jax
import jax.numpy as jnp
import pytest

from algebra_tpu.curves.instances import bls12_381


@pytest.fixture(scope="module")
def rng():
    return random.Random(31337)


@pytest.fixture(scope="module")
def ctx():
    return bls12_381.pairing()


def _index(field, value, i):
    return jax.tree_util.tree_map(lambda a: a[i], value)


def test_bilinearity(ctx, rng):
    g1, g2 = bls12_381.g1(), bls12_381.g2()
    F12 = ctx.fq12
    a = rng.randrange(1, bls12_381.R)
    b = rng.randrange(1, bls12_381.R)

    P = g1.generator_host
    Q = g2.generator_host
    aP = g1.host_mul(P, a)
    bQ = g2.host_mul(Q, b)

    p_batch = g1.from_host([aP, P])
    q_batch = g2.from_host([bQ, Q])
    e = ctx.pairing(p_batch, q_batch)  # [e(aP,bQ), e(P,Q)]

    e_ab = _index(F12, e, 0)
    e_base = _index(F12, e, 1)
    # e(aP, bQ) == e(P, Q)^(ab)
    want = F12.pow_int(e_base, (a * b) % bls12_381.R)
    assert bool(F12.equal(e_ab, want))
    # non-degeneracy
    assert not bool(F12.is_one(e_base))


def test_pairing_with_infinity(ctx):
    g1, g2 = bls12_381.g1(), bls12_381.g2()
    F12 = ctx.fq12
    P = g1.generator_host
    Q = g2.generator_host
    p_batch = g1.from_host([None, P])
    q_batch = g2.from_host([Q, None])
    f = ctx.miller_loop(p_batch, q_batch)
    ones = F12.one((2,))
    assert bool(F12.equal(f, ones).all())


def test_multi_pairing_is_product(ctx, rng):
    g1, g2 = bls12_381.g1(), bls12_381.g2()
    F12 = ctx.fq12
    a = rng.randrange(1, bls12_381.R)
    b = rng.randrange(1, bls12_381.R)
    P, Q = g1.generator_host, g2.generator_host
    aP, bQ = g1.host_mul(P, a), g2.host_mul(Q, b)

    p_batch = g1.from_host([aP, P])
    q_batch = g2.from_host([Q, bQ])
    multi = ctx.multi_pairing(p_batch, q_batch)
    # product of individual pairings: e(aP,Q)*e(P,bQ) = e(P,Q)^(a+b)
    base = ctx.pairing(g1.from_host([P]), g2.from_host([Q]))
    base0 = _index(F12, base, 0)
    want = F12.pow_int(base0, (a + b) % bls12_381.R)
    assert bool(F12.equal(multi, want))
