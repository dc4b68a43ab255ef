"""Pairing tests (mirrors test-templates/src/pairing.rs:2-60):
bilinearity, non-degeneracy, multi_pairing consistency.

Bilinearity is checked in the pow-free form e(aP, Q) == e(P, aQ):
equivalent to the reference's e(sP, rQ) = e(P,Q)^{sr} check but without
a 253-bit GT exponentiation, whose scan-of-Fp12-muls program is the
single most expensive (and crash-prone) XLA:CPU compile in the suite.
Kept tiny (batch 2, CPU backend).
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
    # limb-major leaves: [L, batch] — index the trailing BATCH axis
    return jax.tree_util.tree_map(lambda a: a[..., i], value)


def test_bilinearity(ctx, rng):
    g1, g2 = bls12_381.g1(), bls12_381.g2()
    F12 = ctx.fq12
    a = rng.randrange(1, bls12_381.R)

    P = g1.generator_host
    Q = g2.generator_host
    aP = g1.host_mul(P, a)
    aQ = g2.host_mul(Q, a)

    # e(aP, Q) == e(P, aQ), and e(P, Q) != 1
    p_batch = g1.from_host([aP, P])
    q_batch = g2.from_host([Q, aQ])
    e = ctx.pairing(p_batch, q_batch)
    lhs = _index(F12, e, 0)
    rhs = _index(F12, e, 1)
    assert bool(F12.equal(lhs, rhs))

    base = ctx.pairing(g1.from_host([P]), g2.from_host([Q]))
    assert not bool(F12.is_one(_index(F12, base, 0)))


def test_bilinearity_gt_exponent(ctx, rng):
    """The reference's strong form e(aP, bQ) == e(P, Q)^{ab}
    (test-templates/src/pairing.rs:10-31).  The GT exponentiation runs
    on the HOST Fp12 tower (python big ints) against device pairing
    outputs, so the check costs no 253-bit GT scan compile."""
    from algebra_tpu.fields.host_tower import HostCubicExt, HostQuadExt

    g1, g2 = bls12_381.g1(), bls12_381.g2()
    F12 = ctx.fq12
    host_fq6 = HostCubicExt(bls12_381.host_fq2, bls12_381.FQ6_NONRESIDUE)
    v = (host_fq6.base.zero(), host_fq6.base.one(), host_fq6.base.zero())
    host_gt = HostQuadExt(host_fq6, v)

    a = rng.randrange(1, bls12_381.R)
    b = rng.randrange(1, bls12_381.R)
    P, Q = g1.generator_host, g2.generator_host
    aP = g1.host_mul(P, a)
    bQ = g2.host_mul(Q, b)

    e = ctx.pairing(g1.from_host([P, aP]), g2.from_host([Q, bQ]))
    e1, e_ab = F12.to_int(e)
    one = host_gt.one()
    assert not host_gt.equal(e1, one), "degenerate pairing"
    assert host_gt.equal(host_gt.pow(e1, bls12_381.R), one), "GT order"
    assert host_gt.equal(host_gt.pow(e1, a * b % bls12_381.R), e_ab)


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


def test_multi_pairing_inverse_product(ctx, rng):
    """multi_pairing([P, -P], [Q, Q]) == 1: the product of a pairing and
    its inverse (multi_pairing == product of pairings, pairing.rs:103),
    checked without GT exponentiation."""
    g1, g2 = bls12_381.g1(), bls12_381.g2()
    F12 = ctx.fq12
    a = rng.randrange(1, bls12_381.R)
    P = g1.host_mul(g1.generator_host, a)
    negP = (P[0], (bls12_381.P - P[1]) % bls12_381.P)
    Q = g2.generator_host

    multi = ctx.multi_pairing(g1.from_host([P, negP]), g2.from_host([Q, Q]))
    assert bool(F12.is_one(multi))


def test_prepared_miller_loop_matches(ctx):
    """prepare_g2 + miller_loop_prepared == the fused miller_loop
    (G2Prepared parity, bls12/g2.rs:54-81), incl. infinity lanes."""
    import jax
    import numpy as np

    g1, g2 = bls12_381.g1(), bls12_381.g2()
    P = g1.from_host(
        [g1.generator_host, g1.host_mul(g1.generator_host, 5), None]
    )
    Q = g2.from_host(
        [g2.host_mul(g2.generator_host, 7), g2.generator_host,
         g2.generator_host]
    )
    f_ref = ctx.miller_loop(P, Q)
    f_new = ctx.miller_loop_prepared(P, ctx.prepare_g2(Q))
    for u, v in zip(
        jax.tree_util.tree_leaves(f_ref), jax.tree_util.tree_leaves(f_new)
    ):
        assert np.array_equal(np.asarray(u), np.asarray(v))
