"""GT additive-group wrapper (the reference's PairingOutput,
ec/src/pairing.rs:134-348): group laws and MSM over pairing outputs,
validated against host-tower exponentiation."""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from algebra_tpu.bigint import batch_int_to_limbs
from algebra_tpu.curves.instances import bls12_381
from algebra_tpu.fields.host_tower import HostCubicExt, HostQuadExt
from algebra_tpu.pairing.gt import GTGroup


@pytest.fixture(scope="module")
def ctx():
    return bls12_381.pairing()


@pytest.fixture(scope="module")
def host_gt():
    host_fq6 = HostCubicExt(bls12_381.host_fq2, bls12_381.FQ6_NONRESIDUE)
    v = (host_fq6.base.zero(), host_fq6.base.one(), host_fq6.base.zero())
    return HostQuadExt(host_fq6, v)


def test_gt_group_laws_and_msm(ctx, host_gt):
    rng = random.Random(99)
    g1c, g2c = bls12_381.g1(), bls12_381.g2()
    F12 = ctx.fq12
    gt = GTGroup(F12, bls12_381.R)

    # two independent GT elements from pairings of random points
    k1, k2 = rng.randrange(2, 50), rng.randrange(2, 50)
    P = g1c.from_host([g1c.generator_host,
                       g1c.host_mul(g1c.generator_host, k1)])
    Q = g2c.from_host([g2c.host_mul(g2c.generator_host, k2),
                       g2c.generator_host])
    e = ctx.pairing(P, Q)  # batch 2
    e_host = F12.to_int(e)

    # group laws: zero, add == host mul, neg, double
    z = gt.zero((2,))
    assert bool(np.all(np.asarray(gt.equal(gt.add(e, z), e))))
    s = gt.add(e, e)
    assert F12.to_int(s) == [host_gt.mul(x, x) for x in e_host]
    d = gt.double(e)
    assert F12.to_int(d) == F12.to_int(s)
    n = gt.add(e, gt.neg(e))
    assert bool(np.all(np.asarray(gt.is_zero(n))))

    # scalar mul + msm vs host exponentiation
    a = rng.randrange(1, bls12_381.R)
    b = rng.randrange(1, bls12_381.R)
    Ls = -(-bls12_381.R.bit_length() // 16)
    sc = jnp.asarray(batch_int_to_limbs([a, b], Ls))
    total = gt.msm(e, sc)
    want = host_gt.mul(host_gt.pow(e_host[0], a), host_gt.pow(e_host[1], b))
    assert F12.to_int(total) == want

    # mul_int (host-constant scalar) agrees with scalar_mul lane 0
    m = gt.mul_int(gt.index(e, 0), a)
    assert F12.to_int(m) == host_gt.pow(e_host[0], a)
