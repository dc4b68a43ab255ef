"""Pairing-family engine tests: BN, BW6, MNT4, MNT6.

Mirrors test-templates/src/pairing.rs:2-60 for every pairing family the
reference models (ec/src/models/{bn,bw6,mnt4,mnt6}): full bilinearity
e(aP, bQ) == e(P, Q)^{ab}, non-degeneracy, and GT order r.  The GT
exponentiation runs on the HOST tower (python big ints) against the
device pairing output, so the check is the reference's strong form
without compiling a 750-bit GT scan per family.

Concrete instances: BN254 (EIP-196/197), BW6-761 (derived on import from
the eprint 2020/351 construction), MNT4-753 (arkworks constants + derived
G2), and a toy embedding-degree-6 MNT6 curve (the published MNT6-753 b
coefficient is not derivable from p and r alone; the toy curve runs the
identical engine code paths at CPU-friendly size).
"""

import random

import pytest

from algebra_tpu.fields.host_tower import HostCubicExt, HostQuadExt


def _host_gt_fp12(inst):
    """Host mirror of an Fp12 = 2-over-3-over-2 target tower."""
    host_fq6 = HostCubicExt(inst.host_fq2, inst.FQ6_NONRESIDUE)
    v = (host_fq6.base.zero(), host_fq6.base.one(), host_fq6.base.zero())
    return HostQuadExt(host_fq6, v)


def _host_gt_quad_over(host_base):
    """Host mirror of a target = base[w]/(w^2 - gen) tower (Fp4/Fp6)."""
    if isinstance(host_base, HostCubicExt):
        gen = (host_base.base.zero(), host_base.base.one(), host_base.base.zero())
    else:
        gen = (host_base.base.zero(), host_base.base.one())
    return HostQuadExt(host_base, gen)


def _check_pairing(inst, ctx, gt_field, host_gt, r, seed):
    rng = random.Random(seed)
    g1, g2 = inst.g1(), inst.g2()
    a = rng.randrange(1, r)
    b = rng.randrange(1, r)
    P, Q = g1.generator_host, g2.generator_host
    aP = g1.host_mul(P, a)
    bQ = g2.host_mul(Q, b)

    e = ctx.pairing(g1.from_host([P, aP]), g2.from_host([Q, bQ]))
    e1, e_ab = gt_field.to_int(e)

    one = host_gt.one()
    assert not host_gt.equal(e1, one), "pairing is degenerate"
    # GT subgroup order r (catches a wrong final exponentiation)
    assert host_gt.equal(host_gt.pow(e1, r), one)
    # full bilinearity: e(aP, bQ) == e(P, Q)^{ab}
    assert host_gt.equal(host_gt.pow(e1, a * b % r), e_ab)


def test_bn254_pairing():
    from algebra_tpu.curves.instances import bn254 as inst

    ctx = inst.pairing()
    _check_pairing(inst, ctx, inst.fq12(), _host_gt_fp12(inst), inst.R, 1001)


def test_bn254_multi_pairing_inverse_product():
    from algebra_tpu.curves.instances import bn254 as inst

    ctx = inst.pairing()
    g1, g2 = inst.g1(), inst.g2()
    F12 = inst.fq12()
    P = g1.host_mul(g1.generator_host, 7)
    negP = (P[0], (inst.P - P[1]) % inst.P)
    Q = g2.generator_host
    multi = ctx.multi_pairing(g1.from_host([P, negP]), g2.from_host([Q, Q]))
    assert bool(F12.is_one(multi))


def test_bw6_761_pairing():
    from algebra_tpu.curves.instances import bw6_761 as inst

    ctx = inst.pairing()
    host_gt = _host_gt_quad_over(inst.host_fq3)
    _check_pairing(inst, ctx, inst.fq6(), host_gt, inst.R, 1002)


def test_mnt4_753_pairing():
    from algebra_tpu.curves.instances import mnt4_753 as inst

    ctx = inst.pairing()
    host_gt = _host_gt_quad_over(inst.host_fq2)
    _check_pairing(inst, ctx, inst.fq4(), host_gt, inst.R, 1003)


def test_mnt6_toy_pairing():
    from algebra_tpu.curves.instances import mnt6_toy as inst

    ctx = inst.pairing()
    host_gt = _host_gt_quad_over(inst.host_fq3)
    _check_pairing(inst, ctx, inst.fq6(), host_gt, inst.R, 1004)


def test_mnt6_toy_pairing_with_infinity():
    from algebra_tpu.curves.instances import mnt6_toy as inst

    ctx = inst.pairing()
    g1, g2 = inst.g1(), inst.g2()
    F6 = inst.fq6()
    P, Q = g1.generator_host, g2.generator_host
    f = ctx.miller_loop(g1.from_host([None, P]), g2.from_host([Q, None]))
    assert bool(F6.equal(f, F6.one((2,))).all())


def test_bn254_prepared_miller_loop_matches():
    """BN G2Prepared: prepare_g2 + miller_loop_prepared == the fused
    miller_loop (bn/g2.rs ell_coeffs reuse), incl. infinity lanes."""
    import jax
    import numpy as np

    from algebra_tpu.curves.instances import bn254

    ctx = bn254.pairing()
    g1, g2 = bn254.g1(), bn254.g2()
    P = g1.from_host(
        [g1.generator_host, g1.host_mul(g1.generator_host, 3), None]
    )
    Q = g2.from_host(
        [g2.host_mul(g2.generator_host, 11), g2.generator_host,
         g2.generator_host]
    )
    f_ref = ctx.miller_loop(P, Q)
    f_new = ctx.miller_loop_prepared(P, ctx.prepare_g2(Q))
    for u, v in zip(
        jax.tree_util.tree_leaves(f_ref), jax.tree_util.tree_leaves(f_new)
    ):
        assert np.array_equal(np.asarray(u), np.asarray(v))


def _check_prepared_matches(inst, seed):
    """prepare_g2 + miller_loop_prepared == the fused miller_loop,
    bit-exact (the reference precomputes per-step coefficients once per
    Q for exactly this reuse: bw6/g2.rs:23-121, mnt4/g2.rs:24-90)."""
    import jax
    import numpy as np

    ctx = inst.pairing()
    g1, g2 = inst.g1(), inst.g2()
    P = g1.from_host(
        [g1.generator_host, g1.host_mul(g1.generator_host, 5), None]
    )
    Q = g2.from_host(
        [g2.host_mul(g2.generator_host, 9), g2.generator_host,
         g2.generator_host]
    )
    f_ref = ctx.miller_loop(P, Q)
    f_new = ctx.miller_loop_prepared(P, ctx.prepare_g2(Q))
    for u, v in zip(
        jax.tree_util.tree_leaves(f_ref), jax.tree_util.tree_leaves(f_new)
    ):
        assert np.array_equal(np.asarray(u), np.asarray(v))


def test_bw6_761_prepared_miller_loop_matches():
    from algebra_tpu.curves.instances import bw6_761 as inst

    _check_prepared_matches(inst, 2001)


def test_mnt4_753_prepared_miller_loop_matches():
    from algebra_tpu.curves.instances import mnt4_753 as inst

    _check_prepared_matches(inst, 2002)


def test_mnt6_toy_prepared_miller_loop_matches():
    from algebra_tpu.curves.instances import mnt6_toy as inst

    _check_prepared_matches(inst, 2003)
