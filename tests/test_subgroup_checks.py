"""Subgroup-membership validation (Validate::Yes parity + fast checks).

Mirrors the semantics of short_weierstrass/affine.rs:363-369 (deserialize
with Validate::Yes requires on-curve AND in-subgroup) and the fast
endomorphism checks: G1 sigma check (eprint 2021/1130 §6, beyond the
reference which defaults to mul-by-r for G1) and G2 psi check
(test-curves/src/bls12_381/g2.rs:61-74).
"""

import random

import pytest

import algebra_tpu.serialize as ser
from algebra_tpu.curves.instances import bls12_381
from algebra_tpu.hostmath import sqrt_prime


@pytest.fixture(scope="module")
def g1():
    return bls12_381.g1()


@pytest.fixture(scope="module")
def g2():
    return bls12_381.g2()


def _g1_out_of_subgroup(g1):
    """Deterministic on-curve point outside the r-subgroup."""
    x = 2
    while True:
        y = sqrt_prime((x * x * x + 4) % bls12_381.P, bls12_381.P)
        if y is not None:
            pt = (x, y)
            if not (g1.host_mul_raw(pt, bls12_381.R) is None):
                return pt
        x += 1


def _g2_out_of_subgroup(g2):
    hf2 = bls12_381.host_fq2
    from algebra_tpu.hostmath import host_sqrt

    k = 2
    while True:
        x = (k, 0)
        rhs = hf2.add(hf2.mul(hf2.mul(x, x), x), (4, 4))
        y = host_sqrt(hf2, rhs)
        if y is not None:
            pt = (x, y)
            if not (g2.host_mul_raw(pt, bls12_381.R) is None):
                return pt
        k += 1


def test_g1_fast_check_matches_slow(g1, rng):
    for _ in range(3):
        pt = g1.host_mul(g1.generator_host, rng.randrange(1, bls12_381.R))
        assert g1.subgroup_check_host(g1, pt)
        assert g1.host_is_in_correct_subgroup(pt)
    bad = _g1_out_of_subgroup(g1)
    assert not g1.subgroup_check_host(g1, bad)
    assert not g1.host_is_in_correct_subgroup(bad)
    assert g1.host_is_in_correct_subgroup(None)


def test_g2_fast_check_matches_slow(g2, rng):
    pt = g2.host_mul(g2.generator_host, rng.randrange(1, bls12_381.R))
    assert g2.subgroup_check_host(g2, pt)
    bad = _g2_out_of_subgroup(g2)
    assert not g2.subgroup_check_host(g2, bad)


def test_deserialize_rejects_out_of_subgroup(g1):
    """An on-curve, out-of-subgroup point round-trips with validate=False
    but is rejected with validate=True (Validate::Yes parity)."""
    codec = ser.SWPointCodec(g1)
    bad = _g1_out_of_subgroup(g1)
    raw = codec.serialize(bad, compress=True)
    assert codec.deserialize(raw, validate=False) == bad
    with pytest.raises(ser.SerializationError, match="subgroup"):
        codec.deserialize(raw, validate=True)
    # in-subgroup points still validate
    good = codec.serialize(g1.generator_host, compress=True)
    assert codec.deserialize(good, validate=True) == g1.generator_host


def test_g2_deserialize_rejects_out_of_subgroup(g2):
    codec = ser.SWPointCodec(g2)
    bad = _g2_out_of_subgroup(g2)
    raw = codec.serialize(bad, compress=False)
    assert codec.deserialize(raw, compress=False, validate=False) == bad
    with pytest.raises(ser.SerializationError, match="subgroup"):
        codec.deserialize(raw, compress=False, validate=True)


def test_device_fast_checks(g1, g2, rng):
    """Batched device-side subgroup checks (the TPU analog of the
    reference's rayon batch_check, serialize/src/lib.rs:50-63)."""
    import jax

    pts = [
        g1.host_mul(g1.generator_host, rng.randrange(1, bls12_381.R)),
        _g1_out_of_subgroup(g1),
        None,
    ]
    batch = g1.from_affine(g1.from_host(pts))
    got = jax.device_get(g1.is_in_correct_subgroup(batch))
    assert list(got) == [True, False, True]

    qts = [g2.generator_host, _g2_out_of_subgroup(g2)]
    qbatch = g2.from_affine(g2.from_host(qts))
    got2 = jax.device_get(g2.is_in_correct_subgroup(qbatch))
    assert list(got2) == [True, False]
