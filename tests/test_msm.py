"""MSM tests vs naive host oracle (mirrors test-templates/src/msm.rs:17-55
``test_var_base_msm``: MSM == sum of scalar muls)."""

import random

import jax
import jax.numpy as jnp
import pytest

from algebra_tpu.bigint import batch_int_to_limbs
from algebra_tpu.curves.instances import bls12_381, secp256k1
from algebra_tpu.ops import msm as msm_mod


@pytest.fixture(scope="module")
def rng():
    return random.Random(555)


def naive_msm(curve, pts, scalars):
    acc = None
    for p, k in zip(pts, scalars):
        acc = curve.host_add(acc, curve.host_mul(p, k))
    return acc


@pytest.mark.parametrize("n,c", [(8, 4), (33, 5)])
def test_msm_secp256k1(rng, n, c):
    curve = secp256k1.g1()
    pts = curve.random_host(rng, n)
    scalars = [rng.randrange(curve.scalar_modulus) for _ in range(n)]
    scalars[0] = 0  # edge: zero scalar
    bases = curve.from_host(pts)
    sc = jnp.asarray(batch_int_to_limbs(scalars, 16))
    got = curve.to_host(jax.jit(lambda b, s: msm_mod.msm(curve, b, s, c=c))(bases, sc))
    assert got == naive_msm(curve, pts, scalars)


def test_msm_with_infinity_base(rng):
    curve = secp256k1.g1()
    pts = curve.random_host(rng, 7) + [None]
    scalars = [rng.randrange(curve.scalar_modulus) for _ in range(8)]
    bases = curve.from_host(pts)
    sc = jnp.asarray(batch_int_to_limbs(scalars, 16))
    got = curve.to_host(jax.jit(lambda b, s: msm_mod.msm(curve, b, s, c=4))(bases, sc))
    assert got == naive_msm(curve, pts[:7], scalars[:7])


def test_msm_bls12_381_g1(rng):
    curve = bls12_381.g1()
    n = 16
    pts = curve.random_host(rng, n)
    scalars = [rng.randrange(curve.scalar_modulus) for _ in range(n)]
    bases = curve.from_host(pts)
    sc = jnp.asarray(batch_int_to_limbs(scalars, 16))
    got = curve.to_host(jax.jit(lambda b, s: msm_mod.msm(curve, b, s, c=4))(bases, sc))
    assert got == naive_msm(curve, pts, scalars)


def test_signed_digits_reconstruct(rng):
    """digits recombine to the scalar: sum d_i * 2^(c*i)."""
    import numpy as np

    c = 7
    scalars = [rng.randrange(1 << 256) for _ in range(20)]
    arr = jnp.asarray(batch_int_to_limbs(scalars, 16))
    nw = 256 // c + 1
    digits = np.asarray(msm_mod.signed_digits(arr, c, nw))
    for j, k in enumerate(scalars):
        recon = sum(int(digits[w, j]) << (c * w) for w in range(nw))
        assert recon == k, f"scalar {j}"


def test_msm_affine_tree_path(rng):
    """The sorted-segment affine pairwise tree (the TPU-default bucket
    phase, ops/msm.py _affine_tree_buckets) against the host oracle,
    covering its exceptional cases: duplicate points (tangent adds
    inside a bucket), an infinity base, zero and repeated scalars.
    Forced on explicitly — the CPU default is the lockstep path."""
    from algebra_tpu import config

    curve = secp256k1.g1()
    n = 96
    pts = curve.random_host(rng, 24) * 4  # duplicates -> bucket doublings
    pts[5] = None
    scalars = [rng.randrange(1 << 64) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = scalars[2]
    bases = curve.from_host(pts)
    sc = jnp.asarray(batch_int_to_limbs(scalars, 4))
    config.msm_affine_tree = True
    try:
        got = curve.to_host(
            jax.jit(
                lambda b, s: msm_mod.msm(curve, b, s, c=8, scalar_bits=64)
            )(bases, sc)
        )
    finally:
        config.msm_affine_tree = None
    assert got == naive_msm(curve, [p for p in pts if p is not None],
                            [k for p, k in zip(pts, scalars) if p is not None])


def test_msm_single_hot_bucket(rng):
    """All-equal scalars put every point into ONE bucket per window —
    the maximal Poisson-tail case for the capped lockstep + compacted
    drain loop (ops/msm.py _drain_bucket_tail)."""
    import jax.numpy as jnp

    from algebra_tpu.bigint import batch_int_to_limbs
    from algebra_tpu.curves.instances import bls12_381
    from algebra_tpu.ops.msm import msm

    curve = bls12_381.g1()
    n = 256
    base_pts = curve.random_host(rng, 16)
    pts = [base_pts[i % 16] for i in range(n)]
    aff16 = curve.from_host(base_pts)
    reps = n // 16
    aff = (
        jnp.tile(aff16[0], (1, reps)),
        jnp.tile(aff16[1], (1, reps)),
        jnp.tile(aff16[2], reps),
    )
    k = rng.randrange(1, curve.scalar_modulus)
    Ls = -(-curve.scalar_modulus.bit_length() // 16)
    sc = jnp.asarray(batch_int_to_limbs([k] * n, Ls))
    out = curve.to_host(msm(curve, aff, sc))
    want = None
    for pt in pts:
        want = curve.host_add(want, pt)
    want = curve.host_mul(want, k)
    assert out == want
