"""Fixed-base MSM, wNAF, and GLV tests vs host oracles
(mirrors ec/src/scalar_mul tests: fixed_base.rs, wnaf.rs, glv.rs)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from algebra_tpu.bigint import batch_int_to_limbs
from algebra_tpu.curves.instances import secp256k1
from algebra_tpu.ops import fixed_base, glv, wnaf


@pytest.fixture(scope="module")
def rng():
    return random.Random(4242)


def test_fixed_base_msm_small_scalars(rng):
    curve = secp256k1.g1()
    base_host = curve.random_host(rng, 1)[0]
    base = curve.from_affine(curve.from_host([base_host]))
    base = curve.index_point(base, 0)  # batch ()
    # 32-bit scalars (2 limbs) keep the table tiny
    ks = [rng.randrange(1 << 32) for _ in range(5)]
    sc = jnp.asarray(batch_int_to_limbs(ks, 2))
    c = 4

    @jax.jit
    def run(sc):
        table = fixed_base.window_table(curve, base, c, 32)
        return fixed_base.msm(curve, table, sc, c)

    got = curve.to_host(run(sc))
    want = [curve.host_mul(base_host, k) for k in ks]
    assert got == want


def test_wnaf_digits_reconstruct(rng):
    for w in (2, 3, 5):
        for _ in range(10):
            k = rng.randrange(1 << 64)
            d = wnaf.wnaf_digits(k, w)
            assert sum(di << i for i, di in enumerate(d)) == k
            assert all(di == 0 or (di % 2 == 1 or di % 2 == -1) for di in d)
            assert all(abs(di) < (1 << (w - 1)) for di in d)


def test_wnaf_mul(rng):
    curve = secp256k1.g1()
    p_host = curve.random_host(rng, 1)[0]
    P = curve.index_point(curve.from_affine(curve.from_host([p_host])), 0)
    ctx = wnaf.WnafContext(curve, 3)
    k = rng.randrange(1 << 48)  # short scalar keeps the scan short

    got = curve.to_host(jax.jit(lambda: ctx.mul(P, k))())
    assert got == curve.host_mul(p_host, k)


def test_glv_decompose(rng):
    c = secp256k1.g1()
    r = c.scalar_modulus
    for _ in range(20):
        k = rng.randrange(r)
        k1, k2 = glv.decompose(c.glv, r, k)
        assert (k1 + k2 * c.glv["lam"]) % r == k
        assert abs(k1) < 1 << 130 and abs(k2) < 1 << 130


def test_glv_endomorphism_is_lambda(rng):
    c = secp256k1.g1()
    p_host = c.random_host(rng, 1)[0]
    P = c.index_point(c.from_affine(c.from_host([p_host])), 0)
    phi = glv.endomorphism(c, P)
    assert c.to_host(phi) == c.host_mul(p_host, c.glv["lam"])


def test_glv_mul(rng):
    c = secp256k1.g1()
    p_host = c.random_host(rng, 1)[0]
    P = c.index_point(c.from_affine(c.from_host([p_host])), 0)
    k = rng.randrange(c.scalar_modulus)
    got = c.to_host(jax.jit(lambda: glv.glv_mul_host(c, P, k))())
    assert got == c.host_mul(p_host, k)


def test_glv_decompose_traced(rng):
    """Device Babai rounding agrees with the host contract:
    k == k1 + k2*lam (mod r) and both parts are short."""
    c = secp256k1.g1()
    r = c.scalar_modulus
    n = 16
    ks = [rng.randrange(r) for _ in range(n)]
    ks[0] = 0
    ks[1] = r - 1
    sc = jnp.asarray(batch_int_to_limbs(ks, c.scalar_modulus.bit_length()
                                        // 16 + 1))
    neg1, mag1, neg2, mag2 = jax.jit(
        lambda s: glv.decompose_traced(c.glv, r, s))(sc)
    neg1, mag1 = np.asarray(neg1), np.asarray(mag1)
    neg2, mag2 = np.asarray(neg2), np.asarray(mag2)

    def to_int(mag, j):
        return sum(int(mag[i, j]) << (16 * i) for i in range(mag.shape[0]))

    for j, k in enumerate(ks):
        k1 = (-1 if neg1[j] else 1) * to_int(mag1, j)
        k2 = (-1 if neg2[j] else 1) * to_int(mag2, j)
        assert (k1 + k2 * c.glv["lam"]) % r == k, j
        assert abs(k1) < 1 << 131 and abs(k2) < 1 << 131, j


def test_glv_mul_traced(rng):
    c = secp256k1.g1()
    r = c.scalar_modulus
    n = 4
    pts = c.random_host(rng, n)
    P = c.from_affine(c.from_host(pts))
    ks = [rng.randrange(r) for _ in range(n)]
    ks[0] = 0
    sc = jnp.asarray(batch_int_to_limbs(ks, r.bit_length() // 16 + 1))
    got = c.to_host(jax.jit(lambda p, s: glv.glv_mul(c, p, s))(P, sc))
    want = [c.host_mul(p, k) for p, k in zip(pts, ks)]
    assert got == want
