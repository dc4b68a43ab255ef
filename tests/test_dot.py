"""Direct unit tests for the bilinear-form compiler (fields/dot.py +
ops/mont.dot_stacked) — the kernel substrate under every tower
multiplication, fused pairing step, and fused curve group law.

Oracle: python big-int arithmetic.  dot_stacked computes
    out[o] = sum_k W[o, k] * A[k] * B[k] * R^-1 mod p
(one shared Montgomery reduction per output row).
"""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from algebra_tpu.bigint import batch_int_to_limbs, limbs_to_int
from algebra_tpu.curves.instances import bls12_381, mnt4_753
from algebra_tpu.fields import dot as dot_mod
from algebra_tpu.ops import mont


@pytest.fixture(scope="module")
def rng():
    return random.Random(777)


SPECS = [
    pytest.param(lambda: bls12_381.fr_spec, id="fr_16limbs"),
    pytest.param(lambda: bls12_381.fq_spec, id="fq_24limbs"),
    pytest.param(lambda: mnt4_753.fq_spec, id="mnt4fq_48limbs"),
]


@pytest.mark.parametrize("spec_fn", SPECS)
def test_dot_stacked_random_weights(spec_fn, rng):
    spec = spec_fn()
    p = spec.modulus
    L = spec.n_limbs
    K, n_out, batch = 6, 4, 3
    W = np.asarray(
        [[rng.randrange(-20, 21) for _ in range(K)] for _ in range(n_out)],
        np.int64,
    )
    a_int = [[rng.randrange(p) for _ in range(batch)] for _ in range(K)]
    b_int = [[rng.randrange(p) for _ in range(batch)] for _ in range(K)]
    A = jnp.stack(
        [jnp.asarray(batch_int_to_limbs(row, L)) for row in a_int], axis=1
    )  # [L, K, batch]
    B = jnp.stack(
        [jnp.asarray(batch_int_to_limbs(row, L)) for row in b_int], axis=1
    )
    out = jax.jit(lambda A, B: mont.dot_stacked(spec, A, B, W))(A, B)
    rinv = pow(spec.R, -1, p)
    for o in range(n_out):
        for j in range(batch):
            want = (
                sum(int(W[o, k]) * a_int[k][j] * b_int[k][j] for k in range(K))
                * rinv
            ) % p
            got = limbs_to_int(np.asarray(out)[:, o, j])
            assert got == want, (o, j)


@pytest.mark.parametrize("spec_fn", SPECS)
def test_dot_stacked_mass_limit_edge(spec_fn, rng):
    """Weights summing exactly to dot_mass_limit with near-modulus
    operands must not overflow the column accumulators."""
    spec = spec_fn()
    p = spec.modulus
    L = spec.n_limbs
    lim = mont.dot_mass_limit(spec)
    K = 4
    w = [lim // K] * K
    w[0] += lim - sum(w)
    W = np.asarray([[x * (1 if i % 2 else -1) for i, x in enumerate(w)]],
                   np.int64)
    a_int = [p - 1 - rng.randrange(2) for _ in range(K)]
    b_int = [p - 1 - rng.randrange(2) for _ in range(K)]
    A = jnp.asarray(batch_int_to_limbs(a_int, L))[:, :, None]
    B = jnp.asarray(batch_int_to_limbs(b_int, L))[:, :, None]
    out = mont.dot_stacked(spec, A, B, W)
    rinv = pow(spec.R, -1, p)
    want = (sum(int(W[0, k]) * a_int[k] * b_int[k] for k in range(K)) * rinv) % p
    assert limbs_to_int(np.asarray(out)[:, 0, 0]) == want

    over = np.asarray([[lim + 1]], np.int64)
    with pytest.raises(ValueError):
        mont.dot_stacked(spec, A[:, :1], B[:, :1], over)


def test_dot_multi_tower_vs_host(rng):
    """dot_multi over Fq2 == host tower arithmetic, incl. negative
    weights and multiple groups sharing one kernel."""
    F2 = bls12_381.fq2()
    host = bls12_381.host_fq2
    p = bls12_381.P

    def rand2():
        return (rng.randrange(p), rng.randrange(p))

    a, b, c, d = rand2(), rand2(), rand2(), rand2()
    av, bv, cv, dv = (F2.constant(v) for v in (a, b, c, d))
    groups = [
        [(1, av, bv)],                    # a*b
        [(2, av, av), (-3, cv, dv)],      # 2a^2 - 3cd
        [(1, bv, bv), (1, cv, cv), (1, dv, dv)],
    ]
    outs = dot_mod.dot_multi(F2, groups)
    assert outs is not None
    want = [
        host.mul(a, b),
        host.sub(host.mul(host.from_base_prime(2), host.mul(a, a)),
                 host.mul(host.from_base_prime(3), host.mul(c, d))),
        host.add(host.add(host.mul(b, b), host.mul(c, c)), host.mul(d, d)),
    ]
    for got_dev, w in zip(outs, want):
        got = F2.to_int(got_dev)
        assert got == w


def test_dot_multi_masks(rng):
    """Structural-zero masks skip coordinates without changing results
    when the masked coordinates really are zero."""
    F2 = bls12_381.fq2()
    host = bls12_381.host_fq2
    p = bls12_381.P
    a = (rng.randrange(p), 0)  # c1 == 0
    b = (rng.randrange(p), rng.randrange(p))
    av, bv = F2.constant(a), F2.constant(b)
    m0 = (True, False)
    (masked,) = dot_mod.dot_multi(F2, [[(1, av, bv, m0, None)]])
    (full,) = dot_mod.dot_multi(F2, [[(1, av, bv)]])
    assert F2.to_int(masked) == F2.to_int(full) == host.mul(a, b)


def test_mul_tensor_cached_and_fallback():
    """Prime fields have the trivial tensor; a kind with a huge
    non-small nonresidue falls back (returns None)."""
    Fq = bls12_381.g1().base
    assert dot_mod.mul_tensor(Fq) == {(0, 0, 0): 1}

    from algebra_tpu.fields.quadratic import QuadExtField

    big_nr = bls12_381.P - (1 << 40)  # not small, not -small
    weird = QuadExtField(Fq, big_nr, [1, 1], name="weird")
    assert dot_mod.mul_tensor(weird) is None
    assert dot_mod.dot(weird, [(1, weird.one(()), weird.one(()))]) is None


def test_sum_of_products_vs_fold(rng):
    spec = bls12_381.fr_spec
    p = spec.modulus
    L = spec.n_limbs
    k = 5
    a_int = [rng.randrange(p) for _ in range(k)]
    b_int = [rng.randrange(p) for _ in range(k)]
    a_list = [jnp.asarray(batch_int_to_limbs([v], L))[:, 0] for v in a_int]
    b_list = [jnp.asarray(batch_int_to_limbs([v], L))[:, 0] for v in b_int]
    out = mont.sum_of_products(spec, a_list, b_list)
    rinv = pow(spec.R, -1, p)
    want = sum(x * y for x, y in zip(a_int, b_int)) * rinv % p
    assert limbs_to_int(np.asarray(out)) == want
