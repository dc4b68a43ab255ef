"""Polynomial-layer tests vs host big-int oracles.

Mirrors the reference's polynomial arithmetic tests
(poly/src/polynomial/univariate/dense.rs:616-830, sparse.rs tests,
multilinear dense/sparse tests): add/mul/divide round trips, evaluation
consistency, MLE fix_variables.  Uses a small 64-bit field (Fp64-style,
like the reference's Fp128 test field but smaller) to keep device
programs tiny on the CPU test backend.
"""

import random

import numpy as np
import pytest

from algebra_tpu.fields.prime import prime_field
from algebra_tpu.fields.spec import field_spec
from algebra_tpu.poly.dense import DensePolynomial
from algebra_tpu.poly.domain import Radix2EvaluationDomain
from algebra_tpu.poly.evaluations import Evaluations
from algebra_tpu.poly.multilinear import (
    DenseMultilinearExtension,
    SparseMultilinearExtension,
)
from algebra_tpu.poly.multivariate import SparseMultivariatePolynomial
from algebra_tpu.poly.sparse import SparsePolynomial

# 64-bit FFT-friendly prime: 2^64 - 2^32 + 1 (Goldilocks), generator 7
P64 = 2**64 - 2**32 + 1
F = prime_field(field_spec(P64, generator=7, name="goldilocks"))


@pytest.fixture(scope="module")
def rng():
    return random.Random(777)


def host_poly_mul(a, b, p):
    out = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            out[i + j] = (out[i + j] + x * y) % p
    return out


def host_poly_eval(coeffs, x, p):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % p
    return acc


def test_dense_add_sub(rng):
    a = [rng.randrange(P64) for _ in range(5)]
    b = [rng.randrange(P64) for _ in range(9)]
    pa = DensePolynomial.from_ints(F, a)
    pb = DensePolynomial.from_ints(F, b)
    want = [(x + y) % P64 for x, y in zip(a + [0] * 4, b)]
    assert pa.add(pb).to_ints() == want
    want_sub = [(x - y) % P64 for x, y in zip(a + [0] * 4, b)]
    assert pa.sub(pb).to_ints() == want_sub


def test_dense_naive_mul(rng):
    a = [rng.randrange(P64) for _ in range(4)]
    b = [rng.randrange(P64) for _ in range(6)]
    pa, pb = DensePolynomial.from_ints(F, a), DensePolynomial.from_ints(F, b)
    assert pa.naive_mul(pb).to_ints() == host_poly_mul(a, b, P64)


def test_dense_fft_mul(rng):
    a = [rng.randrange(P64) for _ in range(9)]
    b = [rng.randrange(P64) for _ in range(8)]
    pa, pb = DensePolynomial.from_ints(F, a), DensePolynomial.from_ints(F, b)
    got = pa.mul(pb).truncated()
    want = host_poly_mul(a, b, P64)
    while len(want) > 1 and want[-1] == 0:
        want.pop()
    assert got == want


def test_dense_evaluate(rng):
    coeffs = [rng.randrange(P64) for _ in range(7)]
    poly = DensePolynomial.from_ints(F, coeffs)
    xs = [rng.randrange(P64) for _ in range(5)]
    got = F.to_int(poly.evaluate(F.from_int(np.asarray(xs, dtype=object))))
    assert got == [host_poly_eval(coeffs, x, P64) for x in xs]


def test_dense_long_division(rng):
    a = [rng.randrange(P64) for _ in range(10)]
    b = [rng.randrange(P64) for _ in range(4)]
    b[-1] = b[-1] or 1
    pa, pb = DensePolynomial.from_ints(F, a), DensePolynomial.from_ints(F, b)
    q, r = pa.divide_with_q_and_r(pb)
    # check a == q*b + r
    recon = q.naive_mul(pb).add(r)
    n = len(a)
    got = recon.to_ints()[:n]
    assert got == a
    assert all(c == 0 for c in recon.to_ints()[n:])


def test_divide_by_vanishing_poly(rng):
    domain = Radix2EvaluationDomain(F, 8, offset=3)
    a = [rng.randrange(P64) for _ in range(21)]
    pa = DensePolynomial.from_ints(F, a)
    q, r = pa.divide_by_vanishing_poly(domain)
    # verify: a == q * (x^8 - 3^8) + r
    zh = [(-pow(3, 8, P64)) % P64] + [0] * 7 + [1]
    recon = host_poly_mul(q.to_ints(), zh, P64)
    recon += [0] * (len(a) - len(recon))
    for i, c in enumerate(r.to_ints()):
        recon[i] = (recon[i] + c) % P64
    assert recon[: len(a)] == a


def test_mul_by_vanishing_poly(rng):
    domain = Radix2EvaluationDomain(F, 4, offset=5)
    a = [rng.randrange(P64) for _ in range(6)]
    pa = DensePolynomial.from_ints(F, a)
    got = pa.mul_by_vanishing_poly(domain).to_ints()
    zh = [(-pow(5, 4, P64)) % P64] + [0] * 3 + [1]
    assert got == host_poly_mul(a, zh, P64)


def test_evaluations_interpolate(rng):
    domain = Radix2EvaluationDomain(F, 8)
    vals = [rng.randrange(P64) for _ in range(8)]
    ev = Evaluations.from_ints(F, domain, vals)
    poly = ev.interpolate()
    # evaluating the interpolant over the domain returns vals
    assert F.to_int(domain.fft(poly.coeffs)) == vals


def test_sparse_evaluate_and_mul(rng):
    pairs = [(0, rng.randrange(P64)), (3, rng.randrange(P64)), (10, rng.randrange(P64))]
    sp = SparsePolynomial.from_pairs(F, pairs)
    x = rng.randrange(P64)
    want = sum(c * pow(x, d, P64) for d, c in pairs) % P64
    got = F.to_int(sp.evaluate(F.from_int(x)))
    assert got == want
    sq = sp.mul(sp)
    want_sq = {}
    for d1, c1 in pairs:
        for d2, c2 in pairs:
            want_sq[d1 + d2] = (want_sq.get(d1 + d2, 0) + c1 * c2) % P64
    assert dict(sq.to_pairs()) == {d: c for d, c in want_sq.items() if c}


def test_sparse_to_dense(rng):
    pairs = [(1, 5), (4, 7)]
    sp = SparsePolynomial.from_pairs(F, pairs)
    assert sp.to_dense().to_ints() == [0, 5, 0, 0, 7]


def test_dense_mle_fix_and_evaluate(rng):
    nv = 4
    evals = [rng.randrange(P64) for _ in range(1 << nv)]
    mle = DenseMultilinearExtension.from_ints(F, nv, evals)
    point = [rng.randrange(P64) for _ in range(nv)]
    got = F.to_int(mle.evaluate([F.from_int(x) for x in point]))
    # host oracle: multilinear interpolation; index bit i = variable x_i
    want = 0
    for idx, v in enumerate(evals):
        w = 1
        for i in range(nv):
            xi = point[i]
            w = w * (xi if (idx >> i) & 1 else (1 - xi)) % P64
        want = (want + v * w) % P64
    assert got == want % P64


def test_dense_mle_relabel(rng):
    nv = 4
    evals = [rng.randrange(P64) for _ in range(1 << nv)]
    mle = DenseMultilinearExtension.from_ints(F, nv, evals)
    sw = mle.relabel(0, 2, 2)
    point = [rng.randrange(P64) for _ in range(nv)]
    swapped_point = [point[2], point[3], point[0], point[1]]
    v1 = F.to_int(mle.evaluate([F.from_int(x) for x in point]))
    v2 = F.to_int(sw.evaluate([F.from_int(x) for x in swapped_point]))
    assert v1 == v2


def test_sparse_mle_matches_dense(rng):
    nv = 5
    pairs = [(i, rng.randrange(P64)) for i in rng.sample(range(1 << nv), 6)]
    smle = SparseMultilinearExtension.from_pairs(F, nv, pairs)
    dense_evals = [0] * (1 << nv)
    for i, v in pairs:
        dense_evals[i] = v
    dmle = DenseMultilinearExtension.from_ints(F, nv, dense_evals)
    point = [F.from_int(rng.randrange(P64)) for _ in range(nv)]
    assert F.to_int(smle.evaluate(point)) == F.to_int(dmle.evaluate(point))


def test_multivariate_evaluate(rng):
    # f = 3 + 5*x0^2*x2 + 7*x1*x2^3
    poly = SparseMultivariatePolynomial.from_pairs(
        F, 3, [(3, []), (5, [(0, 2), (2, 1)]), (7, [(1, 1), (2, 3)])]
    )
    assert poly.total_degree() == 4
    pt = [rng.randrange(P64) for _ in range(3)]
    want = (
        3 + 5 * pt[0] ** 2 * pt[2] + 7 * pt[1] * pt[2] ** 3
    ) % P64
    got = F.to_int(poly.evaluate([F.from_int(x) for x in pt]))
    assert got == want


def test_multivariate_add(rng):
    a = SparseMultivariatePolynomial.from_pairs(F, 2, [(2, [(0, 1)]), (3, [(1, 2)])])
    b = SparseMultivariatePolynomial.from_pairs(F, 2, [(5, [(0, 1)]), (1, [])])
    s = a.add(b)
    pt = [rng.randrange(P64) for _ in range(2)]
    va = F.to_int(a.evaluate([F.from_int(x) for x in pt]))
    vb = F.to_int(b.evaluate([F.from_int(x) for x in pt]))
    vs = F.to_int(s.evaluate([F.from_int(x) for x in pt]))
    assert vs == (va + vb) % P64
