"""Radix-2 domain tests vs a host-side naive DFT oracle.

Mirrors the reference's FFT test block (poly/src/test.rs and the FFT
consistency checks in test-templates/src/fields.rs): ifft∘fft == id,
fft == naive evaluation, coset consistency, Lagrange coefficients vs
naive, vanishing polynomial.
"""

import numpy as np
import pytest

from algebra_tpu.fields.prime import prime_field
from algebra_tpu.fields.spec import field_spec
from algebra_tpu.poly.domain import GeneralEvaluationDomain, Radix2EvaluationDomain

BLS12_381_FR = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
FR = prime_field(field_spec(BLS12_381_FR, generator=7, name="Fr"))
P = FR.spec.modulus


def naive_evals(coeffs, domain):
    """Oracle: evaluate at every domain element with host ints."""
    out = []
    for i in range(domain.size):
        x = domain.element(i)
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % P
        out.append(acc)
    return out


@pytest.mark.parametrize("log_n", [0, 1, 3, 5])
@pytest.mark.parametrize("coset", [False, True])
def test_fft_matches_naive(log_n, coset, rng):
    n = 1 << log_n
    offset = 5 if coset else 1
    domain = Radix2EvaluationDomain(FR, n, offset=offset)
    coeffs = [rng.randrange(P) for _ in range(n)]
    got = FR.to_int(domain.fft(FR.from_int(coeffs)))
    if n == 1:
        got = [got] if isinstance(got, int) else got
    assert got == naive_evals(coeffs, domain)


@pytest.mark.parametrize("log_n", [4, 8])
@pytest.mark.parametrize("coset", [False, True])
def test_ifft_fft_roundtrip(log_n, coset, rng):
    n = 1 << log_n
    domain = Radix2EvaluationDomain(FR, n, offset=7 if coset else 1)
    coeffs = FR.from_int([rng.randrange(P) for _ in range(n)])
    back = domain.ifft(domain.fft(coeffs))
    assert np.array_equal(np.asarray(back), np.asarray(coeffs))
    # and the other direction
    evals = FR.from_int([rng.randrange(P) for _ in range(n)])
    back2 = domain.fft(domain.ifft(evals))
    assert np.array_equal(np.asarray(back2), np.asarray(evals))


def test_fft_pads_short_input(rng):
    n = 16
    domain = Radix2EvaluationDomain(FR, n)
    coeffs = [rng.randrange(P) for _ in range(5)]
    got = FR.to_int(domain.fft(FR.from_int(coeffs)))
    assert got == naive_evals(coeffs + [0] * (n - 5), domain)


@pytest.mark.parametrize("coset", [False, True])
@pytest.mark.parametrize("n_coeffs", [1, 3, 16])
def test_degree_aware_fft(n_coeffs, coset, rng):
    """Short inputs take the O(n log d) degree-aware path
    (radix2/fft.rs:22-67) and must agree with the naive oracle."""
    n = 64
    domain = Radix2EvaluationDomain(FR, n, offset=5 if coset else 1)
    coeffs = [rng.randrange(P) for _ in range(n_coeffs)]
    got = FR.to_int(domain.fft(FR.from_int(coeffs)))
    assert got == naive_evals(coeffs + [0] * (n - n_coeffs), domain)


def test_batched_fft(rng):
    n = 8
    domain = Radix2EvaluationDomain(FR, n)
    batch = [[rng.randrange(P) for _ in range(n)] for _ in range(3)]
    got = FR.to_int(domain.fft(FR.from_int(batch)))
    for row, coeffs in zip(got, batch):
        assert row == naive_evals(coeffs, domain)


def test_lagrange_coefficients(rng):
    n = 16
    domain = Radix2EvaluationDomain(FR, n, offset=3)
    tau_int = rng.randrange(P)
    tau = FR.from_int(tau_int)
    li = FR.to_int(domain.evaluate_all_lagrange_coefficients(tau))
    # oracle: interpolate each basis poly via evaluations
    coeffs = [rng.randrange(P) for _ in range(n)]
    evals = naive_evals(coeffs, domain)
    # sum_i L_i(tau) * p(x_i) == p(tau)
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * tau_int + c) % P
    assert sum(l * e for l, e in zip(li, evals)) % P == acc


def test_lagrange_at_domain_point():
    n = 8
    domain = Radix2EvaluationDomain(FR, n)
    tau = FR.from_int(domain.element(3))
    li = FR.to_int(domain.evaluate_all_lagrange_coefficients(tau))
    assert li == [0, 0, 0, 1, 0, 0, 0, 0]


def test_vanishing_polynomial(rng):
    n = 32
    domain = Radix2EvaluationDomain(FR, n, offset=11)
    # zero on the domain
    elems = FR.from_int([domain.element(i) for i in range(4)])
    z = domain.evaluate_vanishing_polynomial(elems)
    assert bool(np.all(np.asarray(FR.is_zero(z))))
    # matches x^n - h^n off the domain
    x = rng.randrange(P)
    got = FR.to_int(domain.evaluate_vanishing_polynomial(FR.from_int(x)))
    assert got == (pow(x, n, P) - pow(11, n, P)) % P


def test_general_domain_dispatch():
    d = GeneralEvaluationDomain(FR, 100)
    assert d.size == 128
    assert isinstance(d, Radix2EvaluationDomain)


def test_reindex_by_subdomain():
    big = Radix2EvaluationDomain(FR, 16)
    # subgroup of size 4 sits at indices 0,4,8,12
    assert [big.reindex_by_subdomain(4, i) for i in range(4)] == [0, 4, 8, 12]
    mapped = sorted(big.reindex_by_subdomain(4, i) for i in range(16))
    assert mapped == list(range(16))
