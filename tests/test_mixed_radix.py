"""Mixed-radix evaluation domain tests (poly/src/domain/mixed_radix.rs
behavior) on a small field with a radix-5 subgroup, vs a naive DFT
oracle, plus GeneralEvaluationDomain dispatch."""

import random

import pytest

from algebra_tpu.fields.prime import prime_field
from algebra_tpu.fields.spec import field_spec
from algebra_tpu.poly.domain import GeneralEvaluationDomain
from algebra_tpu.poly.mixed_radix import (
    MixedRadixEvaluationDomain,
    best_mixed_radix_size,
)

# p - 1 = 2^2 * 5^2 * ... : pick p = 101 (p-1 = 100 = 2^2 * 5^2), gen 2
P101 = 101
F = prime_field(
    field_spec(P101, generator=2, small_subgroup_base=5, name="F101")
)


@pytest.fixture(scope="module")
def rng():
    return random.Random(1212)


def naive_dft(coeffs, domain):
    out = []
    for i in range(domain.size):
        w = domain.element(i)
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * w + c) % P101
        out.append(acc)
    return out


@pytest.mark.parametrize("size", [5, 10, 20, 25, 100])
def test_mixed_radix_fft_matches_naive(size, rng):
    domain = MixedRadixEvaluationDomain(F, size)
    coeffs = [rng.randrange(P101) for _ in range(size)]
    got = F.to_int(domain.fft(F.from_int(coeffs)))
    assert got == naive_dft(coeffs, domain)


@pytest.mark.parametrize("size", [10, 25])
def test_mixed_radix_ifft_roundtrip(size, rng):
    domain = MixedRadixEvaluationDomain(F, size)
    coeffs = [rng.randrange(P101) for _ in range(size)]
    evals = domain.fft(F.from_int(coeffs))
    back = F.to_int(domain.ifft(evals))
    assert back == coeffs


def test_best_size_selection():
    spec = F.spec
    assert best_mixed_radix_size(spec, 3) == 4
    assert best_mixed_radix_size(spec, 7) == 10
    assert best_mixed_radix_size(spec, 11) == 20
    assert best_mixed_radix_size(spec, 21) == 25


def test_general_domain_dispatch():
    # size 8 works as radix-2 (two-adicity 2 -> max 4... 8 > 4): for F101
    # two-adicity is 2, so num_coeffs=8 must go mixed-radix (10 or 20)
    d = GeneralEvaluationDomain(F, 8)
    assert isinstance(d, MixedRadixEvaluationDomain)
    assert d.size >= 8
    d2 = GeneralEvaluationDomain(F, 4)
    assert d2.size == 4
