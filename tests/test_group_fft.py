"""Group-coefficient FFT test (the reference's DomainCoeff over curve
points): group_fft of point coefficients == points built from the scalar
FFT of the underlying scalars, since sum w^(ij) (k_j G) = (sum w^(ij) k_j) G."""

import random

import jax
import jax.numpy as jnp
import pytest

from algebra_tpu.bigint import batch_int_to_limbs
from algebra_tpu.curves.instances import secp256k1
from algebra_tpu.fields.prime import prime_field
from algebra_tpu.poly.domain import Radix2EvaluationDomain
from algebra_tpu.poly.group_domain import group_fft


def test_group_fft_matches_scalar_fft():
    rng = random.Random(99)
    curve = secp256k1.g1()
    Fr = prime_field(secp256k1.fr_spec)
    n = 4
    domain = Radix2EvaluationDomain(Fr, n)
    r = curve.scalar_modulus

    ks = [rng.randrange(1 << 32) for _ in range(n)]
    # point coefficients P_j = k_j * G
    pts = [curve.host_mul(curve.generator_host, k) for k in ks]
    P = curve.from_affine(curve.from_host(pts))

    got = curve.to_host(jax.jit(lambda pp: group_fft(curve, domain, pp))(P))

    # oracle: scalar FFT of the k_j over Fr, then multiply G
    evals = []
    for i in range(n):
        acc = 0
        w = domain.element(i)
        for j, k in enumerate(ks):
            acc = (acc + k * pow(w, j, Fr.spec.modulus)) % r
        evals.append(curve.host_mul(curve.generator_host, acc))
    assert got == evals
