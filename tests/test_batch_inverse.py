"""Blocked batched inversion (ops/mont_pallas.batch_inverse) — the
amortized-Montgomery-trick kernel behind the MSM affine bucket phase and
large-batch PrimeField.inverse.  Runs the actual Pallas kernels in
interpret mode on CPU and checks bit-exactness against the Fermat
ladder (inverses are unique, so any correct method must agree)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from algebra_tpu import config
from algebra_tpu.bigint import batch_int_to_limbs
from algebra_tpu.curves.instances.bls12_381 import fq_spec
from algebra_tpu.ops import mont, mont_pallas


def test_blocked_batch_inverse_interpret():
    rng = np.random.default_rng(11)
    n = 260  # non-multiple of 128: exercises padding; two kernel levels
    vals = [int.from_bytes(rng.bytes(47), "little") % fq_spec.modulus
            for _ in range(n)]
    vals[17] = 0  # zero lane maps to zero
    a = jnp.asarray(batch_int_to_limbs(vals, fq_spec.n_limbs))
    config.pallas_interpret = True
    try:
        got = jax.jit(lambda x: mont_pallas.batch_inverse(fq_spec, x))(a)
    finally:
        config.pallas_interpret = False
    ref = mont.inv(fq_spec, a)
    assert (np.asarray(got) == np.asarray(ref)).all()
    assert (np.asarray(got[:, 17]) == 0).all()


def test_pad_bucket_shape_buckets():
    """Widths collapse to {2^k, 0.75*2^k} multiples of the block."""
    for n, block, want in [
        (1, 128, 128),
        (129, 128, 256),  # 0.75*256 = 192 is not a block multiple
        (200, 128, 256),
        (4097, 1024, 6144),
        (6145, 1024, 8192),
        (1 << 20, 1024, 1 << 20),
        ((1 << 20) + 1, 1024, 3 << 19),
    ]:
        got = mont_pallas.pad_bucket(n, block)
        assert got == want, (n, block, got, want)
        assert got >= n and got % block == 0
