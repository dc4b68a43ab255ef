"""Pallas TPU kernels for Montgomery field arithmetic.

This is the TPU counterpart of the reference's x86_64 Montgomery assembly
(ff-asm/src/lib.rs:51, dispatched at montgomery_backend.rs:150-181): the
hot multiply loop compiled as ONE fused kernel instead of ~10^2 XLA ops.

Layout strategy: API arrays are [N, L] (limb-minor, like the rest of the
framework); inside the kernel each block is transposed once to limb-major
[L, NB] so that the element axis rides the 128-wide vector lanes at full
utilization (L is 16..48 — putting IT on lanes would waste 60-90% of the
VPU).  All limb loops are static unrolls over L; carries stay lazy in
32-bit accumulators exactly as in ops/mont.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.spec import FieldSpec

_MASK = jnp.uint32(0xFFFF)


def _mul_kernel(spec: FieldSpec, a_ref, b_ref, o_ref):
    # NOTE: all field constants enter as python ints (weak-typed scalars)
    # — pallas kernels cannot capture jnp array/scalar constants.
    L = spec.n_limbs
    p_list = [int(x) for x in spec.p_limbs]
    inv = int(spec.inv16)
    MASK = 0xFFFF

    a = a_ref[...].T  # [L, NB]
    b = b_ref[...].T

    # column accumulators as a python list of [NB] rows (registers)
    nb = a.shape[1]
    cols = [jnp.zeros((nb,), jnp.uint32) for _ in range(2 * L + 1)]
    for i in range(L):
        prod = a[i][None, :] * b  # [L, NB]
        lo = prod & MASK
        hi = prod >> 16
        for j in range(L):
            cols[i + j] = cols[i + j] + lo[j]
            cols[i + j + 1] = cols[i + j + 1] + hi[j]
    for i in range(L):
        m = ((cols[i] & MASK) * inv) & MASK
        for j in range(L):
            mp = m * p_list[j]
            cols[i + j] = cols[i + j] + (mp & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (mp >> 16)
        cols[i + 1] = cols[i + 1] + (cols[i] >> 16)

    # propagate cols[L:2L+1] -> limbs + carry
    out_rows = []
    carry = jnp.zeros((nb,), jnp.uint32)
    for k in range(L):
        v = cols[L + k] + carry
        out_rows.append(v & MASK)
        carry = v >> 16
    carry = carry + cols[2 * L]
    res = jnp.stack(out_rows, axis=0)  # [L, NB]

    # conditional subtract p
    borrow = jnp.zeros((nb,), jnp.uint32)
    d_rows = []
    for k in range(L):
        t = res[k] - p_list[k] - borrow
        d_rows.append(t & MASK)
        borrow = (t >> 16) & 1
    d = jnp.stack(d_rows, axis=0)
    ge = jnp.logical_or(carry.astype(bool), jnp.logical_not(borrow.astype(bool)))
    out = jnp.where(ge[None, :], d, res)
    o_ref[...] = out.T


@functools.lru_cache(maxsize=None)
def _mul_call(spec: FieldSpec, n: int, block: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    grid = (n // block,)
    bspec = pl.BlockSpec((block, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mul_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((n, L), jnp.uint32),
        grid=grid,
        in_specs=[bspec, bspec],
        out_specs=bspec,
    )


DEFAULT_BLOCK = 1024


def mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray,
        block: int = DEFAULT_BLOCK) -> jnp.ndarray:
    """Montgomery product via the Pallas kernel.

    a, b: uint32[..., L]; the batch is flattened and padded to a block
    multiple.  Bit-identical to ops/mont.mul.
    """
    L = spec.n_limbs
    a, b = jnp.broadcast_arrays(a, b)
    batch = a.shape[:-1]
    n = int(np.prod(batch)) if batch else 1
    af = a.reshape(n, L)
    bf = b.reshape(n, L)
    nb = max(block, 128)
    padded = -(-n // nb) * nb
    if padded != n:
        pad = ((0, padded - n), (0, 0))
        af = jnp.pad(af, pad)
        bf = jnp.pad(bf, pad)
    out = _mul_call(spec, padded, nb)(af, bf)
    return out[:n].reshape(*batch, L)
