"""Experiment: Montgomery-mul throughput vs data layout on TPU.

Variants:
  A: limb-last [N, L] (current ops/mont.py)
  B: limb-major [L, N] (limbs on sublanes, elements on lanes)
  C: limb-last with more chained reps (tunnel-latency probe)
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from algebra_tpu.bigint import batch_int_to_limbs
from algebra_tpu.curves.instances.bls12_381 import fr_spec
from algebra_tpu.ops import mont

L = fr_spec.n_limbs
MASK = jnp.uint32(0xFFFF)


def mul_limb_major(p_limbs, inv16, a, b):
    """a, b: uint32[L, N] -> montgomery product [L, N]."""
    p = jnp.asarray(p_limbs, jnp.uint32)  # [L]
    cols = jnp.zeros((2 * L + 1,) + a.shape[1:], jnp.uint32)
    for i in range(L):
        prod = a[i][None, :] * b  # [L, N]
        cols = cols.at[i : i + L].add(prod & MASK)
        cols = cols.at[i + 1 : i + L + 1].add(prod >> 16)
    for i in range(L):
        m = ((cols[i] & MASK) * inv16) & MASK
        mp = m[None, :] * p[:, None]
        cols = cols.at[i : i + L].add(mp & MASK)
        cols = cols.at[i + 1 : i + L + 1].add(mp >> 16)
        cols = cols.at[i + 1].add(cols[i] >> 16)
    # propagate carries on cols[L:2L+1]
    out = []
    carry = jnp.zeros(a.shape[1:], jnp.uint32)
    for k in range(L):
        v = cols[L + k] + carry
        out.append(v & MASK)
        carry = v >> 16
    res = jnp.stack(out, axis=0)
    carry = carry + cols[2 * L]
    # conditional subtract p
    borrow = jnp.zeros(a.shape[1:], jnp.uint32)
    d = []
    for k in range(L):
        t = res[k] - p[k] - borrow
        d.append(t & MASK)
        borrow = (t >> 16) & jnp.uint32(1)
    d = jnp.stack(d, axis=0)
    ge = jnp.logical_or(carry.astype(bool), jnp.logical_not(borrow.astype(bool)))
    return jnp.where(ge[None, :], d, res)


def bench(fn, args, reps_done, n_elems, warm=True):
    out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_map(lambda x: x.ravel()[0], out))
    t0 = time.perf_counter()
    out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_map(lambda x: x.ravel()[0], out))
    dt = time.perf_counter() - t0
    return n_elems * reps_done / dt, dt


def main():
    n = 1 << 20
    rng = np.random.default_rng(0)
    xs = [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]
    ys = [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]
    a_ll = jnp.asarray(batch_int_to_limbs(xs, L))
    b_ll = jnp.asarray(batch_int_to_limbs(ys, L))
    a_lm = a_ll.T.copy()
    b_lm = b_ll.T.copy()
    inv16 = np.uint32(fr_spec.inv16)

    REPS = 32

    @jax.jit
    def chainA(a, b):
        x = a
        for _ in range(REPS):
            x = mont.mul(fr_spec, x, b)
        return x

    @jax.jit
    def chainB(a, b):
        x = a
        for _ in range(REPS):
            x = mul_limb_major(fr_spec.p_limbs, inv16, x, b)
        return x

    rateA, dtA = bench(chainA, (a_ll, b_ll), REPS, n)
    print(f"A limb-last   : {rateA:.3e} mults/s (dt={dtA:.3f})", flush=True)
    rateB, dtB = bench(chainB, (a_lm, b_lm), REPS, n)
    print(f"B limb-major  : {rateB:.3e} mults/s (dt={dtB:.3f})", flush=True)

    # correctness cross-check
    outA = jax.device_get(chainA(a_ll, b_ll))[:4]
    outB = jax.device_get(chainB(a_lm, b_lm))[:, :4].T
    print("match:", np.array_equal(outA, outB), flush=True)


if __name__ == "__main__":
    main()
