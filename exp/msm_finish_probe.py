"""What does one MSM lockstep finish round cost at [g, B] width?

Breakdown candidates for the measured ~50 ms/round at 2^20 (c=16,
g=4, B=32768): the V row gather, the unpack kernel, the Jacobian
mixed add, or the fori_loop acc plumbing.

Usage: python exp/msm_finish_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax

    return np.asarray(
        jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:2]))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/atc_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import random as _random

    from algebra_tpu.curves.instances import bls12_381
    from algebra_tpu.ops import rows_pallas

    curve = bls12_381.g1()
    spec = curve.base.spec
    L = spec.n_limbs
    g, B = 4, 32768
    mk = 6 * B  # remaining slots per window after stage-1 halving
    rng = np.random.default_rng(7)

    hrng = _random.Random(1234)
    aff = curve.from_host(curve.random_host(hrng, 256))
    xs = jnp.tile(aff[0], (1, g * mk // 256))
    ys = jnp.tile(aff[1], (1, g * mk // 256))
    V = rows_pallas.pack(spec, xs, ys, jnp.zeros((g * mk,), bool))
    _sync(V)

    start_k = jnp.asarray(
        np.sort(rng.integers(0, mk - 16, (g, B)).astype(np.int32), axis=1))
    ck = jnp.asarray(rng.integers(1, 8, (g, B)).astype(np.int32))
    goff = (jnp.arange(g, dtype=jnp.int32) * mk)[:, None]
    acc0 = curve.zero((g, B))

    R = 8

    def bench(name, fn, *args):
        j = jax.jit(fn)
        _sync(j(*args))
        t0 = time.perf_counter()
        _sync(j(*args))
        dt = time.perf_counter() - t0
        print(f"{name}: {dt*1e3:.1f} ms total, {dt/R*1e3:.1f} ms/round",
              flush=True)

    # a) gather only
    def rounds_gather(V, start_k, ck):
        def body(r, acc):
            rows = V[(goff + jnp.minimum(start_k + r, mk - 1)).reshape(-1)]
            return acc + rows[:, 0].astype(jnp.uint32).sum()

        return jax.lax.fori_loop(0, R, body, jnp.uint32(0))

    bench("a_gather_only", rounds_gather, V, start_k, ck)

    # b) gather + unpack
    def rounds_unpack(V, start_k, ck):
        def body(r, acc):
            rows = V[(goff + jnp.minimum(start_k + r, mk - 1)).reshape(-1)]
            gx, gy, ginf = rows_pallas.unpack(spec, rows)
            return acc + gx[0].astype(jnp.uint32).sum() + gy[0, 0]

        return jax.lax.fori_loop(0, R, body, jnp.uint32(0))

    bench("b_gather_unpack", rounds_unpack, V, start_k, ck)

    # c) full round (gather + unpack + add_mixed)
    def rounds_full(V, start_k, ck, acc):
        def body(r, acc):
            rows = V[(goff + jnp.minimum(start_k + r, mk - 1)).reshape(-1)]
            gx, gy, ginf = rows_pallas.unpack(spec, rows)
            gx = gx.reshape(L, g, B)
            gy = gy.reshape(L, g, B)
            ginf = jnp.logical_or(ginf.reshape(g, B), r >= ck)
            return curve.add_mixed(acc, (gx, gy, ginf))

        return jax.lax.fori_loop(0, R, body, acc)

    bench("c_full_round", rounds_full, V, start_k, ck, acc0)

    # d) add_mixed only (no gather/unpack: reuse one block slice)
    def rounds_add(V, start_k, ck, acc):
        rows = V[: g * B]
        gx, gy, ginf0 = rows_pallas.unpack(spec, rows)
        gx = gx.reshape(L, g, B)
        gy = gy.reshape(L, g, B)

        def body(r, acc):
            ginf = jnp.logical_or(ginf0.reshape(g, B), r >= ck)
            return curve.add_mixed(acc, (gx, gy, ginf))

        return jax.lax.fori_loop(0, R, body, acc)

    bench("d_add_only", rounds_add, V, start_k, ck, acc0)


if __name__ == "__main__":
    main()
