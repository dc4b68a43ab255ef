"""Per-phase MSM timing on TPU: recode+sort, affine-tree bucket phase,
weighted reduction + Horner fold.  Reproduces ops/msm.msm's structure
with a sync fetch between phases.

Usage: python exp/msm_phases.py [log_n ...]
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


def main(log_sizes):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/atc_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import random as _random

    from algebra_tpu.bigint import batch_int_to_limbs
    from algebra_tpu.curves.instances import bls12_381
    from algebra_tpu.ops import msm as msm_mod

    curve = bls12_381.g1()
    hrng = _random.Random(1234)
    host_pts = curve.random_host(hrng, 256)
    aff256 = curve.from_host(host_pts)
    rng = np.random.default_rng(9)

    for log_n in log_sizes:
        n = 1 << log_n
        reps = n // 256
        x = jnp.tile(aff256[0], (1, reps))
        y = jnp.tile(aff256[1], (1, reps))
        inf = jnp.tile(aff256[2], (reps,))
        scalars = jnp.asarray(batch_int_to_limbs(
            [int.from_bytes(rng.bytes(40), "little") % bls12_381.R
             for _ in range(n)], bls12_381.fr_spec.n_limbs))

        scalar_bits = curve.scalar_modulus.bit_length()
        c, W = msm_mod.plan_windows(
            scalar_bits, msm_mod.default_window_size(n), n)
        B = 1 << (c - 1)
        print(f"# 2^{log_n}: c={c} W={W} B={B}", flush=True)

        _, _, group = msm_mod._tree_plan(n, B, W)
        n_groups = -(-W // group)
        print(f"# group={group} n_groups={n_groups}", flush=True)

        def recode(g0, g1, scalars, inf):
            digits = msm_mod.signed_digits(
                scalars, c, W, last_unsigned=True, w_start=g0, w_end=g1)
            mags = jnp.abs(digits).astype(jnp.uint32)
            isneg_g = digits < 0
            key = jnp.where(
                jnp.logical_or(mags == 0, inf[None, :]),
                jnp.uint32(B), mags - 1)
            order_g = jnp.argsort(key, axis=1).astype(jnp.uint32)
            sorted_key = jnp.take_along_axis(key, order_g, axis=1)
            g_sz = sorted_key.shape[0]
            first = jnp.full((g_sz, B + 2), n, jnp.int32)
            first = first.at[
                jnp.arange(g_sz, dtype=jnp.int32)[:, None],
                sorted_key.astype(jnp.int32),
            ].min(jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32)[None, :], sorted_key.shape))
            ext = jax.lax.cummin(first[:, ::-1], axis=1)[:, ::-1]
            start_g = ext[:, :B]
            counts_g = ext[:, 1:B + 1] - start_g
            negs = jnp.take_along_axis(
                isneg_g, order_g.astype(jnp.int32), axis=1)
            order_signed = order_g | (negs.astype(jnp.uint32) << 31)
            return order_signed, sorted_key, start_g, counts_g

        recode_j = jax.jit(recode, static_argnums=(0, 1))

        def buckets_fn(x, y, order_signed, skey, start, counts):
            from algebra_tpu.ops import rows_pallas

            L = x.shape[0]
            base_rows = rows_pallas.pack(curve.base.spec, x, y,
                                         jnp.zeros((n,), bool))
            sentinel = jnp.zeros((1, rows_pallas.ROW_W), jnp.uint32)
            sentinel = sentinel.at[0, 2 * L].set(1)
            xy_rows = jnp.concatenate([base_rows, sentinel], axis=0)
            return msm_mod._affine_tree_buckets(
                curve, xy_rows, order_signed, skey, start, counts, n, B)

        buckets_j = jax.jit(buckets_fn)

        def reduce_fn(bucket_parts):
            ws = msm_mod._weighted_reduce(curve, tuple(bucket_parts))
            return msm_mod._horner_fold(curve, ws, c)

        reduce_j = jax.jit(reduce_fn)

        # warm all phases
        groups = []
        for gi in range(n_groups):
            g0, g1 = gi * group, min((gi + 1) * group, W)
            r = recode_j(g0, g1, scalars, inf)
            _sync(r)
            groups.append((g0, g1))
        r0 = recode_j(0, groups[0][1], scalars, inf)
        bk = buckets_j(x, y, *r0)
        _sync(bk)
        if n_groups == 1:
            parts = bk
        else:
            parts = tuple(
                jnp.concatenate([c1, c1], axis=1)[:, :W] if c1.ndim == 2
                else c1 for c1 in bk)
        # build full-width buckets for reduce warm (tile groups)
        full = tuple(
            jnp.concatenate([coord] * n_groups, axis=1)[:, :W]
            for coord in bk)
        out = reduce_j(full)
        _sync(out)

        # timed
        t0 = time.perf_counter()
        rs = []
        for g0, g1 in groups:
            rs.append(recode_j(g0, g1, scalars, inf))
        _sync(rs[-1])
        t1 = time.perf_counter()
        bks = []
        for r in rs:
            bks.append(buckets_j(x, y, *r))
        _sync(bks[-1])
        t2 = time.perf_counter()
        full = tuple(
            jnp.concatenate([bk[i] for bk in bks], axis=1)
            for i in range(3))
        out = reduce_j(full)
        _sync(out)
        t3 = time.perf_counter()
        print(f"2^{log_n}: recode+sort {t1-t0:.3f}s  "
              f"affine-tree {t2-t1:.3f}s  reduce+fold {t3-t2:.3f}s  "
              f"total {t3-t0:.3f}s", flush=True)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [18, 20]
    main(sizes)
