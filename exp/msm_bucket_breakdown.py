"""Breakdown INSIDE the multi-stage affine-tree bucket phase (r5 form):
stage A (sorted rows + sign fold), each halving stage (expansion DMA +
levels), and the lockstep finish.

Replicates ops/msm._affine_tree_buckets stage by stage with a sync
fetch between stages (each stage jitted separately, so XLA cannot fuse
across the cut — absolute numbers are slightly pessimistic, the RATIO
is what matters).

Usage: python exp/msm_bucket_breakdown.py [log_n]
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


def main(log_n=20):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/atc_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import random as _random

    from algebra_tpu.bigint import batch_int_to_limbs
    from algebra_tpu.curves.instances import bls12_381
    from algebra_tpu.ops import msm as msm_mod, rows_pallas
    from algebra_tpu.ops.mont_pallas import pad_bucket

    curve = bls12_381.g1()
    B_ = curve.base
    spec = B_.spec
    L = spec.n_limbs
    hrng = _random.Random(1234)
    aff256 = curve.from_host(curve.random_host(hrng, 256))
    rng = np.random.default_rng(9)

    n = 1 << log_n
    reps = n // 256
    x = jnp.tile(aff256[0], (1, reps))
    y = jnp.tile(aff256[1], (1, reps))
    inf = jnp.zeros((n,), bool)
    scalars = jnp.asarray(batch_int_to_limbs(
        [int.from_bytes(rng.bytes(40), "little") % bls12_381.R
         for _ in range(n)], bls12_381.fr_spec.n_limbs))

    scalar_bits = curve.scalar_modulus.bit_length()
    c, W = msm_mod.plan_windows(scalar_bits, msm_mod.default_window_size(n), n)
    nB = 1 << (c - 1)
    k, m0, group = msm_mod._tree_plan(n, nB, W)
    stages = ([k] if k > 0 else []) + msm_mod._extra_stages(n, nB, k)
    print(f"# 2^{log_n}: c={c} W={W} B={nB} k={k} m0={m0} group={group} "
          f"stages={stages}", flush=True)
    g = group

    def recode(scalars, inf):
        digits = msm_mod.signed_digits(scalars, c, W, last_unsigned=True,
                                       w_start=0, w_end=g)
        mags = jnp.abs(digits).astype(jnp.uint32)
        isneg_g = digits < 0
        key = jnp.where(jnp.logical_or(mags == 0, inf[None, :]),
                        jnp.uint32(nB), mags - 1)
        order_g = jnp.argsort(key, axis=1).astype(jnp.uint32)
        sorted_key = jnp.take_along_axis(key, order_g, axis=1)
        first = jnp.full((g, nB + 2), n, jnp.int32)
        first = first.at[
            jnp.arange(g, dtype=jnp.int32)[:, None],
            sorted_key.astype(jnp.int32),
        ].min(jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[None, :], sorted_key.shape))
        ext = jax.lax.cummin(first[:, ::-1], axis=1)[:, ::-1]
        start_g = ext[:, :nB]
        counts_g = ext[:, 1:nB + 1] - start_g
        negs = jnp.take_along_axis(isneg_g, order_g.astype(jnp.int32), axis=1)
        order_signed = order_g | (negs.astype(jnp.uint32) << 31)
        return order_signed, start_g, counts_g

    order_signed, start, counts = jax.jit(recode)(scalars, inf)
    _sync(order_signed)
    xy_rows = jax.jit(lambda x, y: rows_pallas.pack(
        spec, x, y, jnp.zeros((n,), bool)))(x, y)
    _sync(xy_rows)

    inv_fn = msm_mod._batched_inv_fn(B_)
    w_rows = jnp.arange(g, dtype=jnp.int32)[:, None]
    bucket_ids = jnp.broadcast_to(
        jnp.arange(nB, dtype=jnp.int32)[None, :], (g, nB))

    # stage A
    def stage_a(xy_rows, order_signed):
        idx = (order_signed & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        negs = (order_signed >> 31) != 0
        return rows_pallas.negate_y(
            spec, xy_rows[idx.reshape(-1)], negs.reshape(-1))

    stage_a_j = jax.jit(stage_a)

    # one halving stage: expansion + ks levels
    def make_stage(ks, n_cur):
        U = 1 << ks
        m_s = pad_bucket(n_cur + (U - 1) * nB, max(64 << ks, 128))
        mu = m_s // U

        def stage(src, counts_c, start_c):
            counts_p = ((counts_c + U - 1) >> ks) << ks
            start_p = jnp.cumsum(counts_p, axis=1) - counts_p
            seed = jnp.zeros((g, mu), jnp.int32)
            seed = seed.at[w_rows, start_p >> ks].max(bucket_ids,
                                                      mode="drop")
            run_u = jax.lax.cummax(seed, axis=1)
            su = jnp.take_along_axis(start_p, run_u, axis=1)
            sc_ = jnp.take_along_axis(start_c, run_u, axis=1)
            cc = jnp.take_along_axis(counts_c, run_u, axis=1)
            ju = jnp.arange(mu, dtype=jnp.int32)[None, :]
            us = sc_ + (ju * U - su)
            goff_src = (jnp.arange(g, dtype=jnp.int32) * n_cur)[:, None]
            us_flat = jnp.clip((us + goff_src).reshape(-1), 0,
                               g * n_cur - U)
            V = rows_pallas.expand_units(src, us_flat.astype(jnp.int32), U)
            bnd = su + cc
            slot_j = jnp.arange(m_s, dtype=jnp.int32).reshape(1, mu, U)
            valid = (slot_j < bnd[:, :, None]).reshape(-1)
            for lvl in range(ks):
                Pl = rows_pallas.unpack(spec, V[0::2])
                Pr = rows_pallas.unpack(spec, V[1::2])
                if lvl == 0:
                    Pl = (Pl[0], Pl[1], jnp.logical_or(
                        Pl[2], jnp.logical_not(valid[0::2])))
                    Pr = (Pr[0], Pr[1], jnp.logical_or(
                        Pr[2], jnp.logical_not(valid[1::2])))
                P3 = curve.affine_add(Pl, Pr, inv_fn)
                V = rows_pallas.pack(spec, *P3)
            return V, counts_p >> ks, start_p >> ks

        return jax.jit(stage), m_s >> ks

    # finish
    def make_finish(mk):
        def finish(V, ck, start_k):
            goff_mk = (jnp.arange(g, dtype=jnp.int32) * mk)[:, None]

            def fetch_slots(pos, validr):
                rows = V[(goff_mk + jnp.minimum(pos, mk - 1)).reshape(-1)]
                gx, gy, ginf = rows_pallas.unpack(spec, rows)
                gx = gx.reshape(L, g, nB)
                gy = gy.reshape(L, g, nB)
                ginf = jnp.logical_or(ginf.reshape(g, nB),
                                      jnp.logical_not(validr))
                return (gx, gy, ginf)

            def slot_round(r, acc):
                return curve.add_mixed(acc, fetch_slots(start_k + r, r < ck))

            zero_pt = curve.zero((g, nB))
            counts_f = ck.reshape(-1)
            rounds_max = jnp.max(counts_f).astype(jnp.int32)
            WB = g * nB
            K = min(max(64, WB // 16), WB)
            if WB > 2 * K:
                rounds_full = jnp.sort(counts_f)[WB - K].astype(jnp.int32)
            else:
                rounds_full = rounds_max
            buckets = jax.lax.fori_loop(0, rounds_full, slot_round, zero_pt)
            if WB > 2 * K:
                buckets = msm_mod._drain_slot_tail(
                    curve, buckets, V, counts_f, start_k,
                    (jnp.arange(g, dtype=jnp.int32) * mk)[:, None],
                    rounds_full, rounds_max, g, nB, mk, K)
            return buckets

        return jax.jit(finish)

    # build pipeline
    stage_fns = []
    n_cur = n
    for ks in stages:
        fn, n_next = make_stage(ks, n_cur)
        stage_fns.append((ks, fn))
        n_cur = n_next
    finish_j = make_finish(n_cur)

    def run_all(verbose):
        t0 = time.perf_counter()
        src = stage_a_j(xy_rows, order_signed)
        _sync(src)
        ts = [time.perf_counter()]
        cc, st = counts.astype(jnp.int32), start.astype(jnp.int32)
        for ks, fn in stage_fns:
            src, cc, st = fn(src, cc, st)
            _sync(src)
            ts.append(time.perf_counter())
        out = finish_j(src, cc, st)
        _sync(out)
        ts.append(time.perf_counter())
        if verbose:
            parts = [f"stageA {ts[0]-t0:.3f}s"]
            for i, (ks, _) in enumerate(stage_fns):
                parts.append(f"stage(k={ks}) {ts[i+1]-ts[i]:.3f}s")
            parts.append(f"finish {ts[-1]-ts[-2]:.3f}s")
            total = ts[-1] - t0
            print(f"2^{log_n} one group (g={g}): " + "  ".join(parts)
                  + f"  total {total:.3f}s x{W//g} groups = "
                  f"{total*(W//g):.3f}s", flush=True)

    run_all(False)  # warm
    run_all(True)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]] or [20])
