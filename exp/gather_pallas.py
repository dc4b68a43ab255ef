"""A/B: Pallas DMA-driven row gather vs XLA's dynamic gather (v5e).

The MSM bucket phase is bound by gather ISSUE cost (~15 ns per 512 B row
on 2-D [n, 128]-u32 arrays; NOTES.md round 4) — ~34 GB/s effective
against ~800 GB/s HBM.  Hypothesis (VERDICT r4 #2): a Pallas kernel that
issues the row copies itself — indices delivered to SMEM per grid block,
K outstanding DMAs ahead of the wait — can beat that per-row issue cost;
and because bucket runs are CONTIGUOUS after the per-window sort, the
level-0 expansion can copy U-row units (one DMA per U rows) instead of
single rows, dividing the issue count by U.

Candidates:
  a) jnp row gather       out[j] = src[idx[j]]            (baseline)
  b) pallas per-row DMA   same semantics, K-deep DMA pipeline
  c) pallas per-unit DMA  out[j*U:(j+1)*U] = src[us[j]:us[j]+U] — the
     expansion form: us[] computed from run metadata with jnp, pad
     slots read past-run garbage rows (masked later by the consumer)
  d) jnp expansion        the current msm level-0 form (two table
     lookups + composed row gather) for the same run structure

Usage: python exp/gather_pallas.py [log_n] [log_occ]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROW_W = 128


def main(log_n=20, log_occ=4):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/atc_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = 1 << log_n
    occ = 1 << log_occ          # rows per run (uniform for the harness)
    B = n // occ                # number of runs
    U = 8                       # rows per DMA unit (4 KB)
    occ_p = occ + U             # padded run length (worst-case pad)
    m = B * occ_p               # expansion output rows

    rng = np.random.default_rng(5)
    src = jnp.asarray(
        rng.integers(0, 2**32, (n + 2 * U, ROW_W), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, n, (m,), dtype=np.int32))
    # run structure: run r covers src rows [r*occ, (r+1)*occ)
    start = jnp.arange(B, dtype=jnp.int32) * occ
    startp = jnp.arange(B, dtype=jnp.int32) * occ_p

    def bench(name, fn, *args, reps=3):
        j = jax.jit(fn)
        out = j(*args)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2]))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = j(*args)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2]))
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt*1e3:.2f} ms  ({dt/m*1e9:.1f} ns/row over {m})",
              flush=True)
        return out

    # ---------------------------------------------------------------- a)
    def jnp_gather(src, idx):
        return src[idx]

    ref = bench("a_jnp_row_gather", jnp_gather, src, idx)

    # ---------------------------------------------------------------- b)
    BLK = 1024
    NSEM = 16

    def _rowdma_kernel(idx_ref, src_ref, out_ref, sem):
        def get_dma(j):
            return pltpu.make_async_copy(
                src_ref.at[idx_ref[j]], out_ref.at[j], sem.at[j % NSEM]
            )

        for j in range(NSEM):
            get_dma(j).start()

        def body(j, _):
            @pl.when(j + NSEM < BLK)
            def _():
                get_dma(j + NSEM).start()

            get_dma(j).wait()
            return 0

        jax.lax.fori_loop(0, BLK, body, 0)

    @functools.lru_cache(maxsize=None)
    def rowdma_call(mm):
        return pl.pallas_call(
            _rowdma_kernel,
            out_shape=jax.ShapeDtypeStruct((mm, ROW_W), jnp.uint32),
            grid=(mm // BLK,),
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((BLK, ROW_W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
        )

    def pallas_gather(src, idx):
        mm = idx.shape[0]
        mm_p = -(-mm // BLK) * BLK
        idx_p = jnp.pad(idx, (0, mm_p - mm))
        return rowdma_call(mm_p)(idx_p, src)[:mm]

    got = bench("b_pallas_row_dma", pallas_gather, src, idx)
    assert np.array_equal(np.asarray(ref), np.asarray(got)), "b mismatch"

    # ---------------------------------------------------------------- c)
    # 1-D SMEM operands must block in multiples of XLA's T(1024) tiling
    UBLK = 1024  # units per grid step
    CBLK = UBLK * U  # output rows per grid step

    def _unitdma_kernel(us_ref, src_ref, out_ref, sem):
        def get_dma(j):
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(us_ref[j], U)],
                out_ref.at[pl.ds(j * U, U)],
                sem.at[j % NSEM],
            )

        nu = min(NSEM, UBLK)
        for j in range(nu):
            get_dma(j).start()

        def body(j, _):
            @pl.when(j + nu < UBLK)
            def _():
                get_dma(j + nu).start()

            get_dma(j).wait()
            return 0

        jax.lax.fori_loop(0, UBLK, body, 0)

    @functools.lru_cache(maxsize=None)
    def unitdma_call(mm):
        return pl.pallas_call(
            _unitdma_kernel,
            out_shape=jax.ShapeDtypeStruct((mm, ROW_W), jnp.uint32),
            grid=(mm // CBLK,),
            in_specs=[
                pl.BlockSpec((UBLK,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((CBLK, ROW_W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
        )

    def pallas_expand(src, start, startp):
        # unit table with jnp: unit j belongs to run j // (occ_p/U)
        upr = occ_p // U
        mu = m // U
        mu_p = -(-mu // UBLK) * UBLK
        uj = jnp.arange(mu_p, dtype=jnp.int32)
        run = jnp.minimum(uj // upr, B - 1)
        us = start[run] + (uj % upr) * U  # past-run rows pad the tail
        us = jnp.minimum(us, n + U)
        return unitdma_call(mu_p * U)(us, src)[:m]

    def jnp_expand(src, start, startp):
        j = jnp.arange(m, dtype=jnp.int32)
        run = j // occ_p
        t = j - startp[run]
        return src[start[run] + t]

    exp_ref = bench("d_jnp_expansion", jnp_expand, src, start, startp)
    got_c = bench("c_pallas_unit_dma", pallas_expand, src, start, startp)
    assert np.array_equal(np.asarray(exp_ref), np.asarray(got_c)), "c mismatch"


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
