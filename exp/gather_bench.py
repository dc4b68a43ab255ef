"""Row-gather microbenchmark: how expensive is fetching m scattered
point rows under different layouts/constructions?

The 2^20 MSM trace showed u32[8.9M,48] gathers from u32[1M,48]{0,1}
costing 0.46 s — ~50 ns/row for 192 B rows (~125x byte amplification
from the column-major tiled layout).  Candidates:

  a) transpose-in-jit (current): xy_rows = concat([x,y]).T
  b) per-limb gather from limb-major [48, n]
  c) pallas-packed rows: a kernel writes [n, 48] row-major
  d) padded rows [n, 64] via transpose-in-jit
  e) gather on [n, 8, 8] reshaped rows (tile-aligned subrows)

Usage: python exp/gather_bench.py [log_n] [log_m]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(log_n=20, log_m=23):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/atc_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = 1 << log_n
    m = 1 << log_m
    L2 = 48
    rng = np.random.default_rng(3)
    src_lm = jnp.asarray(rng.integers(0, 2**32, (L2, n), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, n, (m,), dtype=np.uint32))

    def bench(name, fn, *args):
        j = jax.jit(fn)
        out = j(*args)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2]))
        t0 = time.perf_counter()
        out = j(*args)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2]))
        dt = time.perf_counter() - t0
        print(f"{name}: {dt*1e3:.1f} ms  ({dt/m*1e9:.1f} ns/row)", flush=True)

    # a) transpose-in-jit rows
    def rows_t(src, idx):
        rows = src.T  # [n, 48]
        return jax.vmap(lambda i: rows[i])(idx.astype(jnp.int32))

    bench("a_transpose_rows", rows_t, src_lm, idx)

    # b) per-limb gather from [48, n]
    def limb_gather(src, idx):
        return src[:, idx.astype(jnp.int32)]

    bench("b_limb_major_cols", limb_gather, src_lm, idx)

    # c) pallas-packed rows then gather
    def _pack_kernel(i_ref, o_ref):
        o_ref[...] = i_ref[...].T

    @functools.lru_cache(maxsize=None)
    def pack_call(nn):
        blk = 4096
        return pl.pallas_call(
            _pack_kernel,
            out_shape=jax.ShapeDtypeStruct((nn, L2), jnp.uint32),
            grid=(nn // blk,),
            in_specs=[pl.BlockSpec((L2, blk), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((blk, L2), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )

    def rows_pallas(src, idx):
        rows = pack_call(n)(src)
        return jax.vmap(lambda i: rows[i])(idx.astype(jnp.int32))

    bench("c_pallas_packed_rows", rows_pallas, src_lm, idx)

    # d) padded rows [n, 64]
    def rows_pad(src, idx):
        rows = jnp.concatenate(
            [src, jnp.zeros((16, src.shape[1]), jnp.uint32)], axis=0).T
        return jax.vmap(lambda i: rows[i])(idx.astype(jnp.int32))

    bench("d_padded64_rows", rows_pad, src_lm, idx)

    # e) take_along_axis form on [n, 48]
    def rows_taa(src, idx):
        rows = src.T
        return jnp.take(rows, idx.astype(jnp.int32), axis=0)

    bench("e_take_rows", rows_taa, src_lm, idx)

    # f) slice baseline (contiguous read of m rows, no indices)
    def rows_slice(src):
        rows = src.T
        return jax.lax.dynamic_slice(rows, (0, 0), (min(m, n), L2))

    bench("f_contig_slice", rows_slice, src_lm)


if __name__ == "__main__":
    a = [int(v) for v in sys.argv[1:]]
    main(*a)


def main2(log_n=20, log_m=23, R=51, G=16):
    """3-D vmap-batched gather (the tree's rows_take form) vs flat 2-D."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/atc_bench")
    n = (1 << log_n) // G
    m = (1 << log_m) // G
    rng = np.random.default_rng(3)
    V = jnp.asarray(rng.integers(0, 2**32, (G, n, R), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, n, (G, m), dtype=np.uint32))

    def bench(name, fn, *args):
        j = jax.jit(fn)
        out = j(*args)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2]))
        t0 = time.perf_counter()
        out = j(*args)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2]))
        dt = time.perf_counter() - t0
        tot = G * m
        print(f"{name}: {dt*1e3:.1f} ms  ({dt/tot*1e9:.1f} ns/row)", flush=True)

    def vmap_rows(V, idx):
        return jax.vmap(lambda v, i: v[i])(V, idx.astype(jnp.int32))

    bench(f"g_vmap3d_R{R}", vmap_rows, V, idx)

    def flat_rows(V, idx):
        VF = V.reshape(G * n, R)
        base = (jnp.arange(G, dtype=jnp.uint32) * n)[:, None]
        return VF[(idx + base).astype(jnp.int32).reshape(-1)].reshape(G, m, R)

    bench(f"h_flat2d_R{R}", flat_rows, V, idx)


def main3(log_n=20, log_m=23):
    """Row-width alignment sweep + shared-source 2-D-index vmap form."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/atc_bench")
    n = 1 << log_n
    m = 1 << log_m
    rng = np.random.default_rng(3)

    def bench(name, fn, *args):
        j = jax.jit(fn)
        out = j(*args)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2]))
        t0 = time.perf_counter()
        out = j(*args)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2]))
        dt = time.perf_counter() - t0
        print(f"{name}: {dt*1e3:.1f} ms  ({dt/m*1e9:.1f} ns/row)", flush=True)

    for R in (48, 64, 128):
        V = jnp.asarray(rng.integers(0, 2**32, (n, R), dtype=np.uint32))
        idx = jnp.asarray(rng.integers(0, n, (m,), dtype=np.uint32))
        bench(f"flat_R{R}", lambda V, i: V[i.astype(jnp.int32)], V, idx)

    # shared source, [G, m/G] indices via vmap over index rows only
    G = 16
    V = jnp.asarray(rng.integers(0, 2**32, (n, 48), dtype=np.uint32))
    idx2 = jnp.asarray(rng.integers(0, n, (G, m // G), dtype=np.uint32))
    bench("shared_vmap_R48",
          lambda V, i: jax.vmap(lambda r: V[r.astype(jnp.int32)])(i), V, idx2)


if __name__ == "__main__" and os.environ.get("GB3"):
    main3(*[int(v) for v in sys.argv[1:3]])
elif __name__ == "__main__" and os.environ.get("GB2"):
    main2(*[int(v) for v in sys.argv[1:4]])
