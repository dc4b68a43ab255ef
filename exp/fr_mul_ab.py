"""A/B harness for the Fr Montgomery-mul Pallas kernel (regression hunt).

BENCH_r01 measured 3.69e8 mults/s with the round-1 [N, L]+in-kernel-
transpose kernel; r3 measures 2.71e8 with the limb-major [L, N] kernel.
The inner math is identical — this isolates block orientation, block
size, and accumulator strategy.

Usage: python exp/fr_mul_ab.py [variant ...]   (default: all)
Prints one JSON line per variant.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench(chain_fn, a, b, reps=64, iters=4):
    import jax

    jitted = jax.jit(chain_fn)
    out = jitted(a, b)
    np.asarray(jax.device_get(out[:, :1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(out, b)
    np.asarray(jax.device_get(out[:, :1]))
    dt = time.perf_counter() - t0
    n = a.shape[-1] if a.shape[0] <= 64 else a.shape[0]
    return n * reps * iters / dt


def main(variants):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/atc_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from algebra_tpu.bigint import batch_int_to_limbs
    from algebra_tpu.curves.instances.bls12_381 import fr_spec
    from algebra_tpu.ops import mont_pallas as mp

    spec = fr_spec
    L = spec.n_limbs
    n = 1 << 20
    reps = 64

    rng = np.random.default_rng(1234)
    xs = [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]
    ys = [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]
    a = jnp.asarray(batch_int_to_limbs(xs, L))  # [L, n]
    b = jnp.asarray(batch_int_to_limbs(ys, L))

    def report(name, rate):
        print(json.dumps({"variant": name, "mults_per_s": rate}), flush=True)

    # -- variant: current kernel at a given block width ---------------------
    def run_current(block):
        def chain(x, y):
            for _ in range(reps):
                x = mp.mul(spec, x, y, block=block)
            return x

        return _bench(chain, a, b, reps)

    # -- variant: round-1 style [N, L] blocks + in-kernel transpose ---------
    def _t_kernel(a_ref, b_ref, o_ref):
        o_ref[...] = mp._lm_mul(spec, a_ref[...].T, b_ref[...].T).T

    @functools.lru_cache(maxsize=None)
    def _t_call(block):
        grid = (n // block,)
        bspec = pl.BlockSpec((block, L), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _t_kernel,
            out_shape=jax.ShapeDtypeStruct((n, L), jnp.uint32),
            grid=grid,
            in_specs=[bspec, bspec],
            out_specs=bspec,
        )

    def run_r1(block):
        at = a.T  # [n, L]
        bt = b.T

        def chain(x, y):
            for _ in range(reps):
                x = _t_call(block)(x, y)
            return x

        return _bench(chain, at, bt, reps)

    # -- variant: interleaved CIOS window (L+2-row sliding accumulator) -----
    def _cios_mul(a_, b_):
        p_list = [int(x) for x in spec.p_limbs]
        inv = int(spec.inv16)
        nb = a_.shape[1]
        M = 0xFFFF
        p_full = jnp.concatenate(
            [jnp.full((1, nb), pj, jnp.uint32) for pj in p_list], axis=0
        )
        zero1 = jnp.zeros((1, nb), jnp.uint32)
        t = jnp.zeros((L + 2, nb), jnp.uint32)
        for i in range(L):
            prod = a_[i][None, :] * b_  # [L, nb]
            t = jnp.concatenate(
                [t[:L] + (prod & M), t[L:]], axis=0)
            t = jnp.concatenate(
                [t[:1], t[1 : L + 1] + (prod >> 16), t[L + 1 :]], axis=0)
            m = ((t[0] & M) * inv) & M
            mpd = m[None, :] * p_full
            t = jnp.concatenate(
                [t[:L] + (mpd & M), t[L:]], axis=0)
            t = jnp.concatenate(
                [t[:1], t[1 : L + 1] + (mpd >> 16), t[L + 1 :]], axis=0)
            t = jnp.concatenate(
                [t[:1], (t[1] + (t[0] >> 16))[None], t[2:]], axis=0)
            t = jnp.concatenate([t[1:], zero1], axis=0)  # shift down
        # t[:L+1] holds the redundant result columns; propagate
        carry = jnp.zeros((nb,), jnp.uint32)
        rows = []
        for k in range(L):
            v = t[k] + carry
            rows.append(v & M)
            carry = v >> 16
        carry = carry + t[L]
        res = jnp.stack(rows, axis=0)
        return mp._lm_cond_sub(spec, res, carry)

    def _cios_kernel(a_ref, b_ref, o_ref):
        o_ref[...] = _cios_mul(a_ref[...], b_ref[...])

    # -- variant: CIOS with fused mul+reduce waves (3 rebuilds/iter) --------
    def _cios2_mul(a_, b_):
        p_list = [int(x) for x in spec.p_limbs]
        inv = int(spec.inv16)
        nb = a_.shape[1]
        M = 0xFFFF
        p_full = jnp.concatenate(
            [jnp.full((1, nb), pj, jnp.uint32) for pj in p_list], axis=0
        )
        zero1 = jnp.zeros((1, nb), jnp.uint32)
        t = jnp.zeros((L + 1, nb), jnp.uint32)
        for i in range(L):
            prod = a_[i][None, :] * b_  # [L, nb]
            lo = prod & M
            hi = prod >> 16
            m = (((t[0] + lo[0]) & M) * inv) & M
            mprod = m[None, :] * p_full
            mlo = mprod & M
            mhi = mprod >> 16
            t = jnp.concatenate([t[:L] + (lo + mlo), t[L:]], axis=0)
            t0c = t[0] >> 16  # t[0] & M == 0 by Montgomery invariant
            t = jnp.concatenate(
                [(t[1] + t0c)[None], t[2:], zero1], axis=0
            )  # shift down; new top row starts at 0
            t = jnp.concatenate([t[:L] + (hi + mhi), t[L:]], axis=0)
        carry = jnp.zeros((nb,), jnp.uint32)
        rows = []
        for k in range(L):
            v = t[k] + carry
            rows.append(v & M)
            carry = v >> 16
        carry = carry + t[L]
        res = jnp.stack(rows, axis=0)
        return mp._lm_cond_sub(spec, res, carry)

    def _cios2_kernel(a_ref, b_ref, o_ref):
        o_ref[...] = _cios2_mul(a_ref[...], b_ref[...])

    @functools.lru_cache(maxsize=None)
    def _cios2_call(block):
        grid = (n // block,)
        bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _cios2_kernel,
            out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
            grid=grid,
            in_specs=[bspec, bspec],
            out_specs=bspec,
        )

    def run_cios2(block):
        def chain(x, y):
            for _ in range(reps):
                x = _cios2_call(block)(x, y)
            return x

        return _bench(chain, a, b, reps)

    def check2():
        from algebra_tpu import config
        from algebra_tpu.ops import mont

        config.use_pallas = False
        s = 4096
        want = np.asarray(mont.mul(spec, a[:, :s], b[:, :s]))
        config.use_pallas = None
        got = np.asarray(_cios2_call(1024)(
            jnp.pad(a[:, :s], ((0, 0), (0, n - s))),
            jnp.pad(b[:, :s], ((0, 0), (0, n - s))))[:, :s])
        assert (want == got).all(), "cios2 kernel mismatch"
        print("# cios2 correctness ok", file=sys.stderr)

    @functools.lru_cache(maxsize=None)
    def _cios_call(block):
        grid = (n // block,)
        bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _cios_kernel,
            out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
            grid=grid,
            in_specs=[bspec, bspec],
            out_specs=bspec,
        )

    def run_cios(block):
        def chain(x, y):
            for _ in range(reps):
                x = _cios_call(block)(x, y)
            return x

        return _bench(chain, a, b, reps)

    # -- correctness guard: all variants vs mont.mul jnp path ---------------
    def check():
        from algebra_tpu import config
        from algebra_tpu.ops import mont

        config.use_pallas = False
        want = np.asarray(mont.mul(spec, a[:, :4096], b[:, :4096]))
        config.use_pallas = None
        got_cur = np.asarray(mp.mul(spec, a[:, :4096], b[:, :4096]))
        s = 4096
        got_cios = np.asarray(_cios_call(1024)(
            jnp.pad(a[:, :s], ((0, 0), (0, n - s))),
            jnp.pad(b[:, :s], ((0, 0), (0, n - s))))[:, :s])
        assert (want == got_cur).all(), "current kernel mismatch"
        assert (want == got_cios).all(), "cios kernel mismatch"
        print("# correctness ok", file=sys.stderr)

    # -- variant: bench.py's exact path (mont.mul dispatch wrapper) ----------
    def run_via_mont():
        from algebra_tpu.ops import mont

        def chain(x, y):
            for _ in range(reps):
                x = mont.mul(spec, x, y)
            return x

        return _bench(chain, a, b, reps)

    # -- variant: ONE window rebuild per round -----------------------------
    # The shipped sliding window rebuilds the [L+1, nb] accumulator 3x
    # per round (add-lo, shift, add-hi).  Algebraically the three
    # updates compose into a single row-wise expression, so each round
    # can materialize the window ONCE:
    #   new[0]     = t[1] + lomp[1] + carry(t[0]+lomp[0]) + himp[0]
    #   new[r]     = t[r+1] + lomp[r+1] + himp[r]       (1 <= r <= L-2)
    #   new[L-1]   = t[L] + himp[L-1]
    #   new[L]     = 0
    # with lomp = lo + (m*p & M16), himp = hi + (m*p >> 16).
    def _onecat_mul(a_, b_):
        nb = a_.shape[1]
        inv = int(spec.inv16)
        p_full = mp._p_full(spec, nb)
        zero1 = jnp.zeros((1, nb), jnp.uint32)
        t = jnp.zeros((L + 1, nb), jnp.uint32)
        M16 = jnp.uint32(0xFFFF)
        for i in range(L):
            prod = a_[i][None, :] * b_
            lo = prod & M16
            hi = prod >> 16
            m = (((t[0] + lo[0]) & M16) * inv) & M16
            mpd = m[None, :] * p_full
            lomp = lo + (mpd & M16)
            himp = hi + (mpd >> 16)
            t0c = (t[0] + lomp[0]) >> 16
            head = (t[1] + lomp[1] + t0c + himp[0])[None]
            mid = t[2:L] + lomp[2:] + himp[1 : L - 1]
            tail = (t[L] + himp[L - 1])[None]
            t = jnp.concatenate([head, mid, tail, zero1], axis=0)
        return mp._lm_propagate(spec, t, nb)

    def _onecat_kernel(a_ref, b_ref, o_ref):
        o_ref[...] = _onecat_mul(a_ref[...], b_ref[...])

    @functools.lru_cache(maxsize=None)
    def _onecat_call(block):
        grid = (n // block,)
        bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _onecat_kernel,
            out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
            grid=grid,
            in_specs=[bspec, bspec],
            out_specs=bspec,
        )

    def run_onecat(block):
        def chain(x, y):
            for _ in range(reps):
                x = _onecat_call(block)(x, y)
            return x

        return _bench(chain, a, b, reps)

    def check3():
        from algebra_tpu import config
        from algebra_tpu.ops import mont

        config.use_pallas = False
        s = 4096
        want = np.asarray(mont.mul(spec, a[:, :s], b[:, :s]))
        config.use_pallas = None
        got = np.asarray(_onecat_call(1024)(
            jnp.pad(a[:, :s], ((0, 0), (0, n - s))),
            jnp.pad(b[:, :s], ((0, 0), (0, n - s))))[:, :s])
        assert (want == got).all(), "onecat kernel mismatch"
        print("# onecat correctness ok", file=sys.stderr)

    table = {
        "check": check,
        "check3": check3,
        "onecat_1024": lambda: report("onecat_1024", run_onecat(1024)),
        "onecat_2048": lambda: report("onecat_2048", run_onecat(2048)),
        "check2": check2,
        "via_mont": lambda: report("via_mont", run_via_mont()),
        "cios_512": lambda: report("cios_512", run_cios(512)),
        "cios2_512": lambda: report("cios2_512", run_cios2(512)),
        "cios2_1024": lambda: report("cios2_1024", run_cios2(1024)),
        "cios2_2048": lambda: report("cios2_2048", run_cios2(2048)),
        "cur_512": lambda: report("cur_512", run_current(512)),
        "cur_1024": lambda: report("cur_1024", run_current(1024)),
        "cur_2048": lambda: report("cur_2048", run_current(2048)),
        "cur_4096": lambda: report("cur_4096", run_current(4096)),
        "cur_8192": lambda: report("cur_8192", run_current(8192)),
        "r1_1024": lambda: report("r1_1024", run_r1(1024)),
        "r1_2048": lambda: report("r1_2048", run_r1(2048)),
        "cios_1024": lambda: report("cios_1024", run_cios(1024)),
        "cios_2048": lambda: report("cios_2048", run_cios(2048)),
        "cios_4096": lambda: report("cios_4096", run_cios(4096)),
    }
    if not variants:
        variants = list(table)
    for v in variants:
        table[v]()


if __name__ == "__main__":
    main(sys.argv[1:])
