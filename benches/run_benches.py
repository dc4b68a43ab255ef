"""Benchmark runner — the TPU analogue of the reference's criterion
bench-templates (bench-templates/src/macros/{field,ec,pairing}.rs and
poly/benches/fft.rs).

Usage:  python benches/run_benches.py [field|ntt|msm|pairing|all] [--json]

Runs on whatever backend JAX selects (the TPU chip under axon).  Each
benchmark prints one JSON line compatible with bench.py's schema.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/atc_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


_enable_compile_cache()

def _sync_fetch(x):
    import jax

    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:4]))


def _time(fn, iters=3):
    _sync_fetch(fn())  # warm/compile AND drain the async queue
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync_fetch(out)
    return (time.perf_counter() - t0) / iters


def report(metric, value, unit, baseline=None):
    rec = {"metric": metric, "value": value, "unit": unit}
    if baseline:
        rec["vs_baseline"] = value / baseline
    print(json.dumps(rec), flush=True)


def bench_field(n=1 << 20, reps=8):
    # reps > 8: the axon remote compile of the chained program scales
    # superlinearly in Pallas call sites (NOTES.md round 4)
    import jax
    import jax.numpy as jnp

    from algebra_tpu.bigint import batch_int_to_limbs
    from algebra_tpu.curves.instances.bls12_381 import fr_spec, fq_spec
    from algebra_tpu.ops import mont

    rng = np.random.default_rng(7)
    for spec, name in ((fr_spec, "fr"), (fq_spec, "fq")):
        nb = (spec.modulus_bit_size - 2) // 8
        a = jnp.asarray(batch_int_to_limbs(
            [int.from_bytes(rng.bytes(nb), "little") for _ in range(n)], spec.n_limbs))
        b = jnp.asarray(batch_int_to_limbs(
            [int.from_bytes(rng.bytes(nb), "little") for _ in range(n)], spec.n_limbs))

        @jax.jit
        def chain(a, b):
            x = a
            for _ in range(reps):
                x = mont.mul(spec, x, b)
            return x

        state = {"x": a}

        def run():
            state["x"] = chain(state["x"], b)
            return state["x"]

        # 24 iters: each dispatch pays a ~5-8 ms tunnel fence; at 3 iters
        # that overhead inflated the 11 ms compute by ~70% (bench.py, the
        # official headline, amortizes over 32 dispatches the same way)
        dt = _time(run, iters=24)
        report(f"bls12_381_{name}_mont_mults_per_s", n * reps / dt, "mults/s",
               1e8 if name == "fr" else None)


def bench_ntt(log_sizes=(16, 20, 22, 24)):
    import jax
    import jax.numpy as jnp

    from algebra_tpu.bigint import batch_int_to_limbs
    from algebra_tpu.curves.instances.bls12_381 import Fr, fr_spec
    from algebra_tpu.poly.domain import Radix2EvaluationDomain

    rng = np.random.default_rng(8)
    for log_n in log_sizes:
        n = 1 << log_n
        domain = Radix2EvaluationDomain(Fr, n)
        coeffs = jnp.asarray(batch_int_to_limbs(
            [int.from_bytes(rng.bytes(31), "little") for _ in range(n)],
            fr_spec.n_limbs))

        def run():
            return domain.fft(coeffs)

        try:
            dt = _time(run)
        except Exception as e:  # OOM at the largest sizes: report the rest
            print(f"# ntt 2^{log_n} failed: {type(e).__name__}", file=sys.stderr)
            continue
        report(f"bls12_381_fr_ntt_2e{log_n}_s", dt, "s")


def bench_msm(log_sizes=(16, 18, 20, 22, 24), curve_name="g1"):
    import jax
    import jax.numpy as jnp

    from algebra_tpu.bigint import batch_int_to_limbs
    from algebra_tpu.curves.instances import bls12_381
    from algebra_tpu.ops import msm as msm_mod

    curve = getattr(bls12_381, curve_name)()
    rng = np.random.default_rng(9)
    max_n = 1 << max(log_sizes)
    # bases: 256 host-generated random subgroup points tiled per size.
    # MSM cost depends on the scalar digit distribution, not base values,
    # so tiling keeps setup cheap without distorting the measurement.
    import random as _random

    hrng = _random.Random(1234)
    host_pts = curve.random_host(hrng, 256)
    aff256 = curve.from_host(host_pts)

    r_mod = bls12_381.R
    # scalars stay on HOST; each size slices and uploads its own view so
    # the 2^24 arrays (8+ GB) are not resident while timing 2^18
    # (measured OOM: small-size transients + max-size persistents)
    host_scalars = np.asarray(batch_int_to_limbs(
        [int.from_bytes(rng.bytes(40), "little") % r_mod for _ in range(max_n)],
        bls12_381.fr_spec.n_limbs))

    for log_n in log_sizes:
        n = 1 << log_n
        reps = n // 256
        bases_n = (
            jax.tree_util.tree_map(lambda a: jnp.tile(a, (1, reps)),
                                   aff256[0]),
            jax.tree_util.tree_map(lambda a: jnp.tile(a, (1, reps)),
                                   aff256[1]),
            jnp.tile(aff256[2], (reps,)),
        )
        sc_n = jnp.asarray(host_scalars[:, :n])
        if log_n >= 22:
            # streaming chunks (the reference's msm_chunks mode,
            # variable_base/mod.rs:54-85): single-shot level-0 buffers
            # exceed HBM beyond ~2^20 (2^21 measured 16.5 GB live);
            # 2^20 chunks reuse one compiled kernel set for all sizes.
            # NOT wrapped in an outer jit: each chunk must be its own
            # dispatch so XLA cannot interleave chunk buffers (OOM).
            f = lambda b, s: msm_mod.msm_chunks(curve, b, s,
                                                chunk=1 << 20)
        else:
            f = jax.jit(lambda b, s: msm_mod.msm(curve, b, s))

        def run():
            return f(bases_n, sc_n)

        try:
            dt = _time(run)
        except Exception as e:
            print(f"# msm 2^{log_n} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        finally:
            del bases_n, sc_n  # free before the next size uploads
        report(f"bls12_381_{curve_name}_msm_2e{log_n}_s", dt, "s")


def bench_field_ops(n=1 << 20):
    """add/sub/square/inverse/sqrt rows (the reference's f_bench! sweep,
    bench-templates/src/macros/field.rs:2-60)."""
    import jax
    import jax.numpy as jnp

    from algebra_tpu.bigint import batch_int_to_limbs
    from algebra_tpu.curves.instances.bls12_381 import fr_spec
    from algebra_tpu.ops import mont

    spec = fr_spec
    rng = np.random.default_rng(11)
    nb = (spec.modulus_bit_size - 2) // 8
    a = jnp.asarray(batch_int_to_limbs(
        [int.from_bytes(rng.bytes(nb), "little") for _ in range(n)],
        spec.n_limbs))
    b = jnp.asarray(batch_int_to_limbs(
        [int.from_bytes(rng.bytes(nb), "little") for _ in range(n)],
        spec.n_limbs))

    def chain(op, reps):
        @jax.jit
        def f(x, y):
            for _ in range(reps):
                x = op(x, y)
            return x
        state = {"x": a}

        def run():
            state["x"] = f(state["x"], b)
            return state["x"]
        dt = _time(run)
        return n * reps / dt

    report("bls12_381_fr_add_per_s", chain(lambda x, y: mont.add(spec, x, y), 16), "ops/s")
    report("bls12_381_fr_sub_per_s", chain(lambda x, y: mont.sub(spec, x, y), 16), "ops/s")
    report("bls12_381_fr_square_per_s", chain(lambda x, y: mont.square(spec, x), 8), "ops/s")

    # Production dispatch (ops/msm._batched_inv_fn): TPU routes batched
    # inversion to the ONE blocked Pallas kernel.  The associative-scan
    # form traces ~80 distinct-shape Pallas muls at 2^20 — ~0.5-1 min
    # EACH through a cold axon remote compiler (measured: >35 min, killed).
    from algebra_tpu import config as _cfg

    if _cfg.pallas_enabled():
        from algebra_tpu.ops import mont_pallas

        inv = jax.jit(lambda x: mont_pallas.batch_inverse(spec, x))
    else:
        inv = jax.jit(lambda x: mont.batch_inverse(spec, x, axis=0))
    dt = _time(lambda: inv(a))
    report("bls12_381_fr_batch_inverse_per_s", n / dt, "ops/s")

    from algebra_tpu.curves.instances.bls12_381 import Fr

    sq = mont.mul(spec, a, a)  # guaranteed QRs
    sqrt = jax.jit(lambda x: Fr.sqrt(x)[1])
    dt = _time(lambda: sqrt(sq))
    report("bls12_381_fr_sqrt_per_s", n / dt, "ops/s")


def bench_pairing(batches=(256, 4096)):
    import jax
    import jax.numpy as jnp

    from algebra_tpu.curves.instances import bls12_381

    ctx = bls12_381.pairing()
    g1, g2 = bls12_381.g1(), bls12_381.g2()
    for batch in batches:
        p = g1.to_affine(g1.generator((batch,)))
        q = g2.to_affine(g2.generator((batch,)))

        miller = jax.jit(lambda a, b: ctx.miller_loop(a, b))
        final = jax.jit(lambda f: ctx.final_exponentiation(f))
        prep = jax.jit(lambda b: ctx.prepare_g2(b))

        dt_m = _time(lambda: miller(p, q))
        f = miller(p, q)
        dt_f = _time(lambda: final(f))
        dt_p = _time(lambda: prep(q))
        sfx = f"_b{batch}" if batch != 256 else ""
        report(f"bls12_381_miller_loop_per_pair{sfx}_s", dt_m / batch, "s")
        report(f"bls12_381_final_exp_per_lane{sfx}_s", dt_f / batch, "s")
        report(f"bls12_381_pairing_per_pair{sfx}_s", (dt_m + dt_f) / batch, "s")
        report(f"bls12_381_g2_prepare_per_point{sfx}_s", dt_p / batch, "s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("what", nargs="?", default="all",
                    choices=["field", "fieldops", "ntt", "msm", "pairing",
                             "all"])
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a JAX profiler trace (xprof/tensorboard "
                         "format) of the benchmarked kernels into DIR")
    args = ap.parse_args()
    t0 = time.time()
    prof_ctx = None
    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)
        prof_ctx = args.profile
    if args.what in ("field", "all"):
        bench_field()
    if args.what in ("fieldops", "all"):
        bench_field_ops()
    if args.what in ("ntt", "all"):
        bench_ntt()
    if args.what in ("msm", "all"):
        bench_msm()
    if args.what in ("pairing", "all"):
        bench_pairing()
    if prof_ctx:
        import jax

        jax.profiler.stop_trace()
        print(f"# profiler trace written to {prof_ctx}", file=sys.stderr)
    print(f"# total {time.time()-t0:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
