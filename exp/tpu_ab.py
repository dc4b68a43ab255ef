"""TPU A/B harness — run the moment the axon tunnel is back.

Measures, on the real chip:
  1. MSM 2^16/2^20 with (a) sw_pallas fused group-law kernels (current
     default for big prime-field batches) vs (b) the dot-wave fused jnp
     path (config.pallas disabled for the group law), same inputs.
  2. The bucket-round gather in isolation (row-major [n, L] copy vs
     limb-major column gather) at MSM-realistic shapes.
  3. Fr/Fq Pallas mul throughput (sanity vs BENCH_r01's 3.7e8/1.95e8).

Usage:  python exp/tpu_ab.py [msm|gather|field|all]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _sync(x):
    import jax

    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:4]))


def _time(fn, iters=3):
    _sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters


def report(metric, value, unit="s"):
    print(json.dumps({"metric": metric, "value": value, "unit": unit}),
          flush=True)


def _msm_inputs(log_n):
    import random

    import jax
    import jax.numpy as jnp

    from algebra_tpu.bigint import batch_int_to_limbs
    from algebra_tpu.curves.instances import bls12_381

    curve = bls12_381.g1()
    n = 1 << log_n
    hrng = random.Random(1234)
    host_pts = curve.random_host(hrng, 256)
    aff256 = curve.from_host(host_pts)
    reps = n // 256
    aff = (
        jnp.tile(aff256[0], (1, reps)),
        jnp.tile(aff256[1], (1, reps)),
        jnp.tile(aff256[2], (reps,)),
    )
    rng = np.random.default_rng(9)
    sc = jnp.asarray(batch_int_to_limbs(
        [int.from_bytes(rng.bytes(40), "little") % bls12_381.R
         for _ in range(n)],
        bls12_381.fr_spec.n_limbs))
    return curve, aff, sc


def ab_msm(log_sizes=(16, 20)):
    import jax

    from algebra_tpu import config
    from algebra_tpu.ops import msm as msm_mod

    for log_n in log_sizes:
        curve, aff, sc = _msm_inputs(log_n)
        for label, pallas_on in (("sw_pallas", True), ("dot_waves", False)):
            saved = config.pallas_min_batch
            try:
                if not pallas_on:
                    config.pallas_min_batch = 1 << 62  # force jnp dot path
                f = jax.jit(lambda b, s: msm_mod.msm(curve, b, s))
                dt = _time(lambda: f(aff, sc), iters=2)
                report(f"msm_2e{log_n}_{label}_s", dt)
            except Exception as e:  # noqa: BLE001
                print(f"# msm 2^{log_n} {label} failed: {e!r}",
                      file=sys.stderr)
            finally:
                config.pallas_min_batch = saved


def ab_gather(log_n=20, c=13):
    import jax
    import jax.numpy as jnp

    curve, aff, _ = _msm_inputs(log_n)
    n = 1 << log_n
    W = -(-255 // c)
    B = 1 << (c - 1)
    rng = np.random.default_rng(4)
    idx = jnp.asarray(rng.integers(0, n, size=(W, B), dtype=np.int64))
    x = aff[0]

    xrow = x.T  # [n, L]
    f_row = jax.jit(lambda xr, i: jnp.moveaxis(xr[i], -1, 0))
    f_col = jax.jit(lambda xc, i: xc[:, i])
    report(f"gather_rowmajor_2e{log_n}_s", _time(lambda: f_row(xrow, idx), 10))
    report(f"gather_limbmajor_2e{log_n}_s", _time(lambda: f_col(x, idx), 10))


def ab_field():
    import jax
    import jax.numpy as jnp

    from algebra_tpu.bigint import batch_int_to_limbs
    from algebra_tpu.curves.instances.bls12_381 import fq_spec, fr_spec
    from algebra_tpu.ops import mont_pallas

    rng = np.random.default_rng(7)
    n = 1 << 20
    for spec, name in ((fr_spec, "fr"), (fq_spec, "fq")):
        nb = (spec.modulus_bit_size - 2) // 8
        a = jnp.asarray(batch_int_to_limbs(
            [int.from_bytes(rng.bytes(nb), "little") for _ in range(n)],
            spec.n_limbs))

        @jax.jit
        def chain(a):
            x = a
            for _ in range(16):
                x = mont_pallas.mul(spec, x, a)
            return x

        dt = _time(lambda: chain(a))
        report(f"{name}_pallas_mults_per_s", n * 16 / dt, "mults/s")


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("field", "all"):
        ab_field()
    if what in ("gather", "all"):
        ab_gather()
    if what in ("msm", "all"):
        ab_msm()


if __name__ == "__main__":
    main()
