"""Headline benchmark: BLS12-381 Fr Montgomery multiplication throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 1e8 Fr mults/s/chip.

Runs on whatever backend JAX_PLATFORMS selects (the driver provides the
real TPU chip).  Keep this file's default metric stable across rounds so
BENCH_r{N}.json stays comparable; secondary metrics can be printed to
stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np



def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/atc_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


_enable_compile_cache()

def main():
    import jax
    import jax.numpy as jnp

    from algebra_tpu.bigint import batch_int_to_limbs
    from algebra_tpu.curves.instances.bls12_381 import fr_spec
    from algebra_tpu.ops import mont

    n = 1 << 20
    # 8 chained muls per launch amortize dispatch (~3 ms via the axon
    # tunnel vs ~11 ms compute); reps=64 made the axon REMOTE COMPILE of
    # the chain program take >20 min — compile scales superlinearly in
    # call-site count, so keep the program small and loop on the host.
    reps = 8

    rng = np.random.default_rng(1234)
    # random field elements via rejection-free: random 252-bit ints < r
    xs = [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]
    ys = [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]
    a = jnp.asarray(batch_int_to_limbs(xs, fr_spec.n_limbs))
    b = jnp.asarray(batch_int_to_limbs(ys, fr_spec.n_limbs))

    @jax.jit
    def chain(a, b):
        x = a
        for _ in range(reps):
            x = mont.mul(fr_spec, x, b)
        return x

    out = chain(a, b)
    # compile + warm + sync.  The warmup MUST include the eager checksum
    # slice: out[:, 0] is its own XLA program, and an axon remote compile
    # inside the timed region costs ~0.5s (this was the whole "27%
    # regression" of rounds 2-3 — the kernel never slowed down).
    _ = int(np.asarray(jax.device_get(out[:, 0])).sum())

    iters = 32
    t0 = time.perf_counter()
    for _ in range(iters):
        out = chain(out, b)
    # sync via a tiny dependent fetch (64B) so tunnel transfer time of the
    # full array doesn't pollute the measurement
    checksum = int(np.asarray(jax.device_get(out[:, 0])).sum())
    dt = time.perf_counter() - t0

    mults_per_s = n * reps * iters / dt
    baseline = 1e8  # BASELINE.md north star: >= 10^8 Fr mults/s/chip
    print(
        json.dumps(
            {
                "metric": "bls12_381_fr_mont_mults_per_s",
                "value": mults_per_s,
                "unit": "mults/s/chip",
                "vs_baseline": mults_per_s / baseline,
            }
        )
    )
    print(
        f"# backend={jax.default_backend()} n={n} reps={reps} iters={iters} "
        f"dt={dt:.4f}s checksum={checksum}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
