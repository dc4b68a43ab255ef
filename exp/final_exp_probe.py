"""Phase probe for the BLS12-381 final exponentiation at batch 256:
easy part (incl. the Fp12 inversion), one cyclotomic square, one
_exp_by_x chain, one full Fp12 mul, frobenius — each timed as its own
jit so the per-phase cost is visible.

Usage: python exp/final_exp_probe.py [batch]
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


def _time(fn, *args, iters=3):
    _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main(batch=256):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/atc_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from algebra_tpu.curves.instances import bls12_381

    ctx = bls12_381.pairing()
    g1, g2 = bls12_381.g1(), bls12_381.g2()
    F12 = ctx.fq12

    p = g1.to_affine(g1.generator((batch,)))
    q = g2.to_affine(g2.generator((batch,)))
    f = jax.jit(lambda a, b: ctx.miller_loop(a, b))(p, q)
    _sync(f)

    t_easy = _time(jax.jit(lambda x: ctx._easy_part(x)), f)
    print(f"easy part (incl Fp12 inverse): {t_easy*1e3:.2f} ms")

    t_sq = _time(jax.jit(lambda x: F12.cyclotomic_square(x)), f)
    print(f"one cyclotomic_square:         {t_sq*1e3:.3f} ms")

    t_mul = _time(jax.jit(lambda x: F12.mul(x, x)), f)
    print(f"one full Fp12 mul:             {t_mul*1e3:.3f} ms")

    t_inv = _time(jax.jit(lambda x: F12.inverse(x)), f)
    print(f"one Fp12 inverse:              {t_inv*1e3:.2f} ms")

    t_cyc_inv = _time(jax.jit(lambda x: F12.cyclotomic_inverse(x)), f)
    print(f"one cyclotomic_inverse:        {t_cyc_inv*1e3:.3f} ms")

    t_frob = _time(jax.jit(lambda x: F12.frobenius(x, 1)), f)
    print(f"one frobenius:                 {t_frob*1e3:.3f} ms")

    t_expx = _time(jax.jit(lambda x: ctx._exp_by_x(x)), f)
    print(f"one _exp_by_x (64-bit x):      {t_expx*1e3:.2f} ms")

    t_full = _time(jax.jit(lambda x: ctx.final_exponentiation(x)), f)
    print(f"FULL final_exponentiation:     {t_full*1e3:.2f} ms")
    print(f"  = easy + 5*expx + ~10 mul/sq accounting: "
          f"{(t_easy + 5*t_expx + 10*t_mul)*1e3:.2f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
