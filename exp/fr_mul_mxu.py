"""MXU formulation probe for the Fr Montgomery multiply (VERDICT r4 #5).

The VPU sliding-window kernel does ~2L^2 = 512 u32 multiplies (plus
~4x that in mask/shift/add traffic) per 255-bit Montgomery mul at
7.6e8 muls/s.  The MXU is the chip's dominant silicon — can the limb
products ride it?

The only matmul-shaped decomposition of a*b with BOTH operands varying
per element is a per-element banded (Toeplitz) matrix:
    c[k] = sum_{i+j=k} a8[i] * b8[j]  =  (T(a8) @ b8)[k]
with 8-bit sub-limbs so products accumulate in int32 (63 * 255^2 < 2^31).
T(a8) is [63, 32] PER ELEMENT — the MXU sees batched 63x32 matvecs
(utilization <= (63/128)*(32/128) ~ 12%) and the Toeplitz build
materializes 2 KB/element of HBM traffic before any math happens.

This probe measures, on v5e:
  a) the FULL VPU Montgomery mul (mont_pallas.mul) — baseline
  b) peak dense int8 MXU rate via one big [M,K]x[K,N] dot (context)
  c) the Toeplitz column phase alone (build T + batched matvec),
     NOT including Montgomery reduction — if (c) alone loses to the
     complete (a), the MXU formulation is a no-go with numbers.

The go case the numbers leave open: sum-of-products against CONSTANT
coefficients (NTT radix-R DFT blocks, fixed-base tables), where the
matrix is shared across the batch and the MXU runs dense.

Usage: python exp/fr_mul_mxu.py [log_n]
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

    from algebra_tpu.bigint import batch_int_to_limbs
    from algebra_tpu.curves.instances.bls12_381 import fr_spec
    from algebra_tpu.ops import mont_pallas

    n = 1 << log_n
    L = fr_spec.n_limbs  # 16 x 16-bit limbs
    rng = np.random.default_rng(3)
    a = jnp.asarray(batch_int_to_limbs(
        [int.from_bytes(rng.bytes(31), "little") for _ in range(n)], L))
    b = jnp.asarray(batch_int_to_limbs(
        [int.from_bytes(rng.bytes(31), "little") for _ in range(n)], L))

    def bench(name, fn, *args, work=None, unit="mul"):
        j = jax.jit(fn)
        _sync(j(*args))
        t0 = time.perf_counter()
        reps = 4
        for _ in range(reps):
            out = j(*args)
        _sync(out)
        dt = (time.perf_counter() - t0) / reps
        rate = (work or n) / dt
        print(f"{name}: {dt*1e3:.2f} ms -> {rate:.3e} {unit}/s", flush=True)
        return dt

    # a) full VPU Montgomery mul
    def vpu_mul(a, b):
        return mont_pallas.mul(fr_spec, a, b)

    bench("a_vpu_mont_mul", vpu_mul, a, b)

    # b) dense int8 MXU context rate
    M, K, N = 4096, 512, 512
    x8 = jnp.asarray(rng.integers(-127, 127, (M, K), dtype=np.int8))
    w8 = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))

    def mxu_dense(x8, w8):
        return jax.lax.dot_general(
            x8, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    dt = bench("b_mxu_int8_dense", mxu_dense, x8, w8,
               work=2 * M * K * N, unit="int8-MAC")

    # c) Toeplitz column phase (per-element banded matmul), batch-first.
    # 7-bit sub-limbs so values fit SIGNED int8 (the MXU's 8-bit mode);
    # 37 sub-limbs cover 256 bits, 73 product columns, max column sum
    # 73 * 127^2 < 2^31.
    W7 = 7
    L7 = -(-16 * L // W7)  # 37
    cols = 2 * L7 - 1  # 73
    idx = np.zeros((cols, L7), np.int32)
    for k in range(cols):
        for i in range(L7):
            j = k - i
            idx[k, i] = j if 0 <= j < L7 else L7 + cols - 1  # pad slot
    idx_c = jnp.asarray(idx)

    def sublimbs7(x):
        # [L, n] 16-bit limbs -> [n, L7] 7-bit values (int8-safe)
        xt = jnp.concatenate([x, jnp.zeros((1, n), jnp.uint32)], axis=0)
        outs = []
        for j in range(L7):
            lo = j * W7
            k, off = lo // 16, lo % 16
            v = (xt[k] >> off) | jnp.where(
                off + W7 > 16, xt[min(k + 1, L)] << (16 - off),
                jnp.uint32(0))
            outs.append(v & 0x7F)
        return jnp.stack(outs, axis=1)  # [n, L7]

    def toeplitz_cols(a, b):
        a7 = sublimbs7(a)
        b7 = sublimbs7(b)
        a7p = jnp.pad(a7, ((0, 0), (0, cols)))  # pad slot reads 0
        T = a7p[:, idx_c]  # [n, 73, 37] the per-element banded matrix
        return jax.lax.dot_general(
            T.astype(jnp.int8), b7.astype(jnp.int8),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)  # [n, 73]

    bench("c_toeplitz_mxu_cols", toeplitz_cols, a, b)

    # sanity: columns reconstruct a*b
    got = np.asarray(jax.jit(toeplitz_cols)(a, b))[:4].astype(object)
    from algebra_tpu.bigint import limbs_to_int

    an = [limbs_to_int(np.asarray(a)[:, i]) for i in range(4)]
    bn = [limbs_to_int(np.asarray(b)[:, i]) for i in range(4)]
    for e in range(4):
        v = sum(int(got[e, k]) << (W7 * k) for k in range(cols))
        assert v == an[e] * bn[e], "toeplitz columns wrong"
    print("# toeplitz columns verified vs bigint product", flush=True)


if __name__ == "__main__":
    main(*[int(x) for x in sys.argv[1:]] or [20])
