"""Staged radix-2 NTT butterflies and power tables (pure jnp kernels).

TPU-native equivalent of the reference's radix-2 FFT engine
(poly/src/domain/radix2/fft.rs:22-366).  Instead of recursive/chunked
butterflies with rayon, each stage is one full-width vector operation over
the batched limb arrays: at stage s the coefficient axis is reshaped to
(n/m, m) and the m/2-wide butterfly applies to all rows at once.  The
twiddle tables are built *on device* by repeated doubling (log n fused
multiplies) — no host big-int loops at 2^24 scale.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..fields.spec import FieldSpec
from . import mont


def bit_reverse_indices(n: int) -> np.ndarray:
    """Host-side bit-reversal permutation table for size n = 2^k."""
    k = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev.astype(np.int32)


def powers_from_int(spec: FieldSpec, base: int, n: int) -> jnp.ndarray:
    """[n, L] table of base^i (Montgomery form) via device-side doubling.

    Each round doubles the table length with one batched multiply by the
    host-computed constant base^(2^k); log2(n) multiplies total.
    """
    from ..bigint import int_to_limbs

    p = spec.modulus
    table = jnp.asarray(int_to_limbs(spec.to_mont(1), spec.n_limbs), jnp.uint32)[
        None, :
    ]
    k = 1
    while k < n:
        factor_int = pow(base, k, p)
        factor = jnp.asarray(
            int_to_limbs(spec.to_mont(factor_int), spec.n_limbs), jnp.uint32
        )
        table = jnp.concatenate([table, mont.mul(spec, table, factor[None, :])], axis=0)
        k *= 2
    return table[:n]


def powers_from_device(spec: FieldSpec, base: jnp.ndarray, n: int) -> jnp.ndarray:
    """[n, L] table of base^i for a *traced* base value (same doubling)."""
    one = jnp.asarray(spec.one_mont_limbs, jnp.uint32)[None, :]
    table = one
    factor = base[None, :] if base.ndim == 1 else base
    k = 1
    while k < n:
        table = jnp.concatenate([table, mont.mul(spec, table, factor)], axis=0)
        factor = mont.square(spec, factor)
        k *= 2
    return table[:n]


def powers_from_device_batch(spec: FieldSpec, bases: jnp.ndarray, n: int) -> jnp.ndarray:
    """[R, L] traced bases -> [R, n, L] tables with table[r, i] = bases[r]^i
    (per-row doubling; used by the sharded four-step NTT twiddle)."""
    R = bases.shape[0]
    one = jnp.broadcast_to(
        jnp.asarray(spec.one_mont_limbs, jnp.uint32), (R, 1, spec.n_limbs)
    )
    table = one
    factor = bases[:, None, :]
    k = 1
    while k < n:
        table = jnp.concatenate(
            [table, mont.mul(spec, table, factor)], axis=1
        )
        factor = mont.square(spec, factor)
        k *= 2
    return table[:, :n]


def fft_stages(spec: FieldSpec, x: jnp.ndarray, roots: jnp.ndarray) -> jnp.ndarray:
    """In-place-order DIT butterflies; x must already be bit-reversed.

    x: uint32[..., n, L]; roots: uint32[n/2, L] table of omega^j.
    Stage s uses the stride-(n/m) subsample of the root table.

    On TPU each stage runs as ONE fused Pallas kernel (twiddle multiply +
    modular add/sub with in-register carries) — ~3 HBM passes per stage
    instead of the ~15 the composed jnp ops cost.
    """
    from .. import config

    n = x.shape[-2]
    L = x.shape[-1]
    log_n = n.bit_length() - 1
    shape = x.shape
    total = 1
    for d in shape[:-1]:
        total *= d
    use_pallas = config.pallas_enabled() and total // 2 >= config.pallas_min_batch

    if use_pallas and len(shape) == 2 and n > (1 << 22):
        # Very large transforms: XOR-pairing formulation — every stage
        # works on flat [n, L] arrays with device-computed indices, so no
        # [G, m, L] reshape temporaries (whose lane padding makes XLA
        # allocate 8-16x the logical size and OOMs HBM at 2^24).  Slower
        # per element than the reshape path (two gathers per stage) but
        # memory-bounded.
        from . import mont_pallas

        idx = jnp.arange(n, dtype=jnp.int32)
        for s in range(1, log_n + 1):
            m = 1 << s
            half = m >> 1
            j = idx & (m - 1)
            partner = jnp.take(x, idx ^ half, axis=0)
            w_idx = (j & (half - 1)) * (n // m)
            w_full = jnp.take(roots, w_idx, axis=0)
            x = mont_pallas.xor_butterfly(spec, x, partner, w_full, half)
        return x

    if use_pallas and len(shape) == 2:
        # fused butterfly-stage kernels over the reshaped lo/hi halves
        from . import mont_pallas

        for s in range(1, log_n + 1):
            m = 1 << s
            half = m >> 1
            w = roots[:: n // m] if m < n else roots  # [half, L]
            xv = x.reshape((-1, m, L))
            lo = xv[:, :half].reshape(-1, L)
            hi = xv[:, half:].reshape(-1, L)
            olo, ohi = mont_pallas.butterfly_stage(spec, lo, hi, w)
            x = jnp.concatenate(
                [olo.reshape(-1, half, L), ohi.reshape(-1, half, L)], axis=1
            ).reshape(shape)
        return x

    for s in range(1, log_n + 1):
        m = 1 << s
        half = m >> 1
        w = roots[:: n // m] if m < n else roots  # [half, L]
        xv = x.reshape((-1, m, L))
        lo = xv[:, :half]
        hi = xv[:, half:]
        t = mont.mul(spec, hi, w)
        x = jnp.concatenate(
            [mont.add(spec, lo, t), mont.sub(spec, lo, t)], axis=1
        ).reshape(shape)
    return x


def fft(spec: FieldSpec, coeffs: jnp.ndarray, roots: jnp.ndarray,
        bitrev: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT, natural-order in and out."""
    x = jnp.take(coeffs, bitrev, axis=-2)
    return fft_stages(spec, x, roots)


def scale(spec: FieldSpec, x: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Pointwise multiply coefficients by a per-index table
    (the reference's distribute_powers, poly/src/domain/mod.rs:130-147)."""
    return mont.mul(spec, x, table)
