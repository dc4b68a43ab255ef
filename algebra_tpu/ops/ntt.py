"""Staged radix-2 NTT butterflies and power tables (pure jnp kernels).

TPU-native equivalent of the reference's radix-2 FFT engine
(poly/src/domain/radix2/fft.rs:22-366).  Instead of recursive/chunked
butterflies with rayon, each stage is one full-width vector operation over
the batched limb arrays.

Layout: limb-major — coefficient arrays are uint32[L, ..., n] with the
coefficient index on the MINOR axis (TPU lanes), so a 2^24-point Fr array
is 1 GiB of HBM with zero tile padding (the round-1 [n, L] layout padded
8x and OOM'd the flagship size).

Two formulations:

  * ``fft_stages`` — classic in-order DIT over the trailing axis.  Fine on
    CPU and for small transforms, but stage s materializes [L, n/m, m]
    temporaries whose minor axis m is tiny in early stages (lane padding
    on TPU).
  * ``fft_four_step`` — Bailey decomposition n = n1*n2 (the same algebra
    as parallel/ntt_sharded.py, intra-chip): column FFTs along MAJOR axes
    with the other factor riding the lanes, one twiddle multiply, one
    [n1, n2] transpose.  Every materialized array keeps a >= 128-wide
    minor axis, so the TPU path is padding-free at every stage.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..fields.spec import FieldSpec
from . import mont

_FOUR_STEP_MIN = 1 << 15  # below this the plain path is fine everywhere


def bit_reverse_indices(n: int) -> np.ndarray:
    """Host-side bit-reversal permutation table for size n = 2^k."""
    k = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev.astype(np.int32)


def powers_from_int(spec: FieldSpec, base: int, n: int) -> jnp.ndarray:
    """[L, n] table of base^i (Montgomery form) via device-side doubling.

    Each round doubles the table length with one batched multiply by the
    host-computed constant base^(2^k); log2(n) multiplies total.
    """
    from ..bigint import int_to_limbs

    p = spec.modulus
    table = jnp.asarray(int_to_limbs(spec.to_mont(1), spec.n_limbs), jnp.uint32)[
        :, None
    ]
    k = 1
    while k < n:
        factor_int = pow(base, k, p)
        factor = jnp.asarray(
            int_to_limbs(spec.to_mont(factor_int), spec.n_limbs), jnp.uint32
        )
        table = jnp.concatenate(
            [table, mont.mul(spec, table, factor[:, None])], axis=1
        )
        k *= 2
    return table[:, :n]


def powers_from_device(spec: FieldSpec, base: jnp.ndarray, n: int) -> jnp.ndarray:
    """[L, n] table of base^i for a *traced* base value (same doubling)."""
    one = jnp.asarray(spec.one_mont_limbs, jnp.uint32)[:, None]
    table = one
    factor = base[:, None] if base.ndim == 1 else base
    k = 1
    while k < n:
        table = jnp.concatenate([table, mont.mul(spec, table, factor)], axis=1)
        factor = mont.square(spec, factor)
        k *= 2
    return table[:, :n]


def powers_from_device_batch(spec: FieldSpec, bases: jnp.ndarray, n: int) -> jnp.ndarray:
    """[L, R] traced bases -> [L, R, n] tables with table[:, r, i] =
    bases[r]^i (per-row doubling; used by the sharded four-step NTT)."""
    R = bases.shape[1]
    one = mont.bconst(spec.one_mont_limbs, (R, 1))
    table = one
    factor = bases[:, :, None]
    k = 1
    while k < n:
        table = jnp.concatenate([table, mont.mul(spec, table, factor)], axis=2)
        factor = mont.square(spec, factor)
        k *= 2
    return table[:, :, :n]


def fft_stages(spec: FieldSpec, x: jnp.ndarray, roots: jnp.ndarray,
               start_stage: int = 1) -> jnp.ndarray:
    """In-place-order DIT butterflies; x must already be bit-reversed.

    x: uint32[L, ..., n]; roots: uint32[L, n/2] table of omega^j.
    Stage s uses the stride-(n/m) subsample of the root table.
    ``start_stage`` resumes mid-pipeline (the degree-aware path skips the
    stages a zero-padded input renders trivial).
    """
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    shape = x.shape

    for s in range(start_stage, log_n + 1):
        m = 1 << s
        half = m >> 1
        w = roots[:, :: n // m] if m < n else roots  # [L, half]
        xv = x.reshape(shape[:-1] + (n // m, m))
        lo = xv[..., :half]
        hi = xv[..., half:]
        t = mont.mul(spec, hi, mont.expand(w, xv.ndim - 1))
        x = jnp.concatenate(
            [mont.add(spec, lo, t), mont.sub(spec, lo, t)], axis=-1
        ).reshape(shape)
    return x


def fft_stages_major(spec: FieldSpec, x: jnp.ndarray,
                     roots: jnp.ndarray) -> jnp.ndarray:
    """DIT butterflies along AXIS 1 of x: uint32[L, n1, B]; x must already
    be bit-reversed along axis 1.  roots: [L, n1/2].  The batch axis B
    stays minor throughout, so every temporary is lane-full on TPU.

    On TPU each stage runs as one fused Pallas butterfly kernel over the
    flattened [L, G*half*B] halves with the twiddle expanded to its
    period (half*B)."""
    from .. import config

    L, n1, Bdim = x.shape
    log_n = n1.bit_length() - 1
    use_pallas = (
        config.pallas_enabled()
        and (n1 * Bdim) // 2 >= config.pallas_min_batch
    )

    for s in range(1, log_n + 1):
        m = 1 << s
        half = m >> 1
        w = roots[:, :: n1 // m] if m < n1 else roots  # [L, half]
        xv = x.reshape(L, n1 // m, m, Bdim)
        lo = xv[:, :, :half]
        hi = xv[:, :, half:]
        if use_pallas:
            from . import mont_pallas

            w_exp = jnp.repeat(w, Bdim, axis=1)  # [L, half*B], period
            olo, ohi = mont_pallas.butterfly_stage(
                spec,
                lo.reshape(L, -1),
                hi.reshape(L, -1),
                w_exp,
            )
            lo_t = olo.reshape(lo.shape)
            hi_t = ohi.reshape(hi.shape)
        else:
            t = mont.mul(spec, hi, w[:, None, :, None])
            lo_t = mont.add(spec, lo, t)
            hi_t = mont.sub(spec, lo, t)
        x = jnp.concatenate([lo_t, hi_t], axis=2).reshape(L, n1, Bdim)
    return x


def _split_sizes(n: int):
    """n = n1 * n2 with n1 <= n2, both powers of two."""
    log_n = n.bit_length() - 1
    l1 = log_n // 2
    return 1 << l1, 1 << (log_n - l1)


def fft_four_step(spec: FieldSpec, coeffs: jnp.ndarray,
                  roots: jnp.ndarray) -> jnp.ndarray:
    """Natural-order forward NTT via the Bailey four-step decomposition.

    coeffs: uint32[L, n]; roots: [L, n/2] powers of the transform root w.
    X[k1 + n1*k2] = FFT_n2 over i2 of ( w^(k1*i2) * FFT_n1 over i1 )
    with x laid out as [n1, n2] (i = i1*n2 + i2).
    """
    L, n = coeffs.shape
    n1, n2 = _split_sizes(n)
    half = n // 2

    x = coeffs.reshape(L, n1, n2)

    # --- step 1: length-n1 FFT down the columns (root w^n2)
    br1 = jnp.asarray(bit_reverse_indices(n1))
    x = jnp.take(x, br1, axis=1)
    x = fft_stages_major(spec, x, roots[:, ::n2][:, : n1 // 2])

    # --- step 2: twiddle by w^(k1*i2); exponents reduced mod n with
    # w^(j + n/2) = -w^j so the existing [L, n/2] table suffices.
    k1 = np.arange(n1, dtype=np.int64)[:, None]
    i2 = np.arange(n2, dtype=np.int64)[None, :]
    e = (k1 * i2) % n
    sign_flip = e >= half
    e_lo = jnp.asarray(np.where(sign_flip, e - half, e).astype(np.int32))
    tw = jnp.take(roots, e_lo.reshape(-1), axis=1).reshape(L, n1, n2)
    tw = jnp.where(jnp.asarray(sign_flip), mont.neg(spec, tw), tw)
    x = mont.mul(spec, x, tw)

    # --- step 3: transpose so the i2-transform runs along a major axis
    x = jnp.transpose(x, (0, 2, 1))  # [L, n2, n1]

    # --- step 4: length-n2 FFT down the columns (root w^n1)
    br2 = jnp.asarray(bit_reverse_indices(n2))
    x = jnp.take(x, br2, axis=1)
    x = fft_stages_major(spec, x, roots[:, ::n1][:, : n2 // 2])

    # output element [k2, k1] is X[k1 + n1*k2]: flat row-major == natural
    return x.reshape(L, n)


def fft(spec: FieldSpec, coeffs: jnp.ndarray, roots: jnp.ndarray,
        bitrev: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT, natural-order in and out."""
    n = coeffs.shape[-1]
    if coeffs.ndim == 2 and n >= _FOUR_STEP_MIN:
        return fft_four_step(spec, coeffs, roots)
    x = jnp.take(coeffs, bitrev, axis=-1)
    return fft_stages(spec, x, roots)


def fft_degree_aware(spec: FieldSpec, coeffs: jnp.ndarray, n: int,
                     roots: jnp.ndarray) -> jnp.ndarray:
    """Size-n forward NTT of a degree-< d polynomial given only its d
    coefficients (d a power of two, d < n): O(n log d) instead of
    O(n log n).

    TPU-native form of the reference's degree-aware FFT
    (poly/src/domain/radix2/fft.rs:22-67, from libiop): with the input
    zero beyond d, the first log(n/d) DIT stages of the bit-reversed
    array merely broadcast each nonzero value across its length-(n/d)
    block (the DFT of (x, 0, .., 0) is constant x).  So: bit-reverse the
    d real coefficients, repeat each n/d times, and resume the butterfly
    pipeline at stage log(n/d)+1.

    coeffs: uint32[L, ..., d]; roots: [L, n/2] over the size-n root.
    """
    d = coeffs.shape[-1]
    if d & (d - 1) or n % d:
        raise ValueError("degree-aware fft needs power-of-two d | n")
    if d == n:
        return fft(spec, coeffs, roots, jnp.asarray(bit_reverse_indices(n)))
    stride = n // d

    if coeffs.ndim == 2 and n >= _FOUR_STEP_MIN:
        n1, n2 = _split_sizes(n)
        if d <= n2:
            return _four_step_low_degree(spec, coeffs, n1, n2, roots)

    x = jnp.take(coeffs, jnp.asarray(bit_reverse_indices(d)), axis=-1)
    x = jnp.repeat(x, stride, axis=-1)
    return fft_stages(spec, x, roots,
                      start_stage=stride.bit_length())  # log2(stride)+1


def _four_step_low_degree(spec: FieldSpec, coeffs: jnp.ndarray, n1: int,
                          n2: int, roots: jnp.ndarray) -> jnp.ndarray:
    """Four-step NTT when every nonzero coefficient sits in row i1 = 0 of
    the [n1, n2] layout (d <= n2): the column FFTs of step 1 reduce to a
    broadcast of row 0, so only the twiddle and the length-n2 transforms
    remain — O(n log n2) with the same lane-full temporaries."""
    L, d = coeffs.shape
    n = n1 * n2
    half = n // 2
    row0 = coeffs if d == n2 else jnp.pad(coeffs, [(0, 0), (0, n2 - d)])

    # step 1 (broadcast) fused into step 2's twiddle gather: the
    # "column FFT" output is row0 at every k1.
    k1 = np.arange(n1, dtype=np.int64)[:, None]
    i2 = np.arange(n2, dtype=np.int64)[None, :]
    e = (k1 * i2) % n
    sign_flip = e >= half
    e_lo = jnp.asarray(np.where(sign_flip, e - half, e).astype(np.int32))
    tw = jnp.take(roots, e_lo.reshape(-1), axis=1).reshape(L, n1, n2)
    tw = jnp.where(jnp.asarray(sign_flip), mont.neg(spec, tw), tw)
    x = mont.mul(spec, jnp.broadcast_to(row0[:, None, :], (L, n1, n2)), tw)

    x = jnp.transpose(x, (0, 2, 1))  # [L, n2, n1]
    br2 = jnp.asarray(bit_reverse_indices(n2))
    x = jnp.take(x, br2, axis=1)
    x = fft_stages_major(spec, x, roots[:, ::n1][:, : n2 // 2])
    return x.reshape(L, n)


def scale(spec: FieldSpec, x: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Pointwise multiply coefficients by a per-index table
    (the reference's distribute_powers, poly/src/domain/mod.rs:130-147)."""
    return mont.mul(spec, x, table)
