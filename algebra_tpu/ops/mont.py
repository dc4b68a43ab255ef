"""Batched multi-limb Montgomery arithmetic in pure jnp (uint32 lanes).

This module is the TPU-native equivalent of the reference's field-arithmetic
hot path — the CIOS Montgomery multiplier and its x86_64 asm specialization
(reference: ff/src/fields/models/fp/montgomery_backend.rs:148-293 and
ff-asm/src/lib.rs:51).  Instead of scalar 64x64->128 carry chains, elements
are arrays of 16-bit limbs held in uint32 lanes (last axis = limbs,
little-endian), and every operation is vectorized over arbitrary leading
batch dimensions: one TPU vector op processes 8x128 field elements' worth
of limbs at once.  Products of 16-bit limbs fit uint32 exactly, and column
accumulators stay far below 2^32 (<= ~2^23 for 768-bit fields), so carries
are resolved *lazily* — once per multiplication, not per partial product.

Everything here is also valid on the CPU backend (tests) and is written so
XLA can fuse the unrolled limb loops into a few big vector ops.  A Pallas
version of the multiplier lives in ops/mont_pallas.py and is numerically
identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..bigint import LIMB_BITS, LIMB_MASK
from ..fields.spec import FieldSpec

_MASK = np.uint32(LIMB_MASK)
_U32 = jnp.uint32


def _const(arr) -> jnp.ndarray:
    return jnp.asarray(arr, dtype=_U32)


# ---------------------------------------------------------------------------
# carry / borrow primitives
# ---------------------------------------------------------------------------


def _propagate(cols: jnp.ndarray):
    """Normalize a column vector to 16-bit limbs; return (limbs, carry).

    ``cols`` holds per-column accumulators (< 2^31).  Sequential carry
    ripple over the (static) limb axis; each step is a full-batch vector op.
    """
    K = cols.shape[-1]
    out = []
    carry = jnp.zeros(cols.shape[:-1], dtype=_U32)
    for k in range(K):
        v = cols[..., k] + carry
        out.append(v & _MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(out, axis=-1), carry


def _add_limbs(a: jnp.ndarray, b: jnp.ndarray):
    """(a + b) over 16-bit limbs -> (sum limbs, carry in {0,1})."""
    return _propagate(a + b)


def _sub_limbs(a: jnp.ndarray, b: jnp.ndarray):
    """(a - b) over 16-bit limbs -> (difference limbs, borrow in {0,1})."""
    L = a.shape[-1]
    out = []
    borrow = jnp.zeros(a.shape[:-1], dtype=_U32)
    for k in range(L):
        # uint32 wrap-around: if the true difference is negative the high
        # half of d is all ones, so (d >> 16) & 1 == 1 exactly on borrow.
        d = a[..., k] - b[..., k] - borrow
        out.append(d & _MASK)
        borrow = (d >> LIMB_BITS) & np.uint32(1)
    return jnp.stack(out, axis=-1), borrow


def _cond_sub_modulus(spec: FieldSpec, x: jnp.ndarray, carry: jnp.ndarray):
    """Return x - p if (carry:x) >= p else x, for (carry:x) < 2p."""
    p = _const(spec.p_limbs)
    d, borrow = _sub_limbs(x, jnp.broadcast_to(p, x.shape))
    ge = jnp.logical_or(carry.astype(bool), jnp.logical_not(borrow.astype(bool)))
    return jnp.where(ge[..., None], d, x)


# ---------------------------------------------------------------------------
# ring operations (inputs/outputs: uint32[..., L], Montgomery form, < p)
# ---------------------------------------------------------------------------


def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    s, carry = _add_limbs(a, b)
    return _cond_sub_modulus(spec, s, carry)


def double(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return add(spec, a, a)


def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d, borrow = _sub_limbs(a, b)
    p = jnp.broadcast_to(_const(spec.p_limbs), d.shape)
    d_plus_p, _ = _add_limbs(d, p)
    return jnp.where(borrow[..., None].astype(bool), d_plus_p, d)


def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    p = jnp.broadcast_to(_const(spec.p_limbs), a.shape)
    d, _ = _sub_limbs(p, a)
    return jnp.where(is_zero(spec, a)[..., None], a, d)


def is_zero(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def equal(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise select over the batch: mask broadcast across limbs."""
    return jnp.where(mask[..., None], a, b)


def mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a * b * R^-1 mod p.

    Column-accumulating schoolbook product with interleaved Montgomery
    reduction — semantically the reference's no-carry CIOS
    (montgomery_backend.rs:148-215) but with all carries deferred into
    32-bit column accumulators (lazy reduction), which is the natural
    formulation for 16-bit limbs on 32-bit vector lanes.
    """
    L = spec.n_limbs
    a, b = jnp.broadcast_arrays(a, b)
    batch = a.shape[:-1]
    p = _const(spec.p_limbs)
    inv = np.uint32(spec.inv16)

    cols = jnp.zeros(batch + (2 * L + 1,), dtype=_U32)
    # accumulate partial products
    for i in range(L):
        prod = a[..., i : i + 1] * b  # exact: (2^16-1)^2 < 2^32
        cols = cols.at[..., i : i + L].add(prod & _MASK)
        cols = cols.at[..., i + 1 : i + L + 1].add(prod >> LIMB_BITS)
    # interleaved Montgomery reduction, one limb at a time
    for i in range(L):
        m = ((cols[..., i] & _MASK) * inv) & _MASK
        mp = m[..., None] * p
        cols = cols.at[..., i : i + L].add(mp & _MASK)
        cols = cols.at[..., i + 1 : i + L + 1].add(mp >> LIMB_BITS)
        cols = cols.at[..., i + 1].add(cols[..., i] >> LIMB_BITS)
    res, carry = _propagate(cols[..., L : 2 * L + 1])
    carry = carry + res[..., L]  # top column folds into the carry bit
    return _cond_sub_modulus(spec, res[..., :L], carry)


def square(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    # TODO(perf): dedicated squaring saves ~half the partial products.
    return mul(spec, a, a)


def to_mont(spec: FieldSpec, x: jnp.ndarray) -> jnp.ndarray:
    """Canonical limbs -> Montgomery form (multiply by R^2)."""
    return mul(spec, x, jnp.broadcast_to(_const(spec.r2_limbs), x.shape))


def from_mont(spec: FieldSpec, x: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> canonical limbs (multiply by 1 = reduce)."""
    return mul(spec, x, jnp.broadcast_to(_const(spec.unit_limbs), x.shape))


# ---------------------------------------------------------------------------
# exponentiation / inversion
# ---------------------------------------------------------------------------


def pow_fixed(spec: FieldSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a host-constant exponent, via an on-device bit scan.

    Square-and-multiply MSB-first (reference: ff/src/fields/mod.rs:280-291),
    expressed as a lax.scan so the compiled program stays small even for
    field-sized exponents.
    """
    e = int(e)
    if e < 0:
        raise ValueError("negative exponents not supported; invert first")
    one = jnp.broadcast_to(_const(spec.one_mont_limbs), a.shape)
    if e == 0:
        return one
    nbits = e.bit_length()
    if nbits <= 4:  # tiny exponents: unroll
        res = one
        for bit in bin(e)[2:]:
            res = square(spec, res)
            if bit == "1":
                res = mul(spec, res, a)
        return res
    bits = jnp.asarray(
        [(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.bool_
    )

    def body(res, bit):
        res = square(spec, res)
        res = select(
            jnp.broadcast_to(bit, res.shape[:-1]), mul(spec, res, a), res
        )
        return res, None

    res, _ = jax.lax.scan(body, one, bits)
    return res


def inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-form inverse via Fermat's little theorem.

    The reference uses a variable-time binary EEA
    (montgomery_backend.rs:295-355); constant-shape exponentiation is the
    right trade on TPU (no data-dependent control flow).  inv(0) = 0.
    """
    return pow_fixed(spec, a, spec.modulus - 2)


def batch_inverse(spec: FieldSpec, a: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Batched inversion via Montgomery's trick (one inversion total).

    Parallel formulation of the reference's ``batch_inversion``
    (ff/src/fields/mod.rs:313-375): prefix and suffix running products via
    work-efficient associative scans, then inv_i = prefix_{i-1} *
    suffix_{i+1} * (prod all)^-1.  Zero entries map to zero.
    """
    if axis != 0:
        a = jnp.moveaxis(a, axis, 0)
    zero_mask = is_zero(spec, a)
    one = jnp.broadcast_to(_const(spec.one_mont_limbs), a.shape)
    safe = jnp.where(zero_mask[..., None], one, a)

    mul_fn = lambda x, y: mul(spec, x, y)
    prefix = jax.lax.associative_scan(mul_fn, safe, axis=0)
    suffix = jax.lax.associative_scan(mul_fn, safe, axis=0, reverse=True)
    total_inv = inv(spec, prefix[-1])

    n = a.shape[0]
    left = jnp.concatenate([one[:1], prefix[: n - 1]], axis=0)
    right = jnp.concatenate([suffix[1:], one[:1]], axis=0)
    out = mul(spec, mul(spec, left, right), total_inv[None])
    out = jnp.where(zero_mask[..., None], jnp.zeros_like(out), out)
    if axis != 0:
        out = jnp.moveaxis(out, 0, axis)
    return out


def sum_of_products(spec: FieldSpec, a_list, b_list) -> jnp.ndarray:
    """sum_i a_i * b_i (reference: ff/src/fields/mod.rs sum_of_products).

    v1: fold of full Montgomery products.  TODO(perf): share the single
    final reduction across terms (the reference's interleaved formulation).
    """
    acc = None
    for a, b in zip(a_list, b_list):
        t = mul(spec, a, b)
        acc = t if acc is None else add(spec, acc, t)
    return acc


def mul_by_u32(spec: FieldSpec, a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Multiply by a small host constant via double-and-add."""
    k = int(k)
    if k == 0:
        return jnp.zeros_like(a)
    bits = bin(k)[2:]
    res = a
    for bit in bits[1:]:
        res = add(spec, res, res)
        if bit == "1":
            res = add(spec, res, a)
    return res
