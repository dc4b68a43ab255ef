"""Batched multi-limb Montgomery arithmetic in pure jnp (uint32 lanes).

This module is the TPU-native equivalent of the reference's field-arithmetic
hot path — the CIOS Montgomery multiplier and its x86_64 asm specialization
(reference: ff/src/fields/models/fp/montgomery_backend.rs:148-293 and
ff-asm/src/lib.rs:51).  Instead of scalar 64x64->128 carry chains, elements
are arrays of 16-bit limbs held in uint32 lanes, and every operation is
vectorized over arbitrary batch dimensions.  Products of 16-bit limbs fit
uint32 exactly, and column accumulators stay far below 2^32 (<= ~2^23 for
768-bit fields), so carries are resolved *lazily* — once per
multiplication, not per partial product.

Layout: **limb-major** — element batches are ``uint32[L, *batch]`` with the
limb axis FIRST (little-endian) and batch axes trailing.  On TPU the
minor-most (lane) axis is then the batch, so a [L, n] array tiles HBM/VMEM
with zero padding; the round-1 limb-minor [n, L] layout lane-padded L=16 up
to 128 and wasted 7/8 of the bandwidth and memory of every array (the 2^24
NTT OOM).  Binary ops auto-align mixed batch ranks by inserting singleton
axes right after the limb axis (the limb-major analogue of NumPy's
right-aligned broadcasting).

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


def expand(x: jnp.ndarray, batch_ndim: int) -> jnp.ndarray:
    """Insert singleton batch axes after the limb axis so a [L, *b] value
    broadcasts against a higher-rank [L, *B, *b] batch."""
    missing = batch_ndim - (x.ndim - 1)
    if missing <= 0:
        return x
    return x.reshape(x.shape[:1] + (1,) * missing + x.shape[1:])


def _align(a: jnp.ndarray, b: jnp.ndarray):
    """Auto-align two limb-major values of different batch rank."""
    if a.ndim < b.ndim:
        a = expand(a, b.ndim - 1)
    elif b.ndim < a.ndim:
        b = expand(b, a.ndim - 1)
    return a, b


def bconst(spec_limbs, batch_shape=()) -> jnp.ndarray:
    """Host limb list -> [L, *batch] broadcast constant."""
    v = _const(spec_limbs)
    batch_shape = tuple(batch_shape)
    return jnp.broadcast_to(
        v.reshape(v.shape + (1,) * len(batch_shape)), v.shape + batch_shape
    )


# ---------------------------------------------------------------------------
# carry / borrow primitives
#
# Carries are resolved with log-depth Kogge–Stone generate/propagate
# prefixes rather than per-limb ripples: a ripple emits O(L) HLO ops per
# field op, which made large programs (pairings: ~10^4 field muls per
# Miller scan body) prohibitively slow to compile and serialized the
# vector units at run time.  (g, p) combine as
# (g2, p2)∘(g1, p1) = (g2 | p2&g1, p2 & p1); log2(L) doubling rounds.
# ---------------------------------------------------------------------------


def _shift_up(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Shift limb-axis (axis 0) entries towards higher indices by k."""
    pad = [(k, 0)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)[: x.shape[0]]


def _ks_carries(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Kogge–Stone prefix: returns carry-IN per limb given per-limb
    generate/propagate bits (uint32 0/1)."""
    L = g.shape[0]
    shift = 1
    while shift < L:
        g = g | (p & _shift_up(g, shift))
        p = p & _shift_up(p, shift)
        shift *= 2
    return _shift_up(g, 1)


def _add_limbs(a: jnp.ndarray, b: jnp.ndarray):
    """(a + b) over 16-bit limbs -> (sum limbs, carry in {0,1})."""
    s = a + b  # <= 2^17 - 2
    gen = s >> LIMB_BITS  # 0/1
    prop = ((s & _MASK) == _MASK).astype(_U32)
    carry_in = _ks_carries(gen, prop)
    total = s + carry_in
    carry_out = total[-1] >> LIMB_BITS
    return total & _MASK, carry_out


def _sub_limbs(a: jnp.ndarray, b: jnp.ndarray):
    """(a - b) over 16-bit limbs -> (difference limbs, borrow in {0,1})."""
    gen = (a < b).astype(_U32)
    prop = (a == b).astype(_U32)
    borrow_in = _ks_carries(gen, prop)
    d = a - b - borrow_in
    borrow_out = (a[-1] - b[-1] - borrow_in[-1]) >> 31
    return d & _MASK, borrow_out


def _normalize(cols: jnp.ndarray):
    """Redundant columns (< 2^31, high halves < 2^15) -> exact 16-bit
    limbs + integer carry-out beyond the top limb."""
    lo = cols & _MASK
    hi = cols >> LIMB_BITS
    s = lo + _shift_up(hi, 1)  # < 2^16 + 2^15: carries in {0,1}
    gen = s >> LIMB_BITS
    prop = ((s & _MASK) == _MASK).astype(_U32)
    carry_in = _ks_carries(gen, prop)
    total = s + carry_in
    carry_out = hi[-1] + (total[-1] >> LIMB_BITS)
    return total & _MASK, carry_out


def _propagate(cols: jnp.ndarray):
    """Back-compat alias of _normalize."""
    return _normalize(cols)


def _cond_sub_modulus(spec: FieldSpec, x: jnp.ndarray, carry: jnp.ndarray):
    """Return x - p if (carry:x) >= p else x, for (carry:x) < 2p."""
    p = bconst(spec.p_limbs, x.shape[1:])
    d, borrow = _sub_limbs(x, p)
    ge = jnp.logical_or(carry.astype(bool), jnp.logical_not(borrow.astype(bool)))
    return jnp.where(ge, d, x)


# ---------------------------------------------------------------------------
# ring operations (inputs/outputs: uint32[L, ...], Montgomery form, < p)
# ---------------------------------------------------------------------------


def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a, b = _align(a, b)
    s, carry = _add_limbs(a, b)
    return _cond_sub_modulus(spec, s, carry)


def double(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return add(spec, a, a)


def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a, b = _align(a, b)
    d, borrow = _sub_limbs(a, b)
    p = bconst(spec.p_limbs, d.shape[1:])
    d_plus_p, _ = _add_limbs(d, p)
    return jnp.where(borrow.astype(bool), d_plus_p, d)


def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    p = bconst(spec.p_limbs, a.shape[1:])
    d, _ = _sub_limbs(p, a)
    return jnp.where(is_zero(spec, a), a, d)


def is_zero(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=0)


def equal(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a, b = _align(a, b)
    return jnp.all(a == b, axis=0)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise select over the batch (mask broadcasts right-aligned
    against the trailing batch axes)."""
    return jnp.where(mask, a, b)


def _antidiag_sum(P: jnp.ndarray) -> jnp.ndarray:
    """Sum the anti-diagonals of the LEADING [L, L] axes: out[k] =
    sum_{i+j=k} P[i, j, ...], k in [0, 2L-1).  Pure reshape trick
    (pad rows to 2L, flatten, drop tail, re-fold): flat index i*2L + j
    equals position (i, i+j) in a width-(2L-1) grid."""
    L = P.shape[0]
    batch = P.shape[2:]
    D = 2 * L - 1
    pad = [(0, 0), (0, L)] + [(0, 0)] * len(batch)
    flat = jnp.pad(P, pad).reshape((2 * L * L,) + batch)[: L * D]
    return flat.reshape((L, D) + batch).sum(axis=0)


def mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a * b * R^-1 mod p.

    Semantically the reference's no-carry CIOS
    (montgomery_backend.rs:148-215), formulated for vector units and
    small compiled programs:

      * the full schoolbook product is ONE broadcast multiply
        [L, 1, ...] x [1, L, ...] followed by an anti-diagonal fold —
        no per-limb scatter ops;
      * the interleaved Montgomery reduction (inherently sequential in
        the limb index) runs as a lax.fori_loop whose body touches an
        (L+1)-wide window — compiled once, executed L times;
      * carries stay lazy in 32-bit column accumulators (bounded by
        ~L * 2^17 << 2^32) and are resolved once at the end with a
        log-depth Kogge–Stone prefix.
    """
    from .. import config

    L = spec.n_limbs
    a, b = _align(a, b)
    a, b = jnp.broadcast_arrays(a, b)
    batch = a.shape[1:]
    if config.pallas_enabled() and int(np.prod(batch or (1,))) >= config.pallas_min_batch:
        from . import mont_pallas

        return mont_pallas.mul(spec, a, b)
    inv = np.uint32(spec.inv16)
    p_exp = bconst(spec.p_limbs, (1,) * len(batch))  # [L, 1...]

    P = a[:, None] * b[None, :]  # exact: (2^16-1)^2 < 2^32
    c_lo = _antidiag_sum(P & _MASK)  # [2L-1, ...], <= L * (2^16-1)
    c_hi = _antidiag_sum(P >> LIMB_BITS)
    cols = jnp.zeros((2 * L + 1,) + batch, dtype=_U32)
    cols = cols.at[: 2 * L - 1].add(c_lo)
    cols = cols.at[1 : 2 * L].add(c_hi)

    zero1 = jnp.zeros((1,) + batch, dtype=_U32)

    if isinstance(a, jax.core.Tracer):
        # under jit: O(1)-size compiled loop body
        def red_body(i, cols):
            window = jax.lax.dynamic_slice_in_dim(cols, i, L + 1, axis=0)
            m = ((window[0] & _MASK) * inv) & _MASK
            mp = m[None] * p_exp
            window = (
                window
                + jnp.concatenate([mp & _MASK, zero1], axis=0)
                + jnp.concatenate([zero1, mp >> LIMB_BITS], axis=0)
            )
            window = window.at[1].add(window[0] >> LIMB_BITS)
            return jax.lax.dynamic_update_slice_in_dim(cols, window, i, axis=0)

        cols = jax.lax.fori_loop(0, L, red_body, cols)
    else:
        # eager: a fori_loop would re-trace and re-COMPILE its body on
        # every call (the closure is fresh each time); plain unrolled ops
        # dispatch through the per-op eager cache instead.
        for i in range(L):
            m = ((cols[i] & _MASK) * inv) & _MASK
            mp = m[None] * p_exp
            cols = cols.at[i : i + L].add(mp & _MASK)
            cols = cols.at[i + 1 : i + L + 1].add(mp >> LIMB_BITS)
            cols = cols.at[i + 1].add(cols[i] >> LIMB_BITS)
    res, carry = _normalize(cols[L : 2 * L + 1])
    carry = carry + res[L]  # top column folds into the carry bit
    return _cond_sub_modulus(spec, res[:L], carry)


def square(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery squaring with the upper-triangle trick: the schoolbook
    columns use L(L+1)/2 limb products (off-diagonal terms doubled)
    instead of the full L^2 outer product (reference: the interleaved
    squaring of montgomery_backend.rs:217-293).  The Montgomery
    reduction is identical to ``mul``'s."""
    from .. import config

    L = spec.n_limbs
    batch = a.shape[1:]
    if config.pallas_enabled() and int(np.prod(batch or (1,))) >= config.pallas_min_batch:
        from . import mont_pallas

        return mont_pallas.mul(spec, a, a)
    inv = np.uint32(spec.inv16)
    p_exp = bconst(spec.p_limbs, (1,) * len(batch))

    # per-row contributions: a[i] * a[i:], off-diagonal doubled.  Columns
    # hold sums of up to ~2L products of 15/16-bit halves — the same
    # <2^31 bound as dot_stacked's weight-2 case.
    cols = jnp.zeros((2 * L + 1,) + batch, dtype=_U32)
    c_lo = jnp.zeros((2 * L - 1,) + batch, dtype=_U32)
    c_hi = jnp.zeros((2 * L - 1,) + batch, dtype=_U32)
    for i in range(L):
        prod = a[i][None] * a[i:]  # [L-i, ...]
        lo = prod & _MASK
        hi = prod >> LIMB_BITS
        # double the off-diagonal (j > i) terms
        dbl = jnp.concatenate([lo[:1], lo[1:] * 2], axis=0)
        dbl_hi = jnp.concatenate([hi[:1], hi[1:] * 2], axis=0)
        c_lo = jax.lax.dynamic_update_slice_in_dim(
            c_lo, jax.lax.dynamic_slice_in_dim(c_lo, 2 * i, L - i, 0) + dbl,
            2 * i, axis=0)
        c_hi = jax.lax.dynamic_update_slice_in_dim(
            c_hi, jax.lax.dynamic_slice_in_dim(c_hi, 2 * i, L - i, 0) + dbl_hi,
            2 * i, axis=0)
    cols = cols.at[: 2 * L - 1].add(c_lo)
    cols = cols.at[1 : 2 * L].add(c_hi)

    zero1 = jnp.zeros((1,) + batch, dtype=_U32)
    if isinstance(a, jax.core.Tracer):
        def red_body(i, cols):
            window = jax.lax.dynamic_slice_in_dim(cols, i, L + 1, axis=0)
            m = ((window[0] & _MASK) * inv) & _MASK
            mp = m[None] * p_exp
            window = (
                window
                + jnp.concatenate([mp & _MASK, zero1], axis=0)
                + jnp.concatenate([zero1, mp >> LIMB_BITS], axis=0)
            )
            window = window.at[1].add(window[0] >> LIMB_BITS)
            return jax.lax.dynamic_update_slice_in_dim(cols, window, i, axis=0)

        cols = jax.lax.fori_loop(0, L, red_body, cols)
    else:
        for i in range(L):
            m = ((cols[i] & _MASK) * inv) & _MASK
            mp = m[None] * p_exp
            cols = cols.at[i : i + L].add(mp & _MASK)
            cols = cols.at[i + 1 : i + L + 1].add(mp >> LIMB_BITS)
            cols = cols.at[i + 1].add(cols[i] >> LIMB_BITS)
    res, carry = _normalize(cols[L : 2 * L + 1])
    carry = carry + res[L]
    # same post-reduction bound as mul: (a^2 + m*p)/R < 2p — the doubled
    # columns change the redundant representation, not the value.
    return _cond_sub_modulus(spec, res[:L], carry)


def to_mont(spec: FieldSpec, x: jnp.ndarray) -> jnp.ndarray:
    """Canonical limbs -> Montgomery form (multiply by R^2)."""
    return mul(spec, x, bconst(spec.r2_limbs, x.shape[1:]))


def from_mont(spec: FieldSpec, x: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> canonical limbs (multiply by 1 = reduce)."""
    return mul(spec, x, bconst(spec.unit_limbs, x.shape[1:]))


# ---------------------------------------------------------------------------
# exponentiation / inversion
# ---------------------------------------------------------------------------


def pow_fixed(spec: FieldSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a host-constant exponent, via an on-device windowed scan.

    4-bit fixed windows (vs the reference's bit-at-a-time
    ff/src/fields/mod.rs:280-291): per window the scan body does 4
    squarings + ONE table-gather multiply, so a field-sized exponent
    costs ~nbits squarings + nbits/4 multiplies instead of ~nbits/2
    data-dependent multiplies.  The 16-entry power table is a stacked
    leading axis; the traced digit indexes it with one dynamic gather.
    """
    e = int(e)
    if e < 0:
        raise ValueError("negative exponents not supported; invert first")
    one = bconst(spec.one_mont_limbs, a.shape[1:])
    if e == 0:
        return one
    nbits = e.bit_length()
    if nbits <= 8:  # tiny exponents: unrolled square-and-multiply
        res = one
        for bit in bin(e)[2:]:
            res = square(spec, res)
            if bit == "1":
                res = mul(spec, res, a)
        return res

    if int(np.prod(a.shape[1:] or (1,))) >= (1 << 16):
        # huge batches: the 16-entry table would cost 16x the array in
        # HBM; branchless bit-at-a-time costs memory-neutral
        bits = jnp.asarray(
            [(e >> (nbits - 1 - i)) & 1 for i in range(nbits)],
            dtype=jnp.bool_,
        )

        def bit_body(res, bit):
            res = square(spec, res)
            res = select(
                jnp.broadcast_to(bit, res.shape[1:]), mul(spec, res, a), res
            )
            return res, None

        res, _ = jax.lax.scan(bit_body, one, bits)
        return res

    w = 4
    n_dig = -(-nbits // w)
    digits = [(e >> (w * (n_dig - 1 - i))) & ((1 << w) - 1)
              for i in range(n_dig)]  # MSB-first
    table = [one, jnp.broadcast_to(a, one.shape)]
    for _ in range(2, 1 << w):
        table.append(mul(spec, table[-1], a))
    T = jnp.stack(table, axis=0)  # [16, L, *batch]

    def body(res, d):
        for _ in range(w):
            res = square(spec, res)
        return mul(spec, res, T[d]), None

    first = T[digits[0]]
    res, _ = jax.lax.scan(
        body, first, jnp.asarray(digits[1:], dtype=jnp.int32)
    )
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

    ``axis`` indexes the BATCH axes (axis=0 is the leading batch axis,
    i.e. array axis 1 in the limb-major layout).  Parallel formulation of
    the reference's ``batch_inversion`` (ff/src/fields/mod.rs:313-375):
    prefix and suffix running products via work-efficient associative
    scans, then inv_i = prefix_{i-1} * suffix_{i+1} * (prod all)^-1.
    Zero entries map to zero.
    """
    ax = axis + 1 if axis >= 0 else axis
    if ax != 1:
        a = jnp.moveaxis(a, ax, 1)
    zero_mask = is_zero(spec, a)
    one = bconst(spec.one_mont_limbs, a.shape[1:])
    safe = jnp.where(zero_mask, one, a)

    mul_fn = lambda x, y: mul(spec, x, y)
    prefix = jax.lax.associative_scan(mul_fn, safe, axis=1)
    suffix = jax.lax.associative_scan(mul_fn, safe, axis=1, reverse=True)
    total_inv = inv(spec, prefix[:, -1])

    n = a.shape[1]
    left = jnp.concatenate([one[:, :1], prefix[:, : n - 1]], axis=1)
    right = jnp.concatenate([suffix[:, 1:], one[:, :1]], axis=1)
    out = mul(spec, mul(spec, left, right), total_inv[:, None])
    out = jnp.where(zero_mask, jnp.zeros_like(out), out)
    if ax != 1:
        out = jnp.moveaxis(out, 1, ax)
    return out


def sum_of_products(spec: FieldSpec, a_list, b_list) -> jnp.ndarray:
    """sum_i a_i * b_i with ONE shared Montgomery reduction
    (reference: ff/src/fields/mod.rs sum_of_products and the interleaved
    formulation montgomery_backend.rs:391-495), via ``dot_stacked``.
    Falls back to a mul/add fold if the term count exceeds the column
    headroom."""
    k = len(a_list)
    if 0 < k <= dot_mass_limit(spec):
        L = spec.n_limbs
        batch = np.broadcast_shapes(
            *[x.shape[1:] for x in (*a_list, *b_list)]
        )

        def bc(x):
            return jnp.broadcast_to(expand(x, len(batch)), (L,) + batch)

        A = jnp.stack([bc(a) for a in a_list], axis=1)
        B = jnp.stack([bc(b) for b in b_list], axis=1)
        mask = [a is b for a, b in zip(a_list, b_list)]
        out = dot_stacked(spec, A, B, np.ones((1, k), np.int64),
                          square_mask=mask)
        return out[:, 0]
    acc = None
    for a, b in zip(a_list, b_list):
        t = mul(spec, a, b)
        acc = t if acc is None else add(spec, acc, t)
    return acc


def dot_mass_limit(spec: FieldSpec) -> int:
    """Largest allowed sum_k |W[o, k]| for ``dot_stacked``.

    Exact headroom accounting: ``_normalize`` needs every column
    accumulator < 2^31 (high halves < 2^15).  A column starts at
    <= wmass * colmax (colmax = 2L * 2^16 from the stacked antidiagonal
    sums) and the interleaved reduction adds at most 2*(2^16 - 1) per
    round over <= L+1 rounds plus one 2^15 carry fold, so
    wmass <= (2^31 - (L+1)*2^17 - 2^15) / colmax.  (The previous flat
    2^29 bound was 4x too conservative and forced pairing-step fusions
    over towers with nonresidues like 13 back onto the generic path.)"""
    L = spec.n_limbs
    colmax = 2 * L * (1 << LIMB_BITS)
    slack = (L + 1) * (1 << (LIMB_BITS + 1)) + (1 << (LIMB_BITS - 1))
    return ((1 << 31) - slack) // colmax


def _square_pair_columns(A: jnp.ndarray):
    """Schoolbook columns of A[k]^2 for stacked [L, S, *batch] operands
    via the upper-triangle trick (off-diagonal doubled): L(L+1)/2 limb
    products per pair instead of L^2.  Same per-column bound as the
    general path (half the terms, each doubled).  Returns
    (c_lo, c_hi): [2L-1, S, *batch]."""
    L = A.shape[0]
    rest = A.shape[1:]
    c_lo = jnp.zeros((2 * L - 1,) + rest, dtype=_U32)
    c_hi = jnp.zeros((2 * L - 1,) + rest, dtype=_U32)
    for i in range(L):
        prod = A[i][None] * A[i:]  # [L-i, S, *batch]
        lo = prod & _MASK
        hi = prod >> LIMB_BITS
        dbl_lo = jnp.concatenate([lo[:1], lo[1:] * 2], axis=0)
        dbl_hi = jnp.concatenate([hi[:1], hi[1:] * 2], axis=0)
        c_lo = jax.lax.dynamic_update_slice_in_dim(
            c_lo, jax.lax.dynamic_slice_in_dim(c_lo, 2 * i, L - i, 0) + dbl_lo,
            2 * i, axis=0)
        c_hi = jax.lax.dynamic_update_slice_in_dim(
            c_hi, jax.lax.dynamic_slice_in_dim(c_hi, 2 * i, L - i, 0) + dbl_hi,
            2 * i, axis=0)
    return c_lo, c_hi


def dot_stacked(spec: FieldSpec, A: jnp.ndarray, B: jnp.ndarray,
                W, square_mask=None) -> jnp.ndarray:
    """sum_k W[o, k] * A[k] * B[k] * R^-1 mod p — ONE Montgomery reduction.

    The vectorized generalization of the reference's single-reduction
    ``sum_of_products`` (montgomery_backend.rs:391-495): every product's
    schoolbook columns come from one broadcast multiply, are combined with
    the integer weight matrix in column space, and reduced once per output
    row.  Negative weights are handled by duplicating those product pairs
    with a negated second operand (p - b ≡ -b), so columns stay unsigned
    and need no bias.  This is what makes tower multiplications
    single-kernel ops: an Fp12 product becomes a [12, K] weight matrix
    over K Fq products with one reduction, instead of dozens of chained
    mul/add kernels whose per-op carry chains dominated both compile time
    and small-batch runtime.

    A, B: uint32[L, K, *batch] Montgomery-form elements (< p).
    W:    host int array [n_out, K] (may be negative);
          sum_k |W[o, k]| <= dot_mass_limit(spec).
    square_mask: optional host bool[K] marking pairs whose operands are
          the SAME value (A[k] == B[k]); those columns use the
          upper-triangle squaring trick (~half the limb products).
    Returns uint32[L, n_out, *batch].
    """
    from ..bigint import int_to_limbs

    L = spec.n_limbs
    K = A.shape[1]
    batch = A.shape[2:]
    W = np.asarray(W, np.int64)
    n_out = W.shape[0]
    assert W.shape == (n_out, K)
    wmass = int(np.abs(W).sum(axis=1).max()) if K else 0
    if wmass > dot_mass_limit(spec):
        raise ValueError(
            f"dot weight mass {wmass} exceeds limit {dot_mass_limit(spec)}"
        )
    inv = np.uint32(spec.inv16)
    sq_mask = (np.zeros(K, bool) if square_mask is None
               else np.asarray(square_mask, bool))

    # fold negative weights into negated operands: -(a*b) == a*(p-b)
    neg_pairs = np.where((W < 0).any(axis=0))[0]
    if neg_pairs.size:
        p_c = bconst(spec.p_limbs, A.shape[1:])
        b_neg, _ = _sub_limbs(p_c[:, neg_pairs], B[:, neg_pairs])
        A = jnp.concatenate([A, A[:, neg_pairs]], axis=1)
        B = jnp.concatenate([B, b_neg], axis=1)
        W_ext = np.concatenate(
            [np.maximum(W, 0), np.maximum(-W[:, neg_pairs], 0)], axis=1
        )
        # appended copies multiply by a negated operand — never squares
        sq_mask = np.concatenate([sq_mask, np.zeros(neg_pairs.size, bool)])
    else:
        W_ext = W

    # schoolbook columns: triangle trick for square pairs, full outer
    # for the rest; recombined in original column order via the weights.
    gen_idx = np.where(~sq_mask)[0]
    sq_idx = np.where(sq_mask)[0]
    parts = []
    if gen_idx.size:
        Ag, Bg = A[:, gen_idx], B[:, gen_idx]
        P = Ag[:, None] * Bg[None, :]
        parts.append((gen_idx, _antidiag_sum(P & _MASK),
                      _antidiag_sum(P >> LIMB_BITS)))
    if sq_idx.size:
        lo, hi = _square_pair_columns(A[:, sq_idx])
        parts.append((sq_idx, lo, hi))

    # weighted combine in uint32 column space (bounded by wmass * colmax)
    ncols = 2 * L + 1
    cols = jnp.zeros((ncols, n_out) + batch, dtype=_U32)
    for idx, c_lo, c_hi in parts:
        Wj = jnp.asarray(W_ext[:, idx].astype(np.uint32))
        s_lo = jnp.einsum("ok,lk...->lo...", Wj, c_lo)
        s_hi = jnp.einsum("ok,lk...->lo...", Wj, c_hi)
        cols = cols.at[: 2 * L - 1].add(s_lo)
        cols = cols.at[1 : 2 * L].add(s_hi)

    # interleaved Montgomery reduction (same shape as mul's loop)
    p_exp = bconst(spec.p_limbs, (1,) * (cols.ndim - 1))
    zero1 = jnp.zeros((1,) + cols.shape[1:], dtype=_U32)

    def _round(window):
        m = ((window[0] & _MASK) * inv) & _MASK
        window = (
            window
            + jnp.concatenate([m[None] * p_exp & _MASK, zero1], axis=0)
            + jnp.concatenate([zero1, (m[None] * p_exp) >> LIMB_BITS], axis=0)
        )
        return window.at[1].add(window[0] >> LIMB_BITS)

    if isinstance(cols, jax.core.Tracer):
        def red_body(i, cols):
            window = jax.lax.dynamic_slice_in_dim(cols, i, L + 1, axis=0)
            return jax.lax.dynamic_update_slice_in_dim(
                cols, _round(window), i, axis=0
            )

        cols = jax.lax.fori_loop(0, L, red_body, cols)
    else:
        for i in range(L):
            cols = jax.lax.dynamic_update_slice_in_dim(
                cols, _round(cols[i : i + L + 1]), i, axis=0
            )

    # normalize the high half, then reduce below p with a binary
    # conditional-subtraction chain sized by the exact value bound
    res, carry = _normalize(cols[L:])  # [L+1, ...], carry beyond
    ext = jnp.concatenate([res, carry[None]], axis=0)  # [L+2, ...]

    p_int = spec.modulus
    v_max = (wmass * (p_int - 1) ** 2) >> (LIMB_BITS * L)
    n_bits = max(((v_max + p_int) // p_int).bit_length(), 1)
    for j in reversed(range(n_bits)):
        mj = bconst(int_to_limbs(p_int << j, ext.shape[0]), ext.shape[1:])
        d_, borrow = _sub_limbs(ext, mj)
        ext = jnp.where(borrow.astype(bool), ext, d_)
    return ext[:L]


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
