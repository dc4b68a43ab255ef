"""Pallas TPU kernels for Montgomery field arithmetic.

This is the TPU counterpart of the reference's x86_64 Montgomery assembly
(ff-asm/src/lib.rs:51, dispatched at montgomery_backend.rs:150-181): the
hot multiply loop compiled as ONE fused kernel instead of ~10^2 XLA ops.

Layout: arrays are limb-major [L, N] end to end — the element axis rides
the 128-wide vector lanes at full utilization and blocks DMA with zero
tile padding (L is 16..48; the round-1 [N, L] API layout lane-padded L up
to 128 and wasted 7/8 of HBM bandwidth on every load).  All limb loops
are static unrolls over L; carries stay lazy in 32-bit accumulators
exactly as in ops/mont.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.spec import FieldSpec

_MASK = jnp.uint32(0xFFFF)


# --------------------------------------------------------------------------
# limb-major helpers used inside kernels.  All field constants enter as
# python ints (weak-typed scalars) — pallas kernels cannot capture jnp
# array/scalar constants.  Values are [L, N] u32 arrays of 16-bit limbs.
# --------------------------------------------------------------------------

_M16 = 0xFFFF


def _interp() -> bool:
    """Read the interpret-mode flag at call time so the CPU suite can
    execute every kernel definition through the Pallas interpreter."""
    from .. import config

    return bool(config.pallas_interpret)


def _p_full(spec: FieldSpec, nb):
    """[L, nb] modulus constant from scalar broadcasts (pallas kernels
    cannot capture array constants; scalar fills are fine)."""
    return jnp.concatenate(
        [jnp.full((1, nb), int(pj), jnp.uint32) for pj in spec.p_limbs],
        axis=0,
    )


def _lm_propagate(spec: FieldSpec, t, nb):
    """Redundant [L+1, nb] accumulator -> exact limbs, cond-sub p."""
    L = spec.n_limbs
    carry = jnp.zeros((nb,), jnp.uint32)
    out_rows = []
    for k in range(L):
        v = t[k] + carry
        out_rows.append(v & _M16)
        carry = v >> 16
    carry = carry + t[L]
    res = jnp.stack(out_rows, axis=0)  # [L, NB]
    return _lm_cond_sub(spec, res, carry)


def _lm_mul(spec: FieldSpec, a, b):
    """Montgomery product over limb-major [L, N] blocks (in-register
    column accumulation; bit-identical to ops/mont.mul).

    Interleaved CIOS on an (L+1)-row sliding window: each round adds
    a[i]*b and m*p into the window, folds the retired column's carry,
    and shifts down — never materializing the 2L+1 schoolbook columns.
    All updates are [L, N] 2-D ops (full 8-sublane VPU utilization);
    the window form cut array-rebuild traffic ~40% vs the two-phase
    accumulator (4.9e8 -> 7.5e8 Fr mults/s on v5e; exp/fr_mul_ab.py).
    """
    L = spec.n_limbs
    nb = a.shape[1]
    inv = int(spec.inv16)
    p_full = _p_full(spec, nb)
    zero1 = jnp.zeros((1, nb), jnp.uint32)
    t = jnp.zeros((L + 1, nb), jnp.uint32)
    for i in range(L):
        prod = a[i][None, :] * b  # [L, NB]
        lo = prod & _M16
        hi = prod >> 16
        m = (((t[0] + lo[0]) & _M16) * inv) & _M16
        mp = m[None, :] * p_full
        t = jnp.concatenate([t[:L] + (lo + (mp & _M16)), t[L:]], axis=0)
        t0c = t[0] >> 16  # t[0] & _M16 == 0 by the Montgomery invariant
        t = jnp.concatenate([(t[1] + t0c)[None], t[2:], zero1], axis=0)
        t = jnp.concatenate([t[:L] + (hi + (mp >> 16)), t[L:]], axis=0)
    return _lm_propagate(spec, t, nb)


def _lm_sq(spec: FieldSpec, a):
    """Montgomery squaring on the same (L+1)-row sliding window as
    _lm_mul: round i multiplies the NEW limb a[i] against a[0..i]
    (off-diagonal products doubled — pair (j,i) stands for
    a[j]a[i] + a[i]a[j]), so every contribution of round i lands in
    window rows 0..i+1 and the 2L+1 schoolbook columns are never
    materialized.  L(L+1)/2 limb products instead of _lm_mul's L^2.
    Bit-identical to _lm_mul(a, a) (inverse mirror of the reference's
    dedicated squaring, montgomery_backend.rs:217-293).

    Overflow headroom: a row receives <= 2*(2^17 + 2^16) per round and
    lives <= L+1 rounds, so peak < L * 2^18.6 < 2^25 for L <= 48."""
    L = spec.n_limbs
    nb = a.shape[1]
    inv = int(spec.inv16)
    p_full = _p_full(spec, nb)
    zero1 = jnp.zeros((1, nb), jnp.uint32)
    t = jnp.zeros((L + 1, nb), jnp.uint32)
    for i in range(L):
        prod = a[: i + 1] * a[i][None, :]  # [i+1, NB]
        lo = prod & _M16
        hi = prod >> 16
        if i > 0:  # double the off-diagonal terms (rows j < i)
            lo = jnp.concatenate([lo[:i] * 2, lo[i:]], axis=0)
            hi = jnp.concatenate([hi[:i] * 2, hi[i:]], axis=0)
        w = i + 1
        m = (((t[0] + lo[0]) & _M16) * inv) & _M16
        mp = m[None, :] * p_full  # [L, NB]
        t = jnp.concatenate([t[:w] + lo, t[w:]], axis=0)
        t = jnp.concatenate([t[:L] + (mp & _M16), t[L:]], axis=0)
        t0c = t[0] >> 16  # t[0] & _M16 == 0 by the Montgomery invariant
        t = jnp.concatenate([(t[1] + t0c)[None], t[2:], zero1], axis=0)
        t = jnp.concatenate([t[:w] + hi, t[w:]], axis=0)
        t = jnp.concatenate([t[:L] + (mp >> 16), t[L:]], axis=0)
    return _lm_propagate(spec, t, nb)


def _lm_cond_sub(spec: FieldSpec, res, carry):
    """res - p if (carry:res) >= p else res (limb-major)."""
    L = spec.n_limbs
    p_list = [int(x) for x in spec.p_limbs]
    nb = res.shape[1]
    borrow = jnp.zeros((nb,), jnp.uint32)
    d_rows = []
    for k in range(L):
        t = res[k] - p_list[k] - borrow
        d_rows.append(t & _M16)
        borrow = (t >> 16) & 1
    d = jnp.stack(d_rows, axis=0)
    ge = jnp.logical_or(carry.astype(bool), jnp.logical_not(borrow.astype(bool)))
    return jnp.where(ge[None, :], d, res)


def _lm_add(spec: FieldSpec, a, b):
    """Modular addition over limb-major blocks (ripple carries —
    in-register, so the ripple is cheap here)."""
    L = spec.n_limbs
    nb = a.shape[1]
    s = a + b
    carry = jnp.zeros((nb,), jnp.uint32)
    rows = []
    for k in range(L):
        v = s[k] + carry
        rows.append(v & _M16)
        carry = v >> 16
    return _lm_cond_sub(spec, jnp.stack(rows, axis=0), carry)


def _lm_sub(spec: FieldSpec, a, b):
    """Modular subtraction over limb-major blocks."""
    L = spec.n_limbs
    p_list = [int(x) for x in spec.p_limbs]
    nb = a.shape[1]
    borrow = jnp.zeros((nb,), jnp.uint32)
    d_rows = []
    for k in range(L):
        t = a[k] - b[k] - borrow
        d_rows.append(t & _M16)
        borrow = (t >> 16) & 1
    d = jnp.stack(d_rows, axis=0)
    # if borrow: d += p
    carry = jnp.zeros((nb,), jnp.uint32)
    rows = []
    for k in range(L):
        v = d[k] + p_list[k] + carry
        rows.append(v & _M16)
        carry = v >> 16
    dp = jnp.stack(rows, axis=0)
    return jnp.where(borrow.astype(bool)[None, :], dp, d)


def _mul_kernel(spec: FieldSpec, a_ref, b_ref, o_ref):
    o_ref[...] = _lm_mul(spec, a_ref[...], b_ref[...])


# --------------------------------------------------------------------------
# hierarchical batched inversion (Montgomery's trick, blocked)
#
# The associative-scan formulation in ops/mont.batch_inverse costs
# ~2*log2(N) muls per lane; the MSM affine bucket phase needs ~3.  Here a
# block of G*128 lanes is viewed as [G, 128]: an in-kernel sequential
# product down the G rows leaves 128 column products per block ("tails"),
# the tails array recurses until one 128-lane row remains, that row is
# inverted by an in-kernel Fermat ladder, and backward passes unwind the
# per-row inverses (2 muls/row).  Total ~(3 + 3/G) muls per lane and a
# few kernel launches per level.
# --------------------------------------------------------------------------


def _prefix_kernel(spec: FieldSpec, G: int, R: int, a_ref, pref_ref, tail_ref):
    """Sequential products down the G sublane-groups of one block.

    a: [L, G*R] seen as G rows of R lanes.  pref[i] = prod(a[0..i]);
    tail = pref[G-1]."""
    a = a_ref[...]
    p = a[:, :R]
    pref_ref[:, :R] = p
    for i in range(1, G):
        p = _lm_mul(spec, p, a[:, i * R : (i + 1) * R])
        pref_ref[:, i * R : (i + 1) * R] = p
    tail_ref[...] = p


def _backward_kernel(spec: FieldSpec, G: int, R: int, a_ref, pref_ref,
                     tinv_ref, o_ref):
    """Unwind per-row inverses from the block-tail inverse.

    running = inv(prod all rows); for i = G-1..1:
    out[i] = running * pref[i-1]; running *= a[i]; out[0] = running."""
    a = a_ref[...]
    pref = pref_ref[...]
    running = tinv_ref[...]
    for i in range(G - 1, 0, -1):
        o_ref[:, i * R : (i + 1) * R] = _lm_mul(
            spec, running, pref[:, (i - 1) * R : i * R]
        )
        running = _lm_mul(spec, running, a[:, i * R : (i + 1) * R])
    o_ref[:, :R] = running


def _fermat_kernel(spec: FieldSpec, a_ref, bits_ref, o_ref):
    """In-kernel Fermat inversion a^(p-2) on one [L, R] row: fori_loop of
    square + bit-selected multiply; exponent bits arrive MSB-first as an
    int32 SMEM vector (bits[0] is always 1)."""
    a = a_ref[...]
    nbits = bits_ref.shape[0]

    def body(i, res):
        res = _lm_sq(spec, res)
        bit = bits_ref[i]
        return jnp.where(bit != 0, _lm_mul(spec, res, a), res)

    o_ref[...] = jax.lax.fori_loop(1, nbits, body, a)


@functools.lru_cache(maxsize=None)
def _prefix_call(spec: FieldSpec, n: int, G: int, R: int,
                 interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    blk = G * R
    grid = (n // blk,)
    dspec = pl.BlockSpec((L, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((L, R), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_prefix_kernel, spec, G, R),
        out_shape=(
            jax.ShapeDtypeStruct((L, n), jnp.uint32),
            jax.ShapeDtypeStruct((L, n // G), jnp.uint32),
        ),
        grid=grid,
        in_specs=[dspec],
        out_specs=(dspec, tspec),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _backward_call(spec: FieldSpec, n: int, G: int, R: int,
                   interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    blk = G * R
    grid = (n // blk,)
    dspec = pl.BlockSpec((L, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((L, R), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_backward_kernel, spec, G, R),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=grid,
        in_specs=[dspec, dspec, tspec],
        out_specs=dspec,
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _fermat_call(spec: FieldSpec, R: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    e = spec.modulus - 2
    bits = np.array([int(b) for b in bin(e)[2:]], np.int32)
    nbits = bits.shape[0]
    call = pl.pallas_call(
        functools.partial(_fermat_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((L, R), jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    # convert the bits INSIDE the call: a cached jnp constant created
    # during one jit trace would leak that trace's tracer into the next
    return lambda a: call(a, jnp.asarray(bits))


_INV_R = 128  # lane row width; the Fermat base case runs on one row


def batch_inverse(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Batched field inversion of a [L, *batch] Montgomery array.

    ~3 Montgomery muls per lane (vs ~2*log2(N) for the associative-scan
    path in ops/mont.batch_inverse) + one 128-lane Fermat ladder.
    Zero lanes invert to zero.  Bit-identical to mont.inv per lane
    (inverses are unique; both end < p)."""
    from .. import config

    interp = bool(config.pallas_interpret)
    L = spec.n_limbs
    batch = a.shape[1:]
    n = int(np.prod(batch)) if batch else 1
    flat = a.reshape(L, n)

    one = jnp.asarray(
        np.asarray(spec.one_mont_limbs, np.uint32).reshape(L, 1)
    )
    zero_mask = (flat == 0).all(axis=0)
    flat = jnp.where(zero_mask[None, :], one, flat)

    padded = pad_bucket(n, _INV_R)
    if padded != n:
        pad_cols = jnp.broadcast_to(one, (L, padded - n))
        flat = jnp.concatenate([flat, pad_cols], axis=1)

    # forward: shrink to one 128-lane row
    stack = []  # (a_level, prefix, G, width)
    cur = flat
    width = padded
    while width > _INV_R:
        G = min(32, width // _INV_R)
        blk = G * _INV_R
        if width % blk:
            extra = blk - width % blk
            cur = jnp.concatenate(
                [cur, jnp.broadcast_to(one, (L, extra))], axis=1
            )
            width += extra
        pref, tails = _prefix_call(spec, width, G, _INV_R, interp)(cur)
        stack.append((cur, pref, G, width))
        cur = tails
        width //= G

    tinv = _fermat_call(spec, _INV_R, interp)(cur)

    # backward: expand inverses back up
    for a_lvl, pref, G, w in reversed(stack):
        tinv = _backward_call(spec, w, G, _INV_R, interp)(a_lvl, pref, tinv)

    out = tinv[:, :n]
    out = jnp.where(zero_mask[None, :], jnp.zeros_like(out), out)
    return out.reshape((L,) + batch)


@functools.lru_cache(maxsize=None)
def _mul_call(spec: FieldSpec, n: int, block: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    grid = (n // block,)
    bspec = pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mul_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=grid,
        in_specs=[bspec, bspec],
        out_specs=bspec,
        interpret=interpret,
    )


DEFAULT_BLOCK = 1024


def pad_bucket(n: int, block: int) -> int:
    """Round a flattened batch width up to a block multiple, then to the
    nearest {2^k, 0.75 * 2^k}: kernel widths collapse into a handful of
    buckets so call sites with drifting widths (MSM tree levels, varying
    problem sizes) REUSE compiled kernels — the axon remote-compile path
    costs ~0.5-1 min per distinct Pallas shape.  Padding overhead is
    <= 1/3 lanes, well under one compile's cost at any realistic width.
    """
    n = max(n, block)
    k = (n - 1).bit_length()  # 2^k >= n
    c2 = 3 << (k - 2) if k >= 2 else 0
    if c2 >= n and c2 % block == 0:
        return c2
    return 1 << k if (1 << k) % block == 0 else -(-n // block) * block


def _butterfly_kernel(spec: FieldSpec, reps: int, lo_ref, hi_ref, w_ref,
                      olo_ref, ohi_ref):
    """One DIT butterfly stage, fused: t = hi*w; out = (lo+t, lo-t).

    lo/hi blocks are [L, NB]; w is [L, NB/reps] and repeats `reps` times
    along the block (the stage's twiddle period divides the block)."""
    lo = lo_ref[...]
    hi = hi_ref[...]
    w = w_ref[...]
    if reps > 1:
        w = jnp.tile(w, (1, reps))
    t = _lm_mul(spec, hi, w)
    olo_ref[...] = _lm_add(spec, lo, t)
    ohi_ref[...] = _lm_sub(spec, lo, t)


@functools.lru_cache(maxsize=None)
def _butterfly_call(spec: FieldSpec, n_half: int, half: int, block: int,
                    interpret: bool = False):
    """n_half: total butterfly count (n/2); half: twiddle period."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    grid = (n_half // block,)
    dspec = pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    if half >= block:
        # twiddles blocked alongside the data
        wspec = pl.BlockSpec(
            (L, block), lambda i: (0, i % (half // block)),
            memory_space=pltpu.VMEM,
        )
        reps = 1
    else:
        # whole (small) twiddle table in VMEM, tiled in-kernel
        wspec = pl.BlockSpec((L, half), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        reps = block // half
    return pl.pallas_call(
        functools.partial(_butterfly_kernel, spec, reps),
        out_shape=(
            jax.ShapeDtypeStruct((L, n_half), jnp.uint32),
            jax.ShapeDtypeStruct((L, n_half), jnp.uint32),
        ),
        grid=grid,
        in_specs=[dspec, dspec, wspec],
        out_specs=(dspec, dspec),
        interpret=interpret,
    )


def butterfly_stage(spec: FieldSpec, lo: jnp.ndarray, hi: jnp.ndarray,
                    w: jnp.ndarray, block: int = DEFAULT_BLOCK):
    """Batched butterflies: returns (lo + hi*w, lo - hi*w).

    lo, hi: [L, n_half] flat butterfly operands; w: [L, half] twiddles
    with period `half` along the flat axis (n_half % half == 0)."""
    L, n_half = lo.shape
    half = w.shape[1]
    blk = min(block, n_half)
    # block must divide n_half, and interact cleanly with the period
    while n_half % blk or (half >= blk and half % blk) or (
        half < blk and blk % half
    ):
        blk //= 2
    return _butterfly_call(spec, n_half, half, blk, _interp())(lo, hi, w)


def mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray,
        block: int = DEFAULT_BLOCK) -> jnp.ndarray:
    """Montgomery product via the Pallas kernel.

    a, b: uint32[L, ...]; the batch is flattened and padded to a block
    multiple.  Bit-identical to ops/mont.mul.
    """
    L = spec.n_limbs
    a, b = jnp.broadcast_arrays(a, b)
    batch = a.shape[1:]
    n = int(np.prod(batch)) if batch else 1
    af = a.reshape(L, n)
    bf = b.reshape(L, n)
    nb = max(block, 128)
    padded = pad_bucket(n, nb)
    if padded != n:
        pad = ((0, 0), (0, padded - n))
        af = jnp.pad(af, pad)
        bf = jnp.pad(bf, pad)
    out = _mul_call(spec, padded, nb, _interp())(af, bf)
    return out[:, :n].reshape((L,) + batch)
