"""Fused Pallas kernels for short-Weierstrass group laws (prime field,
a = 0): one kernel per batched point-add instead of ~15 separate
field-op launches.

Mirrors the branchless semantics of curves/sw.py exactly (same EFD
formulas — dbl-2009-l, add-2007-bl, madd-2007-bl — same exceptional-case
select order), so results are bit-identical to the jnp path.  Used by
the MSM hot loops on G1-style curves; extension-field bases (G2) use the
composed path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.spec import FieldSpec
from .mont_pallas import _interp, _lm_add, _lm_mul, _lm_sq, _lm_sub


def _lm_dbl(spec, a):
    return _lm_add(spec, a, a)


def _lm_is_zero(a):
    return (a == 0).all(axis=0)  # [N] bool


def _sel(mask, a, b):
    """mask [N] over limb-major [L, N] values."""
    return jnp.where(mask[None, :], a, b)


def _double_lm(spec, x1, y1, z1):
    """dbl-2009-l (a = 0), limb-major."""
    A = _lm_sq(spec, x1)
    Bv = _lm_sq(spec, y1)
    C = _lm_sq(spec, Bv)
    t = _lm_add(spec, x1, Bv)
    D = _lm_dbl(spec, _lm_sub(spec, _lm_sub(spec, _lm_sq(spec, t), A), C))
    E = _lm_add(spec, _lm_dbl(spec, A), A)
    F = _lm_sq(spec, E)
    X3 = _lm_sub(spec, F, _lm_dbl(spec, D))
    Y3 = _lm_sub(
        spec,
        _lm_mul(spec, E, _lm_sub(spec, D, X3)),
        _lm_dbl(spec, _lm_dbl(spec, _lm_dbl(spec, C))),
    )
    Z3 = _lm_dbl(spec, _lm_mul(spec, y1, z1))
    return X3, Y3, Z3


def _madd_kernel(spec: FieldSpec, x1r, y1r, z1r, x2r, y2r, inf2r,
                 xo, yo, zo):
    """P (Jacobian) += Q (affine); inf2r: uint32[1, N] nonzero = infinity."""
    x1, y1, z1 = x1r[...], y1r[...], z1r[...]  # [L, N]
    x2, y2 = x2r[...], y2r[...]
    inf2 = inf2r[...][0] != 0  # [N]

    Z1Z1 = _lm_sq(spec, z1)
    U2 = _lm_mul(spec, x2, Z1Z1)
    S2 = _lm_mul(spec, y2, _lm_mul(spec, z1, Z1Z1))
    H = _lm_sub(spec, U2, x1)
    r = _lm_dbl(spec, _lm_sub(spec, S2, y1))
    HH = _lm_sq(spec, H)
    I = _lm_dbl(spec, _lm_dbl(spec, HH))
    J = _lm_mul(spec, H, I)
    V = _lm_mul(spec, x1, I)
    X3 = _lm_sub(spec, _lm_sub(spec, _lm_sq(spec, r), J), _lm_dbl(spec, V))
    Y3 = _lm_sub(
        spec,
        _lm_mul(spec, r, _lm_sub(spec, V, X3)),
        _lm_dbl(spec, _lm_mul(spec, y1, J)),
    )
    t = _lm_add(spec, z1, H)
    Z3 = _lm_sub(spec, _lm_sub(spec, _lm_sq(spec, t), Z1Z1), HH)

    Xd, Yd, Zd = _double_lm(spec, x1, y1, z1)

    same = jnp.logical_and(_lm_is_zero(H), _lm_is_zero(r))
    X3 = _sel(same, Xd, X3)
    Y3 = _sel(same, Yd, Y3)
    Z3 = _sel(same, Zd, Z3)
    # Q at infinity -> P
    X3 = _sel(inf2, x1, X3)
    Y3 = _sel(inf2, y1, Y3)
    Z3 = _sel(inf2, z1, Z3)
    # P at infinity -> from_affine(Q)  ((1,1,0) if Q infinite)
    p_inf = _lm_is_zero(z1)
    # Montgomery one: R mod p limbs as python constants
    one_rows = [int(v) for v in np.asarray(spec.one_mont_limbs)]
    one = jnp.stack(
        [jnp.full((x1.shape[1],), v, jnp.uint32) for v in one_rows], axis=0
    )
    zero = jnp.zeros_like(x1)
    qx = _sel(inf2, one, x2)
    qy = _sel(inf2, one, y2)
    qz = _sel(inf2, zero, one)
    X3 = _sel(p_inf, qx, X3)
    Y3 = _sel(p_inf, qy, Y3)
    Z3 = _sel(p_inf, qz, Z3)

    xo[...] = X3
    yo[...] = Y3
    zo[...] = Z3


def _double_kernel(spec: FieldSpec, x1r, y1r, z1r, xo, yo, zo):
    """Jacobian doubling (dbl-2009-l, a = 0); infinity falls out via
    Z3 = 2*Y1*Z1 == 0."""
    X3, Y3, Z3 = _double_lm(spec, x1r[...], y1r[...], z1r[...])
    xo[...] = X3
    yo[...] = Y3
    zo[...] = Z3


def _add_kernel(spec: FieldSpec, x1r, y1r, z1r, x2r, y2r, z2r, xo, yo, zo):
    """Full Jacobian add (add-2007-bl) with exceptional cases."""
    x1, y1, z1 = x1r[...], y1r[...], z1r[...]
    x2, y2, z2 = x2r[...], y2r[...], z2r[...]

    Z1Z1 = _lm_sq(spec, z1)
    Z2Z2 = _lm_sq(spec, z2)
    U1 = _lm_mul(spec, x1, Z2Z2)
    U2 = _lm_mul(spec, x2, Z1Z1)
    S1 = _lm_mul(spec, y1, _lm_mul(spec, z2, Z2Z2))
    S2 = _lm_mul(spec, y2, _lm_mul(spec, z1, Z1Z1))
    H = _lm_sub(spec, U2, U1)
    r = _lm_dbl(spec, _lm_sub(spec, S2, S1))
    H2 = _lm_dbl(spec, H)
    I = _lm_sq(spec, H2)
    J = _lm_mul(spec, H, I)
    V = _lm_mul(spec, U1, I)
    X3 = _lm_sub(spec, _lm_sub(spec, _lm_sq(spec, r), J), _lm_dbl(spec, V))
    Y3 = _lm_sub(
        spec,
        _lm_mul(spec, r, _lm_sub(spec, V, X3)),
        _lm_dbl(spec, _lm_mul(spec, S1, J)),
    )
    zs = _lm_add(spec, z1, z2)
    Z3 = _lm_mul(
        spec,
        _lm_sub(spec, _lm_sub(spec, _lm_sq(spec, zs), Z1Z1), Z2Z2),
        H,
    )

    Xd, Yd, Zd = _double_lm(spec, x1, y1, z1)
    same = jnp.logical_and(_lm_is_zero(H), _lm_is_zero(r))
    X3 = _sel(same, Xd, X3)
    Y3 = _sel(same, Yd, Y3)
    Z3 = _sel(same, Zd, Z3)
    q_inf = _lm_is_zero(z2)
    X3 = _sel(q_inf, x1, X3)
    Y3 = _sel(q_inf, y1, Y3)
    Z3 = _sel(q_inf, z1, Z3)
    p_inf = _lm_is_zero(z1)
    X3 = _sel(p_inf, x2, X3)
    Y3 = _sel(p_inf, y2, Y3)
    Z3 = _sel(p_inf, z2, Z3)

    xo[...] = X3
    yo[...] = Y3
    zo[...] = Z3


def _lm_const(limbs, nb):
    """Python limb list -> [L, nb] broadcast constant (kernels cannot
    capture array constants; scalar fills are fine)."""
    return jnp.concatenate(
        [jnp.full((1, nb), int(v), jnp.uint32) for v in limbs], axis=0
    )


def _aff_neg(spec, y, negr):
    """In-kernel conditional y -> -y (0 - y mod p; maps 0 to 0)."""
    if negr is None:
        return y
    mask = negr[...][0] != 0
    return _sel(mask, _lm_sub(spec, jnp.zeros_like(y), y), y)


def _aff_cases(spec, x1, y1, i1, x2, y2, i2):
    """Shared branchless case analysis for the affine chord/tangent add:
    (d = x2 - x1, dbl, opp, degenerate)."""
    d = _lm_sub(spec, x2, x1)
    same_x = _lm_is_zero(d)
    y_eq = (y1 == y2).all(axis=0)  # canonical reps: bit-equality
    y1z = _lm_is_zero(y1)
    dbl = jnp.logical_and(same_x, jnp.logical_and(y_eq,
                                                  jnp.logical_not(y1z)))
    opp = jnp.logical_and(same_x, jnp.logical_not(dbl))
    degen = jnp.logical_or(jnp.logical_or(i1, i2), opp)
    return d, dbl, opp, degen


def _aff_denom_kernel(spec: FieldSpec, has_neg, x1r, y1r, i1r, x2r, y2r,
                      i2r, *rest):
    """Denominator of the affine-add slope: x2-x1 (chord), 2*y1
    (tangent), or 1 for degenerate lanes (keeps the batched inversion
    well-defined).  No field muls — this kernel exists so the ~8
    elementwise temporaries live in VMEM, not HBM."""
    (n1r, n2r, dref) = rest if has_neg else (None, None, rest[0])
    x1, y1 = x1r[...], _aff_neg(spec, y1r[...], n1r)
    x2, y2 = x2r[...], _aff_neg(spec, y2r[...], n2r)
    i1 = i1r[...][0] != 0
    i2 = i2r[...][0] != 0
    d, dbl, opp, degen = _aff_cases(spec, x1, y1, i1, x2, y2, i2)
    denom = _sel(dbl, _lm_add(spec, y1, y1), d)
    one = _lm_const(spec.one_mont_limbs, x1.shape[1])
    dref[...] = _sel(degen, one, denom)


def _aff_post_kernel(spec: FieldSpec, a_mont, has_neg, x1r, y1r, i1r, x2r,
                     y2r, i2r, *rest):
    """Completes the affine add given the batched-inverted denominators:
    lam = num * inv;  x3 = lam^2 - x1 - x2;  y3 = lam*(x1-x3) - y1;
    exceptional-case selects identical to SWCurve.affine_add."""
    if has_neg:
        n1r, n2r, invr, xo, yo, io = rest
    else:
        invr, xo, yo, io = rest
        n1r = n2r = None
    x1, y1 = x1r[...], _aff_neg(spec, y1r[...], n1r)
    x2, y2 = x2r[...], _aff_neg(spec, y2r[...], n2r)
    i1 = i1r[...][0] != 0
    i2 = i2r[...][0] != 0
    inv = invr[...]
    d, dbl, opp, degen = _aff_cases(spec, x1, y1, i1, x2, y2, i2)
    x1sq = _lm_sq(spec, x1)
    three = _lm_add(spec, _lm_add(spec, x1sq, x1sq), x1sq)
    if a_mont is not None:
        three = _lm_add(spec, three, _lm_const(a_mont, x1.shape[1]))
    num = _sel(dbl, three, _lm_sub(spec, y2, y1))
    lam = _lm_mul(spec, num, inv)
    x3 = _lm_sub(spec, _lm_sub(spec, _lm_sq(spec, lam), x1), x2)
    y3 = _lm_sub(spec, _lm_mul(spec, lam, _lm_sub(spec, x1, x3)), y1)
    x3 = _sel(i1, x2, _sel(i2, x1, x3))
    y3 = _sel(i1, y2, _sel(i2, y1, y3))
    # where(i1, i2, where(i2, i1, opp)) as pure logical ops — mosaic
    # cannot lower bool-operand select_n on 1-D vectors
    inf3 = jnp.logical_or(
        jnp.logical_and(i1, i2),
        jnp.logical_and(jnp.logical_not(i1),
                        jnp.logical_and(jnp.logical_not(i2), opp)),
    )
    xo[...] = x3
    yo[...] = y3
    io[...] = inf3.astype(jnp.uint32)[None, :]


AFFINE_BLOCK = 512


@functools.lru_cache(maxsize=None)
def _aff_denom_call(spec: FieldSpec, n: int, block: int, has_neg: bool,
                    interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    grid = (n // block,)
    dspec = pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    ins = [dspec, dspec, mspec, dspec, dspec, mspec]
    if has_neg:
        ins += [mspec, mspec]
    return pl.pallas_call(
        functools.partial(_aff_denom_kernel, spec, has_neg),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=grid,
        in_specs=ins,
        out_specs=dspec,
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _aff_post_call(spec: FieldSpec, a_mont, n: int, block: int,
                   has_neg: bool, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    grid = (n // block,)
    dspec = pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((L, n), jnp.uint32)
    ins = [dspec, dspec, mspec, dspec, dspec, mspec]
    if has_neg:
        ins += [mspec, mspec]
    return pl.pallas_call(
        functools.partial(_aff_post_kernel, spec, a_mont, has_neg),
        out_shape=(out, out, jax.ShapeDtypeStruct((1, n), jnp.uint32)),
        grid=grid,
        in_specs=ins + [dspec],
        out_specs=(dspec, dspec, mspec),
        interpret=interpret,
    )


def affine_add(spec: FieldSpec, a_mont, P, Q, inv_fn, neg1=None, neg2=None,
               block: int = AFFINE_BLOCK):
    """Fused batched affine chord/tangent addition (x, y, inf) + (x, y,
    inf) -> (x, y, inf): denominator kernel -> batched inversion ->
    completion kernel.  Bit-identical to SWCurve.affine_add's jnp path;
    ~7 field muls/lane with all elementwise temporaries in VMEM.

    a_mont: tuple of Montgomery limbs of the curve's `a`, or None when
    a == 0.  neg1/neg2: optional bool masks negating the operand's y
    in-kernel."""
    x1, y1, inf1 = P
    x2, y2, inf2 = Q
    i1 = jnp.broadcast_to(inf1, x1.shape[1:]).astype(jnp.uint32)[None]
    i2 = jnp.broadcast_to(inf2, x2.shape[1:]).astype(jnp.uint32)[None]
    has_neg = neg1 is not None or neg2 is not None
    arrs = [x1, y1, i1, x2, y2, i2]
    if has_neg:
        zero = jnp.zeros(x1.shape[1:], jnp.uint32)
        n1 = zero if neg1 is None else neg1.astype(jnp.uint32)
        n2 = zero if neg2 is None else neg2.astype(jnp.uint32)
        arrs += [jnp.broadcast_to(n1, x1.shape[1:])[None],
                 jnp.broadcast_to(n2, x2.shape[1:])[None]]
    flat, batch, n, padded = _flatten(spec, arrs, block)
    fx1, fy1, fi1, fx2, fy2, fi2 = flat[:6]
    extra = flat[6:]
    denom = _aff_denom_call(spec, padded, block, has_neg, _interp())(
        fx1, fy1, fi1, fx2, fy2, fi2, *extra)
    inv = inv_fn(denom)
    xo, yo, io = _aff_post_call(spec, a_mont, padded, block, has_neg,
                                _interp())(
        fx1, fy1, fi1, fx2, fy2, fi2, *extra, inv)
    L = spec.n_limbs
    return (
        xo[:, :n].reshape((L,) + batch),
        yo[:, :n].reshape((L,) + batch),
        (io[0, :n] != 0).reshape(batch),
    )


# ---------------------------------------------------------------------------
# packed-row affine level: V [2m, 128] interleaved pairs -> V' [m, 128]
#
# The MSM halving levels previously ran unpack x2 -> affine_add -> pack
# (three extra full transpose passes over the level data, ~5.6 ns per
# input row measured on v5e).  These kernels read the even/odd packed
# rows directly, transpose in-register, and the completion kernel
# writes PACKED result rows — the level becomes exactly two Pallas
# passes + the batched inversion.
# ---------------------------------------------------------------------------


def _row_coords(spec, t):
    """[blk, 128] packed rows -> (x [L, blk], y, inf [blk] bool)."""
    L = spec.n_limbs
    tt = t.T
    return tt[:L], tt[L : 2 * L], tt[2 * L] != 0


def _row_pairs(v_ref):
    """[2blk, 128] interleaved pair rows -> (even [blk, 128], odd).

    The split happens IN-KERNEL via a sublane reshape: materializing
    V[0::2]/V[1::2] in XLA produced 1.5 GB gather copies whose lifetimes
    the scheduler overlapped across levels (16.7 GB OOM at 2^20)."""
    t = v_ref[...]
    tt = t.reshape(-1, 2, 128)
    return tt[:, 0, :], tt[:, 1, :]


def _affr_denom_kernel(spec: FieldSpec, has_valid, v_ref, *rest):
    if has_valid:
        v1r, v2r, dref = rest
    else:
        (dref,) = rest
        v1r = v2r = None
    e, o = _row_pairs(v_ref)
    x1, y1, i1 = _row_coords(spec, e)
    x2, y2, i2 = _row_coords(spec, o)
    if has_valid:
        i1 = jnp.logical_or(i1, v1r[...][0] == 0)
        i2 = jnp.logical_or(i2, v2r[...][0] == 0)
    d, dbl, opp, degen = _aff_cases(spec, x1, y1, i1, x2, y2, i2)
    denom = _sel(dbl, _lm_add(spec, y1, y1), d)
    one = _lm_const(spec.one_mont_limbs, x1.shape[1])
    dref[...] = _sel(degen, one, denom)


def _affr_post_kernel(spec: FieldSpec, a_mont, has_valid, v_ref, *rest):
    if has_valid:
        v1r, v2r, invr, vout = rest
    else:
        invr, vout = rest
        v1r = v2r = None
    L = spec.n_limbs
    e, o = _row_pairs(v_ref)
    x1, y1, i1 = _row_coords(spec, e)
    x2, y2, i2 = _row_coords(spec, o)
    if has_valid:
        i1 = jnp.logical_or(i1, v1r[...][0] == 0)
        i2 = jnp.logical_or(i2, v2r[...][0] == 0)
    inv = invr[...]
    d, dbl, opp, degen = _aff_cases(spec, x1, y1, i1, x2, y2, i2)
    x1sq = _lm_sq(spec, x1)
    three = _lm_add(spec, _lm_add(spec, x1sq, x1sq), x1sq)
    if a_mont is not None:
        three = _lm_add(spec, three, _lm_const(a_mont, x1.shape[1]))
    num = _sel(dbl, three, _lm_sub(spec, y2, y1))
    lam = _lm_mul(spec, num, inv)
    x3 = _lm_sub(spec, _lm_sub(spec, _lm_sq(spec, lam), x1), x2)
    y3 = _lm_sub(spec, _lm_mul(spec, lam, _lm_sub(spec, x1, x3)), y1)
    x3 = _sel(i1, x2, _sel(i2, x1, x3))
    y3 = _sel(i1, y2, _sel(i2, y1, y3))
    inf3 = jnp.logical_or(
        jnp.logical_and(i1, i2),
        jnp.logical_and(jnp.logical_not(i1),
                        jnp.logical_and(jnp.logical_not(i2), opp)),
    )
    blk = x3.shape[1]
    pad = 128 - (2 * L + 1)
    cols = jnp.concatenate(
        [x3, y3, inf3.astype(jnp.uint32)[None, :],
         jnp.zeros((pad, blk), jnp.uint32)], axis=0)
    vout[...] = cols.T


@functools.lru_cache(maxsize=None)
def _affr_denom_call(spec: FieldSpec, n: int, block: int, has_valid: bool,
                     interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    grid = (n // block,)
    r2spec = pl.BlockSpec((2 * block, 128), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    ins = [r2spec] + ([mspec, mspec] if has_valid else [])
    return pl.pallas_call(
        functools.partial(_affr_denom_kernel, spec, has_valid),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=grid,
        in_specs=ins,
        out_specs=dspec,
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _affr_post_call(spec: FieldSpec, a_mont, n: int, block: int,
                    has_valid: bool, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    grid = (n // block,)
    rspec = pl.BlockSpec((block, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    r2spec = pl.BlockSpec((2 * block, 128), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    ins = [r2spec] + ([mspec, mspec] if has_valid else []) + [dspec]
    return pl.pallas_call(
        functools.partial(_affr_post_kernel, spec, a_mont, has_valid),
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.uint32),
        grid=grid,
        in_specs=ins,
        out_specs=rspec,
        interpret=interpret,
    )


def affine_add_rows(spec: FieldSpec, a_mont, V, valid, inv_fn,
                    block: int = AFFINE_BLOCK):
    """One halving level on packed rows: V [2m, 128] (pairs interleaved
    even/odd) -> result rows [m, 128].  ``valid``: optional bool [2m] —
    invalid slots are treated as infinity (the expansion's pad slots).
    Bit-identical to unpack -> affine_add -> pack."""
    from .mont_pallas import pad_bucket

    m = V.shape[0] // 2
    has_valid = valid is not None
    extra = []
    if has_valid:
        extra = [valid[0::2].astype(jnp.uint32)[None],
                 valid[1::2].astype(jnp.uint32)[None]]
    padded = pad_bucket(m, block)
    if padded != m:
        V = jnp.pad(V, ((0, 2 * (padded - m)), (0, 0)))
        extra = [jnp.pad(v, ((0, 0), (0, padded - m))) for v in extra]
    denom = _affr_denom_call(spec, padded, block, has_valid, _interp())(
        V, *extra)
    inv = inv_fn(denom)
    out = _affr_post_call(spec, a_mont, padded, block, has_valid,
                          _interp())(V, *extra, inv)
    return out[:m]


DEFAULT_BLOCK = 128  # ~25 live [L, N] temporaries must fit 16MB VMEM


@functools.lru_cache(maxsize=None)
def _madd_call(spec: FieldSpec, n: int, block: int,
               interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    grid = (n // block,)
    dspec = pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((L, n), jnp.uint32)
    return pl.pallas_call(
        functools.partial(_madd_kernel, spec),
        out_shape=(out, out, out),
        grid=grid,
        in_specs=[dspec] * 3 + [dspec, dspec, mspec],
        out_specs=(dspec, dspec, dspec),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _add_call(spec: FieldSpec, n: int, block: int,
              interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    grid = (n // block,)
    dspec = pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((L, n), jnp.uint32)
    return pl.pallas_call(
        functools.partial(_add_kernel, spec),
        out_shape=(out, out, out),
        grid=grid,
        in_specs=[dspec] * 6,
        out_specs=(dspec, dspec, dspec),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _double_call(spec: FieldSpec, n: int, block: int,
                 interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    grid = (n // block,)
    dspec = pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((L, n), jnp.uint32)
    return pl.pallas_call(
        functools.partial(_double_kernel, spec),
        out_shape=(out, out, out),
        grid=grid,
        in_specs=[dspec] * 3,
        out_specs=(dspec, dspec, dspec),
        interpret=interpret,
    )


def double(spec: FieldSpec, P, block: int = DEFAULT_BLOCK):
    """Fused Jacobian doubling (a = 0)."""
    flat, batch, n, padded = _flatten(spec, list(P), block)
    xo, yo, zo = _double_call(spec, padded, block, _interp())(*flat)
    L = spec.n_limbs
    return (
        xo[:, :n].reshape((L,) + batch),
        yo[:, :n].reshape((L,) + batch),
        zo[:, :n].reshape((L,) + batch),
    )


def _flatten(spec, arrs, block):
    """Limb-major [K, *batch] arrays -> [K, n_padded] flats (widths
    bucketized to {2^k, 0.75*2^k} so kernel shapes are reused)."""
    from .mont_pallas import pad_bucket

    batch = arrs[0].shape[1:]
    n = int(np.prod(batch)) if batch else 1
    padded = pad_bucket(n, block)
    flat = []
    for a in arrs:
        f = a.reshape((a.shape[0], n))
        if padded != n:
            f = jnp.pad(f, [(0, 0), (0, padded - n)])
        flat.append(f)
    return flat, batch, n, padded


def madd(spec: FieldSpec, P, aff, block: int = DEFAULT_BLOCK):
    """Fused mixed add; P = (x, y, z) uint32[L, ...]; aff = (x2, y2, inf)."""
    x1, y1, z1 = P
    x2, y2, inf = aff
    x2b = jnp.broadcast_to(x2, x1.shape)
    y2b = jnp.broadcast_to(y2, x1.shape)
    infb = jnp.broadcast_to(inf, x1.shape[1:]).astype(jnp.uint32)[None]
    (fx1, fy1, fz1, fx2, fy2, finf), batch, n, padded = _flatten(
        spec, [x1, y1, z1, x2b, y2b, infb], block
    )
    xo, yo, zo = _madd_call(spec, padded, block, _interp())(
        fx1, fy1, fz1, fx2, fy2, finf)
    L = spec.n_limbs
    return (
        xo[:, :n].reshape((L,) + batch),
        yo[:, :n].reshape((L,) + batch),
        zo[:, :n].reshape((L,) + batch),
    )


def add(spec: FieldSpec, P, Q, block: int = DEFAULT_BLOCK):
    """Fused full Jacobian add."""
    arrs = [jnp.broadcast_to(a, P[0].shape) for a in (*P, *Q)]
    flat, batch, n, padded = _flatten(spec, arrs, block)
    xo, yo, zo = _add_call(spec, padded, block, _interp())(*flat)
    L = spec.n_limbs
    return (
        xo[:, :n].reshape((L,) + batch),
        yo[:, :n].reshape((L,) + batch),
        zo[:, :n].reshape((L,) + batch),
    )
