"""Pallas kernels for packed point rows ([N, 128] u32).

The MSM affine bucket tree stores points as flat 2-D 512-byte rows
[x | y | inf | pad] — measured on v5e, row gathers on 128-u32-wide 2-D
arrays run ~15 ns/row vs ~60 ns for narrower or 3-D layouts, and 2-D
form avoids XLA's catastrophic [g, m, 1] tile padding (128x observed).
These kernels convert between limb-major [L, N] coordinate arrays and
packed rows entirely in VMEM (the jnp moveaxis/concatenate equivalents
materialize padded HBM temporaries).

Row layout: cols [0, L) = x, [L, 2L) = y, col 2L = inf flag, rest pad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.spec import FieldSpec
from .mont_pallas import _interp, _lm_sub, pad_bucket


def _use_pallas() -> bool:
    """Pallas path on TPU or under interpret mode; pure-jnp fallback on
    CPU (bit-identical; the kernels exist to control layout/temps)."""
    from .. import config

    return config.pallas_enabled() or config.pallas_interpret

ROW_W = 128  # 512 B: one (8,128)-tile lane row; fields up to 62 limbs


def _pack_kernel(L: int, x_ref, y_ref, i_ref, o_ref):
    blk = x_ref.shape[1]
    pad = ROW_W - (2 * L + 1)
    cols = jnp.concatenate(
        [x_ref[...], y_ref[...], i_ref[...],
         jnp.zeros((pad, blk), jnp.uint32)], axis=0)
    o_ref[...] = cols.T


@functools.lru_cache(maxsize=None)
def _pack_call(L: int, n: int, block: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (n // block,)
    cspec = pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((block, ROW_W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_pack_kernel, L),
        out_shape=jax.ShapeDtypeStruct((n, ROW_W), jnp.uint32),
        grid=grid,
        in_specs=[cspec, cspec, mspec],
        out_specs=rspec,
        interpret=interpret,
    )


def pack(spec: FieldSpec, x, y, inf, block: int = 1024):
    """(x, y [L, n], inf [n] bool/u32) -> packed rows [n, 128].

    Pad rows (from lane bucketing) come out all-zero with inf == 0;
    callers must not index them (gather sources are always clamped)."""
    L = spec.n_limbs
    n = x.shape[1]
    if not _use_pallas():
        i2 = jnp.broadcast_to(inf, (n,)).astype(jnp.uint32)[None, :]
        cols = jnp.concatenate(
            [x, y, i2, jnp.zeros((ROW_W - 2 * L - 1, n), jnp.uint32)],
            axis=0)
        return cols.T
    padded = pad_bucket(n, block)
    i2 = jnp.broadcast_to(inf, (n,)).astype(jnp.uint32)[None, :]
    if padded != n:
        pad = ((0, 0), (0, padded - n))
        x, y, i2 = jnp.pad(x, pad), jnp.pad(y, pad), jnp.pad(i2, pad)
    return _pack_call(L, padded, block, _interp())(x, y, i2)[:n]


def _unpack_kernel(L: int, r_ref, x_ref, y_ref, i_ref):
    t = r_ref[...].T  # [ROW_W, blk]
    x_ref[...] = t[:L]
    y_ref[...] = t[L : 2 * L]
    i_ref[...] = t[2 * L : 2 * L + 1]


@functools.lru_cache(maxsize=None)
def _unpack_call(L: int, n: int, block: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (n // block,)
    cspec = pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((block, ROW_W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_unpack_kernel, L),
        out_shape=(
            jax.ShapeDtypeStruct((L, n), jnp.uint32),
            jax.ShapeDtypeStruct((L, n), jnp.uint32),
            jax.ShapeDtypeStruct((1, n), jnp.uint32),
        ),
        grid=grid,
        in_specs=[rspec],
        out_specs=(cspec, cspec, mspec),
        interpret=interpret,
    )


def unpack(spec: FieldSpec, rows, block: int = 1024):
    """Packed rows [n, 128] -> (x [L, n], y [L, n], inf [n] bool)."""
    L = spec.n_limbs
    n = rows.shape[0]
    if not _use_pallas():
        t = rows.T
        return t[:L], t[L : 2 * L], (t[2 * L] != 0)
    padded = pad_bucket(n, block)
    if padded != n:
        rows = jnp.pad(rows, ((0, padded - n), (0, 0)))
    x, y, i2 = _unpack_call(L, padded, block, _interp())(rows)
    return x[:, :n], y[:, :n], (i2[0, :n] != 0)


def _neg_kernel(spec: FieldSpec, r_ref, n_ref, o_ref):
    """Conditionally negate the y coordinate of packed rows (0 -> 0, so
    infinity/sentinel rows stay canonical)."""
    L = spec.n_limbs
    t = r_ref[...].T  # [ROW_W, blk]
    neg = n_ref[...][0] != 0
    y = t[L : 2 * L]
    ny = _lm_sub(spec, jnp.zeros_like(y), y)
    y2 = jnp.where(neg[None, :], ny, y)
    o_ref[...] = jnp.concatenate([t[:L], y2, t[2 * L :]], axis=0).T


@functools.lru_cache(maxsize=None)
def _neg_call(spec: FieldSpec, n: int, block: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (n // block,)
    mspec = pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((block, ROW_W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_neg_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((n, ROW_W), jnp.uint32),
        grid=grid,
        in_specs=[rspec, mspec],
        out_specs=rspec,
    interpret=interpret,
    )


_EXP_UBLK = 1024  # units per grid step (1-D SMEM operands tile T(1024))
_EXP_NSEM = 16    # outstanding DMAs


def _expand_kernel(U: int, us_ref, src_ref, out_ref, sem):
    """out rows [j*U, (j+1)*U) <- src rows [us[j], us[j]+U) per unit j.

    us arrives in SMEM per block; src stays in HBM (ANY) and each unit
    is ONE U-row (U*512 B) DMA — _EXP_NSEM copies ride ahead of the
    wait, so issue overlaps transfer.  Measured 11.8 ns/row at U=8 vs
    30.3 ns/row for the composed jnp expansion and 15.6 ns/row for a
    plain row gather (exp/gather_pallas.py, v5e)."""
    def get_dma(j):
        return _pltpu().make_async_copy(
            src_ref.at[_pl().ds(us_ref[j], U)],
            out_ref.at[_pl().ds(j * U, U)],
            sem.at[j % _EXP_NSEM],
        )

    for j in range(_EXP_NSEM):
        get_dma(j).start()

    def body(j, _):
        @_pl().when(j + _EXP_NSEM < _EXP_UBLK)
        def _():
            get_dma(j + _EXP_NSEM).start()

        get_dma(j).wait()
        return 0

    jax.lax.fori_loop(0, _EXP_UBLK, body, 0)


def _pl():
    from jax.experimental import pallas as pl

    return pl


def _pltpu():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu


@functools.lru_cache(maxsize=None)
def _expand_call(mu: int, U: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        functools.partial(_expand_kernel, U),
        out_shape=jax.ShapeDtypeStruct((mu * U, ROW_W), jnp.uint32),
        grid=(mu // _EXP_UBLK,),
        in_specs=[
            pl.BlockSpec((_EXP_UBLK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((_EXP_UBLK * U, ROW_W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_EXP_NSEM,))],
    interpret=interpret,
    )


def expand_units(src, us, U: int):
    """Run-batched row expansion: out[j*U + t] = src[us[j] + t].

    src: packed rows [S, 128]; us: int32[mu] unit source starts (caller
    clamps to S - U).  The MSM bucket phase uses this to expand sorted
    bucket runs into 2^k-padded slot layouts — contiguity inside runs
    makes every unit one contiguous U-row copy."""
    mu = us.shape[0]
    if not _use_pallas():
        idx = (us[:, None] + jnp.arange(U, dtype=us.dtype)[None, :])
        return src[idx.reshape(-1)]
    mu_p = -(-mu // _EXP_UBLK) * _EXP_UBLK
    if mu_p != mu:
        us = jnp.pad(us, (0, mu_p - mu))
    out = _expand_call(mu_p, U, _interp())(us, src)
    return out[: mu * U]


def negate_y(spec: FieldSpec, rows, neg, block: int = 1024):
    """rows [n, 128] with y := -y where neg (bool [n])."""
    n = rows.shape[0]
    if not _use_pallas():
        from . import mont

        t = rows.T
        y = t[spec.n_limbs : 2 * spec.n_limbs]
        y2 = jnp.where(neg[None, :], mont.neg(spec, y), y)
        return jnp.concatenate(
            [t[: spec.n_limbs], y2, t[2 * spec.n_limbs :]], axis=0).T
    padded = pad_bucket(n, block)
    negu = neg.astype(jnp.uint32)[None, :]
    if padded != n:
        rows = jnp.pad(rows, ((0, padded - n), (0, 0)))
        negu = jnp.pad(negu, ((0, 0), (0, padded - n)))
    return _neg_call(spec, padded, block, _interp())(rows, negu)[:n]
