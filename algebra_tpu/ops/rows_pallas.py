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
