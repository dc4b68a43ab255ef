"""Multi-chip MSM: point-sharded Pippenger with cross-chip reduction.

The reference's MSM parallelism is a rayon loop over windows
(ec/src/scalar_mul/variable_base/mod.rs:110); across chips the natural
axis is *points*: each device runs the full vectorized Pippenger
(ops/msm.py) on its shard of (bases, scalars), producing one partial
Jacobian point; partial points are then combined with log2(D)
tree-structured group additions after an all_gather of 3 coordinates —
a few hundred bytes of ICI traffic total, so scaling efficiency is
essentially the local-MSM fraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from .mesh import shard_map_compat
from jax.sharding import PartitionSpec as P

from ..ops import msm as msm_mod


def sharded_msm(curve, mesh, bases_aff, scalars, c=None, axis: str = "x"):
    """MSM with bases/scalars sharded over the mesh axis.

    bases_aff: (x, y, inf) affine batch [n]; scalars: uint32[Ls, n]
    canonical limb-major limbs.  n must be divisible by the mesh size.
    Returns a replicated Jacobian point.
    """
    n = scalars.shape[1]
    D = mesh.shape[axis]
    if n % D:
        # ragged point counts: pad with (infinity, scalar 0) lanes —
        # both are MSM identities, so the result is unchanged.
        pad = D - n % D
        x, y, inf = bases_aff
        bases_aff = (
            jax.tree_util.tree_map(
                lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)]), x
            ),
            jax.tree_util.tree_map(
                lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)]), y
            ),
            jnp.pad(inf, (0, pad), constant_values=True),
        )
        scalars = jnp.pad(scalars, [(0, 0), (0, pad)])
        n += pad
    if c is None:
        c = msm_mod.default_window_size(n // D)

    def local(x, y, inf, sc):
        part = msm_mod.msm(curve, (x, y, inf), sc, c=c)  # local Jacobian point
        # expose a size-1 batch axis; the sharded out_spec concatenates
        # the D partials at the shard_map boundary (this boundary concat
        # IS the all_gather — it keeps the checker's varying-axis types
        # sound, unlike an in-body gather whose replicated result the
        # checker cannot statically infer)
        return jax.tree_util.tree_map(lambda a: a[:, None], part)

    x, y, inf = bases_aff
    spec_in = (
        _tree_spec(x, P(None, axis)),
        _tree_spec(y, P(None, axis)),
        P(axis),
        P(None, axis),
    )
    out_spec = (
        _tree_spec(x, P(None, axis)),
        _tree_spec(y, P(None, axis)),
        _tree_spec(y, P(None, axis)),
    )
    mapped = shard_map_compat(local, mesh, spec_in, out_spec)
    parts = mapped(x, y, inf, scalars)
    # fold the D partial points (one scan-compiled add body; D is tiny)
    return msm_mod.scan_sum(curve, tuple(parts), axis=0)


def _tree_spec(value, spec):
    return jax.tree_util.tree_map(lambda _: spec, value)
