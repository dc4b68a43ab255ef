"""Device mesh helpers — the "comms backend" of the framework.

The reference has no distributed runtime at all (its only parallelism is
shared-memory rayon, SURVEY.md §2.8); this module is the TPU-native
component designed in its place: jax.sharding meshes over ICI, with the
collectives (psum / all_to_all / all_gather) used by the sharded NTT and
MSM kernels in this package.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def default_mesh(n_devices: int | None = None, axis: str = "x") -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_leading(mesh: Mesh, axis: str = "x") -> NamedSharding:
    """Sharding that splits the leading BATCH axis of a limb-major
    [L, n, ...] array (array axis 1; the limb axis stays replicated)."""
    return NamedSharding(mesh, PartitionSpec(None, axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_map_compat(f, mesh: Mesh, in_specs, out_specs):
    """shard_map across jax versions, with the varying-manual-axes
    checker ON (jax's one static guard on cross-shard correctness).
    Scan carries initialized from replicated constants are pcast to the
    data's vma set where needed (utils/vma.match_vma); outputs built by
    in-body all_gathers — whose replication the checker cannot infer —
    are instead returned through sharded out_specs and folded outside.

    jax >= 0.8: jax.shard_map(check_vma=True); older: the experimental
    module's check_rep=True."""
    try:
        from jax import shard_map as sm

        try:
            return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      check_vma=True)
        except TypeError:  # pragma: no cover - future kwarg change
            return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as sm_exp

        return sm_exp(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      check_rep=True)
