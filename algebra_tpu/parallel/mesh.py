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
