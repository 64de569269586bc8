"""Device mesh construction and sharding helpers.

One 1-D ``data`` axis covers every parallel pattern this workload has
(SURVEY §5.8): the model is ~0.6 M params so tensor/pipeline sharding is
unmotivated; scale lives in the batch (scans, triplets), the keyframe-graph
node dimension, and the retrieval-database row dimension — all of which
shard along one axis whose collectives ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None,
                axis_names: Sequence[str] = ("data",)) -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices (all by default)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} present")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=tuple(axis_names))


def data_sharding(mesh: Mesh, *spec) -> NamedSharding:
    """NamedSharding for ``mesh`` with the given PartitionSpec entries."""
    return NamedSharding(mesh, P(*spec))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def shard_array(arr, mesh: Mesh, axis: str = "data"):
    """Shard an array's leading dimension across ``axis``. The dimension
    must be divisible by the mesh axis size (pad first if not — see
    ``parallel.train.pad_to_multiple``)."""
    n = mesh.shape[axis]
    if arr.shape[0] % n != 0:
        raise ValueError(
            f"leading dim {arr.shape[0]} not divisible by mesh axis "
            f"'{axis}' of size {n}")
    spec = (axis,) + (None,) * (arr.ndim - 1)
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))
