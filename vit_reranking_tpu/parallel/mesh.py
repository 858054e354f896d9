"""Device mesh and sharding helpers — the distributed-communication layer.

Replaces the reference's single-process ``nn.DataParallel``
(train_baseline.py:88, train_msls_baseline.py:104-106) with a JAX device mesh:
gradients reduce over the ``data`` axis via XLA collectives on ICI, parameters
are replicated, and eval-time feature banks gather with ``all_gather``.  A
spare ``model`` axis is part of the mesh API so embedding-dim sharding (TP)
stays available even though the reference's <30M-param backbones don't need it
(SURVEY.md section 2.10).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    mesh_shape: Optional[str] = None,
) -> Mesh:
    """Build a Mesh.  ``mesh_shape`` is e.g. "data:8" or "data:4,model:2";
    default is all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if mesh_shape:
        axes = [kv.split(":") for kv in mesh_shape.split(",")]
        names = tuple(a[0] for a in axes)
        sizes = tuple(int(a[1]) for a in axes)
    else:
        names = (DATA_AXIS,)
        sizes = (len(devices),)
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh {sizes} does not cover {len(devices)} devices")
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, names)


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """First axis sharded over data, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the leading axis sharded over data."""
    def put(x):
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))

    return jax.tree.map(put, batch)


def tp_state_shardings(mesh: Mesh, state, rules):
    """Build a sharding pytree matching ``state``: leaves whose key-path
    contains a rule substring get that rule's PartitionSpec (when the rank
    fits), everything else replicates.

    Used to shard e.g. the embedding head over the ``model`` axis — the
    reference's backbones are small enough that only the data axis matters
    (SURVEY.md section 2.10), but the TP plumbing stays first-class.
    """

    def leaf(path, x):
        keys = "/".join(str(getattr(p, "key", getattr(p, "name", ""))) for p in path)
        for sub, spec in rules:
            if sub in keys and getattr(x, "ndim", 0) == len(spec):
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf, state)


def pad_to_multiple(x, multiple: int, axis: int = 0, value=0):
    """Pad the leading axis so it divides the data-axis size; returns
    (padded, n_real)."""
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(np.asarray(x), widths, constant_values=value), n
