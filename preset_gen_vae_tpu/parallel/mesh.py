"""Device-mesh data parallelism — the TPU-native replacement for the
reference's single-process ``nn.DataParallel`` wrap (reference:
train.py:77-97; SURVEY.md §2.10).

Design: one jitted train step runs SPMD over a 1-D ``data`` mesh axis.
Batches are sharded on their leading axis with ``NamedSharding``; parameters
and optimizer state are replicated. Gradient reduction happens *inside* XLA:
with replicated params and a sharded batch, the grad contraction requires a
cross-replica sum and GSPMD inserts the ``psum`` over ICI automatically —
no explicit collectives, no NCCL analog (SURVEY.md §5.8).

BatchNorm note: the reference's DataParallel computed *per-replica* BN batch
stats. Under GSPMD the batch-mean reduction spans the full global batch, so
our BN is effectively sync-BN — a strict improvement in estimator quality,
flagged here because it is an intentional semantic difference.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    n_devices: int = -1,
    devices: Optional[Sequence] = None,
    axis_name: str = DATA_AXIS,
) -> Mesh:
    """Builds a 1-D data-parallel mesh over local devices.

    :param n_devices: number of devices to use; -1 = all local devices
        (reference analog: the CUDA device list, train.py:89-94).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, ndim: int, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding for a batch tensor: leading axis split over ``data``."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, opt state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = DATA_AXIS):
    """Places a host pytree of arrays onto the mesh, leading axis sharded.

    The replacement for the reference's per-minibatch blocking ``.to(device)``
    copies (train.py:207,265)."""

    def _put(x):
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x), axis_name))

    return jax.tree_util.tree_map(_put, batch)
