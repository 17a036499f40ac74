"""Multi-host (pod-scale) scaffolding.

The reference has no multi-process story at all (SURVEY.md §2.10: a single
process, nn.DataParallel). At pod scale the TPU-native recipe is:

- every host runs the SAME program (`jax.distributed.initialize` +
  one global mesh over all devices);
- each host feeds only its local shard of the global batch
  (`jax.make_array_from_process_local_data`), so batch data rides
  host->local-device PCIe only — gradients ride ICI/DCN via the same
  GSPMD psum as the single-host path;
- the per-host corpus is the item-range owned by that host's process
  index (deterministic split below), so no host loads the full dataset.

Single-host meshes exercise this module's helpers trivially (process
count 1), which is how the tests cover it; the real multi-host path only
differs by `jax.distributed.initialize` having connected several
processes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Connects this process into a multi-host JAX job. No-op when the
    job is single-process (the common local case)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data mesh over ALL devices of ALL processes."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def host_item_range(n_items: int) -> Tuple[int, int]:
    """[start, end) of the corpus items this host owns (contiguous
    per-process split; deterministic)."""
    p, n = jax.process_index(), jax.process_count()
    per = n_items // n
    extra = n_items % n
    start = p * per + min(p, extra)
    end = start + per + (1 if p < extra else 0)
    return start, end


def make_global_batch(mesh: Mesh, local_batch, axis_name: str = DATA_AXIS):
    """Assembles a globally-sharded batch from each host's LOCAL shard.

    ``local_batch`` is a pytree of numpy arrays holding this host's
    ``global_batch_size / process_count`` items. Returns jax Arrays whose
    global shape covers all hosts, without any host ever materializing the
    full batch."""

    def _make(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        sharding = NamedSharding(mesh, P(axis_name, *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(_make, local_batch)
