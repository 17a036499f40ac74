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


def _equalized_shard_sizes(n_items: int, n_hosts: int) -> Tuple[np.ndarray, int]:
    """(real per-host shard sizes, common padded size). Host shards from
    ``host_item_range`` can differ by 1 item; every host is cyclically
    padded up to the max so all hosts run IDENTICAL epoch batch counts —
    otherwise hosts issue different numbers of collective dispatches per
    epoch and the pod job desyncs at the epoch boundary."""
    per, extra = divmod(n_items, n_hosts)
    real = np.array(
        [per + (1 if q < extra else 0) for q in range(n_hosts)], dtype=np.int64
    )
    return real, int(real.max())


def _global_batch_weights(
    real_sizes: np.ndarray, common: int, local_bs: int, drop_last: bool
) -> np.ndarray:
    """Per-global-batch fraction of REAL rows, counting every host's shard.
    Batch i of the global batch concatenates each host's local batch i;
    padded rows (shard equalization + final-batch cyclic padding) must not
    count toward validation means."""
    if drop_last:
        n_batches = common // local_bs
    else:
        n_batches = (common + local_bs - 1) // local_bs
    w = np.empty(n_batches, dtype=np.float64)
    slots = local_bs * len(real_sizes)
    for i in range(n_batches):
        real = np.clip(real_sizes - i * local_bs, 0, local_bs).sum()
        w[i] = real / slots
    return w


def shard_loaders_for_host(loaders, force: bool = False):
    """Per-host data sharding: carves every split loader down to this
    host's contiguous ``host_item_range`` of items (so no host loads the
    full corpus) and divides the batch size by ``process_count`` (so each
    host serves exactly its local shard of the global batch —
    ``make_global_batch`` assembles the rest).

    Host shards are equalized to a common item count by cyclic padding
    (``_equalized_shard_sizes``), so every host runs the same number of
    batches per epoch — per-host batch-count divergence would desync the
    pod's collectives. Validation weights come from the GLOBAL real-item
    counts via ``SplitLoader.batch_weights``.

    Per-host epoch shuffles run over *disjoint* item sets, so the global
    batch is a concatenation of independent per-host samples — the
    standard pod input-pipeline semantics (vs the reference's
    single-process global shuffle, data/build.py:43-79).

    Single-process jobs pass through unchanged unless ``force`` is set
    (integration tests exercise the full path at process_count=1)."""
    n = jax.process_count()
    if n <= 1 and not force:
        return loaders
    from ..data.pipeline import SplitLoader

    out = {}
    for name, ld in loaders.items():
        if ld.batch_size % n != 0:
            raise ValueError(
                f"minibatch_size {ld.batch_size} not divisible by "
                f"process_count {n}"
            )
        s, e = host_item_range(ld.n_items)
        real_sizes, common = _equalized_shard_sizes(ld.n_items, n)
        # cyclic-pad this host's item list to the common per-host size
        local = np.resize(np.asarray(ld.item_indexes[s:e]), common)
        # slice the corpus rows this host actually serves; remap the
        # split's global row ids into the local tensors
        rows = np.unique(local)
        remap = np.full(int(rows.max()) + 1 if len(rows) else 1, -1,
                        dtype=np.int64)
        remap[rows] = np.arange(len(rows))
        from ..data.corpus_device import ChunkedDeviceCorpus

        if isinstance(ld.tensors.get("x"), ChunkedDeviceCorpus):
            # corpus_cache_policy='device' is single-host: carving the
            # device-resident corpus into host shards would fetch it
            # through the downlink — the exact transfer the policy
            # removes (training/loop.py raises the same way; round-4
            # advisor medium finding: the old isinstance check there ran
            # AFTER this conversion and could never fire)
            raise ValueError(
                "corpus_cache_policy='device' cannot be host-sharded; "
                "use corpus_cache_policy='disk' for multihost runs"
            )
        tensors = {k: np.asarray(t)[rows] for k, t in ld.tensors.items()}
        local_bs = ld.batch_size // n
        out[name] = SplitLoader(
            tensors,
            remap[local],
            batch_size=local_bs,
            shuffle=ld.shuffle,
            drop_last=ld.drop_last,
            seed=ld.seed,
            pad_to_full=ld.pad_to_full,
            batch_weights=_global_batch_weights(
                real_sizes, common, local_bs, ld.drop_last
            ),
        )
        assert len(out[name]) * local_bs >= common or ld.drop_last
    return out


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
