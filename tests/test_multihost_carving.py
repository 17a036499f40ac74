"""Per-host loader carving (parallel/multihost.shard_loaders_for_host):
simulated process topologies via monkeypatched jax.process_count/index —
verifies every host gets a disjoint item shard, batch sizes divide, host
shard sizes/batch counts are equalized (pod-desync guard), the union covers
the full split, and validation batch weights reflect GLOBAL real-item
counts (no real multi-process job needed)."""

import jax
import numpy as np
import pytest

from preset_gen_vae_tpu.data.pipeline import SplitLoader
from preset_gen_vae_tpu.parallel.multihost import (
    _equalized_shard_sizes,
    _global_batch_weights,
    host_item_range,
    shard_loaders_for_host,
)


def _loaders(n_items=50, batch=8):
    tensors = {
        "x": np.arange(n_items, dtype=np.float32).reshape(n_items, 1),
        "v": np.arange(n_items, dtype=np.float32).reshape(n_items, 1) * 2,
        "info": np.stack([np.arange(n_items)] * 3, axis=1).astype(np.int32),
    }
    idx = np.arange(n_items)
    return {
        "train": SplitLoader(tensors, idx[:40], batch, shuffle=True,
                             drop_last=True, seed=0),
        "validation": SplitLoader(tensors, idx[40:], batch, shuffle=False,
                                  drop_last=False, pad_to_full=True),
    }


@pytest.mark.parametrize("n_proc", [2, 4])
def test_carving_partitions_items(monkeypatch, n_proc):
    served = {name: set() for name in ("train", "validation")}
    shard_sizes = {name: [] for name in ("train", "validation")}
    batch_counts = {name: [] for name in ("train", "validation")}
    monkeypatch.setattr(jax, "process_count", lambda: n_proc)
    for p in range(n_proc):
        monkeypatch.setattr(jax, "process_index", lambda p=p: p)
        out = shard_loaders_for_host(_loaders())
        for name, ld in out.items():
            assert ld.batch_size == 8 // n_proc
            # the local tensors contain exactly the served rows: recover the
            # original item ids from the 'info' column
            ids = ld.tensors["info"][ld.item_indexes, 0]
            served[name] |= set(int(i) for i in ids)
            shard_sizes[name].append(ld.n_items)
            batch_counts[name].append(len(ld))
            # tensors were actually carved down (no host holds everything)
            assert len(ld.tensors["x"]) < 50
    # union across hosts == the original split (shard equalization may
    # duplicate an item on short hosts, but never invents or drops one)
    assert served["train"] == set(range(40))
    assert served["validation"] == set(range(40, 50))
    # every host runs the SAME shard size and batch count — unequal counts
    # would desync the pod's collective dispatches at the epoch boundary
    for name in ("train", "validation"):
        assert len(set(shard_sizes[name])) == 1, shard_sizes[name]
        assert len(set(batch_counts[name])) == 1, batch_counts[name]


@pytest.mark.parametrize("n_proc", [2, 4])
def test_validation_weights_use_global_counts(monkeypatch, n_proc):
    """Sum of batch weights x global slots == total REAL validation items:
    neither shard-equalization padding nor final-batch cyclic padding may
    count toward validation means."""
    monkeypatch.setattr(jax, "process_count", lambda: n_proc)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    out = shard_loaders_for_host(_loaders())
    ld = out["validation"]
    assert ld.batch_weights is not None
    slots = ld.batch_size * n_proc
    total_real = sum(ld.batch_weight(i) * slots for i in range(len(ld)))
    assert total_real == pytest.approx(10)  # 10 real validation items
    # all weights in (0, 1]
    assert all(0 < ld.batch_weight(i) <= 1 for i in range(len(ld)))


def test_equalized_shard_sizes_and_weights():
    real, common = _equalized_shard_sizes(10, 4)
    assert list(real) == [3, 3, 2, 2] and common == 3
    # local batch 2, not drop_last: 2 batches; global slots = 8/batch
    w = _global_batch_weights(real, common, local_bs=2, drop_last=False)
    # batch 0: all hosts full (8 real / 8); batch 1: [1,1,0,0] real / 8
    assert np.allclose(w, [1.0, 0.25])
    # drop_last case
    w2 = _global_batch_weights(real, common, local_bs=3, drop_last=True)
    assert np.allclose(w2, [10 / 12])


def test_indivisible_batch_raises(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 3)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    with pytest.raises(ValueError):
        shard_loaders_for_host(_loaders(batch=8))


def test_single_process_passthrough():
    loaders = _loaders()
    assert shard_loaders_for_host(loaders) is loaders
    forced = shard_loaders_for_host(loaders, force=True)
    assert forced is not loaders
    assert forced["train"].batch_size == 8
    assert forced["train"].n_items == 40


def test_host_item_range_covers(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 3)
    spans = []
    for p in range(3):
        monkeypatch.setattr(jax, "process_index", lambda p=p: p)
        spans.append(host_item_range(10))
    assert spans[0][0] == 0 and spans[-1][1] == 10
    for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
        assert e0 == s1
    assert max(e - s for s, e in spans) - min(e - s for s, e in spans) <= 1
