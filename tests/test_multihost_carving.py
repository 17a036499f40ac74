"""Per-host loader carving (parallel/multihost.shard_loaders_for_host):
simulated process topologies via monkeypatched jax.process_count/index —
verifies every host gets a disjoint item shard, batch sizes divide, and the
union covers the full split (no real multi-process job needed)."""

import jax
import numpy as np
import pytest

from preset_gen_vae_tpu.data.pipeline import SplitLoader
from preset_gen_vae_tpu.parallel.multihost import (
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
    served = {name: [] for name in ("train", "validation")}
    monkeypatch.setattr(jax, "process_count", lambda: n_proc)
    for p in range(n_proc):
        monkeypatch.setattr(jax, "process_index", lambda p=p: p)
        out = shard_loaders_for_host(_loaders())
        for name, ld in out.items():
            assert ld.batch_size == 8 // n_proc
            # the local tensors contain exactly the served rows: recover the
            # original item ids from the 'info' column
            ids = ld.tensors["info"][ld.item_indexes, 0]
            served[name] += list(ids)
            # tensors were actually carved down (no host holds everything)
            assert len(ld.tensors["x"]) < 50
    # disjoint union across hosts == the original split
    assert sorted(served["train"]) == list(range(40))
    assert sorted(served["validation"]) == list(range(40, 50))


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
