"""TPU input pipeline: whole-corpus tensors + per-epoch shuffled batches.

Replaces the reference's DataLoader-worker stack (reference:
data/build.py:43-79 — num_workers heuristics, persistent workers,
per-item torch.stft in forked processes) with a zero-copy design: the
normalized spectrogram corpus is one dense array; an epoch is a shuffled
index array; a batch is a numpy gather handed to ``jax.device_put`` with
the mesh's batch sharding (or, device-resident, a jnp gather inside jit).

Determinism: epoch shuffles derive from ``numpy.default_rng(seed ^ epoch)``
— reproducible across runs and resumable mid-training, unlike torch's
global-RNG samplers.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from .sampler import build_subset_item_indexes


class SplitLoader:
    """Batches of (x, v, info) for one subset. ``drop_last`` mirrors the
    reference's train-only drop_last (data/build.py:67)."""

    def __init__(
        self,
        tensors: Dict[str, np.ndarray],
        item_indexes: np.ndarray,
        batch_size: int,
        shuffle: bool,
        drop_last: bool,
        seed: int = 0,
        pad_to_full: bool = False,
        batch_weights: Optional[np.ndarray] = None,
    ):
        self.tensors = tensors
        self.item_indexes = np.asarray(item_indexes)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        # pad_to_full: cyclically pad the final partial batch to the full
        # batch size. Keeps every compiled step at ONE static shape and
        # mesh-divisible (XLA recompiles per shape; ragged final batches
        # would also break the data-axis sharding).
        self.pad_to_full = pad_to_full
        # batch_weights: optional per-batch real-item fraction override.
        # Multi-host loaders set this from GLOBAL counts: host shards are
        # equalized by cyclic padding, so a host's local (n_items, batch)
        # arithmetic no longer reflects how many real items the global
        # batch carries (parallel/multihost.py).
        self.batch_weights = (
            None if batch_weights is None else np.asarray(batch_weights, float)
        )

    def __len__(self):
        n = len(self.item_indexes)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    @property
    def n_items(self) -> int:
        return len(self.item_indexes)

    def batch_weight(self, i: int) -> float:
        """Fraction of batch ``i``'s rows that are real (not cyclic
        padding). Validation means are weighted by this so padded rows
        never count (reference evaluates exact per-item means,
        train.py:261-293)."""
        if self.batch_weights is not None:
            return float(self.batch_weights[i])
        n_real = min(self.batch_size, self.n_items - i * self.batch_size)
        return max(n_real, 0) / self.batch_size

    def epoch_index_batches(self, epoch: int = 0) -> Iterator[np.ndarray]:
        """Index-only batches — the device-resident pipeline gathers the
        actual tensors on device (zero host->device batch traffic)."""
        idx = self.item_indexes
        if self.shuffle:
            rng = np.random.default_rng(self.seed ^ (epoch + 0x9E3779B9))
            idx = rng.permutation(idx)
        n_batches = len(self)
        for b in range(n_batches):
            sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
            if self.pad_to_full and len(sel) < self.batch_size:
                extra = np.resize(idx, self.batch_size - len(sel))
                sel = np.concatenate([sel, extra])
            yield sel

    def epoch_batches(
        self, epoch: int = 0
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        for sel in self.epoch_index_batches(epoch):
            yield (
                self.tensors["x"][sel],
                self.tensors["v"][sel],
                self.tensors["info"][sel],
            )


def get_split_loaders(
    dataset,
    train_config,
    k_fold: Optional[int] = None,
) -> Dict[str, SplitLoader]:
    """'train'/'validation'/'test' loaders (reference: data/build.py:43-79 +
    sampler.py:17-59). Validation/test batches are full minibatch-sized too
    (the reference evaluates at the train batch size, train.py:261-293)."""
    if getattr(dataset, "corpus_cache_policy", "disk") == "device":
        # device-resident corpus: build it directly in the training compute
        # dtype so no corpus-sized cast buffer ever materializes (a 16 GB
        # chip cannot hold two copies of a 30k 1-note / 16k 3-note corpus)
        import jax.numpy as jnp

        dt = (
            jnp.bfloat16
            if getattr(train_config, "compute_dtype", "float32") == "bfloat16"
            else jnp.float32
        )
        tensors = dataset.corpus_tensors(dtype=dt)
    else:
        tensors = dataset.corpus_tensors()
    splits = build_subset_item_indexes(
        dataset,
        k_fold=train_config.current_k_fold if k_fold is None else k_fold,
        k_folds_count=train_config.k_folds,
        test_holdout_proportion=train_config.test_holdout_proportion,
        random_seed=0,  # reference pins the split seed (sampler.py:36-38)
    )
    out = {}
    for name, idx in splits.items():
        out[name] = SplitLoader(
            tensors,
            idx,
            batch_size=train_config.minibatch_size,
            shuffle=(name == "train"),
            drop_last=(name == "train"),
            seed=getattr(train_config, "seed", 0),
            pad_to_full=(name != "train"),
        )
    return out
