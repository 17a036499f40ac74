"""Dataset registry (reference: data/dataset.py:1-25) — maps synth name to
dataset class and adapts a model config into dataset kwargs. The factory
logic lives in data/build.py; this module keeps the reference's import
surface."""

from .build import get_dataset, model_config_to_dataset_kwargs  # noqa: F401
from .dexed_dataset import DexedDataset

ALL_DATASETS = {"dexed": DexedDataset}
