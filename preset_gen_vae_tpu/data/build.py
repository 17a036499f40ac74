"""Dataset / loader factory (reference: data/build.py:15-79, data/dataset.py).

``get_dataset`` builds the synth dataset from a resolved config;
``resolve_with_dataset`` (config.py) then applies the dataset-dependent
config values the reference mutates in-place (synth param counts, and
dim_z := learnable tensor length for flow regression;
reference: data/build.py:34-39)."""

from __future__ import annotations

from typing import Dict

from ..config import ModelConfig, TrainConfig
from .dexed_dataset import DexedDataset
from .pipeline import SplitLoader, get_split_loaders


def model_config_to_dataset_kwargs(model_config: ModelConfig) -> Dict:
    """(reference: data/dataset.py:18-25)"""
    return dict(
        note_duration=model_config.note_duration,
        n_fft=model_config.stft_args[0],
        fft_hop=model_config.stft_args[1],
        midi_notes=model_config.midi_notes,
        multichannel_stacked_spectrograms=model_config.stack_spectrograms,
        n_mel_bins=model_config.mel_bins,
        spectrogram_min_dB=model_config.spectrogram_min_dB,
        algos=model_config.dataset_synth_args[0],
        operators=model_config.dataset_synth_args[1],
        vst_params_learned_as_categorical=(
            model_config.synth_vst_params_learned_as_categorical
        ),
        restrict_to_labels=model_config.dataset_labels,
        sample_rate=model_config.sampling_rate,
        corpus_render_backend=getattr(
            model_config, "dataset_corpus_render_backend", "cpp"
        ),
        corpus_cache_policy=getattr(
            model_config, "dataset_corpus_cache_policy", "disk"
        ),
    )


def get_dataset(
    model_config: ModelConfig, train_config: TrainConfig, **extra_kwargs
) -> DexedDataset:
    if model_config.synth != "dexed":
        raise NotImplementedError(f"No dataset for synth '{model_config.synth}'")
    kwargs = model_config_to_dataset_kwargs(model_config)
    kwargs.update(extra_kwargs)
    return DexedDataset(**kwargs)


def get_split_dataloaders(
    train_config: TrainConfig, dataset
) -> Dict[str, SplitLoader]:
    """(reference: data/build.py:43-79)"""
    return get_split_loaders(dataset, train_config)
