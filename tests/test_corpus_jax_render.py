"""On-device corpus render backend (VERDICT r3 item 8): DexedDataset
built with corpus_render_backend='jax' fuses FM render + spectrogram in
one device program per chunk and must match the C++-engine corpus within
the engines' golden tolerance (tests/test_fm_jax.py: ~2e-5 waveform MAE
with feedback='exact'; reference offline pipeline: dexeddataset.py:278-328).
"""

import numpy as np
import pytest

from preset_gen_vae_tpu.data.dexed_dataset import DexedDataset

N = 12  # tiny corpus: render cost dominates this test


@pytest.mark.slow
def test_jax_corpus_matches_cpp(tmp_path):
    common = dict(
        n_synthetic_presets=N,
        spectrogram_normalization=None,  # compare raw log-mels
        data_root=tmp_path,
    )
    ds_cpp = DexedDataset(**common)
    ds_jax = DexedDataset(corpus_render_backend="jax", **common)
    # distinct cache namespaces (no silent cross-backend reuse)
    assert ds_cpp._corpus_cache_dir() != ds_jax._corpus_cache_dir()
    spec_cpp = ds_cpp.load_spectrogram_corpus()
    spec_jax = ds_jax.load_spectrogram_corpus()
    assert spec_cpp.shape == spec_jax.shape == (N, 1, 257, 347)
    # log-domain spectrograms; silent bins sit at min_dB, so MAE over the
    # full tensor is a strict whole-corpus criterion
    mae = float(np.abs(spec_cpp - spec_jax).mean())
    assert mae < 0.05, mae
    # normalization stats must agree closely enough that training on
    # either corpus sees the same data statistics
    s1, s2 = ds_cpp._compute_stats(spec_cpp), ds_jax._compute_stats(spec_jax)
    for k in ("mean", "std"):
        assert s1[k] == pytest.approx(s2[k], rel=0.02), (k, s1, s2)


@pytest.mark.slow
def test_jax_corpus_device_stats_and_fp16_tier(tmp_path):
    """The jax backend accumulates exact f32 corpus stats ON DEVICE (the
    padded tail chunk must be mask-weighted out) and fetches/caches the
    raw tier as fp16 — the downlink/disk halving that makes the on-device
    pass viable on a tunneled attachment."""
    ds = DexedDataset(
        n_synthetic_presets=5,  # chunk=64 pads 59 tail rows: exercises w
        spectrogram_normalization=None,
        corpus_render_backend="jax",
        data_root=tmp_path,
    )
    spec = ds.load_spectrogram_corpus()
    dev = ds._device_spec_stats
    host = ds._compute_stats(spec)  # from the fp16-rounded values
    for k in ("min", "max", "mean", "std"):
        assert dev[k] == pytest.approx(host[k], rel=1e-2, abs=1e-2), (
            k, dev, host)
    assert ds.spec_stats == dev  # the pass served the device stats
    raw = np.load(ds._corpus_cache_dir() / "specs_raw.npy", mmap_mode="r")
    assert raw.dtype == np.float16
    assert raw.shape[0] == 5  # pad rows never reach the cache


@pytest.mark.slow
def test_jax_corpus_sidecar_keys_backend(tmp_path):
    ds = DexedDataset(
        n_synthetic_presets=4, corpus_render_backend="jax",
        data_root=tmp_path,
    )
    import json

    with open(ds._corpus_cache_dir() / "render_constraints.json") as f:
        side = json.load(f)
    assert side["render_backend"] == "jax"
    assert side["render_feedback"] == "exact"


def test_invalid_backend_rejected(tmp_path):
    with pytest.raises(ValueError):
        DexedDataset(
            n_synthetic_presets=4, corpus_render_backend="vst",
            data_root=tmp_path,
        )
