"""Fused Pallas log-mel kernel vs the XLA reference path (golden test in
interpreter mode; on TPU hardware the same kernel runs compiled)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from preset_gen_vae_tpu.ops.pallas_mel import PallasSpectrogramProcessor
from preset_gen_vae_tpu.ops.spectrogram import (
    SpectrogramConfig,
    SpectrogramProcessor,
)


@pytest.mark.parametrize(
    "n_mel_bins",
    [pytest.param(257, marks=pytest.mark.slow), -1],  # keep one fast smoke
)
def test_pallas_matches_xla_path(n_mel_bins):
    cfg = SpectrogramConfig(n_mel_bins=n_mel_bins)
    ref = SpectrogramProcessor(cfg)
    pal = PallasSpectrogramProcessor(cfg, interpret=True)
    # local fixed seed: assertions must not depend on test ordering
    x = np.random.default_rng(7).standard_normal((2, 88576)).astype(np.float32) * 0.1
    a = np.asarray(ref(jnp.asarray(x)))
    b = np.asarray(pal(jnp.asarray(x)))
    assert a.shape == b.shape == (2, n_mel_bins if n_mel_bins > 0 else 513, 347)
    np.testing.assert_allclose(a, b, atol=5e-2)  # dB domain: 0.05 dB


@pytest.mark.slow
def test_pallas_partial_last_tile(rng):
    """Frame count not divisible by the tile: padded tail must not corrupt
    the valid frames."""
    cfg = SpectrogramConfig(n_mel_bins=64)
    ref = SpectrogramProcessor(cfg)
    pal = PallasSpectrogramProcessor(cfg, tile_t=100, interpret=True)
    x = rng.standard_normal((1, 22016)).astype(np.float32)
    a = np.asarray(ref(jnp.asarray(x)))
    b = np.asarray(pal(jnp.asarray(x)))
    np.testing.assert_allclose(a, b, atol=5e-2)  # dB domain: 0.05 dB


def test_pallas_fast_precision_mode():
    """'fast' (native bf16 MXU) mode: coarse agreement with the exact path
    away from the log floor — intended for training-data generation on
    TPU VMs, not for reference-parity evaluation."""
    cfg = SpectrogramConfig(n_mel_bins=64)
    exact = PallasSpectrogramProcessor(cfg, interpret=True, precision="exact")
    fast = PallasSpectrogramProcessor(cfg, interpret=True, precision="fast")
    x = np.random.default_rng(3).standard_normal((1, 22016)).astype(np.float32)
    a = np.asarray(exact(jnp.asarray(x)))
    b = np.asarray(fast(jnp.asarray(x)))
    assert a.shape == b.shape
    # compare only well above the -120 dB floor
    mask = a > -60.0
    assert mask.any()
    assert np.abs((a - b)[mask]).max() < 1.0  # within 1 dB in-band
