"""Golden-value tests for the spectral frontend against the reference
formulas: torch.stft for the STFT path (reference: utils/audio.py:33-54) and
an independent direct-numpy mel filterbank implementation (reference relies
on librosa defaults, utils/audio.py:85-87)."""

import numpy as np
import pytest
import torch

from preset_gen_vae_tpu.ops import mel as mel_ops
from preset_gen_vae_tpu.ops.spectrogram import (
    SpectrogramConfig,
    SpectrogramProcessor,
    hann_window,
    num_frames,
    spectrogram_norm_factor,
)


def _torch_reference_spectrogram(x_wav, n_fft, hop, min_dB, log_scale=True):
    """Literal re-expression of the reference Spectrogram.__call__
    (utils/audio.py:30-54) using torch."""
    window = torch.hann_window(n_fft, periodic=False)
    norm = torch.fft.rfft(window).abs().max().item()
    spec = torch.stft(
        torch.tensor(np.asarray(x_wav), dtype=torch.float32),
        n_fft=n_fft,
        hop_length=hop,
        window=window,
        center=True,
        pad_mode="constant",
        onesided=True,
        return_complex=True,
    ).abs()
    spec = spec / norm
    if log_scale:
        spec = torch.maximum(spec, torch.ones(spec.size()) * 10 ** (min_dB / 20.0))
        spec = 20.0 * torch.log10(spec)
    return spec.numpy()


@pytest.fixture(scope="module")
def wav_batch(rng=None):
    g = np.random.default_rng(7)
    # 0.4 s of audio keeps the test fast; mixture of tones + noise + silence
    n = 9000
    t = np.arange(n) / 22050.0
    w0 = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1305 * t)
    w1 = g.standard_normal(n).astype(np.float64) * 0.1
    w2 = np.zeros(n)
    w2[1000:1500] = 1.0  # impulse-ish content
    return np.stack([w0, w1, w2]).astype(np.float32)


def test_window_and_norm_factor_match_torch():
    for n_fft in (512, 1024):
        w_torch = torch.hann_window(n_fft, periodic=False).numpy()
        np.testing.assert_allclose(hann_window(n_fft), w_torch, atol=1e-6)
        norm_torch = torch.fft.rfft(torch.hann_window(n_fft, periodic=False)).abs().max().item()
        assert spectrogram_norm_factor(n_fft) == pytest.approx(norm_torch, rel=1e-6)


def test_frame_count_matches_torch_stft(wav_batch):
    n_fft, hop = 1024, 256
    ref = _torch_reference_spectrogram(wav_batch[0], n_fft, hop, -120.0, log_scale=False)
    assert num_frames(wav_batch.shape[1], n_fft, hop) == ref.shape[-1]
    # reference spectrogram_size (257, 347) implies 347 frames from the
    # buffer-quantized render length (ceil(4.0s*22050/512)*512 = 88576)
    assert num_frames(88576, 1024, 256) == 347


def test_linear_magnitude_matches_torch(wav_batch):
    n_fft, hop = 1024, 256
    proc = SpectrogramProcessor(SpectrogramConfig(n_fft=n_fft, fft_hop=hop))
    ours = np.asarray(proc.magnitude(wav_batch))
    ref = _torch_reference_spectrogram(wav_batch, n_fft, hop, -120.0, log_scale=False)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_log_spectrogram_matches_torch(wav_batch):
    n_fft, hop, min_dB = 512, 256, -120.0
    proc = SpectrogramProcessor(SpectrogramConfig(n_fft=n_fft, fft_hop=hop, min_dB=min_dB))
    ours = np.asarray(proc(wav_batch))
    ref = _torch_reference_spectrogram(wav_batch, n_fft, hop, min_dB, log_scale=True)
    # dB-domain comparison: floor region is exactly min_dB in both.
    # 0.05 dB tolerance absorbs f32 DFT-vs-FFT roundoff near the floor.
    np.testing.assert_allclose(ours, ref, atol=5e-2)
    assert ours.min() >= min_dB - 1e-4


def test_log_floor_applied():
    proc = SpectrogramProcessor(SpectrogramConfig(n_fft=512, fft_hop=256, min_dB=-120.0))
    silent = np.zeros((1, 4096), dtype=np.float32)
    out = np.asarray(proc(silent))
    np.testing.assert_allclose(out, -120.0)


def _independent_slaney_mel(sr, n_fft, n_mels):
    """Direct textbook construction of the Slaney filterbank, written
    independently from ops/mel.py (scalar math, no shared helpers)."""
    def h2m(f):
        return f / (200.0 / 3) if f < 1000.0 else 15.0 + np.log(f / 1000.0) / (np.log(6.4) / 27.0)

    def m2h(m):
        return m * (200.0 / 3) if m < 15.0 else 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0))

    edges = [m2h(m) for m in np.linspace(h2m(0.0), h2m(sr / 2.0), n_mels + 2)]
    n_bins = 1 + n_fft // 2
    freqs = np.linspace(0, sr / 2.0, n_bins)
    W = np.zeros((n_mels, n_bins))
    for i in range(n_mels):
        lo, ctr, hi = edges[i], edges[i + 1], edges[i + 2]
        for j, f in enumerate(freqs):
            if lo < f < hi or (lo <= f <= hi and (f == ctr)):
                if f <= ctr:
                    W[i, j] = (f - lo) / (ctr - lo) if ctr > lo else 0.0
                else:
                    W[i, j] = (hi - f) / (hi - ctr) if hi > ctr else 0.0
            elif f == lo and f == ctr:
                W[i, j] = 1.0
    return W


def test_mel_filterbank_matches_independent_construction():
    sr, n_fft, n_mels = 22050, 1024, 64
    ours = mel_ops.mel_filterbank(sr, n_fft, n_mels)
    ref = _independent_slaney_mel(sr, n_fft, n_mels)
    assert ours.shape == (n_mels, 1 + n_fft // 2)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_mel_spectrogram_shape_and_reference_config(wav_batch):
    # Reference flagship frontend: n_fft 1024, hop 256, 257 mel bins
    proc = SpectrogramProcessor(
        SpectrogramConfig(n_fft=1024, fft_hop=256, n_mel_bins=257, min_dB=-120.0)
    )
    out = np.asarray(proc(wav_batch))
    assert out.shape == (3, 257, num_frames(wav_batch.shape[1], 1024, 256))
    assert np.isfinite(out).all()
    assert out.min() >= -120.0 - 1e-4


def test_mel_matches_manual_matmul(wav_batch):
    """Full mel pipeline == |STFT| -> filterbank matmul -> log floor."""
    proc = SpectrogramProcessor(
        SpectrogramConfig(n_fft=1024, fft_hop=256, n_mel_bins=128, min_dB=-120.0)
    )
    mag = np.asarray(proc.magnitude(wav_batch))
    fb = mel_ops.mel_filterbank(22050, 1024, 128)
    manual = np.einsum("mf,bft->bmt", fb, mag)
    manual = 20.0 * np.log10(np.maximum(manual, 10 ** (-120.0 / 20.0)))
    ours = np.asarray(proc(wav_batch))
    np.testing.assert_allclose(ours, manual, atol=2e-3)


def test_mel_pseudo_inverse_roundtrip():
    fb = mel_ops.mel_filterbank(22050, 1024, 257)
    pinv = mel_ops.mel_pseudo_inverse(fb)
    assert pinv.shape == (513, 257)
    # smooth spectrum should round-trip approximately (clip at application)
    spec = np.exp(-np.linspace(0, 4, 513)).astype(np.float32)
    mel_spec = fb @ spec
    rec = np.maximum(pinv @ mel_spec, 0.0)
    err = np.abs(rec[5:-5] - spec[5:-5]).mean() / spec.mean()
    assert err < 0.01


def test_normalize_denormalize_roundtrip():
    """min_max / mean_std normalization and their inverses
    (reference: abstractbasedataset.py:129-133, 340-345)."""
    import numpy as np

    from preset_gen_vae_tpu.ops.spectrogram import (
        denormalize,
        normalize_mean_std,
        normalize_min_max,
    )

    rng = np.random.default_rng(0)
    spec = (rng.random((4, 16, 16)) * 100.0 - 110.0).astype(np.float32)
    stats = {
        "min": float(spec.min()), "max": float(spec.max()),
        "mean": float(spec.mean()), "std": float(spec.std()),
    }
    mm = np.asarray(normalize_min_max(spec, (stats["min"], stats["max"])))
    assert mm.min() >= -1.0 - 1e-5 and mm.max() <= 1.0 + 1e-5
    back = np.asarray(denormalize(mm, "min_max", stats))
    np.testing.assert_allclose(back, spec, rtol=1e-4, atol=1e-3)
    ms = np.asarray(normalize_mean_std(spec, (stats["mean"], stats["std"])))
    assert abs(float(ms.mean())) < 1e-3
    back = np.asarray(denormalize(ms, "mean_std", stats))
    np.testing.assert_allclose(back, spec, rtol=1e-4, atol=1e-3)
