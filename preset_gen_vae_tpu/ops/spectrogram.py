"""TPU-native spectral frontend: framing + windowed rDFT + mel + log floor.

Numerically matched to the reference's torch frontend
(reference: utils/audio.py:20-92):
  - Hann window, periodic=False                      (audio.py:30)
  - STFT center-padded with zeros ('constant')       (audio.py:36-38)
  - magnitude normalized by max |rFFT(window)|       (audio.py:31,46)
  - optional Slaney mel filterbank, norm=None        (audio.py:85-87)
  - log floor: max(S, 10^(min_dB/20)), 20*log10(S)   (audio.py:52-54)

TPU-first design: instead of an FFT, the windowed rDFT is expressed as two
dense matmuls against precomputed (n_fft, n_bins) cosine/sine matrices with
the window folded in. For n_fft=1024 these are MXU-shaped (1024x513)
contractions over large frame batches — XLA fuses the magnitude, mel matmul
and log into the same pipeline, and the whole frontend runs at matmul speed
with zero host round-trips. A fused Pallas kernel for the same computation
lives in ops/pallas_mel.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .mel import mel_filterbank, mel_pseudo_inverse


def hann_window(n_fft: int) -> np.ndarray:
    """Symmetric (periodic=False) Hann window, matching torch.hann_window
    (reference: utils/audio.py:30)."""
    n = np.arange(n_fft, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / (n_fft - 1)))).astype(np.float64)


def spectrogram_norm_factor(n_fft: int) -> float:
    """max |rFFT(hann_window)| (reference: utils/audio.py:31)."""
    w = hann_window(n_fft)
    return float(np.abs(np.fft.rfft(w)).max())


def num_frames(num_samples: int, n_fft: int, hop: int) -> int:
    """Frame count of a center-padded STFT (torch.stft center=True)."""
    return 1 + (num_samples + 2 * (n_fft // 2) - n_fft) // hop


def _windowed_dft_matrices(n_fft: int) -> tuple:
    """(n_fft, n_bins) cos / -sin rDFT matrices with the Hann window folded in,
    so `frames @ cos_m` == Re(rfft(frames * w)) and `frames @ sin_m` == Im."""
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    w = hann_window(n_fft)[:, None]
    cos_m = (np.cos(ang) * w).astype(np.float32)
    sin_m = (-np.sin(ang) * w).astype(np.float32)
    return cos_m, sin_m


@dataclasses.dataclass(frozen=True)
class SpectrogramConfig:
    n_fft: int = 1024
    fft_hop: int = 256
    min_dB: float = -120.0
    n_mel_bins: int = -1  # <= 0 disables mel
    sample_rate: int = 22050
    mel_fmin: float = 0.0
    mel_fmax: Optional[float] = None  # None -> sr/2


class SpectrogramProcessor:
    """Batched waveform -> log-(mel-)spectrogram transform, jit-compatible.

    Replaces the reference's ``Spectrogram`` / ``MelSpectrogram`` classes
    (utils/audio.py:20-92). `__call__` maps (B, num_samples) float waveforms
    to (B, n_bins_out, T) log spectrograms, where n_bins_out is
    ``n_fft//2 + 1`` (linear) or ``n_mel_bins`` (mel).
    """

    def __init__(self, config: SpectrogramConfig):
        self.config = config
        self.n_fft = config.n_fft
        self.hop = config.fft_hop
        self.min_dB = config.min_dB
        self.norm_factor = spectrogram_norm_factor(config.n_fft)
        cos_m, sin_m = _windowed_dft_matrices(config.n_fft)
        # Fold the 1/norm_factor magnitude normalization into the DFT matrices.
        self._cos_m = jnp.asarray(cos_m / self.norm_factor)
        self._sin_m = jnp.asarray(sin_m / self.norm_factor)
        self.use_mel = config.n_mel_bins > 0
        if self.use_mel:
            fb = mel_filterbank(
                config.sample_rate,
                config.n_fft,
                config.n_mel_bins,
                fmin=config.mel_fmin,
                fmax=config.mel_fmax,
            )
            self._mel_fb_t = jnp.asarray(fb.T)  # (n_bins, n_mels)
            self._mel_pinv_t = None  # built lazily
        self._floor_amp = float(10.0 ** (self.min_dB / 20.0))

    # ---------------- core ops ----------------

    def frame(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, num_samples) -> (B, T, n_fft) zero-center-padded frames."""
        pad = self.n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)))
        T = 1 + (x.shape[-1] - self.n_fft) // self.hop
        starts = np.arange(T) * self.hop
        idx = starts[:, None] + np.arange(self.n_fft)[None, :]  # (T, n_fft)
        return x[:, idx]

    def magnitude(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, num_samples) -> (B, n_bins, T) normalized |STFT|.

        DFT matmuls request full float32 precision: on TPU the MXU would
        otherwise truncate inputs to bfloat16, which is fine for training
        activations but not for a data-prep transform whose output must
        match the reference frontend within ~1e-5."""
        frames = self.frame(x).astype(jnp.float32)  # (B, T, n_fft)
        re = jnp.matmul(frames, self._cos_m, precision=jax.lax.Precision.HIGHEST)
        im = jnp.matmul(frames, self._sin_m, precision=jax.lax.Precision.HIGHEST)
        mag = jnp.sqrt(re * re + im * im)
        return jnp.swapaxes(mag, -1, -2)  # (B, n_bins, T)

    def linear_to_log_scale(self, spec: jnp.ndarray) -> jnp.ndarray:
        """(reference: utils/audio.py:52-54)"""
        return 20.0 * jnp.log10(jnp.maximum(spec, self._floor_amp))

    def log_to_linear_scale(self, spec: jnp.ndarray) -> jnp.ndarray:
        """Reverses the log scale, re-applying the window norm factor
        (reference: utils/audio.py:56-61)."""
        return jnp.power(10.0, spec / 20.0) * self.norm_factor

    def __call__(self, x_wav: jnp.ndarray) -> jnp.ndarray:
        """(B, num_samples) -> (B, n_bins_out, T) log-amplitude spectrogram."""
        spec = self.magnitude(x_wav)
        if self.use_mel:
            # mel along the freq axis: (B, n_bins, T) -> (B, n_mels, T)
            spec = jnp.einsum(
                "bft,fm->bmt", spec, self._mel_fb_t,
                precision=jax.lax.Precision.HIGHEST,
            )
        return self.linear_to_log_scale(spec)

    # ---------------- inverses (figures / audio reconstruction) ----------

    def mel_dB_to_STFT(self, mel_spec: jnp.ndarray) -> jnp.ndarray:
        """Approximately recovers |STFT| from a log-mel spectrogram
        (role of reference utils/audio.py:89-92)."""
        assert self.use_mel
        if self._mel_pinv_t is None:
            self._mel_pinv_t = jnp.asarray(
                mel_pseudo_inverse(np.asarray(self._mel_fb_t).T).T
            )  # (n_mels, n_bins)
        lin = jnp.power(10.0, mel_spec / 20.0) * self.norm_factor
        return jnp.maximum(jnp.einsum("bmt,mf->bft", lin, self._mel_pinv_t), 0.0)


def make_processor_from_model_config(model_config) -> SpectrogramProcessor:
    """Builds the frontend from a ModelConfig (reference wiring:
    data/abstractbasedataset.py:70-74)."""
    return SpectrogramProcessor(
        SpectrogramConfig(
            n_fft=model_config.stft_args[0],
            fft_hop=model_config.stft_args[1],
            min_dB=model_config.spectrogram_min_dB,
            n_mel_bins=model_config.mel_bins,
            sample_rate=model_config.sampling_rate,
        )
    )


@partial(jax.jit, static_argnums=(1,))
def normalize_min_max(spec: jnp.ndarray, stats: tuple) -> jnp.ndarray:
    """Dataset-stats min/max normalization to [-1, 1]
    (reference: abstractbasedataset.py:129-131)."""
    smin, smax = stats
    return -1.0 + (spec - smin) / ((smax - smin) / 2.0)


@partial(jax.jit, static_argnums=(1,))
def normalize_mean_std(spec: jnp.ndarray, stats: tuple) -> jnp.ndarray:
    """(reference: abstractbasedataset.py:132-133)"""
    mean, std = stats
    return (spec - mean) / std


def denormalize(spec: jnp.ndarray, mode: Optional[str], stats: dict) -> jnp.ndarray:
    """(reference: abstractbasedataset.py:340-345)"""
    if mode == "min_max":
        return (spec + 1.0) * ((stats["max"] - stats["min"]) / 2.0) + stats["min"]
    if mode == "mean_std":
        return spec * stats["std"] + stats["mean"]
    return spec
