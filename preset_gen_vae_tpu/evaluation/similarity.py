"""Audio similarity metrics, batched and device-friendly.

Role of the reference ``SimilarityEvaluator`` (utils/audio.py:95-161):
MAE of log10|STFT| (eps -80 dB on un-normalized magnitudes), spectral
convergence (Frobenius-relative STFT error), and MFCC mean-absolute error.

Design difference: the reference evaluates one pair at a time with librosa
on the CPU inside a process pool (eval.py:190-203); here every metric is a
batched jax function — (B, samples) x 2 -> (B,) — so a whole eval split's
audio errors compute in a few device calls. MFCCs follow the librosa
defaults the reference relies on (n_fft 2048, hop 512, 128 slaney-normed
mel bands, power 2, top_db 80, DCT-II ortho).

A per-pair ``SimilarityEvaluator`` wrapper preserves the reference call
surface for spot checks and notebooks.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mel import mel_filterbank


def _frame(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    T = 1 + (x.shape[-1] - n_fft) // hop
    idx = (np.arange(T) * hop)[:, None] + np.arange(n_fft)[None, :]
    return x[:, idx]


@functools.partial(jax.jit, static_argnums=(1, 2))
def stft_magnitude(x: jnp.ndarray, n_fft: int = 1024, hop: int = 256) -> jnp.ndarray:
    """(B, samples) -> (B, n_bins, T) un-normalized |STFT| with a Hann
    window and reflect center padding (librosa.stft semantics, which the
    reference similarity metrics use — NOT the training frontend's
    window-max normalization)."""
    win = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
    frames = _frame(x, n_fft, hop) * win[None, None, :]
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.abs(spec).swapaxes(-1, -2)


def mae_log_stft(s_ref: jnp.ndarray, s_est: jnp.ndarray) -> jnp.ndarray:
    """(B, F, T) x2 -> (B,). eps = 1e-4 (= -80 dB, reference
    utils/audio.py:117-121)."""
    eps = 1e-4
    l0 = jnp.log10(jnp.maximum(s_ref, eps))
    l1 = jnp.log10(jnp.maximum(s_est, eps))
    return jnp.mean(jnp.abs(l1 - l0), axis=(-2, -1))


def spectral_convergence(s_ref: jnp.ndarray, s_est: jnp.ndarray) -> jnp.ndarray:
    """(B, F, T) x2 -> (B,) Frobenius-relative error
    (reference: utils/audio.py:137-143).

    A (near-)silent reference makes the ratio meaningless — the reference
    flags this as an open TODO (utils/audio.py:139); here those rows return
    NaN so aggregations can skip them instead of being dominated by 1e10
    ratios."""
    num = jnp.sqrt(jnp.sum(jnp.square(s_ref - s_est), axis=(-2, -1)))
    den = jnp.sqrt(jnp.sum(jnp.square(s_ref), axis=(-2, -1)))
    sc = num / jnp.maximum(den, 1e-12)
    return jnp.where(den < 1e-3, jnp.nan, sc)


@functools.partial(jax.jit, static_argnums=(1, 2))
def mfcc(x: jnp.ndarray, sr: int = 22050, n_mfcc: int = 40) -> jnp.ndarray:
    """(B, samples) -> (B, n_mfcc, T) MFCCs with librosa-default settings
    (the reference calls librosa.feature.mfcc with defaults,
    utils/audio.py:148-150)."""
    n_fft, hop, n_mels = 2048, 512, 128
    s = stft_magnitude(x, n_fft, hop)  # (B, F, T)
    power = jnp.square(s)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, norm="slaney"))
    melspec = jnp.einsum("mf,bft->bmt", fb, power)
    # power_to_db(ref=1.0, amin=1e-10, top_db=80)
    log_spec = 10.0 * jnp.log10(jnp.maximum(melspec, 1e-10))
    log_spec = jnp.maximum(
        log_spec, jnp.max(log_spec, axis=(-2, -1), keepdims=True) - 80.0
    )
    # DCT-II, norm='ortho' along the mel axis, as a matmul (MXU-friendly)
    k = np.arange(n_mels)
    dct_m = np.cos(np.pi / n_mels * (k[None, :] + 0.5) * k[:n_mfcc, None])
    dct_m = dct_m * np.sqrt(2.0 / n_mels)
    dct_m[0] *= np.sqrt(0.5)
    return jnp.einsum("cm,bmt->bct", jnp.asarray(dct_m.astype(np.float32)), log_spec)


def mae_mfcc(
    x_ref: jnp.ndarray, x_est: jnp.ndarray, sr: int = 22050, n_mfcc: int = 40
) -> jnp.ndarray:
    return jnp.mean(
        jnp.abs(mfcc(x_ref, sr, n_mfcc) - mfcc(x_est, sr, n_mfcc)), axis=(-2, -1)
    )


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def batched_audio_errors(
    x_ref: jnp.ndarray, x_est: jnp.ndarray, n_fft: int = 1024, hop: int = 256,
    sr: int = 22050,
):
    """All similarity metrics for a batch of waveform pairs in one jit:
    -> dict of (B,) arrays (reference per-pair loop: eval.py:254-275)."""
    s_ref = stft_magnitude(x_ref, n_fft, hop)
    s_est = stft_magnitude(x_est, n_fft, hop)
    return {
        "spec_mae": mae_log_stft(s_ref, s_est),
        "spec_sc": spectral_convergence(s_ref, s_est),
        "mfcc13_mae": mae_mfcc(x_ref, x_est, sr, 13),
        "mfcc40_mae": mae_mfcc(x_ref, x_est, sr, 40),
    }


class SimilarityEvaluator:
    """Per-pair wrapper with the reference API (utils/audio.py:95-161)."""

    def __init__(self, x_wav: Sequence, n_fft=1024, fft_hop=256, sr=22050,
                 n_mfcc=13):
        assert len(x_wav) == 2
        self.x_wav = [np.asarray(x, dtype=np.float32) for x in x_wav]
        self.n_fft, self.fft_hop, self.sr, self.n_mfcc = n_fft, fft_hop, sr, n_mfcc
        batch = jnp.stack([jnp.asarray(x) for x in self.x_wav])
        self.stft = np.asarray(stft_magnitude(batch, n_fft, fft_hop))

    def get_mae_log_stft(self, return_spectrograms=True):
        eps = 1e-4
        logs = [np.log10(np.maximum(s, eps)) for s in self.stft]
        mae = float(np.abs(logs[1] - logs[0]).mean())
        return (mae, logs) if return_spectrograms else mae

    def get_spectral_convergence(self, return_spectrograms=True):
        sc = float(
            np.linalg.norm(self.stft[0] - self.stft[1], ord="fro")
            / np.linalg.norm(self.stft[0], ord="fro")
        )
        return (sc, list(self.stft)) if return_spectrograms else sc

    def get_mae_mfcc(self, return_mfccs=True, n_mfcc: Optional[int] = None):
        n = n_mfcc or self.n_mfcc
        batch = jnp.stack([jnp.asarray(x) for x in self.x_wav])
        m = np.asarray(mfcc(batch, self.sr, n))
        mae = float(np.abs(m[0] - m[1]).mean())
        return (mae, list(m)) if return_mfccs else mae
