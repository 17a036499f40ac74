"""Fused Pallas TPU kernel: waveform -> log-mel spectrogram in one pass.

The XLA path (ops/spectrogram.py) materializes the framed tensor
(B, T, n_fft) and the linear magnitude (B, n_bins, T) in HBM between ops —
for the canonical 4 s / 22.05 kHz render that is ~16x the waveform in HBM
traffic before the mel matmul even starts. This kernel fuses
frame / windowed-DFT / magnitude / mel / log per (batch row x time tile):
only waveform-sized data is read and only the final (TILE_T, n_mels)
log-mel tile is written back, with the three matmuls (cos-DFT, sin-DFT,
mel) running back-to-back on the MXU from VMEM.

Frame construction: with hop | n_fft (1024 = 4 x 256) a frame is the
concatenation of k=4 consecutive hop-blocks. Mosaic cannot address
row-shifted slices of a tiled buffer (sublane alignment), so the k shifted
hop-block views are prepared by XLA as a (B, k, T_pad, hop) array — a
waveform-sized duplication (~0.5 MB/item), negligible next to the saved
framed-tensor traffic — and the kernel's inputs become plain aligned
BlockSpecs that Mosaic pipelines with automatic double buffering.

Numerical contract: identical to SpectrogramProcessor (same folded
window+norm DFT matrices, same mel filterbank, same -120 dB floor);
golden tests check the two paths against each other.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mel import mel_filterbank
from .spectrogram import (
    SpectrogramConfig,
    _windowed_dft_matrices,
    spectrogram_norm_factor,
)


def _build_constants(config: SpectrogramConfig):
    n_fft = config.n_fft
    norm = spectrogram_norm_factor(n_fft)
    cos_m, sin_m = _windowed_dft_matrices(n_fft)  # (n_fft, n_bins), window folded
    cos_m, sin_m = cos_m / norm, sin_m / norm
    if config.n_mel_bins > 0:
        fb = mel_filterbank(
            config.sample_rate, n_fft, config.n_mel_bins,
            fmin=config.mel_fmin, fmax=config.mel_fmax,
        ).T  # (n_bins, n_mels)
    else:
        fb = np.eye(cos_m.shape[1], dtype=np.float32)
    return cos_m.astype(np.float32), sin_m.astype(np.float32), fb.astype(np.float32)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _pallas_logmel(x, config: SpectrogramConfig, tile_t: int, interpret: bool,
                   precision: str = "exact"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_fft, hop = config.n_fft, config.fft_hop
    assert n_fft % hop == 0, "kernel requires hop | n_fft"
    k = n_fft // hop  # hop-blocks per frame
    B, S = x.shape
    T = 1 + S // hop  # frame count with center padding n_fft//2 both sides
    n_tiles = (T + tile_t - 1) // tile_t
    t_pad = n_tiles * tile_t

    cos_m, sin_m, fb = _build_constants(config)
    n_bins, n_mels = fb.shape
    floor_amp = float(10.0 ** (config.min_dB / 20.0))

    # center pad; extend so the last frame's span exists; build the k
    # shifted hop-block views (see module docstring)
    n_hb = t_pad + k - 1
    pad_l = n_fft // 2
    pad_r = max(0, n_hb * hop - (S + pad_l))
    hb = jnp.pad(x, ((0, 0), (pad_l, pad_r))).reshape(B, n_hb, hop)
    xs = jnp.stack([hb[:, i : i + t_pad] for i in range(k)], axis=1)

    def kernel(x_ref, cos_ref, sin_ref, fb_ref, out_ref):
        # x_ref: (1, k, tile_t, hop) — the k shifted hop-block tiles
        frames = jnp.concatenate(
            [x_ref[0, i] for i in range(k)], axis=1
        )  # (tile_t, n_fft)
        # full-f32 MXU passes: default matmul precision truncates inputs
        # to bf16, which is ~16 dB of error in the log-spectrogram domain
        # near the floor; 'exact' = f32 (bf16_6x emulation, reference
        # parity ~0.002 dB, ~1.1x the XLA path); 'fast' = native bf16 MXU
        # (2.1x the XLA path, accurate above ~-60 dB — fine for training
        # data, NOT for reference-parity evaluation). Mosaic supports only
        # DEFAULT and HIGHEST.
        hi = (jax.lax.Precision.HIGHEST if precision == "exact"
              else jax.lax.Precision.DEFAULT)
        re = jnp.dot(frames, cos_ref[:, :], precision=hi,
                     preferred_element_type=jnp.float32)
        im = jnp.dot(frames, sin_ref[:, :], precision=hi,
                     preferred_element_type=jnp.float32)
        mag = jnp.sqrt(re * re + im * im)  # (tile_t, n_bins)
        mel = jnp.dot(mag, fb_ref[:, :], precision=hi,
                      preferred_element_type=jnp.float32)
        out_ref[0, :, :] = 20.0 * jnp.log10(jnp.maximum(mel, floor_amp))

    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, k, tile_t, hop), lambda b, j: (b, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_bins), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_bins), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, n_mels), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_t, n_mels), lambda b, j: (b, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, t_pad, n_mels), jnp.float32),
        interpret=interpret,
    )(xs, jnp.asarray(cos_m), jnp.asarray(sin_m), jnp.asarray(fb))
    return out[:, :T, :].swapaxes(-1, -2)  # (B, n_mels, T)


class PallasSpectrogramProcessor:
    """Drop-in fused replacement for ``SpectrogramProcessor.__call__``.

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU
    tests); on TPU hardware leave it False."""

    def __init__(self, config: SpectrogramConfig, tile_t: int = 128,
                 interpret: bool = False, precision: str = "exact"):
        self.config = config
        self.tile_t = tile_t
        self.interpret = interpret
        self.precision = precision

    def __call__(self, x_wav: jnp.ndarray) -> jnp.ndarray:
        return _pallas_logmel(x_wav, self.config, self.tile_t, self.interpret,
                              self.precision)
