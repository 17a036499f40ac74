"""Latent-space preset interpolation (sound morphing).

A capability the reference does not expose (its eval is regression-only,
eval.py:65-243): walk the VAE latent space between two sounds and decode
every intermediate point into a *playable synth preset* — the practical
"synthesizer programming from the latent space" use the DAFx21 line of
work motivates. Steps: encode both spectrograms to z0 = mu (eval-mode
convention, reference VAE.py:181), slerp/lerp between the two latents,
push each point through the latent flow and the regression head, and
render the resulting full presets with the C++ engine.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfg
from ..data import build as data_build
from ..logs.logger import load_checkpoint
from ..models import build as mbuild
from ..training.train_step import create_train_state


def slerp(a: np.ndarray, b: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Spherical interpolation between two latent vectors; falls back to
    lerp when the vectors are (near-)colinear. t: (n,) in [0, 1]."""
    a_n = a / np.linalg.norm(a)
    b_n = b / np.linalg.norm(b)
    dot = float(np.clip(np.dot(a_n, b_n), -1.0, 1.0))
    omega = np.arccos(dot)
    t = t[:, None]
    if omega < 1e-4:
        return (1.0 - t) * a[None] + t * b[None]
    so = np.sin(omega)
    return (np.sin((1.0 - t) * omega) / so) * a[None] + (
        np.sin(t * omega) / so
    ) * b[None]


def interpolate_presets(
    model_config: cfg.ModelConfig,
    train_config: cfg.TrainConfig,
    uid_a: int,
    uid_b: int,
    n_steps: int = 9,
    epoch: int = -1,
    mode: str = "slerp",
    dataset=None,
    render: bool = True,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """-> (full presets (n_steps, 155), waveforms (n_steps, samples) or
    None). Endpoints are the DECODED presets of the two items (not the
    ground truths), so the whole path lives in model space."""
    model_c, train_c = cfg.resolve(model_config, train_config)
    if dataset is None:
        dataset = data_build.get_dataset(model_c, train_c)
    model_c, train_c = cfg.resolve_with_dataset(model_c, train_c, dataset)
    model_c = dataclasses.replace(
        model_c,
        input_tensor_size=(
            train_c.minibatch_size,
            model_c.input_tensor_size[1],
            *dataset.get_spectrogram_tensor_size()[1:],
        ),
    )
    idx_helper = dataset.preset_indexes_helper
    _, _, _, ext = mbuild.build_extended_ae_model(model_c, train_c, idx_helper)
    ckpt = load_checkpoint(model_c, epoch)
    variables = mbuild.init_extended_ae(ext, 0, model_c.input_tensor_size)
    state = create_train_state(ext, variables, train_c)
    vs = {
        "params": ckpt["state_tree"]["params"],
        "batch_stats": ckpt["state_tree"]["batch_stats"],
    }

    uid_rows = {int(u): i for i, u in enumerate(dataset.valid_preset_UIDs)}
    items = []
    per = (dataset.midi_notes_per_preset
           if dataset.midi_notes_per_preset > 1
           and not dataset.multichannel_stacked_spectrograms else 1)
    for uid in (uid_a, uid_b):
        # first (multi-note) item of the preset
        x, _v, info, _lab = dataset[uid_rows[int(uid)] * per]
        items.append((np.asarray(x)[None], np.asarray(info)[None]))
    x2 = np.concatenate([i[0] for i in items])
    info2 = np.concatenate([i[1] for i in items])

    @jax.jit
    def encode_mu(x, info):
        enc = ext.apply(vs, x, info, train=False,
                        method=lambda m, x, info, train: m.ae_model.encode(
                            x, info, train=train))
        return enc[:, 0, :]  # z0 = mu in eval mode (reference VAE.py:181)

    @jax.jit
    def decode_presets(z0):
        def _dec(m, z0):
            if m.is_flow_based_latent_space:
                zK, _ = m.ae_model.flow.forward(z0, train=False)
            else:
                zK = z0
            return m.reg_model(zK, train=False)
        return ext.apply(vs, z0, method=_dec)

    mu = np.asarray(encode_mu(jnp.asarray(x2), jnp.asarray(info2)))
    t = np.linspace(0.0, 1.0, n_steps).astype(np.float32)
    if mode == "slerp":
        z_path = slerp(mu[0], mu[1], t)
    elif mode == "lerp":
        z_path = (1.0 - t[:, None]) * mu[0][None] + t[:, None] * mu[1][None]
    else:
        raise ValueError(f"unknown interpolation mode '{mode}'")

    v_path = np.asarray(decode_presets(jnp.asarray(z_path)))
    full = idx_helper.learnable_to_full_batch(v_path)

    wavs = None
    if render:
        pitch = int(info2[0, 1])
        vel = int(info2[0, 2])
        wavs = np.asarray(dataset._renderer.render_batch(
            full, np.full(n_steps, pitch, np.int32),
            np.full(n_steps, vel, np.int32),
        ))
    return full, wavs
