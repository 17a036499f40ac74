"""VAE cores: BasicVAE (Gaussian latent, Dkl loss) and FlowVAE (latent
normalizing flow, ELBO-style loss) — reference: model/VAE.py:19-193.

flax design: ``__call__(x, sample_info, train)`` returns the reference's
5-tuple ``(z0_mu_logvar, z0_sampled, zK_sampled, log_abs_det_jac, x_out)``.
Sampling consumes the 'sampling' RNG stream; dropout the 'dropout' stream.
Latent losses are pure functions (losses package) so they jit inside the
train step with no module state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .flows import LatentFlow


class BasicVAE(nn.Module):
    """Standard VAE with dim_z independent Gaussian latents
    (reference: model/VAE.py:19-66). Returns zK = z0 and logdet = 0 for
    interface compatibility with FlowVAE."""

    encoder: nn.Module
    decoder: nn.Module
    dim_z: int

    def __call__(self, x, sample_info=None, train: bool = True):
        z_mu_logvar = self.encoder(x, train=train)  # (B, 2, dim_z)
        mu = z_mu_logvar[:, 0, :]
        if train:
            # reparameterization trick (reference: VAE.py:51-56)
            sigma = jnp.exp(z_mu_logvar[:, 1, :] / 2.0)
            key = self.make_rng("sampling")
            z_sampled = mu + sigma * jax.random.normal(key, mu.shape, dtype=mu.dtype)
        else:  # eval: deterministic mean (reference: VAE.py:57-58)
            z_sampled = mu
        x_out = self.decoder(z_sampled, train=train)
        zeros_logdet = jnp.zeros((z_sampled.shape[0],), dtype=z_sampled.dtype)
        return z_mu_logvar, z_sampled, z_sampled, zeros_logdet, x_out


class FlowVAE(nn.Module):
    """VAE with an invertible latent flow z0 -> zK
    (reference: model/VAE.py:69-181).

    If ``concat_midi_to_z0``, the encoder emits dim_z - 2 values and MIDI
    pitch/velocity occupy latent dims 0-1: mean min-max scaled to [-1, 1],
    log-var of a unit std in the [0, 127] MIDI domain
    (reference: VAE.py:153-165).
    """

    encoder: nn.Module
    decoder: nn.Module
    dim_z: int
    flow_arch: str
    concat_midi_to_z0: bool = False
    flow_dtype: jnp.dtype = jnp.float32  # conditioner GEMM dtype (flows.py)

    def setup(self):
        self.flow = LatentFlow(flow_arch=self.flow_arch, features=self.dim_z,
                               dtype=self.flow_dtype)

    def encode(self, x, sample_info=None, train: bool = True):
        if not self.concat_midi_to_z0:
            return self.encoder(x, train=train)
        enc = self.encoder(x, train=train)  # (B, 2, dim_z - 2)
        B = enc.shape[0]
        if sample_info is None:  # tolerated for summaries (reference: VAE.py:157-158)
            midi_mu = jnp.zeros((B, 2), dtype=enc.dtype)
            midi_logvar = jnp.zeros((B, 2), dtype=enc.dtype)
        else:
            midi_mu = -1.0 + 2.0 * sample_info[:, 1:3].astype(enc.dtype) / 127.0
            midi_logvar = jnp.full(
                (B, 2), float(np.log(4.0 / 127 ** 2)), dtype=enc.dtype
            )
        head = jnp.stack([midi_mu, midi_logvar], axis=1)  # (B, 2, 2)
        return jnp.concatenate([head, enc], axis=2)  # (B, 2, dim_z)

    def __call__(self, x, sample_info=None, train: bool = True):
        z0_mu_logvar = self.encode(x, sample_info, train=train)
        mu0 = z0_mu_logvar[:, 0, :]
        if train:
            sigma0 = jnp.exp(z0_mu_logvar[:, 1, :] / 2.0)
            key = self.make_rng("sampling")
            z0 = mu0 + sigma0 * jax.random.normal(key, mu0.shape, dtype=mu0.dtype)
        else:
            z0 = mu0
        zK, log_abs_det_jac = self.flow.forward(z0, train=train)
        x_out = self.decoder(zK, train=train)
        return z0_mu_logvar, z0, zK, log_abs_det_jac, x_out

    def flow_inverse(self, zK, train: bool = False):
        """z_K -> z_0 with log|det J^-1| (used by FlowParamsLoss,
        reference: loss.py:340-342)."""
        return self.flow.inverse(zK, train=train)
