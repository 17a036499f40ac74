"""Reconstruction and latent losses (reference: model/loss.py:15-66,
model/VAE.py:63-66, 183-193). All pure jax functions."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.probability import (
    gaussian_log_probability,
    standard_gaussian_log_probability,
)


class L2Loss:
    """Non-normalized squared-error loss with optional averaging
    (reference: model/loss.py:15-43)."""

    def __init__(self, contents_average: bool = False, batch_average: bool = True):
        self.contents_average = contents_average
        self.batch_average = batch_average

    def __call__(self, inferred, target):
        loss = jnp.sum(jnp.square(inferred - target))
        if self.batch_average:
            loss = loss / inferred.shape[0]
        if self.contents_average:
            loss = loss / inferred[0].size
        return loss


def reconstruction_loss(x_out, x_in, normalize: bool):
    """MSELoss(mean) when normalized, else batch-averaged L2
    (reference wiring: train.py:103-106)."""
    if normalize:
        return jnp.mean(jnp.square(x_out - x_in))
    return L2Loss()(x_out, x_in)


class GaussianDkl:
    """Dkl( N(mu, exp(logvar)) || N(0, I) ), batch-averaged, optionally
    normalized over the latent dimension (reference: model/loss.py:46-66)."""

    def __init__(self, normalize: bool = True):
        self.normalize = normalize

    def __call__(self, mu, logvar):
        dkl = 0.5 * jnp.sum(jnp.exp(logvar) + jnp.square(mu) - logvar - 1.0)
        dkl = dkl / mu.shape[0]
        if self.normalize:
            dkl = dkl / mu.shape[1]
        return dkl


def latent_dkl_loss(z0_mu_logvar, normalize: bool):
    """BasicVAE latent loss (reference: VAE.py:63-66)."""
    return GaussianDkl(normalize=normalize)(
        z0_mu_logvar[:, 0, :], z0_mu_logvar[:, 1, :]
    )


def flow_vae_latent_loss(
    z0_mu_logvar, z0_sampled, zK_sampled, log_abs_det_jac, normalize: bool
):
    """FlowVAE ELBO-style latent loss: -E[ log p(zK) - log q(z0) + log|detJ| ]
    (reference: model/VAE.py:183-193)."""
    log_q_z0 = gaussian_log_probability(
        z0_sampled, z0_mu_logvar[:, 0, :], z0_mu_logvar[:, 1, :]
    )
    log_p_zK = standard_gaussian_log_probability(zK_sampled)
    loss = -jnp.mean(log_p_zK - log_q_z0 + log_abs_det_jac)
    if normalize:
        loss = loss / z0_sampled.shape[1]
    return loss
