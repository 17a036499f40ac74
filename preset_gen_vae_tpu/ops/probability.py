"""Closed-form Gaussian log-probabilities (reference: utils/probability.py:13-29)."""

import numpy as np
import jax.numpy as jnp

_LOG_2_PI = float(np.log(2.0 * np.pi))


def standard_gaussian_log_probability(samples):
    """log N(samples; 0, I), summed over the feature axis -> (B,)."""
    return -0.5 * (
        samples.shape[1] * _LOG_2_PI + jnp.sum(samples ** 2, axis=1)
    )


def gaussian_log_probability(samples, mu, log_var):
    """log N(samples; mu, diag(exp(log_var))) -> (B,)."""
    return -0.5 * (
        samples.shape[1] * _LOG_2_PI
        + jnp.sum(log_var + (samples - mu) ** 2 / jnp.exp(log_var), axis=1)
    )
