"""Extended auto-encoder: spectrogram VAE + synth-param regression head
(reference: model/extendedAE.py:13-52).

One flax module holding both sub-models, with separate entry points so the
train step can auto-encode and regress in one jitted function (the reference
calls the regression sub-model separately via a second DataParallel wrapper,
train.py:95-97 / 214-220 — under jit there is no such split)."""

from __future__ import annotations

from flax import linen as nn

from .regression import FlowRegression, MLPRegression
from .vae import BasicVAE, FlowVAE


class ExtendedAE(nn.Module):
    ae_model: nn.Module
    reg_model: nn.Module

    @property
    def is_flow_based_latent_space(self) -> bool:
        return isinstance(self.ae_model, FlowVAE)

    @property
    def is_flow_based_regression(self) -> bool:
        return isinstance(self.reg_model, FlowRegression)

    def __call__(self, x, sample_info=None, train: bool = True):
        """Auto-encode only (reference: extendedAE.py:42-48)."""
        return self.ae_model(x, sample_info, train=train)

    def regress(self, z_K, train: bool = True):
        return self.reg_model(z_K, train=train)

    def forward_full(self, x, sample_info=None, train: bool = True):
        """Auto-encode + regression in one pass — the jitted train-step path.
        Returns (z0_mu_logvar, z0, zK, log_abs_det_jac, x_out, v_out)."""
        z0_mu_logvar, z0, zK, logdet, x_out = self.ae_model(
            x, sample_info, train=train
        )
        v_out = self.reg_model(zK, train=train)
        return z0_mu_logvar, z0, zK, logdet, x_out, v_out

    def latent_flow_inverse(self, zK, train: bool = False):
        assert isinstance(self.ae_model, FlowVAE)
        return self.ae_model.flow_inverse(zK, train=train)

    def regression_flow_inverse(self, v, train: bool = False):
        assert isinstance(self.reg_model, FlowRegression)
        return self.reg_model.flow_inverse(v, train=train)
