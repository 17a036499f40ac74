from .vae_losses import L2Loss, GaussianDkl, reconstruction_loss, latent_dkl_loss, flow_vae_latent_loss  # noqa: F401
from .synth_params import (  # noqa: F401
    SynthParamsLoss,
    QuantizedNumericalParamsLoss,
    CategoricalParamsAccuracy,
    FlowParamsLoss,
)
