"""Model factory: config -> model instances (reference: model/build.py:11-80).

Also provides parameter initialization helpers (flax init needs example
inputs and RNG streams, which torch did implicitly)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig, TrainConfig
from ..data.preset import PresetIndexesHelper
from .decoder import SpectrogramDecoder
from .encoder import SpectrogramEncoder
from .extended_ae import ExtendedAE
from .regression import FlowRegression, MLPRegression
from .vae import BasicVAE, FlowVAE


def _compute_dtype(train_config: TrainConfig):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        getattr(train_config, "compute_dtype", "float32") or "float32"
    ]


def build_encoder_and_decoder_models(
    model_config: ModelConfig, train_config: TrainConfig
) -> Tuple[SpectrogramEncoder, SpectrogramDecoder]:
    """(reference: model/build.py:11-31)"""
    # Multi-note single-channel models get wider mixing layers for fair
    # comparisons (reference: build.py:16)
    force_bigger = (len(model_config.midi_notes) > 1) and not model_config.stack_spectrograms
    enc_z_length = (
        model_config.dim_z - 2 if model_config.concat_midi_to_z else model_config.dim_z
    )
    channels = model_config.input_tensor_size[1]
    dtype = _compute_dtype(train_config)
    encoder = SpectrogramEncoder(
        architecture=model_config.encoder_architecture,
        dim_z=enc_z_length,
        spectrogram_channels=channels,
        fc_dropout=train_config.fc_dropout,
        output_bn=(train_config.latent_flow_input_regularization.lower() == "bn"),
        deepest_features_mix=model_config.stack_specs_deepest_features_mix,
        force_bigger_network=force_bigger,
        dtype=dtype,
    )
    decoder = SpectrogramDecoder(
        architecture=model_config.encoder_architecture,
        dim_z=model_config.dim_z,
        output_size=tuple(model_config.spectrogram_size),
        spectrogram_channels=channels,
        fc_dropout=train_config.fc_dropout,
        force_bigger_network=force_bigger,
        dtype=dtype,
    )
    return encoder, decoder


def build_ae_model(model_config: ModelConfig, train_config: TrainConfig):
    """(reference: model/build.py:34-52)"""
    encoder, decoder = build_encoder_and_decoder_models(model_config, train_config)
    if model_config.latent_flow_arch is None:
        ae_model = BasicVAE(encoder=encoder, decoder=decoder, dim_z=model_config.dim_z)
    else:
        ae_model = FlowVAE(
            encoder=encoder,
            decoder=decoder,
            dim_z=model_config.dim_z,
            flow_arch=model_config.latent_flow_arch,
            concat_midi_to_z0=bool(model_config.concat_midi_to_z),
            flow_dtype=_compute_dtype(train_config),
        )
    return encoder, decoder, ae_model


def build_extended_ae_model(
    model_config: ModelConfig,
    train_config: TrainConfig,
    idx_helper: PresetIndexesHelper,
):
    """(reference: model/build.py:55-80)"""
    encoder, decoder, ae_model = build_ae_model(model_config, train_config)
    arch = model_config.params_regression_architecture
    if arch.startswith("mlp_"):
        # Non-invertible MLP cannot inverse target values (build.py:65)
        assert model_config.forward_controls_loss is True
        reg_model = MLPRegression(
            architecture=arch.replace("mlp_", ""),
            dim_z=model_config.dim_z,
            idx_helper=idx_helper,
            dropout_p=train_config.reg_fc_dropout,
            cat_softmax_activation=model_config.params_reg_softmax,
            dtype=_compute_dtype(train_config),
        )
    elif arch.startswith("flow_"):
        assert model_config.learnable_params_tensor_length > 0  # build.py:70
        reg_model = FlowRegression(
            architecture=arch.replace("flow_", ""),
            dim_z=model_config.dim_z,
            idx_helper=idx_helper,
            dropout_p=train_config.reg_fc_dropout,
            fast_forward_flow=model_config.forward_controls_loss,
            cat_softmax_activation=model_config.params_reg_softmax,
            dtype=_compute_dtype(train_config),
        )
    else:
        raise NotImplementedError(f"Synth param regression arch '{arch}' not implemented")
    extended = ExtendedAE(ae_model=ae_model, reg_model=reg_model)
    return encoder, decoder, ae_model, extended


def init_extended_ae(
    model: ExtendedAE,
    seed: int,
    input_tensor_size,
    init_batch: int = 2,
):
    """Initializes all parameters / batch stats with a small dummy batch.

    :returns: flax variables dict with 'params' and (possibly) 'batch_stats'.
    """
    rng = jax.random.PRNGKey(seed)
    p_rng, s_rng, d_rng = jax.random.split(rng, 3)
    _, c, h, w = input_tensor_size
    x = jnp.zeros((init_batch, c, h, w), dtype=jnp.float32)
    info = jnp.zeros((init_batch, 3), dtype=jnp.int32)
    variables = model.init(
        {"params": p_rng, "sampling": s_rng, "dropout": d_rng},
        x,
        info,
        train=True,
        method=model.forward_full,
    )
    return variables
