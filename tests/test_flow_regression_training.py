"""Inverse-flow controls loss training path (reference: train.py:119-121 +
model/loss.py:318-346): forward_controls_loss=False routes the controls
loss through the regression-flow inverse and the latent-flow inverse,
scoring the pulled-back target under q(z0)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.data.dexed_spec import build_dexed_preset_spec
from preset_gen_vae_tpu.data.preset import PresetIndexesHelper
from preset_gen_vae_tpu.models import build as mbuild
from preset_gen_vae_tpu.training import create_train_state, make_train_step


@pytest.fixture(scope="module")
def helper():
    return PresetIndexesHelper(build_dexed_preset_spec(operators=[1]))


@pytest.mark.slow
@pytest.mark.parametrize("bn_mode", ["train", "eval"])
def test_flow_params_loss_training_decreases(helper, bn_mode):
    """'train': reference-parity inverse (batch-stat BN + dropout, running
    stats updated twice per step); 'eval': running-stat inverse. Both must
    receive gradients and decrease."""
    L = helper.learnable_preset_size
    model_c = cfg.ModelConfig(
        latent_flow_arch="realnvp_2l32",
        params_regression_architecture="flow_realnvp_2l32",
        dim_z=L,
        forward_controls_loss=False,  # inverse-flow loss path
    )
    train_c = cfg.TrainConfig(minibatch_size=8, compute_dtype="float32",
                              flow_loss_bn_mode=bn_mode)
    model_c, train_c = cfg.resolve(model_c, train_c)
    model_c = dataclasses.replace(
        model_c, learnable_params_tensor_length=L, synth_params_count=L
    )
    _, _, _, ext = mbuild.build_extended_ae_model(model_c, train_c, helper)
    variables = mbuild.init_extended_ae(ext, 0, model_c.input_tensor_size)
    state = create_train_state(ext, variables, train_c)
    step = jax.jit(make_train_step(ext, model_c, train_c, helper))

    rng = np.random.default_rng(3)
    x = rng.standard_normal((8, 1, 257, 347)).astype(np.float32)
    v = helper.full_to_learnable_batch(
        rng.random((8, helper.full_preset_size)).astype(np.float32)
    )
    info = np.tile([[0, 60, 85]], (8, 1)).astype(np.int32)
    conts = []
    for _ in range(4):
        state, m = step(state, x, v, info, jax.random.PRNGKey(0),
                        jnp.float32(0.2))
        conts.append(float(m["Controls/BackpropLoss"]))
    assert np.all(np.isfinite(conts))
    # the inverse-flow loss must actually receive gradients
    assert conts[-1] < conts[0]
