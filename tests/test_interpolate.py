"""Latent-space preset interpolation (evaluation/interpolate.py): train a
tiny model, morph between two presets, check the decoded path is valid."""

import dataclasses

import numpy as np
import pytest

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.data.dexed_dataset import DexedDataset
from preset_gen_vae_tpu.evaluation.interpolate import (
    interpolate_presets,
    slerp,
)
from preset_gen_vae_tpu.synth.render import engine_available
from preset_gen_vae_tpu.training.loop import train_config

pytestmark = pytest.mark.skipif(
    not engine_available(), reason="libdx7.so not built"
)


def test_slerp_endpoints_and_norms():
    rng = np.random.default_rng(0)
    a, b = rng.standard_normal(16), rng.standard_normal(16)
    t = np.linspace(0, 1, 5)
    path = slerp(a, b, t)
    np.testing.assert_allclose(path[0], a, atol=1e-5)
    np.testing.assert_allclose(path[-1], b, atol=1e-5)
    # slerp between unit vectors stays on the sphere
    a_u, b_u = a / np.linalg.norm(a), b / np.linalg.norm(b)
    norms = np.linalg.norm(slerp(a_u, b_u, t), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


@pytest.mark.slow
def test_interpolate_presets_tiny_model(tmp_path):
    dataset = DexedDataset(
        n_synthetic_presets=24, synthetic_seed=11,
        data_root=tmp_path / "data",
    )
    model_c = cfg.ModelConfig(
        name="TestVAE", run_name="interp", latent_flow_arch="realnvp_2l32",
        params_regression_architecture="mlp_2l64", dim_z=16,
        logs_root_dir=str(tmp_path),
    )
    train_c = cfg.TrainConfig(
        minibatch_size=8, n_epochs=2, save_period=1, lr_warmup_epochs=1,
        compute_dtype="float32", verbosity=0,
    )
    train_config(model_c, train_c, dataset=dataset, use_tensorboard=False)

    uids = dataset.valid_preset_UIDs
    full, wavs = interpolate_presets(
        model_c, train_c, int(uids[0]), int(uids[1]), n_steps=5,
        dataset=dataset, render=True,
    )
    assert full.shape == (5, 155) and np.isfinite(full).all()
    assert 0.0 <= full.min() and full.max() <= 1.0
    # endpoints decode to different presets (the corpus items differ)
    assert np.abs(full[0] - full[-1]).max() > 1e-3
    assert wavs.shape[0] == 5 and np.isfinite(wavs).all()
