"""Integration tests: the 2-D (data, model) tensor-parallel mesh and the
multi-host data pipeline as exercised by the REAL training loop
(``training.loop.train_config``), not just the parallel/ helpers.

Runs on the 8-virtual-CPU-device platform from conftest.py. The reference's
only distribution is single-process nn.DataParallel (train.py:95-97;
SURVEY.md §2.10) — these paths are the TPU-native extension."""

import dataclasses

import numpy as np
import pytest

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.data.dexed_dataset import DexedDataset
from preset_gen_vae_tpu.synth.render import engine_available
from preset_gen_vae_tpu.training.loop import train_config

pytestmark = pytest.mark.skipif(
    not engine_available(), reason="libdx7.so not built"
)


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    return DexedDataset(
        n_synthetic_presets=24,
        synthetic_seed=11,
        data_root=tmp_path_factory.mktemp("pardata"),
    )


def _configs(tmp_path, run_name, **train_kw):
    model_c = cfg.ModelConfig(
        name="TestVAE",
        run_name=run_name,
        latent_flow_arch=None,
        params_regression_architecture="mlp_2l64",
        dim_z=16,
        logs_root_dir=str(tmp_path),
    )
    train_c = cfg.TrainConfig(
        minibatch_size=8,
        n_epochs=2,
        save_period=1,
        lr_warmup_epochs=1,
        beta_warmup_epochs=2,
        compute_dtype="float32",
        verbosity=0,
        **train_kw,
    )
    return model_c, train_c


LOSS_KEYS = ("ReconsLoss/Backprop/Valid", "LatLoss/Valid",
             "Controls/BackpropLoss/Valid")


@pytest.mark.slow
def test_2d_mesh_training_matches_1d(tiny_dataset, tmp_path):
    """model_parallel_devices=2 on the 8-device platform: params + Adam
    moments TP-shard over the 'model' axis, and the loss trajectory matches
    the 1-D data-parallel run (same seed) to float tolerance."""
    model_1d, train_1d = _configs(tmp_path, "mesh1d")
    s1 = train_config(model_1d, train_1d, dataset=tiny_dataset,
                      use_tensorboard=False)

    model_2d, train_2d = _configs(
        tmp_path, "mesh2d",
        model_parallel_devices=2,
        tp_min_elements=1 << 10,  # tiny test model: shard aggressively
    )
    s2 = train_config(model_2d, train_2d, dataset=tiny_dataset,
                      use_tensorboard=False)

    assert s2["tp_kernels_sharded"] > 0, "TP engaged no kernel"
    for k in LOSS_KEYS:
        assert np.isclose(s1[k], s2[k], rtol=2e-3), (
            f"{k}: 1-D {s1[k]} vs 2-D {s2[k]}"
        )


@pytest.mark.slow
def test_multihost_data_path_end_to_end(tiny_dataset, tmp_path):
    """force_multihost_data=True at process_count=1 drives training through
    shard_loaders_for_host + make_global_batch (the pod data path); the
    trajectory matches the device-resident single-host run (identical item
    set and per-epoch shuffles at process_count=1)."""
    model_a, train_a = _configs(tmp_path, "mh_off")
    sa = train_config(model_a, train_a, dataset=tiny_dataset,
                      use_tensorboard=False)

    model_b, train_b = _configs(tmp_path, "mh_on", force_multihost_data=True)
    sb = train_config(model_b, train_b, dataset=tiny_dataset,
                      use_tensorboard=False)

    assert sb["epochs_trained"] == 2
    for k in LOSS_KEYS:
        assert np.isclose(sa[k], sb[k], rtol=2e-3), (
            f"{k}: resident {sa[k]} vs multihost {sb[k]}"
        )


@pytest.mark.slow
def test_multihost_plus_tp(tiny_dataset, tmp_path):
    """The pod data path composes with the 2-D TP mesh (global batch over
    'data', kernels over 'model')."""
    model_c, train_c = _configs(
        tmp_path, "mh_tp",
        force_multihost_data=True,
        model_parallel_devices=2,
        tp_min_elements=1 << 10,
    )
    s = train_config(model_c, train_c, dataset=tiny_dataset,
                     use_tensorboard=False)
    assert s["epochs_trained"] == 2
    assert s["tp_kernels_sharded"] > 0
    for k in LOSS_KEYS:
        assert np.isfinite(s[k])
