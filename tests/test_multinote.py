"""Multi-note dataset + model paths (reference: config.py:35-37,155-158;
abstractbasedataset.py:95-119; encoder.py:95-100; VAE.py:153-165):
- stacked: N MIDI notes as spectrogram channels, shared per-channel CNN
- un-stacked: dataset-size multiplication + MIDI pitch/vel concat to z0."""

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

NOTES = ((40, 85), (50, 85), (60, 85))
# the reference's commented-out FULL set (config.py:36) — 6 notes with
# velocity variation on pitch 60; the round-5 at-scale protocols
# (scripts/run_6note_r5.py) run exactly this set
NOTES_6 = ((40, 85), (50, 85), (60, 42), (60, 85), (60, 127), (70, 85))


@pytest.mark.slow
@pytest.mark.parametrize("notes", [NOTES, NOTES_6], ids=["3note", "6note"])
def test_stacked_multinote_run(tmp_path, notes):
    ds = DexedDataset(
        n_synthetic_presets=16, synthetic_seed=3, midi_notes=notes,
        multichannel_stacked_spectrograms=True, data_root=tmp_path / "d",
    )
    assert len(ds) == ds.valid_presets_count  # items = presets
    assert ds.get_spectrogram_tensor_size() == (len(notes), 257, 347)
    t = ds.corpus_tensors()
    assert t["x"].shape[1] == len(notes)  # stacked channels
    model_c = cfg.ModelConfig(
        name="MnVAE", run_name="stacked", latent_flow_arch=None,
        params_regression_architecture="mlp_2l64", dim_z=16,
        midi_notes=notes, stack_spectrograms=True,
        logs_root_dir=str(tmp_path / "saved"),
    )
    train_c = cfg.TrainConfig(
        minibatch_size=4, n_epochs=1, lr_warmup_epochs=0,
        compute_dtype="float32", verbosity=0,
    )
    summary = train_config(model_c, train_c, dataset=ds, use_tensorboard=False)
    assert np.isfinite(summary["ReconsLoss/Backprop/Valid"])


@pytest.mark.slow
@pytest.mark.parametrize("notes", [NOTES, NOTES_6], ids=["3note", "6note"])
def test_unstacked_multinote_run(tmp_path, notes):
    ds = DexedDataset(
        n_synthetic_presets=16, synthetic_seed=3, midi_notes=notes,
        multichannel_stacked_spectrograms=False, data_root=tmp_path / "d",
    )
    assert len(ds) == ds.valid_presets_count * len(notes)  # size increase
    t = ds.corpus_tensors()
    assert t["x"].shape == (len(ds), 1, 257, 347)
    # each preset contributes len(notes) items with distinct (pitch, vel)
    uids = t["info"][:, 0]
    pv = {(int(p), int(v)) for p, v in t["info"][uids == uids[0]][:, 1:3]}
    assert pv == set(notes)
    model_c = cfg.ModelConfig(
        name="MnVAE", run_name="unstacked",
        latent_flow_arch="realnvp_2l32",
        params_regression_architecture="mlp_2l64", dim_z=16,
        midi_notes=notes, stack_spectrograms=False,
        logs_root_dir=str(tmp_path / "saved"),
    )
    train_c = cfg.TrainConfig(
        minibatch_size=4, n_epochs=1, lr_warmup_epochs=0,
        compute_dtype="float32", verbosity=0,
    )
    model_r, train_r = cfg.resolve(model_c, train_c)
    assert model_r.concat_midi_to_z and model_r.increased_dataset_size
    summary = train_config(model_c, train_c, dataset=ds, use_tensorboard=False)
    assert np.isfinite(summary["ReconsLoss/Backprop/Valid"])


@pytest.mark.slow
def test_stacked_deepest_features_mix(tmp_path):
    """stack_specs_deepest_features_mix=True: channels mixed at the deepest
    1x1 conv instead of the 4x4 (reference: config.py:38, encoder.py:95-100)."""
    import jax
    import jax.numpy as jnp

    from preset_gen_vae_tpu.models.encoder import SpectrogramEncoder

    for mix in (False, True):
        enc = SpectrogramEncoder(
            architecture="speccnn8l1_bn", dim_z=8, spectrogram_channels=3,
            fc_dropout=0.0, deepest_features_mix=mix, dtype=jnp.float32,
        )
        x = jnp.zeros((2, 3, 257, 347), dtype=jnp.float32)
        v = enc.init(jax.random.PRNGKey(0), x, train=False)
        out = enc.apply(v, x, train=False)
        assert out.shape == (2, 2, 8), f"mix={mix}"
