"""Config system tests: dynamic derivation parity with the reference
``update_dynamic_config_params()`` (reference: config.py:148-202) and JSON
round-trip (reference: utils/config.py:30-50)."""

import dataclasses

import pytest

from preset_gen_vae_tpu import config as cfg


def test_resolve_single_note_defaults():
    model, train = cfg.resolve(cfg.ModelConfig(), cfg.TrainConfig())
    assert model.stack_spectrograms is False
    assert model.increased_dataset_size is False
    assert model.concat_midi_to_z is False
    assert model.input_tensor_size == (160, 1, 257, 347)
    assert train.early_stop_lr_threshold == pytest.approx(2e-7)
    assert model.synth_args_str == "al*_op123456_lab*"
    assert train.n_epochs == 400


def test_resolve_multi_note_unstacked():
    m = cfg.ModelConfig(midi_notes=((40, 85), (50, 85), (60, 42), (60, 85), (60, 127), (70, 85)))
    model, train = cfg.resolve(m, cfg.TrainConfig())
    assert model.increased_dataset_size is True
    assert model.concat_midi_to_z is True
    assert model.input_tensor_size[1] == 1
    # epoch counts divided by N = len(notes)-1 = 5 (reference: config.py:175-181)
    assert train.n_epochs == 1 + 400 // 5
    assert train.lr_warmup_epochs == 1 + 6 // 5
    assert train.beta_warmup_epochs == 1 + 25 // 5


def test_resolve_multi_note_stacked():
    m = cfg.ModelConfig(
        midi_notes=((40, 85), (60, 85)), stack_spectrograms=True
    )
    model, train = cfg.resolve(m, cfg.TrainConfig())
    assert model.stack_spectrograms is True
    assert model.increased_dataset_size is False
    assert model.concat_midi_to_z is False
    assert model.input_tensor_size[1] == 2
    assert train.n_epochs == 400  # stacked: no epoch reduction


def test_resolve_limited_algos_increases_epochs():
    m = cfg.ModelConfig(dataset_synth_args=((1, 2, 7), (1, 2, 3, 4, 5, 6)))
    model, train = cfg.resolve(m, cfg.TrainConfig())
    assert train.n_epochs == 700
    assert train.lr_warmup_epochs == 10
    assert model.synth_args_str == "al1.2.7_op123456_lab*"


def test_json_round_trip(tmp_path):
    model, train = cfg.resolve(cfg.ModelConfig(), cfg.TrainConfig())
    p = tmp_path / "config.json"
    cfg.save_config(p, model, train, cfg.EvalConfig())
    model2, train2 = cfg.load_config(p)
    assert dataclasses.asdict(model2) == dataclasses.asdict(model)
    # tuples restored (not lists)
    assert isinstance(model2.stft_args, tuple)
    assert isinstance(model2.midi_notes[0], tuple)
    assert train2.minibatch_size == train.minibatch_size


def test_resume_consistency_check(tmp_path):
    model, train = cfg.resolve(cfg.ModelConfig(), cfg.TrainConfig())
    p = tmp_path / "config.json"
    cfg.save_config(p, model, train)
    import json

    with open(p) as f:
        payload = json.load(f)
    cfg.check_configs_on_resume_from_checkpoint(model, train, payload)  # no raise
    bad_model = dataclasses.replace(model, dim_z=128)
    with pytest.raises(ValueError):
        cfg.check_configs_on_resume_from_checkpoint(bad_model, train, payload)
