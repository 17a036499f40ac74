"""Utility tests: figures render, wav IO round-trip, HPSS labeler, profiler
wrapper, hparams ramps, NaN guard."""

import numpy as np
import pytest

from preset_gen_vae_tpu.logs.metrics import LatentMetric
from preset_gen_vae_tpu.utils import figures
from preset_gen_vae_tpu.utils.audio_io import read_wav, write_wav
from preset_gen_vae_tpu.utils.exception import ModelConvergenceError, check_nan_values
from preset_gen_vae_tpu.utils.hparams import LinearDynamicParam
from preset_gen_vae_tpu.utils.label import SimpleSampleLabeler
from preset_gen_vae_tpu.utils.profile import ActualProfiler, NoProfiler, get_optional_profiler


def test_figures_render(rng):
    x_in = rng.standard_normal((4, 1, 64, 80)).astype(np.float32)
    x_out = x_in + 0.1
    info = np.tile([[1, 60, 85]], (4, 1))
    fig, _ = figures.plot_train_spectrograms(x_in, x_out, info)
    assert fig is not None
    lat = LatentMetric(8)
    lat.append(rng.standard_normal((32, 8)), rng.standard_normal((32, 8)))
    fig, _ = figures.plot_latent_distributions_stats(lat)
    fig, _ = figures.plot_spearman_correlation(lat)
    fig, _ = figures.plot_synth_preset_error(rng.standard_normal((32, 24)))
    import matplotlib.pyplot as plt

    plt.close("all")


def test_preset_param_figures_render(rng):
    """The two single-preset fader plots (reference figures.py:166-270):
    full-representation GT-vs-inferred and learnable-representation."""
    from preset_gen_vae_tpu.data.dexed_dataset import build_dexed_preset_spec
    from preset_gen_vae_tpu.data.preset import PresetIndexesHelper

    helper = PresetIndexesHelper(build_dexed_preset_spec())
    full = rng.random(helper.full_preset_size).astype(np.float32)
    inferred = np.clip(full + 0.05, 0, 1)
    fig, _ = figures.plot_synth_preset_param(
        full, inferred, preset_UID=7, idx_helper=helper
    )
    assert fig is not None
    v = rng.random(helper.learnable_preset_size).astype(np.float32)
    fig, _ = figures.plot_synth_learnable_preset(v, helper, preset_UID=7)
    assert fig is not None
    import matplotlib.pyplot as plt

    plt.close("all")


def test_wav_roundtrip(tmp_path):
    # local seed (not the session rng): samples must stay inside [-1, 1] —
    # 16-bit wav clips anything beyond full scale
    x = np.clip(
        np.random.default_rng(77).standard_normal(1000) * 0.3, -0.99, 0.99
    ).astype(np.float32)
    write_wav(tmp_path / "t.wav", x, 22050)
    y, sr = read_wav(tmp_path / "t.wav")
    assert sr == 22050
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)


def test_labeler_harmonic_vs_noise(rng):
    t = np.arange(22050 * 2) / 22050.0
    # steady harmonic tone
    tone = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    assert SimpleSampleLabeler(tone).has_label("harmonic")
    # broadband noise -> not harmonic
    noise = (rng.standard_normal(len(t)) * 0.3).astype(np.float32)
    lab = SimpleSampleLabeler(noise)
    assert not lab.is_harmonic
    # decaying click -> percussive energy concentrated in the attack
    click = np.zeros(len(t), dtype=np.float32)
    click[:2205] = rng.standard_normal(2205).astype(np.float32) * np.linspace(1, 0, 2205)
    lab_click = SimpleSampleLabeler(click)
    assert lab_click.has_label("percussive") or lab_click.has_label("sfx")


def test_profiler_wrapper():
    p = get_optional_profiler({"enabled": False})
    assert isinstance(p, NoProfiler)
    with p as prof:
        assert prof is None
    with p.record_function("X"):
        pass
    assert isinstance(
        get_optional_profiler({"enabled": True}, "/tmp/prof_t"), ActualProfiler
    )


def test_linear_dynamic_param():
    p = LinearDynamicParam(0.1, 1.0, start_epoch=0, end_epoch=10)
    assert p.get(0) == pytest.approx(0.1)
    assert p.get(10) == pytest.approx(1.0)
    assert p.get(5) == pytest.approx(0.55)
    assert p.get(20) == pytest.approx(1.0)


def test_nan_guard():
    check_nan_values(0, 1.0, 2.0)
    with pytest.raises(ModelConvergenceError):
        check_nan_values(0, 1.0, float("nan"))


def test_fast_bf16_cast_matches_ml_dtypes(rng):
    import ml_dtypes

    from preset_gen_vae_tpu.utils.fast_cast import f32_to_bf16

    x = (rng.standard_normal((64, 33)) * 100).astype(np.float32)
    # include exact halfway-rounding cases and specials
    x[0, :4] = [0.0, -0.0, np.inf, -np.inf]
    ours = f32_to_bf16(x)
    ref = x.astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(
        ours.view(np.uint16), ref.view(np.uint16)
    )
    assert ours.shape == x.shape


def test_erase_run(tmp_path):
    """clean_logs equivalent removes the run dir (reference: clean_logs.py)."""
    from preset_gen_vae_tpu import config as cfg
    from preset_gen_vae_tpu.logs.logger import RunLogger, erase_run, get_run_dir

    m = cfg.ModelConfig(name="EraseMe", run_name="r0",
                        logs_root_dir=str(tmp_path))
    t = cfg.TrainConfig(verbosity=0)
    RunLogger(m, t, use_tensorboard=False)
    assert get_run_dir(m).exists()
    erase_run(m)
    assert not get_run_dir(m).exists()
