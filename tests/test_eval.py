"""Eval pipeline tests: similarity metrics (STFT golden vs torch, identity
pairs), per-item losses, and the full evaluate_model artifact flow."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.data.dexed_dataset import DexedDataset
from preset_gen_vae_tpu.evaluation import similarity as sim
from preset_gen_vae_tpu.evaluation.evaluate import evaluate_model
from preset_gen_vae_tpu.synth.render import engine_available
from preset_gen_vae_tpu.training.loop import train_config


def test_stft_magnitude_matches_torch(rng):
    """librosa.stft semantics == torch.stft(center=True, pad_mode='reflect',
    hann window) magnitudes."""
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    ours = np.asarray(sim.stft_magnitude(jnp.asarray(x), 512, 128))
    ref = torch.stft(
        torch.tensor(x), 512, 128, window=torch.hann_window(512, periodic=True),
        center=True, pad_mode="reflect", return_complex=True,
    ).abs().numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_similarity_identity_and_ordering(rng):
    a = rng.standard_normal((1, 22050)).astype(np.float32) * 0.1
    noise = rng.standard_normal((1, 22050)).astype(np.float32)
    b_close = a + 0.01 * noise
    b_far = a + 0.5 * noise
    ja = jnp.asarray(a)
    m_same = sim.batched_audio_errors(ja, ja)
    m_close = sim.batched_audio_errors(ja, jnp.asarray(b_close))
    m_far = sim.batched_audio_errors(ja, jnp.asarray(b_far))
    for k in ("spec_mae", "spec_sc", "mfcc13_mae", "mfcc40_mae"):
        assert float(m_same[k][0]) == pytest.approx(0.0, abs=1e-5)
        assert float(m_close[k][0]) < float(m_far[k][0])


def test_similarity_evaluator_api(rng):
    x = [rng.standard_normal(22050).astype(np.float32) * 0.1 for _ in range(2)]
    ev = sim.SimilarityEvaluator(x)
    mae, logs = ev.get_mae_log_stft()
    sc = ev.get_spectral_convergence(return_spectrograms=False)
    mfcc_mae = ev.get_mae_mfcc(return_mfccs=False)
    assert mae > 0 and sc > 0 and mfcc_mae > 0
    assert logs[0].shape == logs[1].shape


@pytest.mark.skipif(not engine_available(), reason="libdx7.so not built")
@pytest.mark.slow
def test_evaluate_model_end_to_end(tmp_path):
    ds = DexedDataset(
        n_synthetic_presets=24, synthetic_seed=5, data_root=tmp_path / "data"
    )
    model_c = cfg.ModelConfig(
        name="EvalVAE", run_name="e0", latent_flow_arch=None,
        params_regression_architecture="mlp_2l64", dim_z=16,
        logs_root_dir=str(tmp_path / "saved"),
    )
    train_c = cfg.TrainConfig(
        minibatch_size=8, n_epochs=2, save_period=10, lr_warmup_epochs=1,
        compute_dtype="float32", verbosity=0,
    )
    train_config(model_c, train_c, dataset=ds, use_tensorboard=False)
    eval_c = cfg.EvalConfig(dataset="validation")
    df = evaluate_model(model_c, train_c, eval_c, dataset=ds)
    assert len(df) > 0
    for col in ("num_eval_loss", "num_mae", "acc", "spec_mae", "spec_sc",
                "mfcc13_mae", "mfcc40_mae"):
        assert col in df.columns, col
        assert np.isfinite(df[col]).all()
    assert (df["acc"] >= 0).all() and (df["acc"] <= 100).all()
    # artifacts in the run dir (reference layout: eval.py:227-243)
    from preset_gen_vae_tpu.logs.logger import get_run_dir

    run_dir = get_run_dir(model_c)
    assert (run_dir / "eval_validation.dataframe.pickle").exists()
    assert (run_dir / "eval_validation_z0_spearman_r.npy").exists()
    assert (run_dir / "eval_validation_summary.json").exists()
    # GT audio disk cache was written (cache_gt_audio default) and a
    # cache-hit eval + a cache-disabled eval give IDENTICAL audio metrics
    # (deterministic engine -> cached render == fresh render)
    cache_files = list((ds._corpus_cache_dir() / "gt_eval_audio").glob("gt_*.npy"))
    assert cache_files, "GT audio cache not written"
    df_hit = evaluate_model(
        model_c, train_c,
        cfg.EvalConfig(dataset="validation", override_previous_eval=True),
        dataset=ds,
    )
    df_nocache = evaluate_model(
        model_c, train_c,
        cfg.EvalConfig(dataset="validation", override_previous_eval=True,
                       cache_gt_audio=False),
        dataset=ds,
    )
    for col in ("spec_mae", "spec_sc", "mfcc13_mae", "mfcc40_mae"):
        np.testing.assert_array_equal(df_hit[col], df[col])
        np.testing.assert_array_equal(df_nocache[col], df[col])


@pytest.mark.skipif(not engine_available(), reason="libdx7.so not built")
@pytest.mark.slow
def test_evaluate_all_models_walks_saved_runs(tmp_path):
    """evaluate_all_models: k-fold name expansion, skip-if-already-evaluated
    (reference: eval.py:34-62)."""
    from preset_gen_vae_tpu.evaluation.evaluate import evaluate_all_models

    ds = DexedDataset(
        n_synthetic_presets=16, synthetic_seed=6, data_root=tmp_path / "d"
    )
    model_c = cfg.ModelConfig(
        name="WalkVAE", run_name="w0", latent_flow_arch=None,
        params_regression_architecture="mlp_2l64", dim_z=8,
        logs_root_dir=str(tmp_path / "saved"),
    )
    train_c = cfg.TrainConfig(
        minibatch_size=8, n_epochs=1, save_period=10, lr_warmup_epochs=0,
        compute_dtype="float32", verbosity=0,
    )
    train_config(model_c, train_c, dataset=ds, use_tensorboard=False)
    eval_c = cfg.EvalConfig(models_names=("WalkVAE/w0",), dataset="validation")
    dfs = evaluate_all_models(
        eval_c, saved_root=tmp_path / "saved", dataset=ds
    )
    assert len(dfs) == 1 and len(dfs[0]) > 0
    # second call: eval artifacts exist -> skipped unless override
    assert evaluate_all_models(eval_c, saved_root=tmp_path / "saved",
                               dataset=ds) == []


@pytest.mark.skipif(not engine_available(), reason="libdx7.so not built")
def test_mean_std_normalization_mode(tmp_path):
    ds = DexedDataset(
        n_synthetic_presets=8, synthetic_seed=8, data_root=tmp_path,
        spectrogram_normalization="mean_std",
    )
    x = ds.corpus_tensors()["x"]
    assert abs(float(x.mean())) < 0.05  # standardized
    assert 0.8 < float(x.std()) < 1.2


@pytest.mark.skipif(not engine_available(), reason="libdx7.so not built")
@pytest.mark.slow
def test_evaluate_model_jax_render_backend(tmp_path):
    """audio_render_backend='jax': audio similarity computed from the
    on-device differentiable engine; metrics agree with the C++ backend
    (the two engines golden-match at ~2e-5 waveform MAE)."""
    ds = DexedDataset(
        n_synthetic_presets=24, synthetic_seed=9, data_root=tmp_path / "data"
    )
    model_c = cfg.ModelConfig(
        name="EvalVAE", run_name="ej", latent_flow_arch=None,
        params_regression_architecture="mlp_2l64", dim_z=16,
        logs_root_dir=str(tmp_path / "saved"),
    )
    train_c = cfg.TrainConfig(
        minibatch_size=8, n_epochs=1, save_period=10, lr_warmup_epochs=0,
        compute_dtype="float32", verbosity=0,
    )
    train_config(model_c, train_c, dataset=ds, use_tensorboard=False)
    df_cpp = evaluate_model(
        model_c, train_c,
        cfg.EvalConfig(dataset="validation", audio_render_backend="cpp",
                       override_previous_eval=True),
        dataset=ds,
    )
    df_jax = evaluate_model(
        model_c, train_c,
        cfg.EvalConfig(dataset="validation", audio_render_backend="jax",
                       override_previous_eval=True),
        dataset=ds,
    )
    for col in ("spec_mae", "mfcc13_mae", "mfcc40_mae"):
        a = np.asarray(df_cpp[col], dtype=float)
        b = np.asarray(df_jax[col], dtype=float)
        np.testing.assert_allclose(b, a, rtol=0.08, atol=0.02)
