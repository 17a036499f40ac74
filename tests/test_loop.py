"""End-to-end training loop tests: a tiny full run (dataset -> loaders ->
jitted SPMD steps -> scheduler -> checkpoints), then resume-from-checkpoint
and queue NaN-retry semantics."""

import dataclasses

import numpy as np
import pytest

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.data.dexed_dataset import DexedDataset
from preset_gen_vae_tpu.logs.logger import list_checkpoint_epochs
from preset_gen_vae_tpu.synth.render import engine_available
from preset_gen_vae_tpu.training.loop import train_config
from preset_gen_vae_tpu.training.queue import expand_k_folds

pytestmark = pytest.mark.skipif(
    not engine_available(), reason="libdx7.so not built"
)


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    return DexedDataset(
        n_synthetic_presets=24,
        synthetic_seed=11,
        data_root=tmp_path_factory.mktemp("loopdata"),
    )


def _configs(tmp_path, run_name="t0", start_epoch=0, n_epochs=3):
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
        n_epochs=n_epochs,
        start_epoch=start_epoch,
        save_period=2,
        lr_warmup_epochs=1,
        beta_warmup_epochs=2,
        compute_dtype="float32",
        verbosity=0,
    )
    return model_c, train_c


@pytest.mark.slow
def test_tiny_training_run_and_resume(tiny_dataset, tmp_path):
    model_c, train_c = _configs(tmp_path, n_epochs=3)
    summary = train_config(
        model_c, train_c, dataset=tiny_dataset, use_tensorboard=False
    )
    assert summary["epochs_trained"] == 3
    assert np.isfinite(summary["ReconsLoss/Backprop/Valid"])
    # checkpoints at epoch 2 (save_period) and 2 == n_epochs-1 (final)
    epochs = list_checkpoint_epochs(model_c)
    assert 2 in epochs
    # ---- resume from epoch-2 checkpoint for 2 more epochs
    model_c2, train_c2 = _configs(tmp_path, start_epoch=3, n_epochs=5)
    summary2 = train_config(
        model_c2, train_c2, dataset=tiny_dataset, use_tensorboard=False
    )
    assert summary2["epochs_trained"] == 5
    assert 4 in list_checkpoint_epochs(model_c2)


@pytest.mark.slow
def test_resume_config_mismatch_raises(tiny_dataset, tmp_path):
    model_c, train_c = _configs(tmp_path, run_name="t1", n_epochs=2)
    train_config(model_c, train_c, dataset=tiny_dataset, use_tensorboard=False)
    bad_model, bad_train = _configs(tmp_path, run_name="t1", start_epoch=2, n_epochs=3)
    bad_model = dataclasses.replace(bad_model, dim_z=32)  # whitelist attr
    with pytest.raises(ValueError):
        train_config(bad_model, bad_train, dataset=tiny_dataset,
                     use_tensorboard=False)


def test_expand_k_folds():
    mods = expand_k_folds([({"run_name": "r"}, {})], 3)
    assert [m["run_name"] for m, _ in mods] == ["r_kf0", "r_kf1", "r_kf2"]
    assert [t["current_k_fold"] for _, t in mods] == [0, 1, 2]


@pytest.mark.slow
def test_host_fed_pipeline_mode(tiny_dataset, tmp_path):
    """dataset_cache_device=False: batches gathered on host and device_put
    per step (the fallback when the corpus exceeds HBM)."""
    model_c, train_c = _configs(tmp_path, run_name="hostfed", n_epochs=1)
    train_c = dataclasses.replace(train_c, dataset_cache_device=False)
    summary = train_config(
        model_c, train_c, dataset=tiny_dataset, use_tensorboard=False
    )
    assert summary["epochs_trained"] == 1
    assert np.isfinite(summary["ReconsLoss/Backprop/Valid"])


@pytest.mark.slow
def test_profiled_epoch_writes_trace(tiny_dataset, tmp_path):
    """profiler_args={'enabled': True}: a bounded (few-step) jax.profiler
    trace lands in the run dir (reference analog: utils/profile.py +
    logger.save_profiler_results)."""
    model_c, train_c = _configs(tmp_path, run_name="prof", n_epochs=1)
    train_c = dataclasses.replace(train_c, profiler_args={"enabled": True})
    train_config(model_c, train_c, dataset=tiny_dataset, use_tensorboard=False)
    import pathlib

    trace_files = list(
        (pathlib.Path(str(tmp_path)) / "TestVAE" / "prof" / "profile").rglob("*.pb")
    )
    assert trace_files, "no xplane trace written"


def test_run_queue_nan_retry(monkeypatch):
    """The queue restarts a diverged run up to max_restarts times
    (reference: train_queue.py:89-106) — and, deliberately unlike the
    reference, bumps the seed each retry so the deterministic JAX rerun
    actually diverges from the failed trajectory."""
    from preset_gen_vae_tpu.training import queue as q
    from preset_gen_vae_tpu.utils.exception import ModelConvergenceError

    calls = {"n": 0}
    seeds_seen = []

    def fake_train(model_c, train_c, **kw):
        calls["n"] += 1
        seeds_seen.append(train_c.seed)
        if calls["n"] < 3:
            raise ModelConvergenceError("NaN at epoch 0")
        return {"ok": True, "run": model_c.run_name}

    monkeypatch.setattr(q, "train_config", fake_train)
    out = q.run_queue([({"run_name": "r0"}, {})], max_restarts=2)
    assert calls["n"] == 3 and out[0]["ok"]
    # every retry ran with a distinct seed -> distinct trajectory
    assert len(set(seeds_seen)) == 3, seeds_seen

    calls["n"] = -10  # never succeeds within retries
    with pytest.raises(RuntimeError):
        q.run_queue([({"run_name": "r1"}, {})], max_restarts=1)


@pytest.mark.slow
def test_training_reproducibility(tiny_dataset, tmp_path):
    """Two runs with identical seeds/config produce identical final
    validation losses: PRNG streams are keyed (not global-state), splits
    are seed-0 deterministic, and epoch shuffles derive from (seed, epoch)."""
    results = []
    for name in ("repro_a", "repro_b"):
        model_c, train_c = _configs(tmp_path, run_name=name, n_epochs=2)
        s = train_config(model_c, train_c, dataset=tiny_dataset,
                         use_tensorboard=False)
        results.append(s)
    for k in ("ReconsLoss/Backprop/Valid", "LatLoss/Valid",
              "Controls/BackpropLoss/Valid"):
        assert results[0][k] == results[1][k], k


@pytest.mark.slow
def test_steps_per_dispatch_matches(tiny_dataset, tmp_path):
    """steps_per_dispatch=4 (K-step lax.scan dispatch + whole-validation
    scan) reproduces the per-step path: same PRNG stream (the step folds
    rng from state.step), same shuffles, same losses. Training is
    bit-exact; validation scalars come from a *scanned* eval graph whose
    XLA fusion rounds reductions differently at the ~1e-7 level, so the
    comparison is float-tolerance, not bitwise."""
    model_a, train_a = _configs(tmp_path, run_name="k1", n_epochs=2)
    sa = train_config(model_a, train_a, dataset=tiny_dataset,
                      use_tensorboard=False)
    model_b, train_b = _configs(tmp_path, run_name="k4", n_epochs=2)
    train_b = dataclasses.replace(train_b, steps_per_dispatch=4)
    sb = train_config(model_b, train_b, dataset=tiny_dataset,
                      use_tensorboard=False)
    # steps_per_dispatch=-1: whole-epoch dispatch (K pinned to the train
    # loader's batch count — one scan per epoch)
    model_e, train_e = _configs(tmp_path, run_name="kepoch", n_epochs=2)
    train_e = dataclasses.replace(train_e, steps_per_dispatch=-1)
    se = train_config(model_e, train_e, dataset=tiny_dataset,
                      use_tensorboard=False)
    for k in ("ReconsLoss/Backprop/Valid", "LatLoss/Valid",
              "Controls/BackpropLoss/Valid", "Controls/Accuracy/Valid"):
        assert np.isclose(sa[k], sb[k], rtol=1e-5, atol=1e-7), (
            f"{k}: {sa[k]} vs {sb[k]}"
        )
        assert np.isclose(sa[k], se[k], rtol=1e-5, atol=1e-7), (
            f"{k} (epoch-dispatch): {sa[k]} vs {se[k]}"
        )
