"""Device-resident corpus policy (``corpus_cache_policy='device'``).

The corpus is rendered, reduced and normalized on the accelerator and
handed to the input pipeline as a jax array — no disk tier, no
device->host fetch (the round-4 measurement that motivated it: the 'jax'
backend's disk pass spent ~92% of 3,792 s fetching the fp16 corpus
through the tunnel). Values must match the disk path within a few f16
ulps (bit-identical on the TPU backend at matching chunk partitions —
see load_spectrogram_corpus_device's numerical contract), so a training
run cannot meaningfully tell the policies apart. (Reference's offline
pipeline: host process pool + wav files, dexeddataset.py:278-328 — it
has no analog of either policy.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.data.corpus_device import ChunkedDeviceCorpus
from preset_gen_vae_tpu.data.dexed_dataset import DexedDataset
from preset_gen_vae_tpu.synth.render import engine_available
from preset_gen_vae_tpu.training.loop import train_config


def test_device_policy_validation(tmp_path):
    # requires the on-device render backend
    with pytest.raises(ValueError):
        DexedDataset(
            n_synthetic_presets=4, corpus_cache_policy="device",
            data_root=tmp_path,
        )
    with pytest.raises(ValueError):
        DexedDataset(
            n_synthetic_presets=4, corpus_render_backend="jax",
            corpus_cache_policy="nvme", data_root=tmp_path,
        )


@pytest.mark.slow
def test_device_policy_matches_disk_values(tmp_path):
    """Stacked 2-note corpus, chunk smaller than P so the overlap-tail
    scheme runs (the tail chunk re-renders the last `chunk` presets with
    the overlap rows stats-masked). Different chunk partitions mean XLA
    tiles the render/rDFT differently, so values may move a few f16 ulps
    vs the disk pass (which pads every corpus to 64-row chunks) — the
    data must agree within that, and nothing may touch disk. Exact
    bit-identity under MATCHING partitions is proven by the trajectory
    test below."""
    common = dict(
        n_synthetic_presets=10,
        synthetic_seed=3,
        midi_notes=((55, 85), (64, 100)),
        multichannel_stacked_spectrograms=True,
        corpus_render_backend="jax",
    )
    ds_disk = DexedDataset(data_root=tmp_path / "disk", **common)
    ds_dev = DexedDataset(
        corpus_cache_policy="device", data_root=tmp_path / "dev", **common
    )
    x_disk = ds_disk.load_spectrogram_corpus()  # f32 via the fp16 tier
    dev = ds_dev.load_spectrogram_corpus_device(dtype=jnp.float32, chunk=4)
    assert isinstance(dev, ChunkedDeviceCorpus)
    assert all(isinstance(c, jax.Array) for c in dev.chunks)
    x_dev = dev.as_numpy_4d()
    assert x_dev.shape == x_disk.shape == (10, 2, 257, 347)
    # a few fp16 ulps on the [-1, 1] normalized range
    assert float(np.abs(x_disk - x_dev).max()) < 2.5e-3
    for k in ("min", "max", "mean", "std"):
        assert ds_dev.spec_stats[k] == pytest.approx(
            ds_disk.spec_stats[k], rel=1e-4, abs=1e-4
        ), k
    # the device policy persists nothing
    assert not (ds_dev._corpus_cache_dir() / "specs_raw.npy").exists()
    assert not (ds_dev._corpus_cache_dir() / "specs_norm_f16.npy").exists()
    # corpus_tensors serves the memoized device corpus as x
    t = ds_dev.corpus_tensors(dtype=jnp.float32)
    assert isinstance(t["x"], ChunkedDeviceCorpus)
    assert np.array_equal(t["x"].as_numpy_4d(), x_dev)
    # host fancy indexing (eval targets, figures) gathers items on device
    sel = np.asarray([3, 0, 7])
    assert np.array_equal(t["x"][sel], x_dev[sel])


@pytest.mark.slow
@pytest.mark.skipif(not engine_available(), reason="libdx7.so not built")
def test_device_policy_training_trajectory_matches_disk(tmp_path):
    """At P=64 (exactly one shared 64-row chunk — the disk pass pads every
    corpus to 64 rows, so the render cost here is the same as any smaller
    P) the two policies' corpora must agree within a few f16 ulps (on the
    real TPU backend they are bit-identical — see
    load_spectrogram_corpus_device's contract; XLA:CPU, the test
    platform, lowers the f16 affine slightly differently than numpy), and
    device-policy training must be end-to-end functional AND exactly
    reproducible run to run."""
    common = dict(
        n_synthetic_presets=64, synthetic_seed=11,
        corpus_render_backend="jax",
    )
    ds_dev = DexedDataset(
        corpus_cache_policy="device", data_root=tmp_path / "dev", **common
    )
    ds_disk = DexedDataset(data_root=tmp_path / "disk", **common)
    x_dev = ds_dev.load_spectrogram_corpus_device(
        dtype=jnp.float32
    ).as_numpy_4d()
    diff = np.abs(x_dev - ds_disk.load_spectrogram_corpus())
    assert float(diff.max()) < 2.5e-3, float(diff.max())  # few f16 ulps

    def _train(run_name, dataset):
        model_c = cfg.ModelConfig(
            name="TestVAE", run_name=run_name, latent_flow_arch=None,
            params_regression_architecture="mlp_2l64", dim_z=16,
            logs_root_dir=str(tmp_path / "logs"),
        )
        train_c = cfg.TrainConfig(
            minibatch_size=8, n_epochs=2, save_period=2,
            lr_warmup_epochs=1, beta_warmup_epochs=2,
            compute_dtype="float32", verbosity=0,
        )
        return train_config(
            model_c, train_c, dataset=dataset, use_tensorboard=False
        )

    s1 = _train("dev0", ds_dev)
    # the loaders saw a device-resident x
    assert isinstance(
        ds_dev.corpus_tensors(dtype=jnp.float32)["x"], ChunkedDeviceCorpus
    )
    assert np.isfinite(s1["ReconsLoss/Backprop/Valid"])
    assert np.isfinite(s1["LatLoss/Valid"])
    s2 = _train("dev1", ds_dev)  # memoized corpus, fresh model: exact rerun
    for k in ("ReconsLoss/Backprop/Valid", "LatLoss/Valid"):
        assert s1[k] == pytest.approx(s2[k], rel=1e-7, abs=1e-9), k
