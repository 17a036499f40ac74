"""Mesh-sharded device-resident corpus (VERDICT r4 #3).

The corpus's column chunks shard their ROW axis over the mesh's ``data``
axis, so per-device HBM holds ~P/n_data rows and the corpus ceiling
scales linearly with chips. The in-scan gather with replicated indices
must partition as local-gather + mask + psum (GSPMD's embedding-lookup
pattern) — never as a corpus-sized all-gather, which would defeat the
sharding entirely. Runs on the 8-virtual-device CPU platform
(tests/conftest.py).
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.data.corpus_device import from_host_array
from preset_gen_vae_tpu.parallel import make_mesh


def _sharded_corpus(n_rows=96, c=1, h=3, w=100, seed=0):
    mesh = make_mesh(8)
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n_rows, c, h, w)).astype(np.float32)
    shard = NamedSharding(mesh, P("data", None))
    corpus = from_host_array(x, put=lambda a: jax.device_put(a, shard))
    return mesh, x, corpus


def test_row_sharded_gather_matches_dense():
    mesh, x, corpus = _sharded_corpus()
    # each device holds ~P/8 corpus rows, not the whole corpus
    for chunk in corpus.chunks:
        rows_per_dev = chunk.addressable_shards[0].data.shape[0]
        assert rows_per_dev == chunk.shape[0] // 8
    batch_spec = NamedSharding(mesh, P("data"))

    def gather(chunks, idx):
        return jax.lax.with_sharding_constraint(
            corpus.device_gather(chunks, idx), batch_spec
        )

    idx = np.asarray([0, 95, 17, 42, 42, 3, 64, 31])  # crosses shards
    got = jax.jit(gather)(corpus.chunks, jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(got), x[idx], rtol=0, atol=0)


def test_sharded_gather_hlo_has_no_corpus_allgather():
    """The partitioned gather must not all-gather the corpus operand:
    no all-gather instruction in the compiled module may produce a
    corpus-row-count-sized result (the batch-sized psum/all-reduce of
    the masked partial gather is the expected collective)."""
    mesh, x, corpus = _sharded_corpus()
    batch_spec = NamedSharding(mesh, P("data"))

    def gather(chunks, idx):
        return jax.lax.with_sharding_constraint(
            corpus.device_gather(chunks, idx), batch_spec
        )

    idx = jnp.asarray(np.arange(8, dtype=np.int32))
    txt = jax.jit(gather).lower(corpus.chunks, idx).compile().as_text()
    n_rows = corpus.n_rows
    for line in txt.splitlines():
        if "all-gather" in line and re.search(rf"\[{n_rows},", line):
            raise AssertionError(
                f"corpus-sized all-gather in partitioned gather: {line}"
            )


@pytest.mark.slow
def test_training_loss_equal_sharded_vs_replicated(tmp_path):
    """Same corpus VALUES on the SAME 8-device mesh, sharded vs
    replicated placement (``corpus_rows_sharded``): the training
    trajectory must be numerically equal — the gather's psum only ever
    adds masked zeros from non-owner shards, which is exact in fp.
    (Comparing different MESH sizes instead would not isolate the corpus
    placement: cross-device reduction order legitimately perturbs f32
    sums and the trajectories drift apart.)"""
    from preset_gen_vae_tpu.data.dexed_dataset import DexedDataset
    from preset_gen_vae_tpu.training.loop import train_config

    def _train(run_name, shard_rows):
        model_c = cfg.ModelConfig(
            name="TestVAE", run_name=run_name, latent_flow_arch=None,
            params_regression_architecture="mlp_2l64", dim_z=16,
            logs_root_dir=str(tmp_path / "logs"),
        )
        train_c = cfg.TrainConfig(
            minibatch_size=8, n_epochs=2, save_period=2,
            lr_warmup_epochs=1, beta_warmup_epochs=2,
            compute_dtype="float32", verbosity=0,
            corpus_rows_sharded=shard_rows,
        )
        ds = DexedDataset(
            n_synthetic_presets=24, synthetic_seed=5,
            data_root=tmp_path / f"data{run_name}",
        )
        return train_config(model_c, train_c, dataset=ds,
                            use_tensorboard=False)

    s_repl = _train("repl", False)
    s_shard = _train("shard", True)
    for k in ("ReconsLoss/Backprop/Valid", "LatLoss/Valid"):
        assert s_repl[k] == pytest.approx(s_shard[k], rel=1e-6), k
