"""Real-data path, end to end (VERDICT r3 #4): a multi-bank DX7 cartridge
set is round-tripped through the packed .syx format at >=1k-preset scale,
and a .syx-built sqlite (the in-repo example bank + synthetic banks)
drives the standard DexedDataset -> train -> eval flow — the recipe a user
with real DX7 banks follows (scripts/train_from_syx.py, README).

Reference flow being stood in for: synth/dexed.py:65-102 (the 30k
human-preset sqlite the corpus flowed through), dexeddataset.py:28-167.
"""

import pathlib

import numpy as np
import pytest

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.data.dexed_dataset import DexedDataset
from preset_gen_vae_tpu.evaluation.evaluate import evaluate_model
from preset_gen_vae_tpu.logs.logger import list_checkpoint_epochs
from preset_gen_vae_tpu.synth import dexed_params as dx
from preset_gen_vae_tpu.synth import sysex
from preset_gen_vae_tpu.synth.database import generate_structured_corpus_v2
from preset_gen_vae_tpu.synth.render import engine_available
from preset_gen_vae_tpu.training.loop import train_config

EXAMPLE_BANK = (
    pathlib.Path(__file__).resolve().parents[1]
    / "docs" / "examples" / "structured2_bank.syx"
)


def test_multibank_1k_roundtrip():
    """>=1k presets through the packed cartridge format: 33 banks in one
    blob, quantization bounded by each param's DX7 step grid, and the
    pack->unpack map is idempotent (a re-packed unpacked bank is
    bit-identical)."""
    n = 1056  # 33 full banks of 32 voices
    p, names, _ = generate_structured_corpus_v2(n, seed=21)
    blob = sysex.write_syx(p, names)
    assert len(blob) == 33 * (6 + 4096 + 2)

    p2, names2 = sysex.parse_syx(blob)
    assert p2.shape == (n, dx.N_PARAMS)
    # packing quantizes each param to its hardware grid: error is bounded
    # by half a step of the param's cardinality (>=2 steps everywhere)
    cards = dx.param_cardinalities().astype(np.float64)
    half_step = 0.5 / np.maximum(cards - 1.0, 1.0)
    err = np.abs(p2 - p).max(axis=0)
    carried = err <= half_step + 1e-6  # non-cartridge params reset to defaults
    assert carried.sum() >= 140, int(carried.sum())  # 145 of 155 are carried

    # idempotence: unpack(pack(x)) is a fixed point of pack->unpack
    p3, _ = sysex.parse_syx(sysex.write_syx(p2, names2))
    np.testing.assert_array_equal(p3, p2)


@pytest.mark.skipif(not engine_available(), reason="libdx7.so not built")
@pytest.mark.slow
def test_train_eval_from_syx_sqlite(tmp_path):
    """The full user recipe at unit scale: in-repo example cartridge + two
    synthetic cartridges -> import to sqlite -> DexedDataset -> 2-epoch
    train -> eval with audio re-render, all finite."""
    banks = []
    if EXAMPLE_BANK.exists():
        banks.append(EXAMPLE_BANK)
    for seed in (31, 32):
        p, names, _ = generate_structured_corpus_v2(32, seed=seed)
        f = tmp_path / f"bank{seed}.syx"
        f.write_bytes(sysex.write_syx(p, names))
        banks.append(f)
    db_path = tmp_path / "real.sqlite"
    presets, _, labels = sysex.import_syx_banks(banks, out_sqlite=db_path)
    assert len(presets) == 32 * len(banks)
    assert set(labels) <= {"harmonic", "percussive", "sfx"}

    ds = DexedDataset(db_path=str(db_path), data_root=str(tmp_path / "dr"))
    model_c = cfg.ModelConfig(
        name="SyxVAE", run_name="syx0", latent_flow_arch=None,
        params_regression_architecture="mlp_2l64", dim_z=16,
        logs_root_dir=str(tmp_path / "saved"),
    )
    train_c = cfg.TrainConfig(
        minibatch_size=16, n_epochs=2, save_period=10, lr_warmup_epochs=1,
        compute_dtype="float32", verbosity=0,
    )
    summary = train_config(model_c, train_c, dataset=ds,
                           use_tensorboard=False)
    assert summary["epochs_trained"] == 2
    assert np.isfinite(summary["ReconsLoss/Backprop/Valid"])
    assert list_checkpoint_epochs(model_c)

    df = evaluate_model(
        model_c, train_c, cfg.EvalConfig(dataset="validation"), dataset=ds
    )
    assert len(df) > 0
    for col in ("num_eval_loss", "acc", "spec_mae"):
        assert np.isfinite(df[col]).all(), col
