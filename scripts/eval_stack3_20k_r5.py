"""Salvage eval for the 20,480x3 stretch run (r5stack3_v2_20480).

The run's TRAINING completed (early stop at epoch 151, checkpoint saved)
but its SAME-PROCESS eval died with RESOURCE_EXHAUSTED at the audio
similarity phase: after a 20,480-preset training session the process
holds the 8.1 GB device corpus plus the training step's compiled
executables and state remnants, and the eval render/similarity buffers
no longer fit the 15.75 GB chip (at 16,384 they did —
scripts/run_stack3_v2_r5.py ran train+eval in one process fine).

This script re-runs ONLY the eval in a fresh process: corpus rebuilt on
device (render-to-train jax backend, minutes), checkpoint 151 restored,
full eval with the default 'jax' audio backend. Dataset kwargs MUST
match the run script exactly (n_synthetic_presets / synthetic_style are
get_dataset kwargs, not part of the frozen config.json).

Run (queued on the TPU lock):
  setsid nohup python scripts/eval_stack3_20k_r5.py \
      > saved/r5logs/stack3_20k_eval.log 2>&1 &
Prints one JSON line at the end (same shape as the run script's).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from scripts.tpu_lock import tpu_lock
from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.data import build as data_build
from preset_gen_vae_tpu.evaluation.evaluate import evaluate_model
from preset_gen_vae_tpu.logs.logger import get_run_dir, list_checkpoint_epochs


def main() -> None:
    n = 20480
    run = f"r5stack3_v2_{n}"
    model_c = cfg.ModelConfig(
        run_name=run,
        midi_notes=((40, 85), (50, 85), (60, 85)),
        stack_spectrograms=True,
        dataset_corpus_render_backend="jax",
        dataset_corpus_cache_policy="device",
    )
    train_c = cfg.TrainConfig(n_epochs=400, save_period=200, verbosity=0)
    model_r, train_r = cfg.resolve(model_c, train_c)
    dataset = data_build.get_dataset(
        model_r, train_r, n_synthetic_presets=n,
        synthetic_style="structured2",
    )
    with tpu_lock(f"eval_stack3_20k", wait_s=14400.0):
        ep = list_checkpoint_epochs(model_r)[-1]
        ec = cfg.EvalConfig(epoch=ep, dataset="validation",
                            override_previous_eval=True)
        t0 = time.time()
        evaluate_model(model_c, train_c, ec, dataset=dataset)
        eval_s = time.time() - t0
    run_dir = get_run_dir(model_r)
    with open(run_dir / "eval_validation_summary.json") as f:
        s = json.load(f)
    print(json.dumps({
        "run": run, "n_presets": n, "style": "structured2",
        "midi_notes": 3, "stacked": True, "epoch_evaluated": ep,
        "eval_wall_s": round(eval_s, 1),
        **{k: round(v, 4) if isinstance(v, float) else v
           for k, v in s.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
