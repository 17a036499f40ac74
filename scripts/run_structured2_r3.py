"""Round-3 corpus-v2 comparison: train the flagship FlVAE2 on the
structured2 synthetic corpus (modulation-depth roles + patch archetypes,
synth/database.py:generate_structured_corpus_v2) under the exact r2full400
protocol, then evaluate — BENCH.md publishes the structured-v2 vs
structured-v1 table (VERDICT r2 item 9: does the added realism move eval
accuracy?).

Run:  python scripts/run_structured2_r3.py   (~1-2 h on one v5e chip:
corpus render ~17 min + training to early-stop + final eval)
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.data import build as data_build
from preset_gen_vae_tpu.evaluation.evaluate import evaluate_model
from preset_gen_vae_tpu.logs.logger import get_run_dir, list_checkpoint_epochs
from preset_gen_vae_tpu.training.loop import train_config

RUN_NAME = "r3struct2"
N_PRESETS = 30720


def main() -> None:
    model_c = cfg.ModelConfig(run_name=RUN_NAME)
    train_c = cfg.TrainConfig()  # defaults: 400 epochs, early stop, save 50
    model_r, train_r = cfg.resolve(model_c, train_c)
    dataset = data_build.get_dataset(
        model_r, train_r, n_synthetic_presets=N_PRESETS,
        synthetic_style="structured2",
    )

    t0 = time.time()
    summary = train_config(model_c, train_c, dataset=dataset)
    train_wall_s = time.time() - t0
    print(json.dumps({"phase": "train", "wall_s": train_wall_s, **summary}),
          flush=True)

    model_r2, _ = cfg.resolve(model_c, train_c)
    run_dir = get_run_dir(dataclasses.replace(model_r2))
    with open(run_dir / "train_summary.json", "w") as f:
        json.dump({"wall_s": train_wall_s, **summary}, f, indent=2)

    ep_real = list_checkpoint_epochs(model_r2)[-1]
    ec = cfg.EvalConfig(epoch=ep_real, dataset="validation",
                        override_previous_eval=True)
    t0 = time.time()
    evaluate_model(model_c, train_c, ec, dataset=dataset)
    wall = time.time() - t0
    for name in (
        "eval_validation_summary.json",
        "eval_validation.dataframe.pickle",
    ):
        src = run_dir / name
        if src.exists():
            stem, dot, suf = name.partition(".")
            shutil.move(src, run_dir / f"{stem}_ep{ep_real}{dot}{suf}")
    with open(run_dir / f"eval_validation_summary_ep{ep_real}.json") as f:
        s = json.load(f)
    print(json.dumps({"phase": "eval", "epoch": ep_real, "wall_s": wall,
                      **s}), flush=True)


if __name__ == "__main__":
    main()
