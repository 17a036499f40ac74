"""Round-2 flagship protocol: train FlVAE2 to reference length (400 epochs,
reference config.py:87) on the 30,720-preset structured synthetic corpus,
then evaluate the validation split at checkpoints 50 / 100 / 200 / final so
BENCH.md can publish the eval-quality trajectory (VERDICT r1 item 4).

Eval artifacts are epoch-suffixed (eval_validation_summary_ep{E}.json, ...)
because evaluate_model writes fixed names (reference eval.py:227-243 only
ever evaluates the last checkpoint).

Run:  python scripts/run_flagship_r2.py  (takes ~2-4 h on one v5e chip)
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.data import build as data_build
from preset_gen_vae_tpu.evaluation.evaluate import evaluate_model
from preset_gen_vae_tpu.logs.logger import get_run_dir, list_checkpoint_epochs
from preset_gen_vae_tpu.training.loop import train_config

RUN_NAME = "r2full400"
N_PRESETS = 30720
EVAL_EPOCHS = (50, 100, 200, -1)  # -1 = last checkpoint


def main() -> None:
    model_c = cfg.ModelConfig(run_name=RUN_NAME)
    train_c = cfg.TrainConfig()  # defaults: 400 epochs, save_period=50
    model_r, train_r = cfg.resolve(model_c, train_c)
    dataset = data_build.get_dataset(
        model_r, train_r, n_synthetic_presets=N_PRESETS
    )

    t0 = time.time()
    summary = train_config(model_c, train_c, dataset=dataset)
    train_wall_s = time.time() - t0
    print(json.dumps({"phase": "train", "wall_s": train_wall_s, **summary}),
          flush=True)

    # checkpoint-epoch eval trajectory
    model_r2, _ = cfg.resolve(model_c, train_c)
    run_dir = get_run_dir(dataclasses.replace(model_r2))
    with open(run_dir / "train_summary.json", "w") as f:
        json.dump({"wall_s": train_wall_s, **summary}, f, indent=2)

    available = list_checkpoint_epochs(model_r2)
    done = set()
    for ep in EVAL_EPOCHS:
        ep_real = available[-1] if ep < 0 else ep
        if ep_real not in available or ep_real in done:
            continue
        done.add(ep_real)
        ec = cfg.EvalConfig(epoch=ep_real, dataset="validation",
                            override_previous_eval=True)
        t0 = time.time()
        evaluate_model(model_c, train_c, ec, dataset=dataset)
        wall = time.time() - t0
        # suffix the fixed-name artifacts with the checkpoint epoch
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
        print(json.dumps({"phase": "eval", "epoch": ep_real,
                          "wall_s": wall, **s}), flush=True)


if __name__ == "__main__":
    main()
