"""FlowParamsLoss convergence proof (VERDICT r1 item 8).

Trains the flagship with ``forward_controls_loss=False`` — the reference's
FlowParamsLoss mode (reference: train.py:119-121, model/loss.py:318-346) —
to convergence on a 2048-preset corpus, once per inverse-BN mode:

- flow_loss_bn_mode='train': reference parity (batch-stat BN + dropout in
  the inverse flows, running stats updated twice per step);
- flow_loss_bn_mode='eval':  running-stat inverse (strictly invertible).

Publishes final losses + a no-audio eval summary per mode so PARITY.md can
document the measured decision behind the default.

Run: python scripts/run_flowloss_r2.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.data import build as data_build
from preset_gen_vae_tpu.evaluation.evaluate import evaluate_model
from preset_gen_vae_tpu.logs.logger import get_run_dir
from preset_gen_vae_tpu.training.loop import train_config

N_PRESETS = 2048
N_EPOCHS = 150


def main() -> None:
    results = {}
    dataset = None
    for bn_mode in ("train", "eval"):
        model_c = cfg.ModelConfig(
            run_name=f"r2flowloss_{bn_mode}",
            forward_controls_loss=False,
        )
        train_c = cfg.TrainConfig(
            n_epochs=N_EPOCHS,
            save_period=50,
            flow_loss_bn_mode=bn_mode,
        )
        if dataset is None:
            model_r, train_r = cfg.resolve(model_c, train_c)
            dataset = data_build.get_dataset(
                model_r, train_r, n_synthetic_presets=N_PRESETS
            )
        t0 = time.time()
        summary = train_config(model_c, train_c, dataset=dataset)
        summary["wall_s"] = time.time() - t0
        print(json.dumps({"phase": "train", "bn_mode": bn_mode, **summary}),
              flush=True)

        ec = cfg.EvalConfig(epoch=-1, dataset="validation",
                            override_previous_eval=True)
        evaluate_model(model_c, train_c, ec, dataset=dataset,
                       render_audio=False)
        model_r2, _ = cfg.resolve(model_c, train_c)
        run_dir = get_run_dir(model_r2)
        with open(run_dir / "eval_validation_summary.json") as f:
            ev = json.load(f)
        print(json.dumps({"phase": "eval", "bn_mode": bn_mode, **ev}),
              flush=True)
        results[bn_mode] = {"train": summary, "eval": ev}

    with open("saved/flowloss_r2_comparison.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
