"""Corpus-realism A/B: train the flagship config on structured (v1) vs
structured2 (v2) corpora under identical settings and evaluate both
(VERDICT r2 item 9: does the added realism move eval accuracy?).

Defaults are sized for the 1-core CPU backend (2,048 presets, 100 epochs)
so the comparison can run when the TPU tunnel is down; pass
--n-presets 30720 --epochs 400 on a TPU for the full-scale protocol
(scripts/run_structured2_r3.py runs the v2 side alone at full scale).

Prints one JSON line per style. Run:
  PGV_FORCE_CPU=1 python scripts/compare_corpus_styles.py
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("PGV_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.data import build as data_build
from preset_gen_vae_tpu.evaluation.evaluate import evaluate_model
from preset_gen_vae_tpu.logs.logger import get_run_dir, list_checkpoint_epochs
from preset_gen_vae_tpu.training.loop import train_config


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-presets", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--styles", nargs="+",
                    default=["structured", "structured2"])
    args = ap.parse_args()

    for style in args.styles:
        run = f"r3cmp_{style}_{args.n_presets}"
        model_c = cfg.ModelConfig(run_name=run)
        train_c = cfg.TrainConfig(n_epochs=args.epochs,
                                  save_period=max(args.epochs // 2, 1),
                                  verbosity=0)
        model_r, train_r = cfg.resolve(model_c, train_c)
        dataset = data_build.get_dataset(
            model_r, train_r, n_synthetic_presets=args.n_presets,
            synthetic_style=style,
        )
        t0 = time.time()
        summary = train_config(model_c, train_c, dataset=dataset,
                               use_tensorboard=False)
        train_s = time.time() - t0

        ep = list_checkpoint_epochs(cfg.resolve(model_c, train_c)[0])[-1]
        ec = cfg.EvalConfig(epoch=ep, dataset="validation",
                            override_previous_eval=True)
        t0 = time.time()
        evaluate_model(model_c, train_c, ec, dataset=dataset)
        eval_s = time.time() - t0
        run_dir = get_run_dir(cfg.resolve(model_c, train_c)[0])
        with open(run_dir / "eval_validation_summary.json") as f:
            s = json.load(f)
        print(json.dumps({
            "style": style, "n_presets": args.n_presets,
            "epochs_trained": summary.get("epochs_trained"),
            "train_wall_s": round(train_s, 1),
            "eval_wall_s": round(eval_s, 1),
            **{k: round(v, 4) if isinstance(v, float) else v
               for k, v in s.items()},
        }), flush=True)


if __name__ == "__main__":
    main()
