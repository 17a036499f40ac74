"""Real-data path, end to end (VERDICT r3 #4): DX7 .syx cartridges ->
reference-layout sqlite -> DexedDataset -> training -> evaluation.

The reference trained on `synth/dexed_presets.sqlite`, a 30k human-preset
corpus read at synth/dexed.py:65-102 that ships only as an unobtainable
git-lfs pointer. This script is the recipe a user with real DX7 banks
follows to reproduce that flow with their own data:

  python scripts/train_from_syx.py BANK1.syx BANK2.syx ... \
         [--run-name syxrun] [--epochs 400] [--db out.sqlite]

Each .syx holds 32 packed voices (the 4,096-byte cartridge format,
synth/sysex.py); any number of banks can be given. The sqlite written here
is schema-compatible with the reference's (synth/database.py:40-143), so
every downstream component — dataset constraints, split sampler, training,
eval with audio re-render — runs unchanged (reference flow:
dexeddataset.py:28-167, train.py:188-329, eval.py:65-243).

Exercised at unit scale by tests/test_real_data_path.py (a >=1k-preset
multi-bank cartridge set round-tripped through the packed format into a
short train + eval).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.data import build as data_build
from preset_gen_vae_tpu.evaluation.evaluate import evaluate_model
from preset_gen_vae_tpu.logs.logger import get_run_dir, list_checkpoint_epochs
from preset_gen_vae_tpu.synth.sysex import import_syx_banks
from preset_gen_vae_tpu.training.loop import train_config


def main() -> None:
    ap = argparse.ArgumentParser(
        description="Train the flagship model on real DX7 cartridges"
    )
    ap.add_argument("syx", nargs="+", help=".syx cartridge files")
    ap.add_argument("--db", default=None,
                    help="sqlite output path (default: <run dir>.sqlite "
                         "next to the first bank)")
    ap.add_argument("--run-name", default="syxrun")
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--eval", action="store_true", default=True)
    ap.add_argument("--no-eval", dest="eval", action="store_false")
    args = ap.parse_args()

    db_path = pathlib.Path(
        args.db or pathlib.Path(args.syx[0]).with_suffix("")
        .as_posix() + f"_{args.run_name}.sqlite"
    )
    presets, names, labels = import_syx_banks(args.syx, out_sqlite=db_path)
    print(f"imported {len(presets)} voices from {len(args.syx)} bank(s) "
          f"-> {db_path}", flush=True)

    model_c = cfg.ModelConfig(run_name=args.run_name)
    train_c = cfg.TrainConfig(n_epochs=args.epochs)
    model_r, train_r = cfg.resolve(model_c, train_c)
    dataset = data_build.get_dataset(model_r, train_r, db_path=db_path)

    t0 = time.time()
    summary = train_config(model_c, train_c, dataset=dataset)
    print(json.dumps({"phase": "train", "wall_s": time.time() - t0,
                      **summary}), flush=True)

    if args.eval:
        model_r2, _ = cfg.resolve(model_c, train_c)
        run_dir = get_run_dir(dataclasses.replace(model_r2))
        ep = list_checkpoint_epochs(model_r2)[-1]
        ec = cfg.EvalConfig(epoch=ep, dataset="validation",
                            override_previous_eval=True)
        t0 = time.time()
        evaluate_model(model_c, train_c, ec, dataset=dataset)
        with open(run_dir / "eval_validation_summary.json") as f:
            s = json.load(f)
        print(json.dumps({"phase": "eval", "epoch": ep,
                          "wall_s": time.time() - t0, **s}), flush=True)


if __name__ == "__main__":
    main()
