"""Round-5 flagship-audio protocol: 3-note stacked on corpus v2 at
16,384 presets — the scale the round-4 compile OOM blocked.

Round 4's best audio model (spec MAE 0.0814) was capped at 8,192 presets
because the K=16 scan's 4-D corpus gather cost ~2.7x the corpus in XLA
temps (compile OOM at 24.56G/15.75G; scripts/run_stack3_v2_r4.py
docstring). Round 5's column-chunked 2-D corpus layout
(data/corpus_device.py) removes the corpus-scale temps — probe variant F
compiles the SAME train scan at 16,384 x 3-note in 11.55G total
(saved/r5_gather_probe.log) — so this protocol doubles the corpus and
challenges the 0.0814 record. Reference contracts: encoder.py:95-100
(single-CNN multi-channel input), config.py:36 (multi-note sets).

Run (idle host, detached — CLAUDE.md long-run convention):
  setsid nohup python scripts/run_stack3_v2_r5.py [n_presets] [epochs] \
      > saved/r5logs/stack3_16k.log 2>&1 & echo $! > /tmp/stack3_r5.pid
Prints one JSON line at the end (train summary + full eval metrics).
Holds the TPU lock (scripts/tpu_lock.py) for the whole run so the armed
bench sampler never collides with it.

SCALE CEILING: same-process train+eval works up to 16,384 presets
(8.77 GB bf16 corpus = 8.16 GiB; probe args 8.84G = corpus + 0.68G
state); at 20,480 (10.96 GB) training completes but the eval phase hits
RESOURCE_EXHAUSTED (saved/r5logs/stack3_20k.log) — use the
fresh-process scripts/eval_saved_r5.py above 16,384, which also shrinks
the audio dispatch to fit beside the resident corpus (a fresh process
at the default 512 renders/dispatch STILL OOMs at 20,480 —
saved/r5logs/stack3_20k_r5b.log).
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
from preset_gen_vae_tpu.training.loop import train_config


def main() -> None:
    # --no-eval: train only (above 16,384 presets the same-process eval
    # is KNOWN to RESOURCE_EXHAUSTED — see SCALE CEILING above — so the
    # caller chains scripts/eval_saved_r5.py in a fresh process instead
    # of burning an eval compile that must fail).
    no_eval = "--no-eval" in sys.argv
    argv = [a for a in sys.argv if a != "--no-eval"]
    n = int(argv[1]) if len(argv) > 1 else 16384
    epochs = int(argv[2]) if len(argv) > 2 else 400
    run = f"r5stack3_v2_{n}"
    model_c = cfg.ModelConfig(
        run_name=run,
        midi_notes=((40, 85), (50, 85), (60, 85)),
        stack_spectrograms=True,
        # render-to-train: ~49k renders (16,384 presets x 3 notes) run
        # fused on device; the ~8.8 GB bf16 corpus never leaves HBM
        dataset_corpus_render_backend="jax",
        dataset_corpus_cache_policy="device",
    )
    train_c = cfg.TrainConfig(
        n_epochs=epochs, save_period=max(epochs // 2, 1), verbosity=0
    )
    model_r, train_r = cfg.resolve(model_c, train_c)
    dataset = data_build.get_dataset(
        model_r, train_r, n_synthetic_presets=n,
        synthetic_style="structured2",
    )
    with tpu_lock(f"stack3_r5_{n}", wait_s=14400.0):
        t0 = time.time()
        summary = train_config(model_c, train_c, dataset=dataset,
                               use_tensorboard=False)
        train_s = time.time() - t0

        if no_eval:
            print(json.dumps({
                "run": run, "n_presets": n, "style": "structured2",
                "midi_notes": 3, "stacked": True, "eval": "skipped",
                "epochs_trained": summary.get("epochs_trained"),
                "train_wall_s": round(train_s, 1),
            }), flush=True)
            return

        ep = list_checkpoint_epochs(model_r)[-1]
        ec = cfg.EvalConfig(epoch=ep, dataset="validation",
                            override_previous_eval=True)
        t0 = time.time()
        evaluate_model(model_c, train_c, ec, dataset=dataset)
        eval_s = time.time() - t0
    run_dir = get_run_dir(cfg.resolve(model_c, train_c)[0])
    with open(run_dir / "eval_validation_summary.json") as f:
        s = json.load(f)
    print(json.dumps({
        "run": run, "n_presets": n, "style": "structured2",
        "midi_notes": 3, "stacked": True,
        "epochs_trained": summary.get("epochs_trained"),
        "train_wall_s": round(train_s, 1),
        "eval_wall_s": round(eval_s, 1),
        **{k: round(v, 4) if isinstance(v, float) else v
           for k, v in s.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
