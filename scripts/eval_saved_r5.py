"""Fresh-process eval for any round-5 protocol run (generalizes
eval_stack3_20k_r5.py).

Same-process train+eval OOMs above the ~16,384x3-note (11.9 GB args)
class: after training, the process holds the device corpus plus the
train step's compiled executables, and the eval render/similarity
buffers no longer fit (first seen on r5stack3_v2_20480 —
saved/r5logs/stack3_20k.log RESOURCE_EXHAUSTED at evaluate.py:304).
Re-running ONLY the eval in a fresh process fits: corpus + restored
inference params + render buffers, no training remnants.

Usage (dataset kwargs must mirror the run scripts exactly —
n_synthetic_presets/synthetic_style are get_dataset kwargs, not part of
the frozen config.json):

  python scripts/eval_saved_r5.py stack3 16384      # 3-note stacked
  python scripts/eval_saved_r5.py stack6 8192       # 6-note stacked
  python scripts/eval_saved_r5.py multi6 8192       # 6-note multi

Prints one JSON line (same shape as the run scripts'). Queued on the
TPU lock (4 h wait).
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

NOTES_3 = ((40, 85), (50, 85), (60, 85))
# reference config.py:36 (commented full set)
NOTES_6 = ((40, 85), (50, 85), (60, 42), (60, 85), (60, 127), (70, 85))

FAMILIES = {
    # family -> (run-name template, midi_notes, stack_spectrograms)
    "stack3": ("r5stack3_v2_{n}", NOTES_3, True),
    "stack6": ("r5stack6_v2_{n}", NOTES_6, True),
    "multi6": ("r5multi6_v2_{n}", NOTES_6, False),
}


def main() -> None:
    family = sys.argv[1]
    n = int(sys.argv[2])
    run_t, notes, stacked = FAMILIES[family]
    run = run_t.format(n=n)
    model_c = cfg.ModelConfig(
        run_name=run,
        midi_notes=notes,
        stack_spectrograms=stacked,
        dataset_corpus_render_backend="jax",
        dataset_corpus_cache_policy="device",
    )
    train_c = cfg.TrainConfig(n_epochs=400, save_period=200, verbosity=0)
    model_r, train_r = cfg.resolve(model_c, train_c)
    dataset = data_build.get_dataset(
        model_r, train_r, n_synthetic_presets=n,
        synthetic_style="structured2",
    )
    # The audio render+similarity phase dispatches audio_batch_size x 2
    # exact-feedback renders at once while the DEVICE CORPUS stays
    # resident. Measured envelope (this round): 512 renders/dispatch fit
    # beside the 8.77 GB (decimal; 8.16 GiB) 16,384x3 corpus but
    # RESOURCE_EXHAUSTED beside the 10.96 GB 20,480x3 one
    # (saved/r5logs/stack3_20k_r5b.log) — render temps scale ~linearly
    # with the dispatch, so shrink it as the corpus grows instead of
    # failing. (Corpus bytes = specs x 257 x 347 x bf16; the probe table
    # saved/r5_gather_probe.log args column = corpus + 0.68G train state.)
    n_specs = n * (len(notes) if stacked or family == "multi6" else 1)
    corpus_gb = n_specs * 257 * 347 * 2 / 1e9
    audio_bs = 256 if corpus_gb < 9.0 else (64 if corpus_gb < 12.0 else 32)
    with tpu_lock(f"eval_{run}", wait_s=14400.0):
        ep = list_checkpoint_epochs(model_r)[-1]
        ec = cfg.EvalConfig(epoch=ep, dataset="validation",
                            override_previous_eval=True,
                            audio_batch_size=audio_bs)
        t0 = time.time()
        evaluate_model(model_c, train_c, ec, dataset=dataset)
        eval_s = time.time() - t0
    run_dir = get_run_dir(model_r)
    with open(run_dir / "eval_validation_summary.json") as f:
        s = json.load(f)
    print(json.dumps({
        "run": run, "n_presets": n, "style": "structured2",
        "family": family, "epoch_evaluated": ep,
        "eval_wall_s": round(eval_s, 1), "audio_batch_size": audio_bs,
        **{k: round(v, 4) if isinstance(v, float) else v
           for k, v in s.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
