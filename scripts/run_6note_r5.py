"""Round-5 full multi-note family (VERDICT r4 next #5): train the
reference's complete 6-note MIDI set in BOTH multi-note modes.

The reference ships a commented-out full note set (config.py:36:
(40,85),(50,85),(60,42),(60,85),(60,127),(70,85)) exercising the two
multi-note paths never run at scale here:

- ``stack``: 6 spectrogram channels through the shared per-channel CNN +
  deepest-feature mixer (encoder.py:95-100) — the mode the DAFx21 paper
  found strongest; challenges the 3-note audio record.
- ``multi``: ``increased_dataset_size`` — 6x the items, 1 channel each,
  with MIDI pitch/vel concatenated into z0 (VAE.py:153-165 semantics;
  both flags derived by ``cfg.resolve`` exactly as config.py:155-158).

Both run at 8,192 structured2 presets (49,152 spectrograms — the same
HBM footprint the chunked corpus layout was probed at for the 16k
3-note flagship) with the device-resident render-to-train corpus.

SCALE CEILING for this script's same-process train+eval: it completed
with corpora up to 8.77 GB bf16 (49,152 specs) but the eval phase hits
RESOURCE_EXHAUSTED at ~11 GB corpora (measured: 20,480x3 and
12,288x6-multi both trained fine then OOM'd in eval) — training
remnants + corpus + render buffers exceed the 15.75 GB chip. Above
that, eval must run fresh-process: scripts/eval_saved_r5.py (which
also shrinks the audio dispatch to fit beside the resident corpus).

Run (idle host, detached — CLAUDE.md long-run convention):
  setsid nohup python scripts/run_6note_r5.py stack \
      > saved/r5logs/stack6.log 2>&1 & echo $! > /tmp/stack6_r5.pid
  setsid nohup python scripts/run_6note_r5.py multi \
      > saved/r5logs/multi6.log 2>&1 & echo $! > /tmp/multi6_r5.pid
Prints one JSON line at the end (train summary + full eval metrics).
Holds the TPU lock for the whole run (waits up to 4 h for the current
holder), so runs queue strictly.
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

# reference config.py:36 (commented full set)
NOTES_6 = ((40, 85), (50, 85), (60, 42), (60, 85), (60, 127), (70, 85))


def main() -> None:
    # --no-eval: train only (at >= 8 GB corpora the same-process eval is
    # KNOWN to RESOURCE_EXHAUSTED — SCALE CEILING above — so the caller
    # chains scripts/eval_saved_r5.py in a fresh process instead of
    # burning an eval compile that must fail).
    no_eval = "--no-eval" in sys.argv
    argv = [a for a in sys.argv if a != "--no-eval"]
    mode = argv[1] if len(argv) > 1 else "stack"
    assert mode in ("stack", "multi"), mode
    n = int(argv[2]) if len(argv) > 2 else 8192
    epochs = int(argv[3]) if len(argv) > 3 else 400
    run = f"r5{mode}6_v2_{n}"
    model_c = cfg.ModelConfig(
        run_name=run,
        midi_notes=NOTES_6,
        stack_spectrograms=(mode == "stack"),
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
    with tpu_lock(f"{mode}6_r5_{n}", wait_s=14400.0):
        t0 = time.time()
        summary = train_config(model_c, train_c, dataset=dataset,
                               use_tensorboard=False)
        train_s = time.time() - t0

        if no_eval:
            print(json.dumps({
                "run": run, "n_presets": n, "style": "structured2",
                "midi_notes": 6, "mode": mode, "eval": "skipped",
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
        "midi_notes": 6, "mode": mode,
        "epochs_trained": summary.get("epochs_trained"),
        "train_wall_s": round(train_s, 1),
        "eval_wall_s": round(eval_s, 1),
        **{k: round(v, 4) if isinstance(v, float) else v
           for k, v in s.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
