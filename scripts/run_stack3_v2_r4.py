"""Round-4 stretch: full-scale multi-note flagship on corpus v2 — the two
measured audio-match levers combined. Round 2 showed 3-note stacked input
gives the best audio-similarity numbers of any family (BENCH.md: spec MAE
0.190 at 4,096 v1 presets); round 4's A/B showed corpus v2 halves spec MAE
at full scale. This protocol trains the 3-note stacked flagship
(reference multi-note contract: encoder.py:95-100 single-CNN-multi-channel
mode, config.py:155 stacked-vs-multiplied dataset semantics) on 8,192
structured2 presets (the default — 16,384 was shown infeasible by the
round-4 compile OOM below; the round-5 chunked corpus layout lifted that
ceiling, see scripts/run_stack3_v2_r5.py).

8,192 (not 30,720) because the HBM-resident corpus is per-note AND the
K=16 scan's gather lowering needs corpus-scale temps: at 16,384 x 3 the
compile OOM'd at 24.56G/15.75G — XLA materializes a full-corpus layout
copy (9.28G `copy(cx.1)`) plus a [P,3,257,256] gather-slice temp (6.19G)
inside the while loop on top of the 8.95G argument (measured, round-4
log). The steady-state gather cost is therefore ~2.7x the corpus, putting
the 3-note ceiling near 9k presets. 8,192 x 3 notes (~4.1 GB) fits with
headroom and is still 2x the round-2 stacked corpus.

Run (TPU queue slot, idle host):
  python scripts/run_stack3_v2_r4.py [n_presets] [epochs]
Prints one JSON line at the end (train summary + full eval metrics).
"""

from __future__ import annotations

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
from preset_gen_vae_tpu.training.loop import train_config


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    run = f"r4stack3_v2_{n}"
    model_c = cfg.ModelConfig(
        run_name=run,
        midi_notes=((40, 85), (50, 85), (60, 85)),
        stack_spectrograms=True,
        # render-to-train: the ~25k renders (8,192 presets x 3 notes) run
        # fused on device and the ~4.1 GB bf16 corpus never leaves HBM
        # (92.4 s for 30,720 1-note renders measured, BENCH.md round 4 —
        # vs ~15 min through the C++ host engine)
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
    t0 = time.time()
    summary = train_config(model_c, train_c, dataset=dataset,
                           use_tensorboard=False)
    train_s = time.time() - t0

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
