"""Round-4 eval-backend timing (VERDICT r3 item 6): full-scale eval wall
time, C++ engine vs on-device JAX engine with the DEFAULT exact feedback
solve, same checkpoint, same dataset, warm caches. Target: jax <= 1.5x cpp
with metrics unchanged within tolerance (reference render contract:
eval.py:190-203).

Run AFTER a full-scale model exists (e.g. the r4 corpus A/B run):
  python scripts/time_eval_backends_r4.py [run_name]   (default r3cmp_structured_30720)
Prints one JSON line per backend.
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
from preset_gen_vae_tpu.logs.logger import list_checkpoint_epochs

RUN = sys.argv[1] if len(sys.argv) > 1 else "r3cmp_structured_30720"


def main() -> None:
    model_c = cfg.ModelConfig(run_name=RUN)
    train_c = cfg.TrainConfig()
    model_r, train_r = cfg.resolve(model_c, train_c)
    dataset = data_build.get_dataset(
        model_r, train_r, n_synthetic_presets=30720
    )
    ep = list_checkpoint_epochs(model_r)[-1]
    results = {}
    for backend in ("cpp", "jax"):
        ec = cfg.EvalConfig(
            epoch=ep, dataset="validation", override_previous_eval=True,
            audio_render_backend=backend,
        )
        t0 = time.time()
        s = evaluate_model(model_c, train_c, ec, dataset=dataset)
        wall = time.time() - t0
        results[backend] = wall
        print(json.dumps({
            "backend": backend, "eval_wall_s": round(wall, 1),
            "feedback": ec.audio_render_feedback,
            **{k: round(float(v), 4) for k, v in s.items()
               if isinstance(v, (int, float))},
        }), flush=True)
    print(json.dumps({
        "jax_over_cpp": round(results["jax"] / results["cpp"], 3)
    }), flush=True)


if __name__ == "__main__":
    main()
