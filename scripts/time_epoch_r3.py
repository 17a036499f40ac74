"""Round-3 epoch-time protocol: measure steady-state full-scale epoch wall
time with whole-epoch dispatch (steps_per_dispatch=-1) vs the round-2
16-step dispatch, on the 30,720-preset corpus (VERDICT r2 item 3: target
epoch <= 2.5 s; round 2 measured 4 s at K=16 vs ~1.5 s device time).

Run:  python scripts/time_epoch_r3.py [K ...]   (defaults: -1 16)
Prints one JSON line per configuration with per-epoch wall times.
"""

from __future__ import annotations

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
from preset_gen_vae_tpu.logs import logger as logger_mod
from preset_gen_vae_tpu.training.loop import train_config

N_PRESETS = 30720
N_EPOCHS = 8  # epoch 0 pays compile; steady state = epochs 2+


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [-1, 16]
    model_c = cfg.ModelConfig(run_name="r3timing")
    model_r, train_r = cfg.resolve(model_c, cfg.TrainConfig())
    dataset = data_build.get_dataset(
        model_r, train_r, n_synthetic_presets=N_PRESETS
    )

    # capture per-epoch durations from the logger
    durations = {}
    orig = logger_mod.RunLogger.on_epoch_finished

    def patched(self, epoch):
        durations.setdefault(id(self), []).append(time.time() - self._epoch_t0)
        return orig(self, epoch)

    logger_mod.RunLogger.on_epoch_finished = patched

    for k in ks:
        durations.clear()
        train_c = cfg.TrainConfig(
            n_epochs=N_EPOCHS, save_period=10_000, steps_per_dispatch=k,
            verbosity=0,
        )
        mc = dataclasses.replace(model_c, run_name=f"r3timing_k{k}")
        t0 = time.time()
        train_config(mc, train_c, dataset=dataset, use_tensorboard=False)
        total = time.time() - t0
        eps = next(iter(durations.values()), [])
        steady = eps[2:] if len(eps) > 2 else eps
        print(json.dumps({
            "steps_per_dispatch": k,
            "total_wall_s": round(total, 2),
            "epoch_s": [round(e, 3) for e in eps],
            "steady_epoch_s": round(sum(steady) / max(len(steady), 1), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
