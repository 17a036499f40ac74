"""Latent-space sound-morphing demo on the full-scale flagship checkpoint
(saved/FlVAE2/r2full400): slerp an 11-point path between two validation
presets, decode every point to a playable preset, render, and report the
path's audio smoothness (consecutive-pair spectral distances vs the direct
endpoint distance).

Prints one JSON line. Run: python scripts/preset_morph_demo.py [uid_a uid_b]
(CPU is fine — inference at B=2/11 + C++ renders.)
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("PGV_FORCE_CPU") == "1":
    # env JAX_PLATFORMS is too late on this image (a site hook pre-imports
    # jax); jax.config.update works until the first backend touch
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.data import build as data_build
from preset_gen_vae_tpu.evaluation.interpolate import interpolate_presets
from preset_gen_vae_tpu.evaluation.similarity import batched_audio_errors
from preset_gen_vae_tpu.logs.logger import get_run_dir

RUN_NAME = "r2full400"
N_STEPS = 11


def main() -> None:
    t0 = time.time()
    model_c = cfg.ModelConfig(run_name=RUN_NAME)
    train_c = cfg.TrainConfig()
    model_r, train_r = cfg.resolve(model_c, train_c)
    dataset = data_build.get_dataset(model_r, train_r,
                                     n_synthetic_presets=30720)
    uids = dataset.valid_preset_UIDs
    uid_a = int(sys.argv[1]) if len(sys.argv) > 2 else int(uids[7])
    uid_b = int(sys.argv[2]) if len(sys.argv) > 2 else int(uids[13])

    full, wavs = interpolate_presets(
        model_c, train_c, uid_a, uid_b, n_steps=N_STEPS, dataset=dataset,
    )
    # consecutive-pair spectral distances along the path vs the direct
    # endpoint distance: a usable morph moves gradually (sum of local
    # steps >= direct distance, each step well below it)
    import jax.numpy as jnp

    a = jnp.asarray(wavs[:-1])
    b = jnp.asarray(wavs[1:])
    errs = batched_audio_errors(a, b)
    step_d = np.asarray(errs["spec_mae"])
    direct = float(np.asarray(batched_audio_errors(
        jnp.asarray(wavs[:1]), jnp.asarray(wavs[-1:]))["spec_mae"])[0])

    run_dir = get_run_dir(cfg.resolve(model_c, train_c)[0])
    out_dir = run_dir / "morph_demo"
    out_dir.mkdir(parents=True, exist_ok=True)
    np.save(out_dir / "presets.npy", full)
    from preset_gen_vae_tpu.utils.audio_io import write_wav

    for i, w in enumerate(wavs):
        write_wav(out_dir / f"morph_{i:02d}.wav", w, dataset.sample_rate)

    print(json.dumps({
        "uid_a": uid_a, "uid_b": uid_b, "n_steps": N_STEPS,
        "direct_spec_mae": round(direct, 4),
        "step_spec_mae_mean": round(float(step_d.mean()), 4),
        "step_spec_mae_max": round(float(step_d.max()), 4),
        "smooth": bool(step_d.max() < direct),
        "wall_s": round(time.time() - t0, 1),
        "out_dir": str(out_dir),
    }), flush=True)


if __name__ == "__main__":
    main()
