"""preset_gen_vae_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the
gwendal-lv/preset-gen-vae research framework.

The reference (PyTorch, CUDA, VST-hosting) learns to program a DX7 FM
synthesizer from sound: a spectrogram VAE whose latent space is optionally
transformed by normalizing flows, plus a synth-parameter regression head.

This package provides the same capabilities, re-designed TPU-first:
  - `ops`       : spectral frontend (STFT + mel) as XLA matmuls / Pallas kernels
  - `models`    : flax encoder/decoder/VAE/flow/regression model zoo
  - `losses`    : fully-vectorized (jit-safe) losses and monitoring criteria
  - `data`      : preset domain layer, datasets, deterministic splits,
                  HBM-resident batch pipeline
  - `synth`     : DX7 parameter metadata + native C++ FM render engine
  - `parallel`  : device-mesh / sharding helpers (pjit data parallelism)
  - `training`  : jitted train step, schedules, checkpointing, train loop
  - `evaluation`: post-training evaluation pipeline and audio similarity
  - `logs`      : run logger, TensorBoard writer, metric primitives
  - `utils`     : config I/O and misc helpers

Reference parity is documented per-module with `file:line` citations into
the upstream repo.
"""

__version__ = "0.1.0"
