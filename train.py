"""CLI entry point: train one run from the default configs
(reference parity: train.py:345-347 — `python train.py` trains the config
described by preset_gen_vae_tpu.config defaults; edit ModelConfig /
TrainConfig kwargs below or drive programmatically via
preset_gen_vae_tpu.training.loop.train_config)."""

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.training.loop import train_config

if __name__ == "__main__":
    summary = train_config(cfg.ModelConfig(), cfg.TrainConfig())
    print(summary)
