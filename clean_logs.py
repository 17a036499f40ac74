"""CLI entry point: erase a run's saved dir + TensorBoard events
(reference parity: clean_logs.py:20-33)."""

import sys

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.logs.logger import erase_run, get_run_dir

if __name__ == "__main__":
    model_config = cfg.ModelConfig()
    if len(sys.argv) >= 3:
        model_config.name, model_config.run_name = sys.argv[1], sys.argv[2]
    print(f"Erasing {get_run_dir(model_config)}")
    erase_run(model_config)
