"""CLI entry point: evaluate saved runs (reference parity: eval.py:278-284,
config from evalconfig.py -> here EvalConfig defaults; set models_names to
'<model_name>/<run_name>' strings)."""

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.evaluation.evaluate import evaluate_all_models

if __name__ == "__main__":
    eval_config = cfg.EvalConfig(
        models_names=(),  # e.g. ("FlVAE2/00_debug",)
        dataset="validation",
    )
    for df in evaluate_all_models(eval_config):
        print(df.describe())
