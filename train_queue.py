"""CLI entry point: sequential training queue (reference parity:
train_queue.py:24-119). Each entry is (model-config overrides,
train-config overrides); k-fold fan-out and NaN-divergence retries are
handled by the queue runner."""

from preset_gen_vae_tpu.training.queue import run_queue

# Edit this list to enqueue runs (reference: train_queue.py:24-44)
run_mods = [
    ({"run_name": "queued_run0"}, {}),
]

if __name__ == "__main__":
    summaries = run_queue(run_mods, k_folds_fanout=False)
    for s in summaries:
        print(s)
