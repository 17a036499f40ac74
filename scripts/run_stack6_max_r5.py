"""Round-5 final audio-record attempt: 6-note stacked at the largest
scale that fits one chip.

HBM budget (round-5 AOT gather probe + completed runs): the
61,440-spectrogram corpus class (= 20,480x3 or 10,240x6) holds 8.08 GB
bf16; the 3-note flagship compiled at 14.07 GB total there, but the
6-note stacked model's per-step activations are ~2x the 3-note's
(batch 160 items x 6 channels = 960 specs/step), so 10,240x6 may not
compile on the 15.75 GB chip. This wrapper tries 10,240 then falls back
to 9,216 (7.27 GB corpus) — each attempt a FRESH subprocess (a failed
compile leaves HBM fragmented).

Failure triage per attempt (the run script trains then evals in one
process — scripts/run_6note_r5.py):
- rc == 0: everything (train + eval) succeeded — done.
- rc != 0 but the run has checkpoints: training SUCCEEDED and only the
  same-process eval OOM'd (the >= 8 GB-corpus failure mode,
  scripts/eval_saved_r5.py docstring) — run the fresh-process salvage
  eval instead of wastefully retraining smaller.
- rc != 0 and no checkpoints: compile/alloc failure before training —
  retry at the smaller scale.

Run (queued on the TPU lock):
  setsid nohup python scripts/run_stack6_max_r5.py \
      > saved/r5logs/stack6_max.log 2>&1 &
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

REPO = pathlib.Path(__file__).resolve().parents[1]


def _has_checkpoints(n: int) -> bool:
    d = REPO / "saved" / "FlVAE2" / f"r5stack6_v2_{n}" / "checkpoints"
    return d.is_dir() and any(d.iterdir())


def main() -> None:
    for n in (10240, 9216):
        print(f"[stack6_max] attempting n={n}", flush=True)
        r = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "run_6note_r5.py"),
             "stack", str(n), "400"],
            cwd=REPO,
        )
        if r.returncode == 0:
            print(f"[stack6_max] n={n} SUCCEEDED", flush=True)
            return
        if _has_checkpoints(n):
            print(f"[stack6_max] n={n} trained but in-process eval died "
                  f"(rc={r.returncode}); fresh-process salvage eval",
                  flush=True)
            r2 = subprocess.run(
                [sys.executable, str(REPO / "scripts" / "eval_saved_r5.py"),
                 "stack6", str(n)],
                cwd=REPO,
            )
            sys.exit(r2.returncode)
        print(f"[stack6_max] n={n} failed before training "
              f"(rc={r.returncode}); falling back", flush=True)
    print("[stack6_max] all scales failed", flush=True)
    sys.exit(1)


if __name__ == "__main__":
    main()
