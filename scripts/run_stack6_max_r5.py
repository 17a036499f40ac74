"""Round-5 final audio-record attempt: 6-note stacked at the largest
scale that fits one chip.

HBM budget (round-5 AOT gather probe + completed runs): the
61,440-spectrogram corpus class (= 20,480x3 or 10,240x6) holds 10.96 GB
bf16 (10.21 GiB; probe args 10.89G = corpus + 0.68G train state); the
3-note flagship compiled at 14.07 GB total there, but the 6-note
stacked model's per-step activations are ~2x the 3-note's (batch 160
items x 6 channels = 960 specs/step), so 10,240x6 may not compile on
the 15.75 GB chip. This wrapper tries 10,240 then falls back to 9,216
(9.87 GB corpus) — each attempt a FRESH subprocess (a failed compile
leaves HBM fragmented).

Failure triage per attempt (the run script trains with --no-eval —
both scales are in the >= 8 GB-corpus class where same-process eval is
KNOWN to OOM, so eval ALWAYS runs fresh-process via eval_saved_r5.py):
- train rc == 0 (or checkpoints exist): run the fresh-process eval.
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
        # both scales sit in the >= 8 GB-corpus class where same-process
        # eval is KNOWN to OOM, so train with --no-eval and always eval
        # in a fresh process (scripts/eval_saved_r5.py)
        r = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "run_6note_r5.py"),
             "stack", str(n), "400", "--no-eval"],
            cwd=REPO,
        )
        if r.returncode == 0 or _has_checkpoints(n):
            if r.returncode != 0:
                print(f"[stack6_max] n={n} train exited rc={r.returncode} "
                      f"but left checkpoints; salvaging", flush=True)
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
