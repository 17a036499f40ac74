"""Round-4 armed TPU queue (VERDICT r3 item 1), run strictly sequentially
on an otherwise-idle host:

1. scripts/time_epoch_r3.py -1 16 1 — full-scale steady epoch wall time per
   dispatch mode (closes VERDICT r2 item 3 / r3 weak #3 as a measurement).
2. scripts/compare_corpus_styles.py --n-presets 30720 --epochs 400 — the
   corpus-realism A/B at full scale. Both sides render with engine v4, so
   the comparison is style-vs-style, not engine-vs-engine; the v2 side is
   the structured2 full-scale run VERDICT r3 item 1(b) asks for.

Each phase appends its JSON lines to saved/r4_queue_results.jsonl (plus
raw logs under saved/). Run detached:
  setsid nohup python scripts/run_r4_queue.py > saved/r4_queue.log 2>&1 &
"""

from __future__ import annotations

import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
OUT = REPO / "saved" / "r4_queue_results.jsonl"


def run_phase(name: str, cmd: list) -> None:
    print(f"=== phase {name}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    p = subprocess.run(
        [sys.executable] + cmd, cwd=REPO, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    wall = time.time() - t0
    log = REPO / "saved" / f"r4_{name}.log"
    log.write_text(p.stdout)
    with open(OUT, "a") as f:
        for line in p.stdout.splitlines():
            if line.startswith("{"):
                f.write(line + "\n")
    print(f"=== phase {name} done rc={p.returncode} wall={wall/60:.1f} min",
          flush=True)


def main() -> None:
    (REPO / "saved").mkdir(exist_ok=True)
    run_phase("time_epoch", ["scripts/time_epoch_r3.py", "-1", "16", "1"])
    run_phase("corpus_ab", [
        "scripts/compare_corpus_styles.py",
        "--n-presets", "30720", "--epochs", "400",
    ])


if __name__ == "__main__":
    main()
