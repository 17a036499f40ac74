"""Armed bench sampler (VERDICT r4 next #2): poll the chip's regime with
the cheap probe and fire the FULL bench the moment a fast window shows.

The axon attachment swings through order-of-magnitude performance
regimes (BENCH.md round-3/4 tables); round 4 spent its entire span in a
~5x selective throttle and produced no fast-window official record. This
sampler makes window-catching unattended:

- every ``interval`` seconds (default 20 min), if no other process holds
  the TPU lock (scripts/tpu_lock.py), run ``python bench.py --probe``
  (~10 s warm) — every sample self-appends to
  ``saved/bench_samples.jsonl`` with a timestamp;
- when a probe reads ``chip_regime: "fast"`` AND its conv-net leg beats
  the throttled plateau (every slow-window sample round 4-5 sits at
  convnet_step 1.29-1.44 ms; a real fast window is far below — the
  round-5 04:33 sample showed the probe's OLD absolute thresholds alone
  called a 5x-throttled window "fast" and burned a 19-minute full bench
  on it; bench.py now folds the conv-plateau criterion into the probe's
  own regime call, so the conv_ms check here is defense in depth),
  immediately run the full ``python bench.py`` under the same lock (the
  capture that becomes the official record is whichever the driver runs,
  but the sample series proves what the machine could do and when);
- full captures are rate-limited to one per ``--full-gap`` seconds
  (default 2 h) so a long fast window doesn't burn the chip on
  redundant benches.

Run detached (CLAUDE.md long-run convention):
    setsid nohup python scripts/bench_sampler.py > /dev/null 2>&1 &
    echo $! > /tmp/bench_sampler.pid
Stop with ``kill $(cat /tmp/bench_sampler.pid)`` — never by pattern.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from scripts.tpu_lock import locked_out, tpu_lock  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parents[1]


def _run(args, timeout):
    env = dict(os.environ, BENCH_SESSION="sampler")
    try:
        r = subprocess.run(
            [sys.executable, str(REPO / "bench.py"), *args],
            capture_output=True, timeout=timeout, env=env, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return None
    for line in reversed(r.stdout.decode().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                return None
    return None


def main():
    interval = float(sys.argv[1]) if len(sys.argv) > 1 else 1200.0
    full_gap = 7200.0
    for i, a in enumerate(sys.argv):
        if a == "--full-gap" and i + 1 < len(sys.argv):
            full_gap = float(sys.argv[i + 1])
    last_full = 0.0
    while True:
        t0 = time.time()
        if locked_out():
            print("[sampler] chip busy; skipping this tick", flush=True)
        else:
            try:
                with tpu_lock("bench_sampler_probe"):
                    probe = _run(["--probe"], timeout=1200)
                    regime = (probe or {}).get("chip_regime")
                    conv_ms = (probe or {}).get("probe_convnet_step_ms")
                    print(
                        f"[sampler] probe -> {regime} (conv {conv_ms} ms)",
                        flush=True,
                    )
                    if (
                        regime == "fast"
                        and conv_ms is not None
                        and conv_ms < 1.0  # clearly below the 1.29-1.32 ms
                        # throttled plateau; see module docstring
                        and time.time() - last_full > full_gap
                    ):
                        print("[sampler] fast window: full bench", flush=True)
                        out = _run([], timeout=2700)
                        last_full = time.time()
                        if out:
                            print(
                                f"[sampler] full capture: "
                                f"{out.get('value')} specs/s "
                                f"(regime {out.get('chip_regime')})",
                                flush=True,
                            )
            except TimeoutError:
                pass
        time.sleep(max(10.0, interval - (time.time() - t0)))


if __name__ == "__main__":
    main()
