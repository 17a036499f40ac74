"""Unit tests for bench.py's pure window classification.

The probe's regime call gates whether the armed sampler burns a
~19-minute full bench (scripts/bench_sampler.py) and how the committed
sample series (saved/bench_samples.jsonl) reads. Round 5 folded the
conv-plateau criterion into the probe itself after the round-5 04:33
sample showed the absolute thresholds alone call a 5x-throttled window
"fast" (BENCH.md round-4 throttled-window anatomy).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import classify_regime

# a genuinely healthy window (round-3 record neighborhood)
HEALTHY = dict(disp_ms=0.02, rtt_ms=28.0, mm_frac=0.86, hbm_frac=0.69,
               small_us=0.9, conv_mfu=0.21, conv_step_ms=0.95)


def test_healthy_window_is_fast():
    regime, reason = classify_regime(**HEALTHY)
    assert regime == "fast" and reason is None


def test_conv_plateau_alone_is_slow_with_reason():
    # the measured round-4/5 selective throttle: every absolute leg
    # above "mediocre", conv-net at the 1.29-1.44 ms plateau
    legs = dict(HEALTHY, conv_mfu=0.15, conv_step_ms=1.33)
    regime, reason = classify_regime(**legs)
    assert regime == "slow"
    assert reason is not None and reason.startswith("convnet leg")


def test_hard_slow_leg_is_slow_without_plateau_reason():
    # a hard-throttled window (round-3 style: RTT seconds) must NOT be
    # attributed to the conv plateau — the full bench's fast-flip keys
    # on that reason string and must never fire for hard-slow windows
    legs = dict(HEALTHY, rtt_ms=17700.0, conv_step_ms=4.0, conv_mfu=0.05)
    regime, reason = classify_regime(**legs)
    assert regime == "slow" and reason is None


def test_each_hard_leg_triggers_slow():
    for k, v in [("disp_ms", 6.0), ("rtt_ms", 1500.0), ("mm_frac", 0.3),
                 ("hbm_frac", 0.3), ("small_us", 24.4), ("conv_mfu", 0.05)]:
        regime, _ = classify_regime(**dict(HEALTHY, **{k: v}))
        assert regime == "slow", k
