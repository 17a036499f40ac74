"""Differentiable DX7 FM engine in JAX — batched, on-TPU rendering.

The reference renders audio strictly host-side through a VST binary
(reference: synth/dexed.py:234-259); our C++ engine (csrc/dx7) is the
like-for-like replacement. This module is the TPU-native *extension* the
SURVEY build plan calls a stretch goal (SURVEY.md §7 layer 4): the same
DX7 model, vectorized over a batch of presets as pure JAX ops, so that

- audio re-rendering in evaluation can run ON DEVICE, batched, and
- the render is DIFFERENTIABLE wrt the continuous preset parameters
  (output levels, EG rates/levels, fine tuning, LFO depths, ...), enabling
  gradient-through-audio losses the reference could never express.

Semantics mirror csrc/dx7/dx7_engine.cc exactly (same decode laws, EG
state machine, qRate/LFO hardware curves, algorithm table, feedback,
fadeout); golden tests compare against the C++ engine (tests/test_fm_jax.py).

Two feedback modes:
- ``feedback='exact'``: a per-sample ``lax.scan`` carries the DX7's
  two-sample feedback history — bit-path-faithful to the C++ engine, for
  every algorithm in a mixed batch. Sequential in samples (the physics
  is), so prefer it for golden checks and final renders.
- ``feedback='unrolled'`` (default): the operator stack is recomputed
  ``fb_iters`` times with the feedback term read from the previous
  iterate's delayed output (a damped fixed-point unroll). Everything is
  vectorized over samples — MXU/VPU-friendly and cheap to differentiate.
  Exact when a preset's feedback amount is 0; converges to the exact
  solution with iterations otherwise (tested tolerance vs the C++ engine).

Quantized parameter decodes (algorithm, coarse, detune, switches) use
straight-through estimators: forward values match the C++ integer decode,
gradients pass through to the underlying continuous parameter.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

N_OPS = 6
BLOCK = 32  # control-rate block (samples), as in dx7_engine.cc
ENGINE_BLOCK = 512  # render length rounds up to this (dx7_engine.cc:295)
MOD_INDEX_MAX = 4.0
AMS_DB = np.array([0.0, 1.6, 4.8, 12.0], dtype=np.float32)
PMS_SEMIS = np.array(
    [0.0, 0.09, 0.20, 0.43, 0.87, 1.79, 3.66, 7.0], dtype=np.float32
)

# ---------------------------------------------------------------------------
# Algorithm table (public DX7 spec; same encoding as dx7_engine.cc:155-188).
# ---------------------------------------------------------------------------
_ALGOS = [
    # (edges [(mod, car), ...] 1-based, carrier bitmask, fb_src, fb_dst)
    ([(2, 1), (4, 3), (5, 4), (6, 5)], 0b000101, 6, 6),
    ([(2, 1), (4, 3), (5, 4), (6, 5)], 0b000101, 2, 2),
    ([(2, 1), (3, 2), (5, 4), (6, 5)], 0b001001, 6, 6),
    ([(2, 1), (3, 2), (5, 4), (6, 5)], 0b001001, 4, 6),
    ([(2, 1), (4, 3), (6, 5)], 0b010101, 6, 6),
    ([(2, 1), (4, 3), (6, 5)], 0b010101, 5, 6),
    ([(2, 1), (4, 3), (5, 3), (6, 5)], 0b000101, 6, 6),
    ([(2, 1), (4, 3), (5, 3), (6, 5)], 0b000101, 4, 4),
    ([(2, 1), (4, 3), (5, 3), (6, 5)], 0b000101, 2, 2),
    ([(2, 1), (3, 2), (5, 4), (6, 4)], 0b001001, 3, 3),
    ([(2, 1), (3, 2), (5, 4), (6, 4)], 0b001001, 6, 6),
    ([(2, 1), (4, 3), (5, 3), (6, 3)], 0b000101, 2, 2),
    ([(2, 1), (4, 3), (5, 3), (6, 3)], 0b000101, 6, 6),
    ([(2, 1), (4, 3), (5, 4), (6, 4)], 0b000101, 6, 6),
    ([(2, 1), (4, 3), (5, 4), (6, 4)], 0b000101, 2, 2),
    ([(2, 1), (3, 1), (5, 1), (4, 3), (6, 5)], 0b000001, 6, 6),
    ([(2, 1), (3, 1), (5, 1), (4, 3), (6, 5)], 0b000001, 2, 2),
    ([(2, 1), (3, 1), (4, 1), (5, 4), (6, 5)], 0b000001, 3, 3),
    ([(2, 1), (3, 2), (6, 4), (6, 5)], 0b011001, 6, 6),
    ([(3, 1), (3, 2), (5, 4), (6, 4)], 0b001011, 3, 3),
    ([(3, 1), (3, 2), (6, 4), (6, 5)], 0b011011, 3, 3),
    ([(2, 1), (6, 3), (6, 4), (6, 5)], 0b011101, 6, 6),
    ([(3, 2), (6, 4), (6, 5)], 0b011011, 6, 6),
    ([(6, 3), (6, 4), (6, 5)], 0b011111, 6, 6),
    ([(6, 4), (6, 5)], 0b011111, 6, 6),
    ([(3, 2), (5, 4), (6, 4)], 0b001011, 6, 6),
    ([(3, 2), (5, 4), (6, 4)], 0b001011, 3, 3),
    ([(2, 1), (4, 3), (5, 4)], 0b100101, 5, 5),
    ([(4, 3), (6, 5)], 0b010111, 6, 6),
    ([(4, 3), (5, 4)], 0b100111, 5, 5),
    ([(6, 5)], 0b011111, 6, 6),
    ([], 0b111111, 6, 6),
]


def _build_algo_tables():
    adj = np.zeros((32, N_OPS, N_OPS), dtype=np.float32)  # [alg, car, mod]
    car = np.zeros((32, N_OPS), dtype=np.float32)
    fb_src = np.zeros((32,), dtype=np.int32)
    fb_dst = np.zeros((32,), dtype=np.int32)
    for a, (edges, mask, s, d) in enumerate(_ALGOS):
        for m, c in edges:
            assert m > c, "algorithm edges must run high->low"
            adj[a, c - 1, m - 1] = 1.0
        for i in range(N_OPS):
            car[a, i] = (mask >> i) & 1
        fb_src[a], fb_dst[a] = s - 1, d - 1
    return adj, car, fb_src, fb_dst


ALGO_ADJ, ALGO_CARRIER, ALGO_FB_SRC, ALGO_FB_DST = _build_algo_tables()


def _build_mod_depths() -> np.ndarray:
    """(32, 6) int32 modulation depth per (algorithm, operator): carriers
    are 0, an operator that modulates a depth-d operator is d+1 (min over
    its targets). Derived from the same public algorithm table the engine
    uses; feedback self-edges don't affect depth."""
    depth = np.full((32, N_OPS), N_OPS, dtype=np.int32)
    for a, (edges, mask, _s, _d) in enumerate(_ALGOS):
        for i in range(N_OPS):
            if (mask >> i) & 1:
                depth[a, i] = 0
        for _ in range(N_OPS):
            for m, c in edges:
                depth[a, m - 1] = min(depth[a, m - 1], depth[a, c - 1] + 1)
    return depth


ALGO_MOD_DEPTH = _build_mod_depths()


# ---------------------------------------------------------------------------
# Parameter decoding (dx7_engine.cc:48-138) with straight-through rounding
# ---------------------------------------------------------------------------


def _ste(f, x):
    """Straight-through: forward = f(x), gradient = identity."""
    return x + jax.lax.stop_gradient(f(x) - x)


def _qz(x, card):
    """lround(x*(card-1)) clipped — matches dx7_engine.cc:48-51 for x>=0;
    straight-through gradient to x*(card-1)."""
    y = x * (card - 1.0)
    return _ste(lambda v: jnp.clip(jnp.floor(v + 0.5), 0, card - 1), y)


def _p99(x):
    return jnp.clip(x, 0.0, 1.0) * 99.0


def _level_to_db(level):
    return 0.74 * (level - 99.0)


def _rate_to_db_per_s(r):
    """DX7 quantized EG timing law, engine v4 (matches
    dx7_engine.cc rate_to_db_per_s): qr = floor(rate*41/64), slew doubles
    every 4 qr steps, within-group increments follow the hardware's
    {4,5,6,7} pattern (qr & 3). Straight-through gradients so the rate
    params stay trainable through the quantization."""
    qr = jnp.minimum(63.0, _ste(jnp.floor, r * (41.0 / 64.0)))
    octave = _ste(jnp.floor, qr * 0.25)
    fine = qr - 4.0 * octave  # (qr & 3) with STE gradients
    return (9600.0 / (7.0 * 32768.0)) * (4.0 + fine) * jnp.exp2(octave)


def decode_presets(p):
    """(B, 155) normalized preset matrix -> dict of decoded parameter arrays
    (same laws as dx7_engine.cc decode_preset)."""
    d = {}
    d["master_volume"] = jnp.clip(p[:, 2], 0.0, 1.0)
    d["algorithm"] = _qz(p[:, 4], 32)
    d["feedback"] = _qz(p[:, 5], 8)
    d["lfo_speed"] = _p99(p[:, 7])
    d["lfo_delay"] = _p99(p[:, 8])
    d["lfo_pm_depth"] = _p99(p[:, 9])
    d["lfo_am_depth"] = _p99(p[:, 10])
    d["lfo_key_sync"] = _qz(p[:, 11], 2)
    d["lfo_wave"] = _qz(p[:, 12], 6)
    d["transpose"] = jnp.clip(p[:, 13], 0.0, 1.0) * 48.0
    d["pitch_mod_sens"] = _qz(p[:, 14], 8)
    d["peg_rate"] = _p99(p[:, 15:19])
    d["peg_level"] = _p99(p[:, 19:23])
    ops = p[:, 23 : 23 + 22 * N_OPS].reshape(p.shape[0], N_OPS, 22)
    d["eg_rate"] = _p99(ops[..., 0:4])     # (B, 6, 4)
    d["eg_level"] = _p99(ops[..., 4:8])
    d["out_level"] = _p99(ops[..., 8])
    d["fixed_mode"] = _qz(ops[..., 9], 2)
    d["coarse"] = _qz(ops[..., 10], 32)
    d["fine"] = _p99(ops[..., 11])
    d["detune"] = _qz(ops[..., 12], 15)
    d["breakpoint"] = _p99(ops[..., 13])
    d["l_depth"] = _p99(ops[..., 14])
    d["r_depth"] = _p99(ops[..., 15])
    d["l_curve"] = _qz(ops[..., 16], 4)
    d["r_curve"] = _qz(ops[..., 17], 4)
    d["rate_scaling"] = _qz(ops[..., 18], 8)
    d["amp_mod_sens"] = _qz(ops[..., 19], 4)
    d["key_vel"] = _qz(ops[..., 20], 8)
    d["on"] = _qz(ops[..., 21], 2)
    return d


def _keyscale_db(d, note):
    """Key level-scaling contribution in dB (dx7_engine.cc:239-254).
    note: (B, 1) float."""
    bp_note = d["breakpoint"] + 21.0  # (B, 6)
    dist = note - bp_note
    left = dist < 0
    depth = jnp.where(left, d["l_depth"], d["r_depth"])
    curve = jnp.where(left, d["l_curve"], d["r_curve"])
    adist = jnp.abs(dist)
    exp_frac = (jnp.exp2(adist / 16.0) - 1.0) / (2.0 ** (45.0 / 16.0) - 1.0)
    lin_frac = adist / 45.0
    is_exp = (curve == 1) | (curve == 2)
    frac = jnp.where(is_exp, exp_frac, lin_frac)
    db = depth * 0.74 * frac
    db = jnp.where(curve <= 1, -db, db)
    return jnp.where((depth <= 0.0) | (adist <= 0.0), 0.0, db)


def _lfo_wave_value(wave, phase, sh_value):
    """(dx7_engine.cc:257-269); wave is a per-item integer array."""
    tri = 4.0 * jnp.where(phase < 0.5, phase, 1.0 - phase) - 1.0
    return jnp.select(
        [wave == 0, wave == 1, wave == 2, wave == 3, wave == 4],
        [tri, 1.0 - 2.0 * phase, 2.0 * phase - 1.0,
         jnp.where(phase < 0.5, 1.0, -1.0), jnp.sin(2.0 * jnp.pi * phase)],
        sh_value,
    )


# ---------------------------------------------------------------------------
# Control-rate pass: EG / pitch EG / LFO / amplitudes / phase starts
# ---------------------------------------------------------------------------


def _eg_tick(cur, stage, targets, slews, off):
    """One EG control tick, vectorized over trailing dims
    (dx7_engine.cc:214-235). targets/slews: (..., 4)."""
    stage = jnp.where(off, 3, stage)
    target = jnp.take_along_axis(targets, stage[..., None], axis=-1)[..., 0]
    slew = jnp.take_along_axis(slews, stage[..., None], axis=-1)[..., 0]
    dlt = target - cur
    step = jnp.where(dlt > 0.0, 4.0 * slew + 0.05 * dlt, slew)
    reached = jnp.abs(dlt) <= step
    new_cur = jnp.where(reached, target, cur + jnp.sign(dlt) * step)
    new_stage = jnp.where(reached & (stage < 2), stage + 1, stage)
    return new_cur, new_stage


def _control_pass(d, pitches, velocities, note_on_s, total_s, sample_rate):
    """Scan over control ticks -> per-tick op amplitudes, pitch factor.

    Returns (amps (T, B, 6), pitch_fact (T, B)) where T = n_samples/BLOCK.
    """
    fs = float(sample_rate)
    tick_s = BLOCK / fs
    n_samples = samples_per_render(total_s, sample_rate)
    T = n_samples // BLOCK
    note_off_sample = int(note_on_s * sample_rate)
    B = d["out_level"].shape[0]

    pitch = pitches.astype(jnp.float32)[:, None]  # (B, 1)
    vel01 = jnp.clip(velocities.astype(jnp.float32), 0.0, 127.0) / 127.0

    # --- static per-op gains (dx7_engine.cc:316-333)
    vel_db = d["key_vel"] / 7.0 * 24.0 * (vel01[:, None] - 1.0)
    op_gain_db = (
        _level_to_db(d["out_level"]) + _keyscale_db(d, pitch) + vel_db
    )  # (B, 6)

    # --- EG slews/targets
    rs_add = d["rate_scaling"] * (pitch - 60.0) / 6.0  # (B, 6)
    rates = jnp.minimum(d["eg_rate"] + rs_add[..., None], 99.0)  # (B, 6, 4)
    slews = _rate_to_db_per_s(rates) * tick_s
    targets = _level_to_db(d["eg_level"])  # (B, 6, 4)
    eg0 = jnp.where(targets[..., 3] < -70.0, -100.0, targets[..., 3])

    # --- pitch EG (levels interpreted directly, 50 = neutral)
    peg_slews = _rate_to_db_per_s(jnp.minimum(d["peg_rate"], 99.0)) * tick_s
    peg_targets = d["peg_level"] - 50.0  # (B, 4)
    peg0 = peg_targets[..., 3]
    peg_semis_per_unit = 4.0 / 50.0

    # --- LFO hardware curve (dx7_engine.cc:344-351)
    lfo_s = _qz(d["lfo_speed"] / 99.0, 100)
    sr0 = jnp.where(lfo_s == 0, 1.0, _ste(jnp.floor, 165.0 * lfo_s / 64.0))
    mult = jnp.where(sr0 < 160.0, 11.0,
                     11.0 + _ste(jnp.floor, (sr0 - 160.0) / 16.0))
    lfo_hz = sr0 * mult * 0.0057
    lfo_phase0 = jnp.where(d["lfo_key_sync"] > 0, 0.0, 0.25) * jnp.ones((B,))
    lfo_delay_s = 5.0 * jnp.square(d["lfo_delay"] / 99.0)
    pmd = d["lfo_pm_depth"] / 99.0
    amd = d["lfo_am_depth"] / 99.0
    pms = jnp.asarray(PMS_SEMIS)[d["pitch_mod_sens"].astype(jnp.int32)]
    ams_db = jnp.asarray(AMS_DB)[d["amp_mod_sens"].astype(jnp.int32)]  # (B,6)

    tick_starts = jnp.arange(T, dtype=jnp.int32) * BLOCK

    def body(carry, start):
        eg_db, eg_stage, peg_db, peg_stage, lfo_phase, sh_rng, sh_val = carry
        off = start >= note_off_sample
        # LFO advance (dx7_engine.cc:403-414)
        t_s = start.astype(jnp.float32) / fs
        ramp = jnp.where(lfo_delay_s > 0.0,
                         jnp.minimum(t_s / jnp.maximum(lfo_delay_s, 1e-9), 1.0),
                         1.0)
        lfo_phase = lfo_phase + lfo_hz * tick_s
        wrapped = lfo_phase >= 1.0
        lfo_phase = jnp.where(wrapped,
                              lfo_phase - jnp.floor(lfo_phase), lfo_phase)
        new_rng = sh_rng * jnp.uint32(1664525) + jnp.uint32(1013904223)
        sh_rng = jnp.where(wrapped, new_rng, sh_rng)
        new_sh = ((sh_rng >> 8).astype(jnp.float32) / 8388608.0) - 1.0
        sh_val = jnp.where(wrapped, new_sh, sh_val)
        lfo = _lfo_wave_value(d["lfo_wave"], lfo_phase, sh_val) * ramp  # (B,)

        peg_db, peg_stage = _eg_tick(peg_db, peg_stage, peg_targets,
                                     peg_slews, off)
        pitch_semis = peg_db * peg_semis_per_unit + lfo * pmd * pms
        pitch_fact = jnp.exp2(pitch_semis / 12.0)  # (B,)

        eg_db, eg_stage = _eg_tick(eg_db, eg_stage, targets, slews, off)
        am_db = -0.5 * (1.0 + lfo[:, None]) * amd[:, None] * ams_db
        tot_db = jnp.minimum(eg_db + op_gain_db + am_db, 0.0)
        amp = jnp.where(d["on"] > 0, jnp.exp(tot_db * (jnp.log(10.0) / 20.0)),
                        0.0)
        amp = jnp.where(amp < 1e-6, 0.0, amp)  # (B, 6)
        return (eg_db, eg_stage, peg_db, peg_stage, lfo_phase, sh_rng,
                sh_val), (amp, pitch_fact)

    init = (
        eg0, jnp.zeros((B, N_OPS), jnp.int32),
        peg0, jnp.zeros((B,), jnp.int32),
        lfo_phase0, jnp.full((B,), 0x12345678, jnp.uint32),
        jnp.zeros((B,)),
    )
    _, (amps, pitch_fact) = jax.lax.scan(body, init, tick_starts)
    return amps, pitch_fact  # (T, B, 6), (T, B)


def _op_freqs(d, pitches):
    """Static per-op oscillator frequencies (dx7_engine.cc:316-327)."""
    base_note = pitches.astype(jnp.float32)[:, None] + (
        d["transpose"][:, None] - 24.0
    )
    base_freq = 440.0 * jnp.exp2((base_note - 69.0) / 12.0)  # (B, 1)
    coarse_mod4 = d["coarse"] - 4.0 * _ste(jnp.floor, d["coarse"] / 4.0)
    fixed_freq = jnp.exp(
        jnp.log(10.0) * (coarse_mod4 + d["fine"] / 100.0)
    )
    ratio = jnp.where(d["coarse"] == 0, 0.5, d["coarse"]) * (
        1.0 + d["fine"] / 100.0
    )
    freq = jnp.where(d["fixed_mode"] > 0, fixed_freq, base_freq * ratio)
    return freq * jnp.exp2((d["detune"] - 7.0) * (2.0 / 1200.0))  # (B, 6)


def samples_per_render(total_s: float, sample_rate: int) -> int:
    n = int(total_s * sample_rate)
    return (n + ENGINE_BLOCK - 1) // ENGINE_BLOCK * ENGINE_BLOCK


# ---------------------------------------------------------------------------
# Audio-rate synthesis
# ---------------------------------------------------------------------------


def _upsample_amps(amps):
    """(T, B, 6) block targets -> (B, 6, T*BLOCK) per-sample amplitudes with
    the C++ engine's within-block linear interpolation (amp_cur += step per
    sample, dx7_engine.cc:430,439)."""
    T, B, _ = amps.shape
    prev = jnp.concatenate([jnp.zeros_like(amps[:1]), amps[:-1]], axis=0)
    w = (jnp.arange(1, BLOCK + 1, dtype=jnp.float32) / BLOCK)  # (BLOCK,)
    # (T, B, 6, BLOCK)
    per = prev[..., None] + (amps - prev)[..., None] * w
    return per.transpose(1, 2, 0, 3).reshape(B, N_OPS, T * BLOCK)


def _per_sample_phases(freqs, pitch_fact, sample_rate):
    """Oscillator phases for every sample: (B, 6, N). Wraps at block
    boundaries to preserve f32 precision (the C++ engine wraps per sample;
    sin is periodic so block-wrap is equivalent)."""
    T, B = pitch_fact.shape
    inc = freqs[None] * pitch_fact[..., None] / float(sample_rate)  # (T,B,6)

    def body(phase0, inc_t):
        nxt = phase0 + inc_t * BLOCK
        nxt = nxt - jnp.floor(nxt)
        return nxt, phase0

    _, starts = jax.lax.scan(body, jnp.zeros((B, N_OPS)), inc)  # (T, B, 6)
    s = jnp.arange(1, BLOCK + 1, dtype=jnp.float32)
    per = starts[..., None] + inc[..., None] * s  # (T, B, 6, BLOCK)
    return per.transpose(1, 2, 0, 3).reshape(B, N_OPS, T * BLOCK), inc


def _fade_and_volume(sample, d, n_carriers, n_samples, sample_rate):
    """Carrier normalization, master volume, clamp, linspace fadeout
    (dx7_engine.cc:453-459)."""
    fs = float(sample_rate)
    out = sample / n_carriers[:, None] * d["master_volume"][:, None]
    out = jnp.clip(out, -1.0, 1.0)
    fade_samples = int(np.floor(0.1 * fs))
    if fade_samples > 1:
        idx = np.arange(n_samples)
        scale = np.ones(n_samples, dtype=np.float32)
        tail = idx >= n_samples - fade_samples
        scale[tail] = (n_samples - 1 - idx[tail]) / (fade_samples - 1)
        out = out * jnp.asarray(scale)[None, :]
    return out


@functools.partial(
    jax.jit,
    static_argnames=("note_on_s", "total_s", "sample_rate", "feedback",
                     "fb_iters"),
)
def render_batch(
    presets,
    pitches,
    velocities,
    note_on_s: float = 3.0,
    total_s: float = 4.0,
    sample_rate: int = 22050,
    feedback: str = "unrolled",
    fb_iters: int = 3,
):
    """Renders a batch of presets to waveforms on device.

    :param presets: (B, 155) normalized full preset matrix
    :param pitches/velocities: (B,) ints
    :returns: (B, n_samples) float32 waveforms, n_samples rounded up to the
        512-sample engine block (same contract as csrc render, header
        dx7_engine.h / synth/render.py).
    """
    presets = presets.astype(jnp.float32)
    d = decode_presets(presets)
    B = presets.shape[0]
    n_samples = samples_per_render(total_s, sample_rate)

    alg = d["algorithm"].astype(jnp.int32)
    adj = jnp.asarray(ALGO_ADJ)[alg]  # (B, 6, 6) [car, mod]
    carriers = jnp.asarray(ALGO_CARRIER)[alg]  # (B, 6)
    n_carriers = jnp.maximum(carriers.sum(-1), 1.0)
    fb_src = jnp.asarray(ALGO_FB_SRC)[alg]  # (B,)
    fb_dst = jnp.asarray(ALGO_FB_DST)[alg]
    fb_amt = jnp.where(d["feedback"] > 0,
                       jnp.exp2(d["feedback"] - 7.0) * jnp.pi, 0.0)  # (B,)
    src_onehot = jax.nn.one_hot(fb_src, N_OPS)  # (B, 6)
    dst_onehot = jax.nn.one_hot(fb_dst, N_OPS)

    amps_t, pitch_fact = _control_pass(
        d, pitches, velocities, note_on_s, total_s, sample_rate
    )
    amps = _upsample_amps(amps_t)  # (B, 6, N)
    freqs = _op_freqs(d, pitches)  # (B, 6)
    phases, _ = _per_sample_phases(freqs, pitch_fact, sample_rate)  # (B,6,N)

    mod_scale = MOD_INDEX_MAX / (2.0 * jnp.pi)

    if feedback == "unrolled":
        fb_sig = jnp.zeros((B, n_samples))
        ys = None
        for _ in range(max(1, fb_iters)):
            fb_term = (  # 0.5 * (y[n-1] + y[n-2]) * fb_amt on fb_dst's input
                0.5
                * (
                    jnp.pad(fb_sig[:, :-1], ((0, 0), (1, 0)))
                    + jnp.pad(fb_sig[:, :-2], ((0, 0), (2, 0)))
                )
                * fb_amt[:, None]
            )
            y_list = [None] * N_OPS
            for i in range(N_OPS - 1, -1, -1):
                mod = jnp.zeros((B, n_samples))
                for m in range(i + 1, N_OPS):
                    mod = mod + adj[:, i, m, None] * y_list[m]
                mod = mod + dst_onehot[:, i, None] * fb_term
                y_list[i] = (
                    jnp.sin(2.0 * jnp.pi * (phases[:, i] + mod * mod_scale))
                    * amps[:, i]
                )
            ys = jnp.stack(y_list, axis=1)  # (B, 6, N)
            fb_sig = (src_onehot[:, :, None] * ys).sum(1)
        sample = (carriers[:, :, None] * ys).sum(1)  # (B, N)
    elif feedback == "exact":
        # per-sample scan carrying the two-sample feedback history; operator
        # order inside the step is static high->low, as in the C++ engine
        ph_s = phases.transpose(2, 0, 1)  # (N, B, 6)
        amp_s = amps.transpose(2, 0, 1)

        def body(carry, xs):
            fb1, fb2 = carry
            ph, am = xs  # (B, 6)
            fb_term = 0.5 * (fb1 + fb2) * fb_amt  # (B,)
            y_list = [None] * N_OPS
            for i in range(N_OPS - 1, -1, -1):
                mod = jnp.zeros((B,))
                for m in range(i + 1, N_OPS):
                    mod = mod + adj[:, i, m] * y_list[m]
                mod = mod + dst_onehot[:, i] * fb_term
                y_list[i] = (
                    jnp.sin(2.0 * jnp.pi * (ph[:, i] + mod * mod_scale))
                    * am[:, i]
                )
            ys = jnp.stack(y_list, axis=1)  # (B, 6)
            fb_new = (src_onehot * ys).sum(-1)
            sample = (carriers * ys).sum(-1)
            return (fb_new, fb1), sample

        init = (jnp.zeros((B,)), jnp.zeros((B,)))
        _, samples = jax.lax.scan(body, init, (ph_s, amp_s))
        sample = samples.T  # (B, N)
    else:
        raise ValueError(f"unknown feedback mode '{feedback}'")

    return _fade_and_volume(sample, d, n_carriers, n_samples, sample_rate)
