"""Native DX7 render engine tests (csrc/libdx7.so via ctypes).

The reference had no renderer tests at all (it trusted the Dexed VST binary,
SURVEY.md §4); here the render contract itself is pinned: determinism,
length/fadeout, amplitude bounds, silence of zero-volume presets, batch
equivalence, and parameter sensitivity."""

import numpy as np
import pytest

from preset_gen_vae_tpu.synth import dexed_params as dx
from preset_gen_vae_tpu.synth.render import DexedRenderer, engine_available

pytestmark = pytest.mark.skipif(
    not engine_available(), reason="libdx7.so not built (make -C csrc)"
)


@pytest.fixture(scope="module")
def renderer():
    return DexedRenderer(sample_rate=22050, note_duration=(3.0, 1.0))


def _preset(seed=0, algo=None):
    """Random-but-controlled preset: op1 is always promptly audible and the
    pitch path (pitch EG) is neutral, so assertions are deterministic
    regardless of the random draw. Always locally seeded — never from a
    shared fixture rng — so every test renders the same presets no matter
    the test execution order."""
    rng = np.random.default_rng(seed)
    p = rng.random((155,)).astype(np.float32)
    dx.set_default_general_filter_and_tune_params(p)
    dx.set_operators(p, [1, 2, 3, 4, 5, 6])
    dx.prevent_SH_LFO(p)
    # full output level + fast attack + full sustain on op1: always signal
    p[dx.op_param_index(1, dx.OFF_OUTPUT_LEVEL)] = 1.0
    p[dx.op_param_index(1, dx.OFF_EG_RATES[0])] = 1.0
    p[dx.op_param_index(1, dx.OFF_EG_LEVELS[0])] = 1.0
    p[dx.op_param_index(1, dx.OFF_EG_LEVELS[2])] = 1.0
    p[dx.op_param_index(1, dx.OFF_KEY_VELOCITY)] = 0.0
    # no key level scaling on op1: a random depth+breakpoint can attenuate
    # by up to ~150 dB, silencing the op and breaking the audibility promise
    p[dx.op_param_index(1, dx.OFF_L_DEPTH)] = 0.0
    p[dx.op_param_index(1, dx.OFF_R_DEPTH)] = 0.0
    # neutral pitch EG (levels 50/99): random pitch envelopes would detune
    # every operator by up to +/- 4 semitones
    p[dx.IDX_PITCH_EG_FIRST + 4 : dx.IDX_PITCH_EG_FIRST + 8] = 50.0 / 99.0
    if algo is not None:
        p[dx.IDX_ALGORITHM] = (algo - 1) / 31.0
    return p


def _assert_render_contract(w):
    """The reference render contract (synth/dexed.py:247-259): 4.0 s at
    22.05 kHz rounded up to whole 512-sample engine blocks -> 88576 samples
    -> 347 STFT frames (reference spectrogram width, config.py:45-46);
    bounded output; last floor(0.1*Fs) samples scaled by linspace(1, 0) so
    the final sample is exactly zero and the faded tail is < ~2e-3."""
    assert w.shape == (88576,)
    assert 1 + w.shape[0] // 256 == 347
    assert w.dtype == np.float32
    assert np.abs(w).max() <= 1.0
    assert w[-1] == 0.0  # linspace fadeout endpoint
    # last 5 samples scaled by at most 4/(fade_samples-1) = 4/2204
    assert np.abs(w[-5:]).max() < 2e-3
    assert np.sqrt((w ** 2).mean()) > 1e-4  # audible


def test_render_contract(renderer):
    _assert_render_contract(renderer.render_note(_preset(seed=0), 60, 85))


@pytest.mark.slow
def test_render_contract_fuzz_300(renderer):
    """Fuzz the render contract over 300 seeded presets across all
    algorithms (round-1 verdict: loud-tailed presets violated the fadeout
    bound and the amplitude bound before the engine-v3 fixes)."""
    ps = np.stack(
        [_preset(seed=1000 + k, algo=1 + (k % 32)) for k in range(300)]
    )
    wb = renderer.render_batch(ps, [60] * 300, [85] * 300)
    assert np.isfinite(wb).all()
    for i in range(300):
        _assert_render_contract(wb[i])


def test_determinism(renderer):
    p = _preset(seed=1)
    np.testing.assert_array_equal(
        renderer.render_note(p, 60, 85), renderer.render_note(p, 60, 85)
    )


def test_batch_matches_single(renderer):
    ps = np.stack([_preset(seed=2 + a, algo=a) for a in (1, 5, 22, 32)])
    wb = renderer.render_batch(ps, [60] * 4, [85] * 4, n_threads=2)
    for i in range(4):
        np.testing.assert_array_equal(wb[i], renderer.render_note(ps[i], 60, 85))


def test_all_32_algorithms_render(renderer):
    ps = np.stack([_preset(seed=40 + a, algo=a) for a in range(1, 33)])
    wb = renderer.render_batch(ps, [60] * 32, [85] * 32)
    rms = np.sqrt((wb ** 2).mean(axis=1))
    assert np.isfinite(wb).all()
    assert (rms > 1e-5).all()  # op1 is a carrier in every algorithm


def test_zero_volume_is_silent(renderer):
    p = _preset(seed=3)
    for op in range(1, 7):
        p[dx.op_param_index(op, dx.OFF_OUTPUT_LEVEL)] = 0.0
    w = renderer.render_note(p, 60, 85)
    assert np.abs(w).max() < 1e-3


def test_pitch_sensitivity(renderer):
    """An octave up must (roughly) double the dominant frequency."""
    p = _preset(seed=4, algo=32)  # all carriers, no modulation: clean spectrum
    # make it a simple single-op sine: only op1 audible, ratio mode coarse=1
    for op in range(2, 7):
        p[dx.op_param_index(op, dx.OFF_OUTPUT_LEVEL)] = 0.0
    b = dx.op_param_index(1, 0)
    p[b + dx.OFF_MODE] = 0.0
    p[b + dx.OFF_FREQ_COARSE] = 1.0 / 31.0  # coarse = 1
    p[b + dx.OFF_FREQ_FINE] = 0.0
    p[b + dx.OFF_DETUNE] = 7.0 / 14.0
    p[dx.IDX_TRANSPOSE] = 0.5  # center
    p[dx.IDX_LFO_PM_DEPTH] = 0.0

    def peak_hz(w):
        sp = np.abs(np.fft.rfft(w[: 2 ** 16]))
        return np.argmax(sp) * 22050 / 2 ** 16

    f60 = peak_hz(renderer.render_note(p, 60, 100))
    f72 = peak_hz(renderer.render_note(p, 72, 100))
    assert f60 == pytest.approx(261.6, rel=0.05)  # middle C
    assert f72 == pytest.approx(2 * f60, rel=0.05)


def test_velocity_sensitivity(renderer):
    p = _preset(seed=5, algo=32)
    p[dx.op_param_index(1, dx.OFF_KEY_VELOCITY)] = 1.0  # max sensitivity
    # kill key level scaling: a boost there saturates the 0 dB total-level
    # clamp and would mask the velocity attenuation
    p[dx.op_param_index(1, dx.OFF_L_DEPTH)] = 0.0
    p[dx.op_param_index(1, dx.OFF_R_DEPTH)] = 0.0
    loud = renderer.render_note(p, 60, 127)
    soft = renderer.render_note(p, 60, 30)
    assert np.sqrt((loud ** 2).mean()) > 2.0 * np.sqrt((soft ** 2).mean())


def _single_sine_op_preset(seed):
    """Algo 32 with only op1 audible: a plain sine carrier whose amplitude
    envelope is fully determined by explicitly-set EG/LFO params below."""
    p = _preset(seed=seed, algo=32)
    for op in range(2, 7):
        p[dx.op_param_index(op, dx.OFF_OUTPUT_LEVEL)] = 0.0
    b = dx.op_param_index(1, 0)
    p[b + dx.OFF_MODE] = 0.0
    p[b + dx.OFF_FREQ_COARSE] = 1.0 / 31.0  # ratio 1
    p[b + dx.OFF_FREQ_FINE] = 0.0
    p[b + dx.OFF_DETUNE] = 7.0 / 14.0
    p[b + dx.OFF_L_DEPTH] = 0.0
    p[b + dx.OFF_R_DEPTH] = 0.0
    p[b + dx.OFF_RATE_SCALING] = 0.0
    p[b + dx.OFF_AMP_MOD_SENS] = 0.0
    p[b + dx.OFF_KEY_VELOCITY] = 0.0
    # EG: instant attack to full, full sustain, release set per-test
    for k in range(3):
        p[b + dx.OFF_EG_RATES[k]] = 1.0
        p[b + dx.OFF_EG_LEVELS[k]] = 1.0
    p[b + dx.OFF_EG_LEVELS[3]] = 0.0
    # LFO off by default
    p[dx.IDX_LFO_AM_DEPTH] = 0.0
    p[dx.IDX_LFO_PM_DEPTH] = 0.0
    p[dx.IDX_LFO_DELAY] = 0.0
    return p


def _rms_db(w, lo_s, hi_s, fs=22050):
    seg = w[int(lo_s * fs):int(hi_s * fs)]
    return 20.0 * np.log10(np.sqrt((seg ** 2).mean()) + 1e-12)


def test_eg_release_decay_rate_golden(renderer):
    """Golden timing for the quantized EG rate law (engine v4): panel rate
    quantizes to qRate = floor(rate*41/64); slew = 9600/(7*2^15) *
    (4 + (qr&3)) * 2^(qr>>2) dB/s — the documented DX7 structure (octave
    per 4 qr steps, {4,5,6,7} within-group increments) anchored at
    9600 dB/s for qr=63. Release rate 50 -> qr=32 -> 9600*4*2^8/(7*2^15) =
    42.86 dB/s, measured over the post-note-off linear-decay region."""
    p = _single_sine_op_preset(seed=7)
    p[dx.op_param_index(1, dx.OFF_EG_RATES[3])] = 50.0 / 99.0
    w = renderer.render_note(p, 60, 100)
    # note-off at 3.0 s; windows 0.5 s apart, both inside the decay ramp
    drop_db = _rms_db(w, 3.1, 3.2) - _rms_db(w, 3.6, 3.7)
    assert drop_db == pytest.approx(42.86 * 0.5, abs=2.0)


def test_eg_release_rate_within_group_4567(renderer):
    """Within one qRate octave group the slews follow the hardware's
    quantized {4,5,6,7} increment pattern: qr=32..35 -> decay slopes in
    ratio 4:5:6:7 (engine v4 law; panel rates 50,52,54,55 map to those
    qr values via floor(rate*41/64))."""
    drops = []
    for rate in (50.0, 52.0, 54.0, 55.0):  # qr = 32, 33, 34, 35
        p = _single_sine_op_preset(seed=8)
        p[dx.op_param_index(1, dx.OFF_EG_RATES[3])] = rate / 99.0
        w = renderer.render_note(p, 60, 100)
        drops.append(_rms_db(w, 3.1, 3.2) - _rms_db(w, 3.6, 3.7))
    for i, inc in enumerate((5.0, 6.0, 7.0)):
        assert drops[i + 1] == pytest.approx(
            drops[0] * inc / 4.0, rel=0.12
        ), (drops, i)


def test_eg_release_rate_doubles_every_4_qrate(renderer):
    """+4 qRate steps (panel rate +~6.2) must double the decay slope."""
    drops = []
    for rate in (44.0, 50.25):  # qr = 28 and 32 (floor(rate*41/64))
        p = _single_sine_op_preset(seed=8)
        p[dx.op_param_index(1, dx.OFF_EG_RATES[3])] = rate / 99.0
        w = renderer.render_note(p, 60, 100)
        drops.append(_rms_db(w, 3.1, 3.2) - _rms_db(w, 3.6, 3.7))
    assert drops[1] == pytest.approx(2.0 * drops[0], rel=0.15)


def test_eg_absolute_full_sweep_fast_end(renderer):
    """Absolute anchor, fast end (VERDICT r4 #6): the DX7 literature's
    consistently-reported fastest EG transition is a full ~96 dB sweep in
    ~10 ms at panel rate 99 (qr=63: 9600 dB/s anchor of the v4 law; the
    reference's engine contract is Dexed, synth/dexed.py:234-259, whose
    EG derives from the same measured hardware structure). Release rate
    99 -> the tone must still be at full level just before note-off
    (3.0 s) and buried >55 dB down 30 ms after it — and NOT yet silent
    12 ms after at rate 90 (qr=57: 2195 dB/s, ~44 ms full sweep),
    pinning the anchor's decade, not just monotonicity."""
    p = _single_sine_op_preset(seed=12)
    p[dx.op_param_index(1, dx.OFF_EG_RATES[3])] = 1.0
    w = renderer.render_note(p, 60, 100)
    fs = 22050
    before = _rms_db(w, 2.90, 2.99)
    after = 20.0 * np.log10(np.abs(w[int(3.03 * fs):int(3.08 * fs)]).max() + 1e-12)
    assert before - after > 55.0, (before, after)
    p90 = _single_sine_op_preset(seed=12)
    p90[dx.op_param_index(1, dx.OFF_EG_RATES[3])] = 90.0 / 99.0
    w90 = renderer.render_note(p90, 60, 100)
    # 12 ms at 2195 dB/s is ~26 dB down: audible, far from the -55 floor
    mid = 20.0 * np.log10(np.abs(w90[int(3.010 * fs):int(3.014 * fs)]).max() + 1e-12)
    assert before - mid < 40.0, (before, mid)


def test_eg_absolute_slew_rate60_golden(renderer):
    """Absolute mid-rate golden #2 (with rate 50's 42.86 dB/s above):
    panel rate 60 -> qr=floor(60*41/64)=38 -> increment 6, octave 9 ->
    9600*6*512/(7*32768) = 128.57 dB/s. Measured over 0.3 s of the
    post-note-off ramp: expected drop 38.6 dB."""
    p = _single_sine_op_preset(seed=13)
    p[dx.op_param_index(1, dx.OFF_EG_RATES[3])] = 60.0 / 99.0
    w = renderer.render_note(p, 60, 100)
    drop_db = _rms_db(w, 3.05, 3.10) - _rms_db(w, 3.35, 3.40)
    assert drop_db == pytest.approx(128.57 * 0.3, rel=0.12), drop_db


def test_eg_absolute_slew_rate70_golden(renderer):
    """Absolute mid-rate golden #3: panel rate 70 -> qr=floor(70*41/64)
    =44 -> increment 4, octave 11 -> 9600*4*2048/(7*32768) = 342.9 dB/s
    (full 96 dB sweep in 0.28 s — the 'short percussive release' regime
    of the published rate charts). Expected drop over 0.1 s: 34.3 dB."""
    p = _single_sine_op_preset(seed=14)
    p[dx.op_param_index(1, dx.OFF_EG_RATES[3])] = 70.0 / 99.0
    w = renderer.render_note(p, 60, 100)
    drop_db = _rms_db(w, 3.02, 3.06) - _rms_db(w, 3.12, 3.16)
    assert drop_db == pytest.approx(342.9 * 0.1, rel=0.15), drop_db


def test_eg_slowest_rate_full_sweep_decade(renderer):
    """Absolute anchor, slow end: the literature's slowest DX7 envelope
    ('about ten minutes' for the full sweep at rate 0) pins the law's
    other decade: qr=0 -> 9600*4/(7*32768) = 0.1674 dB/s -> 96 dB in
    ~574 s. A 1-s release window must therefore decay < 1 dB (vs 42.9 dB
    at rate 50) — asserting the octave structure reaches down 15 octaves
    from the 9600 dB/s anchor, not just a clamped floor."""
    p = _single_sine_op_preset(seed=15)
    p[dx.op_param_index(1, dx.OFF_EG_RATES[3])] = 0.0
    w = renderer.render_note(p, 60, 100)
    drop_db = _rms_db(w, 3.05, 3.15) - _rms_db(w, 3.85, 3.95)
    assert abs(drop_db) < 1.0, drop_db


def test_eg_attack_time_monotone_in_rate(renderer):
    """Higher attack rate -> strictly earlier arrival at half amplitude."""
    t_half = []
    for rate in (30.0, 60.0, 90.0):
        p = _single_sine_op_preset(seed=9)
        p[dx.op_param_index(1, dx.OFF_EG_RATES[0])] = rate / 99.0
        w = renderer.render_note(p, 60, 100)
        peak = np.abs(w[:44100]).max()
        t_half.append(int(np.argmax(np.abs(w) > 0.5 * peak)))
    assert t_half[0] > t_half[1] > t_half[2]


def test_lfo_speed_golden(renderer):
    """Golden LFO frequency: speed 50 -> count (165*50)>>6 = 128, x11 below
    the 160 break -> 1408 counts -> 8.03 Hz (engine v3 law: the hardware's
    piecewise-linear count curve at 0.0057 Hz/count). Measured from the
    amplitude-modulation envelope spectrum."""
    p = _single_sine_op_preset(seed=10)
    p[dx.IDX_LFO_SPEED] = 50.0 / 99.0
    p[dx.IDX_LFO_WAVE] = 4.0 / 5.0  # sine
    p[dx.IDX_LFO_KEY_SYNC] = 1.0
    p[dx.IDX_LFO_AM_DEPTH] = 1.0
    p[dx.op_param_index(1, dx.OFF_AMP_MOD_SENS)] = 1.0  # sens 3 = 12 dB
    w = renderer.render_note(p, 60, 100)
    fs = 22050
    env = np.abs(w[int(0.5 * fs):3 * fs])  # key-down steady state
    env = np.convolve(env, np.ones(256) / 256.0, mode="valid")
    sp = np.abs(np.fft.rfft(env - env.mean()))
    freqs = np.fft.rfftfreq(env.shape[0], 1.0 / fs)
    band = (freqs > 1.0) & (freqs < 20.0)
    f_peak = freqs[band][np.argmax(sp[band])]
    assert f_peak == pytest.approx(8.03, abs=0.5)


def test_lfo_speed_zero_floor(renderer):
    """Speed 0 is the documented ~0.06 Hz floor: over the 3 s key-down
    window the AM envelope must complete well under one cycle (monotone
    drift, no oscillation peak in the >1 Hz band)."""
    p = _single_sine_op_preset(seed=11)
    p[dx.IDX_LFO_SPEED] = 0.0
    p[dx.IDX_LFO_WAVE] = 4.0 / 5.0
    p[dx.IDX_LFO_KEY_SYNC] = 1.0
    p[dx.IDX_LFO_AM_DEPTH] = 1.0
    p[dx.op_param_index(1, dx.OFF_AMP_MOD_SENS)] = 1.0
    w = renderer.render_note(p, 60, 100)
    fs = 22050
    env = np.abs(w[int(0.5 * fs):3 * fs])
    # heavy smoothing (~93 ms) kills the carrier ripple, keeps < 5 Hz
    env = np.convolve(env, np.ones(2048) / 2048.0, mode="valid")
    # at 0.063 Hz the 2.5 s window sees < 1/6 of an LFO cycle: the envelope
    # is a monotone drift, i.e. strongly correlated with time (an 8 Hz LFO
    # would oscillate ~20 full cycles and decorrelate completely)
    t = np.arange(env.shape[0], dtype=np.float64)
    corr = np.corrcoef(env, t)[0, 1]
    assert abs(corr) > 0.8


def test_note_off_release(renderer):
    """With a fast release EG, audio after note-off (3.0 s) must decay."""
    p = _preset(seed=6, algo=32)
    for op in range(1, 7):
        b = dx.op_param_index(op, 0)
        p[b + dx.OFF_EG_RATES[3]] = 1.0   # fast release
        p[b + dx.OFF_EG_LEVELS[3]] = 0.0  # release to silence
        # no key level scaling: a random boost is clamped against the 0 dB
        # total-level ceiling and would lift the -73 dB release floor
        p[b + dx.OFF_L_DEPTH] = 0.0
        p[b + dx.OFF_R_DEPTH] = 0.0
    w = renderer.render_note(p, 60, 100)
    pre = np.sqrt((w[60000:66000] ** 2).mean())   # ~2.7-3.0 s (key down)
    post = np.sqrt((w[75000:81000] ** 2).mean())  # ~3.4-3.7 s (released)
    assert post < 0.1 * max(pre, 1e-9)
