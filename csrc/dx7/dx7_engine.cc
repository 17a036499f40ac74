// DX7-compatible FM engine — implementation. See dx7_engine.h for the role
// contract and parameter layout. Original code; the DX7 model itself
// (operators, algorithms, envelope shape) is public knowledge.

#include "dx7_engine.h"

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kNumOps = 6;
constexpr int kBlock = 32;  // control-rate block (samples)
constexpr float kPi = 3.14159265358979323846f;
constexpr float kTwoPi = 2.0f * kPi;

// ---------------------------------------------------------------------------
// Sine lookup table (4096 entries + guard, linear interpolation)
// ---------------------------------------------------------------------------
constexpr int kSinBits = 12;
constexpr int kSinSize = 1 << kSinBits;

struct SinTable {
  float t[kSinSize + 1];
  SinTable() {
    for (int i = 0; i <= kSinSize; ++i)
      t[i] = std::sin(kTwoPi * (float)i / (float)kSinSize);
  }
};
const SinTable g_sin;

// phase in [0, 1)
inline float fast_sin(float phase) {
  float p = phase - std::floor(phase);
  float fidx = p * kSinSize;
  int i = (int)fidx;
  float frac = fidx - i;
  return g_sin.t[i] + frac * (g_sin.t[i + 1] - g_sin.t[i]);
}

// ---------------------------------------------------------------------------
// Parameter decoding
// ---------------------------------------------------------------------------
inline int qz(float x, int card) {  // normalized -> integer step
  int v = (int)std::lround((double)x * (card - 1));
  return std::min(std::max(v, 0), card - 1);
}
inline float p99(float x) { return std::min(std::max(x, 0.0f), 1.0f) * 99.0f; }

// DX7 level (0..99) -> dB. ~0.74 dB per step near the top, silence at 0.
inline float level_to_db(float level) { return 0.74f * (level - 99.0f); }
inline float db_to_lin(float db) { return std::pow(10.0f, db / 20.0f); }

// EG rate (0..99) -> envelope slew in dB/second, via the DX7's documented
// quantized-timing law (engine v4): the panel rate quantizes to a 6-bit
// qRate (qr = floor(rate * 41/64), 0..63), the slew doubles every 4 qRate
// steps (qr >> 2 selects the octave), and WITHIN each group of 4 the
// hardware steps through the quantized increment pattern {4,5,6,7}
// (qr & 3) rather than smooth quarter-octave factors — the published DX7
// EG timing structure. The absolute anchor is calibrated, not
// bit-measured: qr=63 sweeps the full ~96 dB swing in ~10 ms
// (near-instant), qr=32 (panel rate 50) in ~2.2 s, qr=0 in ~9.5 minutes —
// the DX7's documented perceptual range. Pinned by golden timing tests
// (tests/test_synth.py: decay slope at qr=32, exact 2x per +4 qr, and the
// 4:5:6:7 within-group ratios).
inline float rate_to_db_per_s(float r) {
  int qr = (int)std::min(63.0f, std::floor(r * 41.0f / 64.0f));
  // 9600 dB/s at qr=63 (increment 7, octave 15): anchor / (7 * 2^15)
  return 9600.0f / (7.0f * 32768.0f) * (float)(4 + (qr & 3)) *
         (float)(1 << (qr >> 2));
}

struct OpParams {
  float eg_rate[4], eg_level[4];  // 0..99
  float out_level;                // 0..99
  bool fixed_mode;
  int coarse;      // 0..31
  float fine;      // 0..99
  int detune;      // 0..14 (center 7)
  float breakpoint;  // 0..99 (note A-1 + bp)
  float l_depth, r_depth;  // 0..99
  int l_curve, r_curve;    // 0:-LIN 1:-EXP 2:+EXP 3:+LIN
  int rate_scaling;        // 0..7
  int amp_mod_sens;        // 0..3
  int key_vel;             // 0..7
  bool on;
};

struct GlobalParams {
  int algorithm;  // 0..31
  int feedback;   // 0..7
  bool osc_key_sync;
  float lfo_speed, lfo_delay, lfo_pm_depth, lfo_am_depth;  // 0..99
  bool lfo_key_sync;
  int lfo_wave;  // 0 tri, 1 saw down, 2 saw up, 3 square, 4 sine, 5 s&h
  float transpose;  // 0..48, center 24
  int pitch_mod_sens;  // 0..7
  float peg_rate[4], peg_level[4];  // pitch EG, 0..99
  float master_volume;  // 'output' param, 0..1
};

void decode_preset(const float* p, GlobalParams* g, OpParams ops[kNumOps]) {
  g->master_volume = std::min(std::max(p[2], 0.0f), 1.0f);
  g->algorithm = qz(p[4], 32);
  g->feedback = qz(p[5], 8);
  g->osc_key_sync = qz(p[6], 2) != 0;
  g->lfo_speed = p99(p[7]);
  g->lfo_delay = p99(p[8]);
  g->lfo_pm_depth = p99(p[9]);
  g->lfo_am_depth = p99(p[10]);
  g->lfo_key_sync = qz(p[11], 2) != 0;
  g->lfo_wave = qz(p[12], 6);
  g->transpose = std::min(std::max(p[13], 0.0f), 1.0f) * 48.0f;
  g->pitch_mod_sens = qz(p[14], 8);
  for (int i = 0; i < 4; ++i) {
    g->peg_rate[i] = p99(p[15 + i]);
    g->peg_level[i] = p99(p[19 + i]);
  }
  for (int op = 0; op < kNumOps; ++op) {
    const float* b = p + 23 + 22 * op;
    OpParams& o = ops[op];
    for (int i = 0; i < 4; ++i) {
      o.eg_rate[i] = p99(b[0 + i]);
      o.eg_level[i] = p99(b[4 + i]);
    }
    o.out_level = p99(b[8]);
    o.fixed_mode = qz(b[9], 2) != 0;
    o.coarse = qz(b[10], 32);
    o.fine = p99(b[11]);
    o.detune = qz(b[12], 15);
    o.breakpoint = p99(b[13]);
    o.l_depth = p99(b[14]);
    o.r_depth = p99(b[15]);
    o.l_curve = qz(b[16], 4);
    o.r_curve = qz(b[17], 4);
    o.rate_scaling = qz(b[18], 8);
    o.amp_mod_sens = qz(b[19], 4);
    o.key_vel = qz(b[20], 8);
    o.on = qz(b[21], 2) != 0;
  }
}

// ---------------------------------------------------------------------------
// The 32 DX7 algorithms: modulation edges (mod -> car), carriers, feedback.
// Edges always go from a higher-numbered op to a lower-numbered one except
// through the feedback path, which is delayed one block-sample.
// fb_src's *output* feeds fb_dst's *input*, scaled by the feedback amount
// (fb_src == fb_dst: classic self-feedback).
// ---------------------------------------------------------------------------
struct Algorithm {
  uint8_t n_edges;
  uint8_t edges[6][2];  // {mod, car}, 1-based
  uint8_t carriers;     // bitmask, bit i-1 = op i is a carrier
  uint8_t fb_src, fb_dst;
};

#define B(...) __VA_ARGS__
const Algorithm kAlgos[32] = {
    /* 1*/ {4, {{2,1},{4,3},{5,4},{6,5}}, 0b000101, 6, 6},
    /* 2*/ {4, {{2,1},{4,3},{5,4},{6,5}}, 0b000101, 2, 2},
    /* 3*/ {4, {{2,1},{3,2},{5,4},{6,5}}, 0b001001, 6, 6},
    /* 4*/ {4, {{2,1},{3,2},{5,4},{6,5}}, 0b001001, 4, 6},
    /* 5*/ {3, {{2,1},{4,3},{6,5}}, 0b010101, 6, 6},
    /* 6*/ {3, {{2,1},{4,3},{6,5}}, 0b010101, 5, 6},
    /* 7*/ {4, {{2,1},{4,3},{5,3},{6,5}}, 0b000101, 6, 6},
    /* 8*/ {4, {{2,1},{4,3},{5,3},{6,5}}, 0b000101, 4, 4},
    /* 9*/ {4, {{2,1},{4,3},{5,3},{6,5}}, 0b000101, 2, 2},
    /*10*/ {4, {{2,1},{3,2},{5,4},{6,4}}, 0b001001, 3, 3},
    /*11*/ {4, {{2,1},{3,2},{5,4},{6,4}}, 0b001001, 6, 6},
    /*12*/ {4, {{2,1},{4,3},{5,3},{6,3}}, 0b000101, 2, 2},
    /*13*/ {4, {{2,1},{4,3},{5,3},{6,3}}, 0b000101, 6, 6},
    /*14*/ {4, {{2,1},{4,3},{5,4},{6,4}}, 0b000101, 6, 6},
    /*15*/ {4, {{2,1},{4,3},{5,4},{6,4}}, 0b000101, 2, 2},
    /*16*/ {5, {{2,1},{3,1},{5,1},{4,3},{6,5}}, 0b000001, 6, 6},
    /*17*/ {5, {{2,1},{3,1},{5,1},{4,3},{6,5}}, 0b000001, 2, 2},
    /*18*/ {5, {{2,1},{3,1},{4,1},{5,4},{6,5}}, 0b000001, 3, 3},
    /*19*/ {4, {{2,1},{3,2},{6,4},{6,5}}, 0b011001, 6, 6},
    /*20*/ {4, {{3,1},{3,2},{5,4},{6,4}}, 0b001011, 3, 3},
    /*21*/ {4, {{3,1},{3,2},{6,4},{6,5}}, 0b011011, 3, 3},
    /*22*/ {4, {{2,1},{6,3},{6,4},{6,5}}, 0b011101, 6, 6},
    /*23*/ {3, {{3,2},{6,4},{6,5}}, 0b011011, 6, 6},
    /*24*/ {3, {{6,3},{6,4},{6,5}}, 0b011111, 6, 6},
    /*25*/ {2, {{6,4},{6,5}}, 0b011111, 6, 6},
    /*26*/ {3, {{3,2},{5,4},{6,4}}, 0b001011, 6, 6},
    /*27*/ {3, {{3,2},{5,4},{6,4}}, 0b001011, 3, 3},
    /*28*/ {3, {{2,1},{4,3},{5,4}}, 0b100101, 5, 5},
    /*29*/ {2, {{4,3},{6,5}}, 0b010111, 6, 6},
    /*30*/ {2, {{4,3},{5,4}}, 0b100111, 5, 5},
    /*31*/ {1, {{6,5}}, 0b011111, 6, 6},
    /*32*/ {0, {}, 0b111111, 6, 6},
};
#undef B

// ---------------------------------------------------------------------------
// Envelope generator: moves the level (dB domain) toward per-stage targets.
// Note-on: stages 0 -> 1 -> 2 (sustain at eg_level[2]); note-off: stage 3.
// ---------------------------------------------------------------------------
struct EG {
  float current_db;
  int stage;          // 0..2 while key down, 3 = release
  bool done;
  float targets_db[4];
  float slews[4];  // dB per control tick

  void init(const float rates[4], const float levels[4], float rate_scale_add,
            float tick_s) {
    for (int i = 0; i < 4; ++i) {
      targets_db[i] = level_to_db(levels[i]);
      float r = std::min(rates[i] + rate_scale_add, 99.0f);
      slews[i] = rate_to_db_per_s(r) * tick_s;
    }
    current_db = targets_db[3] < -70.0f ? -100.0f : targets_db[3];
    stage = 0;
    done = false;
  }
  void note_off() { stage = 3; }
  float tick() {  // returns current level in dB
    if (stage < 4) {
      float target = targets_db[stage];
      float d = target - current_db;
      float step = slews[stage];
      if (d > 0.0f) {
        // rising segment: the DX7 attack closes on its target noticeably
        // faster than a decay at the same rate, with an exponential-like
        // approach; modeled as 4x slew plus proportional pull
        step = 4.0f * step + 0.05f * d;
      }
      if (std::fabs(d) <= step) {
        current_db = target;
        if (stage < 2) ++stage;
        else if (stage == 3) done = true;
        // stage 2 sustains
      } else {
        current_db += (d > 0 ? step : -step);
      }
    }
    return current_db;
  }
};

// Key level-scaling curve contribution in dB.
float keyscale_db(const OpParams& o, int note) {
  float bp_note = o.breakpoint * (99.0f / 99.0f) + 21.0f;  // A-1 + bp
  float dist = (float)note - bp_note;
  float depth;
  int curve;
  if (dist < 0) { depth = o.l_depth; curve = o.l_curve; dist = -dist; }
  else { depth = o.r_depth; curve = o.r_curve; }
  if (depth <= 0.0f || dist <= 0.0f) return 0.0f;
  float frac;
  if (curve == 1 || curve == 2)  // exponential
    frac = (std::pow(2.0f, dist / 16.0f) - 1.0f) / (std::pow(2.0f, 45.0f / 16.0f) - 1.0f);
  else  // linear
    frac = dist / 45.0f;
  float db = depth * 0.74f * frac;
  return (curve <= 1) ? -db : db;  // curves 0,1 attenuate; 2,3 boost
}

// LFO waveform in [-1, 1] given phase [0,1)
inline float lfo_wave_value(int wave, float phase, float sh_value) {
  switch (wave) {
    case 0: {  // triangle
      float p = phase < 0.5f ? phase : 1.0f - phase;
      return 4.0f * p - 1.0f;
    }
    case 1: return 1.0f - 2.0f * phase;       // saw down
    case 2: return 2.0f * phase - 1.0f;       // saw up
    case 3: return phase < 0.5f ? 1.0f : -1.0f;  // square
    case 4: return fast_sin(phase);           // sine
    default: return sh_value;                 // sample & hold
  }
}

// amp-mod sensitivity 0..3 -> dB range of amplitude modulation
const float kAmsDb[4] = {0.0f, 1.6f, 4.8f, 12.0f};
// pitch-mod sensitivity 0..7 -> semitone range at full PMD
const float kPmsSemis[8] = {0.0f, 0.09f, 0.20f, 0.43f, 0.87f, 1.79f, 3.66f, 7.0f};

}  // namespace

extern "C" int dx7_engine_version() { return 4; }

extern "C" int dx7_samples_per_render(float total_s, int sample_rate) {
  if (sample_rate <= 0 || total_s <= 0.0f) return -1;
  const int kEngineBlock = 512;
  return ((int)(total_s * sample_rate) + kEngineBlock - 1) / kEngineBlock *
         kEngineBlock;
}

extern "C" int dx7_render(const float* preset, int midi_pitch, int midi_vel,
                          float note_on_s, float total_s, int sample_rate,
                          float* out) {
  if (!preset || !out || sample_rate <= 0 || total_s <= 0.0f) return -1;
  // Render length rounds UP to the 512-sample engine block, reproducing the
  // reference's audio length (RenderMan renders whole plugin buffers:
  // 4.0 s @ 22.05 kHz -> 88576 samples -> 347 STFT frames, the documented
  // spectrogram width; reference config.py:45-46, synth/dexed.py:234).
  const int kEngineBlock = 512;
  const int n_samples =
      ((int)(total_s * sample_rate) + kEngineBlock - 1) / kEngineBlock * kEngineBlock;
  const int note_off_sample = (int)(note_on_s * sample_rate);
  const float fs = (float)sample_rate;
  const float tick_s = (float)kBlock / fs;

  GlobalParams g;
  OpParams ops[kNumOps];
  decode_preset(preset, &g, ops);
  const Algorithm& alg = kAlgos[g.algorithm];

  // --- per-op static gains / frequencies
  float base_note = (float)midi_pitch + (g.transpose - 24.0f);
  float base_freq = 440.0f * std::pow(2.0f, (base_note - 69.0f) / 12.0f);
  float vel01 = std::min(std::max((float)midi_vel, 0.0f), 127.0f) / 127.0f;

  float op_freq[kNumOps];
  float op_gain_db[kNumOps];  // static part (out level + key scale + velocity)
  bool is_carrier[kNumOps];
  EG eg[kNumOps];
  for (int i = 0; i < kNumOps; ++i) {
    const OpParams& o = ops[i];
    if (o.fixed_mode) {
      op_freq[i] = std::pow(10.0f, (float)(o.coarse % 4)) *
                   std::pow(10.0f, o.fine / 100.0f);
    } else {
      float ratio = (o.coarse == 0 ? 0.5f : (float)o.coarse) *
                    (1.0f + o.fine / 100.0f);
      op_freq[i] = base_freq * ratio;
    }
    // detune: +/- ~2 cents per step around center 7
    op_freq[i] *= std::pow(2.0f, (float)(o.detune - 7) * 2.0f / 1200.0f);
    float vel_db = (float)o.key_vel / 7.0f * 24.0f * (vel01 - 1.0f);
    op_gain_db[i] = level_to_db(o.out_level) + keyscale_db(o, midi_pitch) + vel_db;
    is_carrier[i] = (alg.carriers >> i) & 1;
    float rs_add = (float)o.rate_scaling * ((float)midi_pitch - 60.0f) / 6.0f;
    eg[i].init(o.eg_rate, o.eg_level, rs_add, tick_s);
  }

  // --- pitch EG (same 4-stage machine, levels 0..99 with 50 = neutral)
  EG peg;
  peg.init(g.peg_rate, g.peg_level, 0.0f, tick_s);
  // pitch EG levels are interpreted directly (not via level_to_db):
  for (int i = 0; i < 4; ++i) peg.targets_db[i] = (g.peg_level[i] - 50.0f);
  peg.current_db = peg.targets_db[3];
  // max +/- 4 semitones of pitch EG swing at full scale
  const float peg_semis_per_unit = 4.0f / 50.0f;

  // --- LFO. Speed (0..99) -> Hz via the hardware's piecewise-linear count
  // curve (sr = 165*speed/64, slope break above count 160); absolute scale
  // calibrated so speed 0 gives the documented ~0.06 Hz floor, putting
  // speed 99 at ~23 Hz. Pinned by golden timing tests.
  int lfo_s = qz(g.lfo_speed / 99.0f, 100);
  int lfo_sr = lfo_s == 0 ? 1 : (165 * lfo_s) >> 6;
  lfo_sr *= lfo_sr < 160 ? 11 : (11 + ((lfo_sr - 160) >> 4));
  float lfo_hz = (float)lfo_sr * 0.0057f;
  float lfo_phase = g.lfo_key_sync ? 0.0f : 0.25f;
  float lfo_delay_s = 5.0f * std::pow(g.lfo_delay / 99.0f, 2.0f);
  float pmd = g.lfo_pm_depth / 99.0f;
  float amd = g.lfo_am_depth / 99.0f;
  float pms_semis = kPmsSemis[g.pitch_mod_sens];
  uint32_t sh_rng = 0x12345678u;
  float sh_value = 0.0f;

  // modulation index scale: out level 99 -> ~ pi*1.27 peak phase deviation
  const float kModIndexMax = 4.0f;

  // --- feedback state
  const int fb_src = alg.fb_src - 1, fb_dst = alg.fb_dst - 1;
  const float fb_amt = (g.feedback > 0)
                           ? std::pow(2.0f, (float)(g.feedback - 7)) * kPi
                           : 0.0f;
  float fb_buf1 = 0.0f, fb_buf2 = 0.0f;  // two-sample average (DX7 style)

  // precompute modulator lists per op (edges are mod->car with mod > car)
  uint8_t mod_of[kNumOps][kNumOps];
  uint8_t n_mod[kNumOps] = {0};
  for (int e = 0; e < alg.n_edges; ++e) {
    int m = alg.edges[e][0] - 1, c = alg.edges[e][1] - 1;
    mod_of[c][n_mod[c]++] = (uint8_t)m;
  }
  int n_carriers = 0;
  for (int i = 0; i < kNumOps; ++i) n_carriers += is_carrier[i];
  if (n_carriers == 0) n_carriers = 1;
  const float carrier_norm = 1.0f / (float)n_carriers;

  float phase[kNumOps] = {0, 0, 0, 0, 0, 0};
  float op_out[kNumOps] = {0, 0, 0, 0, 0, 0};

  float amp_cur[kNumOps] = {0}, amp_step[kNumOps] = {0};
  bool note_off_sent = false;

  // Reference fadeout (synth/dexed.py:252-255): the last floor(0.1 * fs)
  // samples are scaled by linspace(1.0, 0.0, fade_samples) — the final
  // sample is exactly zero. Disabled when too short, as in the reference.
  const int fade_samples = (int)std::floor(0.1f * fs);
  const int fade_start = fade_samples > 1 ? n_samples - fade_samples : n_samples;

  for (int start = 0; start < n_samples; start += kBlock) {
    int blk = std::min(kBlock, n_samples - start);
    // --- control tick
    if (!note_off_sent && start >= note_off_sample) {
      for (int i = 0; i < kNumOps; ++i) eg[i].note_off();
      peg.note_off();
      note_off_sent = true;
    }
    // LFO at block rate
    float t_s = (float)start / fs;
    float lfo_ramp = lfo_delay_s > 0.0f
                         ? std::min(t_s / lfo_delay_s, 1.0f)
                         : 1.0f;
    lfo_phase += lfo_hz * tick_s;
    if (lfo_phase >= 1.0f) {
      lfo_phase -= std::floor(lfo_phase);
      // new S&H value on each LFO cycle
      sh_rng = sh_rng * 1664525u + 1013904223u;
      sh_value = ((float)(sh_rng >> 8) / 8388608.0f) - 1.0f;
    }
    float lfo = lfo_wave_value(g.lfo_wave, lfo_phase, sh_value) * lfo_ramp;

    // pitch factor: pitch EG + pitch LFO
    float peg_units = peg.tick();
    float pitch_semis = peg_units * peg_semis_per_unit + lfo * pmd * pms_semis;
    float pitch_fact = std::pow(2.0f, pitch_semis / 12.0f);

    // per-op amplitude for this block (linear), with per-sample interpolation
    for (int i = 0; i < kNumOps; ++i) {
      float eg_db = eg[i].tick();
      float am_db = -0.5f * (1.0f + lfo) * amd * kAmsDb[ops[i].amp_mod_sens];
      // total level saturates at 99 (0 dB) on the DX7 — key scaling and
      // velocity can only push a quiet operator up to full scale, not beyond
      float tot_db = std::min(eg_db + op_gain_db[i] + am_db, 0.0f);
      float a = ops[i].on ? db_to_lin(tot_db) : 0.0f;
      if (a < 1e-6f) a = 0.0f;
      amp_step[i] = (a - amp_cur[i]) / (float)blk;
    }

    // --- audio-rate inner loop
    for (int s = 0; s < blk; ++s) {
      int idx = start + s;
      float sample = 0.0f;
      // ops computed high-to-low so modulators are ready before carriers
      for (int i = kNumOps - 1; i >= 0; --i) {
        amp_cur[i] += amp_step[i];
        float mod = 0.0f;
        for (int k = 0; k < n_mod[i]; ++k) mod += op_out[mod_of[i][k]];
        if (i == fb_dst && fb_amt > 0.0f)
          mod += 0.5f * (fb_buf1 + fb_buf2) * fb_amt;
        phase[i] += op_freq[i] * pitch_fact / fs;
        if (phase[i] >= 1.0f) phase[i] -= std::floor(phase[i]);
        // mod is a phase offset in radians/2pi units scaled by index
        float ph = phase[i] + mod * (kModIndexMax / kTwoPi);
        float y = fast_sin(ph) * amp_cur[i];
        op_out[i] = y;
        if (i == fb_src) { fb_buf2 = fb_buf1; fb_buf1 = y; }
        if (is_carrier[i]) sample += y;
      }
      sample *= carrier_norm * g.master_volume;
      // bound the multi-carrier sum: per-op dB clamps don't bound the sum
      // after float rounding (output contract: |w| <= 1)
      sample = std::min(std::max(sample, -1.0f), 1.0f);
      if (idx >= fade_start)
        sample *= (float)(n_samples - 1 - idx) / (float)(fade_samples - 1);
      out[idx] = sample;
    }
  }
  return n_samples;
}

extern "C" int dx7_render_batch(const float* presets, int n, const int* pitches,
                                const int* velocities, float note_on_s,
                                float total_s, int sample_rate, float* out,
                                int n_threads) {
  if (!presets || !out || n <= 0) return -1;
  const int kEngineBlock = 512;
  const int len =
      ((int)(total_s * sample_rate) + kEngineBlock - 1) / kEngineBlock * kEngineBlock;
  if (n_threads <= 0)
    n_threads = (int)std::thread::hardware_concurrency();
  n_threads = std::max(1, std::min(n_threads, n));
  std::atomic<int> next(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      dx7_render(presets + (size_t)i * 155, pitches[i], velocities[i],
                 note_on_s, total_s, sample_rate, out + (size_t)i * len);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads - 1; ++t) threads.emplace_back(worker);
  worker();
  for (auto& th : threads) th.join();
  return len;
}
