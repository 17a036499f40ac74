// DX7-compatible 6-operator FM synthesis engine.
//
// TPU-build replacement for the reference's two native binaries
// (librenderman.so JUCE VST host + Dexed.so DX7-clone plugin; reference:
// synth/dexed.py:27,220-259). Role contract: a 155-parameter normalized
// Dexed preset vector + one MIDI note (pitch, velocity, note-on duration,
// total duration) -> mono float PCM, deterministic, no external plugin.
//
// Parameter layout (matches preset_gen_vae_tpu/synth/dexed_params.py and
// the reference metadata tables, synth/dexed.py:385-452):
//   0 cutoff  1 resonance  2 output  3 master tune
//   4 algorithm(32)  5 feedback(8)  6 osc key sync(2)
//   7 lfo speed  8 lfo delay  9 lfo pm depth  10 lfo am depth
//   11 lfo key sync(2)  12 lfo wave(6)  13 transpose  14 pitch mod sens(8)
//   15..22 pitch EG rates 1-4 then levels 1-4
//   23+22*i+k, i in 0..5: operator block (EG r1-4 l1-4, out level, mode,
//     coarse, fine, detune, breakpoint, l/r depth, l/r curve, rate scaling,
//     amp mod sens, key velocity, switch)
//
// The DSP is an original implementation of the publicly-documented DX7
// synthesis model (6 sine operators, 32 routing algorithms, per-op
// rate/level envelopes, key scaling, one feedback loop, global LFO).

#pragma once

#include <cstdint>

extern "C" {

// Number of samples one render writes: `total_s * sample_rate` rounded UP
// to the engine's 512-sample block (reproduces the reference's whole-buffer
// render length; synth/dexed.py:234, config.py:45-46). Size `out` buffers
// with this. Returns -1 on invalid arguments.
int dx7_samples_per_render(float total_s, int sample_rate);

// Renders one MIDI note. `out` must hold `dx7_samples_per_render(total_s,
// sample_rate)` samples — NOT the truncated `total_s * sample_rate`; the
// write length rounds up to a whole 512-sample block. Returns the number of
// samples written, or -1 on error.
int dx7_render(const float* preset155, int midi_pitch, int midi_velocity,
               float note_on_s, float total_s, int sample_rate, float* out);

// Batch render with a thread pool: presets is (n, 155) row-major,
// out is (n, samples_per_render) row-major. pitches/velocities length n.
// Returns samples_per_render, or -1 on error.
int dx7_render_batch(const float* presets, int n, const int* pitches,
                     const int* velocities, float note_on_s, float total_s,
                     int sample_rate, float* out, int n_threads);

// Engine version tag (bump when DSP changes invalidate cached renders —
// the render-constraints sidecar of the dataset layer records it;
// reference analog: dexeddataset.py:313-328).
int dx7_engine_version();
}
