"""Golden tests: the differentiable JAX FM engine (synth/fm_jax.py) against
the C++ engine (csrc/dx7) it mirrors, plus render-contract and gradient
checks. Short renders keep the per-sample 'exact' scan cheap on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from preset_gen_vae_tpu.synth import fm_jax
from preset_gen_vae_tpu.synth.database import generate_structured_corpus
from preset_gen_vae_tpu.synth.render import DexedRenderer, engine_available
from preset_gen_vae_tpu.synth import dexed_params as dx

pytestmark = pytest.mark.skipif(
    not engine_available(), reason="libdx7.so not built"
)

SR = 22050
NOTE_ON, TOTAL = 0.5, 0.75  # short render: 16896 samples


def _presets(n, seed=7):
    p, _, _ = generate_structured_corpus(n, seed=seed)
    return p


def _cpp_render(presets, pitches, vels):
    r = DexedRenderer(sample_rate=SR, note_duration=(NOTE_ON, TOTAL - NOTE_ON))
    return r.render_batch(presets, pitches, vels)


@pytest.mark.slow
def test_exact_mode_matches_cpp_engine():
    """feedback='exact' reproduces the C++ engine across mixed structured
    presets (all laws: EG, LFO, key scaling, velocity, feedback, fadeout)."""
    n = 8
    p = _presets(n)
    pitches = np.array([60, 60, 48, 72, 60, 67, 55, 60], dtype=np.int32)
    vels = np.array([85, 100, 85, 85, 64, 85, 110, 85], dtype=np.int32)
    ref = _cpp_render(p, pitches, vels)
    out = np.asarray(
        fm_jax.render_batch(
            jnp.asarray(p), jnp.asarray(pitches), jnp.asarray(vels),
            note_on_s=NOTE_ON, total_s=TOTAL, sample_rate=SR,
            feedback="exact",
        )
    )
    assert out.shape == ref.shape
    mae = np.abs(out - ref).mean()
    # f32 phase accumulation orders differ slightly (C++ per-sample wrap vs
    # block-carried); energy-normalized error must be small
    rel = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert mae < 2e-3, f"MAE {mae}"
    assert rel < 0.15, f"max rel dev {rel}"


@pytest.mark.slow
def test_unrolled_matches_exact():
    """The vectorized unrolled-feedback path converges to the exact scan;
    presets with feedback=0 must match it to float tolerance."""
    n = 6
    p = _presets(n, seed=11)
    p_nofb = p.copy()
    p_nofb[:, 5] = 0.0  # global feedback param -> 0
    pitches = np.full((n,), 60, np.int32)
    vels = np.full((n,), 85, np.int32)

    for arr, tol in ((p_nofb, 1e-5), (p, 0.05)):
        exact = np.asarray(
            fm_jax.render_batch(
                jnp.asarray(arr), jnp.asarray(pitches), jnp.asarray(vels),
                note_on_s=NOTE_ON, total_s=TOTAL, sample_rate=SR,
                feedback="exact",
            )
        )
        unrolled = np.asarray(
            fm_jax.render_batch(
                jnp.asarray(arr), jnp.asarray(pitches), jnp.asarray(vels),
                note_on_s=NOTE_ON, total_s=TOTAL, sample_rate=SR,
                feedback="unrolled", fb_iters=8,
            )
        )
        assert np.abs(exact - unrolled).mean() < tol


def test_render_contract():
    """|w| <= 1, exact-zero final sample (fadeout), deterministic."""
    n = 4
    p = _presets(n, seed=3)
    pitches = np.full((n,), 60, np.int32)
    vels = np.full((n,), 100, np.int32)
    out = np.asarray(
        fm_jax.render_batch(
            jnp.asarray(p), jnp.asarray(pitches), jnp.asarray(vels),
            note_on_s=NOTE_ON, total_s=TOTAL, sample_rate=SR,
        )
    )
    assert out.shape[1] == fm_jax.samples_per_render(TOTAL, SR)
    assert np.all(np.abs(out) <= 1.0 + 1e-6)
    assert np.all(out[:, -1] == 0.0)
    out2 = np.asarray(
        fm_jax.render_batch(
            jnp.asarray(p), jnp.asarray(pitches), jnp.asarray(vels),
            note_on_s=NOTE_ON, total_s=TOTAL, sample_rate=SR,
        )
    )
    np.testing.assert_array_equal(out, out2)


@pytest.mark.slow
def test_differentiable_through_audio():
    """Gradient of a waveform loss flows to continuous preset params (the
    capability the reference's VST render fundamentally lacks)."""
    n = 2
    p = jnp.asarray(_presets(n, seed=5))
    pitches = jnp.full((n,), 60, jnp.int32)
    vels = jnp.full((n,), 85, jnp.int32)

    def loss(presets):
        w = fm_jax.render_batch(
            presets, pitches, vels,
            note_on_s=NOTE_ON, total_s=TOTAL, sample_rate=SR,
            feedback="unrolled", fb_iters=2,
        )
        return jnp.mean(jnp.square(w))

    g = jax.grad(loss)(p)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    # output-level and EG-level entries of at least one op must get signal
    lvl_cols = [23 + 22 * op + 8 for op in range(6)]
    assert np.abs(g[:, lvl_cols]).max() > 0.0


def _mag_spec(w):
    """Coarse magnitude STFT (frame 512 / hop 128, Hann) — phase-invariant
    audio loss surface; raw waveform MSE is pathological for FM."""
    frames = jnp.stack(
        [w[:, s : s + 512] for s in range(0, w.shape[1] - 512, 128)], axis=1
    )
    win = jnp.asarray(np.hanning(512).astype(np.float32))
    return jnp.log1p(jnp.abs(jnp.fft.rfft(frames * win, axis=-1)))


@pytest.mark.slow
def test_gradient_descends_to_target_audio():
    """Adam on operator levels reduces a spectral match-the-target loss:
    end-to-end optimization through the synth."""
    import optax

    p0 = jnp.asarray(_presets(1, seed=21))
    target = _mag_spec(fm_jax.render_batch(
        p0, jnp.array([60]), jnp.array([85]),
        note_on_s=NOTE_ON, total_s=TOTAL, sample_rate=SR,
        feedback="unrolled", fb_iters=2,
    ))
    # perturb the output levels, then recover by gradient descent
    lvl_cols = np.array([23 + 22 * op + 8 for op in range(6)])
    p = p0.at[:, lvl_cols].multiply(0.6)

    def loss(presets):
        w = fm_jax.render_batch(
            presets, jnp.array([60]), jnp.array([85]),
            note_on_s=NOTE_ON, total_s=TOTAL, sample_rate=SR,
            feedback="unrolled", fb_iters=2,
        )
        return jnp.mean(jnp.square(_mag_spec(w) - target))

    opt = optax.adam(2e-2)
    state = opt.init(p)
    l0 = float(loss(p))

    @jax.jit
    def step(p, s):
        g = jax.grad(loss)(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s

    for _ in range(40):
        p, state = step(p, state)
    l1 = float(loss(p))
    assert l1 < 0.5 * l0, f"loss {l0} -> {l1}"
