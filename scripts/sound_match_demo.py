"""Sound-matching by gradient descent THROUGH the synthesizer — a
capability demo of the differentiable JAX FM engine (synth/fm_jax.py).

The reference frames synth programming purely as supervised preset
regression (its VST render is a black box). With the engine differentiable,
a preset can also be optimized directly against a target sound with a
spectral loss — here: start from a detuned/muted corruption of a structured
preset and recover the target's log-mel spectrogram by Adam on the
continuous preset parameters.

Prints one JSON line: initial/final spectral loss + wall time.
Run: python scripts/sound_match_demo.py  (CPU or TPU)
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from preset_gen_vae_tpu.synth import fm_jax
from preset_gen_vae_tpu.synth.database import generate_structured_corpus

SR = 22050
NOTE_ON, TOTAL = 1.0, 1.5
STEPS = 400


def _mag(w, n_fft, hop):
    frames = jnp.stack(
        [w[:, s : s + n_fft] for s in range(0, w.shape[1] - n_fft, hop)],
        axis=1,
    )
    win = jnp.asarray(np.hanning(n_fft).astype(np.float32))
    return jnp.log1p(jnp.abs(jnp.fft.rfft(frames * win, axis=-1)))


def spec_loss(w, targets):
    """Multi-resolution log-magnitude loss (the DDSP recipe): the coarse
    scale gives smooth gradients when partials are misaligned, the fine
    scale sharpens the fit."""
    return sum(
        jnp.mean(jnp.square(_mag(w, n, h) - t))
        for (n, h), t in zip(SCALES, targets)
    )


SCALES = ((1024, 256), (256, 64))


def main() -> None:
    p_target, _, _ = generate_structured_corpus(1, seed=33)
    p_target = jnp.asarray(p_target)
    pitches, vels = jnp.array([60]), jnp.array([95])

    def render(p):
        return fm_jax.render_batch(
            p, pitches, vels, note_on_s=NOTE_ON, total_s=TOTAL,
            sample_rate=SR, feedback="unrolled", fb_iters=3,
        )

    targets = [_mag(render(p_target), n, h) for (n, h) in SCALES]

    # corrupt the timbre: mute/bend output levels and EG level shapes
    p = np.asarray(p_target).copy()
    mask = np.zeros((1, p.shape[1]), dtype=np.float32)
    for op in range(6):
        b = 23 + 22 * op
        p[:, b + 8] *= 0.5                       # output level
        p[:, b + 4 : b + 8] *= 0.6               # EG levels
        mask[:, b + 4 : b + 9] = 1.0             # optimize exactly these
    p = jnp.asarray(p)
    mask = jnp.asarray(mask)

    def loss_fn(p):
        return spec_loss(render(p), targets)

    opt = optax.adam(
        optax.cosine_decay_schedule(2e-2, STEPS, alpha=0.02)
    )
    state = opt.init(p)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g * mask, s, p)
        return optax.apply_updates(p, updates * mask), s, loss

    l0 = float(loss_fn(p))
    t0 = time.time()
    for i in range(STEPS):
        p, state, loss = step(p, state)
    l1 = float(loss)
    print(json.dumps({
        "demo": "sound_match_through_synth",
        "steps": STEPS,
        "initial_spectral_mse": round(l0, 5),
        "final_spectral_mse": round(l1, 5),
        "reduction": round(l0 / max(l1, 1e-9), 1),
        "wall_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
