"""Companion to probe_gather_hbm_r4: writes the optimized HLO of the
K=16 scan step (variant A, current 4-D gather) at a given corpus size to
/tmp/scanA_P{P}.hlo so the corpus-scale temps can be attributed to
specific ops (the axon tunnel compiles remotely — --xla_dump_to is not
usable here)."""

from __future__ import annotations

import dataclasses
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from jax.sharding import NamedSharding, PartitionSpec as P

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.data.dexed_spec import build_dexed_preset_spec
from preset_gen_vae_tpu.data.preset import PresetIndexesHelper
from preset_gen_vae_tpu.models import build as mbuild
from preset_gen_vae_tpu.parallel import make_mesh
from preset_gen_vae_tpu.training import create_train_state, make_train_step


def main() -> None:
    Pn = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    variant = sys.argv[2] if len(sys.argv) > 2 else "a"

    model_c = cfg.ModelConfig(
        midi_notes=((40, 85), (50, 85), (60, 85)), stack_spectrograms=True
    )
    train_c = cfg.TrainConfig(compute_dtype="bfloat16")
    model_c, train_c = cfg.resolve(model_c, train_c)
    helper = PresetIndexesHelper(build_dexed_preset_spec())
    L = helper.learnable_preset_size
    model_c = dataclasses.replace(
        model_c, synth_params_count=L, learnable_params_tensor_length=L, dim_z=L
    )
    _, _, _, ext = mbuild.build_extended_ae_model(model_c, train_c, helper)
    step = make_train_step(ext, model_c, train_c, helper)

    B, K = train_c.minibatch_size, train_c.steps_per_dispatch
    C = len(model_c.midi_notes)
    H, W = model_c.spectrogram_size
    mesh = make_mesh()
    batch_spec = NamedSharding(mesh, P("data"))

    state_sds = jax.eval_shape(
        lambda: create_train_state(
            ext, mbuild.init_extended_ae(ext, 0, model_c.input_tensor_size), train_c
        )
    )

    def scan_a(state, cx, cv, ci, idx_k, key, beta):
        def body(st, idx):
            x = jax.lax.with_sharding_constraint(cx[idx], batch_spec)
            v = jax.lax.with_sharding_constraint(
                cv[idx].astype(jnp.float32), batch_spec
            )
            info = jax.lax.with_sharding_constraint(ci[idx], batch_spec)
            return step(st, x, v, info, key, beta)

        return jax.lax.scan(body, state, idx_k)

    def scan_b(state, cx2, cv, ci, idx_k, key, beta):
        def body(st, idx):
            x = jax.lax.with_sharding_constraint(
                cx2[idx].reshape(B, C, H, W), batch_spec
            )
            v = jax.lax.with_sharding_constraint(
                cv[idx].astype(jnp.float32), batch_spec
            )
            info = jax.lax.with_sharding_constraint(ci[idx], batch_spec)
            return step(st, x, v, info, key, beta)

        return jax.lax.scan(body, state, idx_k)

    sds = jax.ShapeDtypeStruct
    D_PAD = ((C * H * W + 127) // 128) * 128

    def scan_e(state, cx2p, cv, ci, idx_k, key, beta):
        def body(st, idx):
            x = jax.lax.with_sharding_constraint(
                cx2p[idx][:, : C * H * W].reshape(B, C, H, W), batch_spec
            )
            v = jax.lax.with_sharding_constraint(
                cv[idx].astype(jnp.float32), batch_spec
            )
            info = jax.lax.with_sharding_constraint(ci[idx], batch_spec)
            return step(st, x, v, info, key, beta)

        return jax.lax.scan(body, state, idx_k)

    if variant == "a":
        fn, cx = scan_a, sds((Pn, C, H, W), jnp.bfloat16)
    elif variant == "e":
        fn, cx = scan_e, sds((Pn, D_PAD), jnp.bfloat16)
    else:
        fn, cx = scan_b, sds((Pn, C * H * W), jnp.bfloat16)
    compiled = (
        jax.jit(fn, donate_argnums=(0,))
        .lower(
            state_sds,
            cx,
            sds((Pn, L), jnp.float32),
            sds((Pn, 3), jnp.int32),
            sds((K, B), jnp.int32),
            sds((2,), jnp.uint32),
            sds((), jnp.float32),
        )
        .compile()
    )
    out = f"/tmp/scan{variant.upper()}_P{Pn}.hlo"
    with open(out, "w") as f:
        f.write(compiled.as_text())
    print("wrote", out)


if __name__ == "__main__":
    main()
