"""Compile-only probe: the PRODUCTION chunked-corpus K-step train scan
(training/loop.py `_gather` + data/corpus_device.py layout) at full
3-note stacked flagship scale — the round-5 landing check for the
round-4 gather-HBM fix (VERDICT r4 #1).

Same AOT memory_analysis protocol as scripts/probe_gather_hbm_r4.py
(whose variant table picked this layout: saved/r5_gather_probe.log);
nothing is allocated — corpora are jax.ShapeDtypeStruct.

Run on the TPU queue:  python scripts/probe_prod_gather_r5.py [P ...]
"""

from __future__ import annotations

import dataclasses
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from jax.sharding import NamedSharding, PartitionSpec as P

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.data.corpus_device import (
    ChunkedDeviceCorpus,
    all_spans,
)
from preset_gen_vae_tpu.data.dexed_spec import build_dexed_preset_spec
from preset_gen_vae_tpu.data.preset import PresetIndexesHelper
from preset_gen_vae_tpu.models import build as mbuild
from preset_gen_vae_tpu.parallel import make_mesh
from preset_gen_vae_tpu.training import create_train_state, make_train_step

GIB = float(1 << 30)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [8192, 16384]

    model_c = cfg.ModelConfig(
        midi_notes=((40, 85), (50, 85), (60, 85)),
        stack_spectrograms=True,
    )
    train_c = cfg.TrainConfig(compute_dtype="bfloat16")
    model_c, train_c = cfg.resolve(model_c, train_c)
    helper = PresetIndexesHelper(build_dexed_preset_spec())
    L = helper.learnable_preset_size
    model_c = dataclasses.replace(
        model_c,
        synth_params_count=L,
        learnable_params_tensor_length=L,
        dim_z=L,
    )
    _, _, _, ext = mbuild.build_extended_ae_model(model_c, train_c, helper)
    step = make_train_step(ext, model_c, train_c, helper)

    B = train_c.minibatch_size
    K = train_c.steps_per_dispatch
    C = len(model_c.midi_notes)
    H, W = model_c.spectrogram_size

    mesh = make_mesh()
    batch_spec = NamedSharding(mesh, P("data"))
    state_sds = jax.eval_shape(
        lambda: create_train_state(
            ext,
            mbuild.init_extended_ae(ext, 0, model_c.input_tensor_size),
            train_c,
        )
    )
    sds = jax.ShapeDtypeStruct
    key = sds((2,), jnp.uint32)
    beta = sds((), jnp.float32)
    idx_k = sds((K, B), jnp.int32)

    print(f"# production scan: B={B} K={K} C={C} H={H} W={W}")
    for Pn in sizes:
        hw_pad, spans = all_spans(Pn, C, H * W)
        corpus = ChunkedDeviceCorpus(
            tuple(sds((Pn, w_), jnp.bfloat16) for (_n, _o, w_) in spans),
            Pn, C, H, W, hw_pad, spans,
        )
        cv = sds((Pn, L), jnp.float32)
        ci = sds((Pn, 3), jnp.int32)

        def _scan(state, cx, cv, ci, idx_k, key, beta):
            # mirrors training/loop.py _train_scan/_gather exactly
            def body(st, idx):
                x = jax.lax.with_sharding_constraint(
                    corpus.device_gather(cx, idx), batch_spec
                )
                v = jax.lax.with_sharding_constraint(
                    cv[idx].astype(jnp.float32), batch_spec
                )
                info = jax.lax.with_sharding_constraint(ci[idx], batch_spec)
                return step(st, x, v, info, key, beta)

            return jax.lax.scan(body, state, idx_k)

        try:
            compiled = (
                jax.jit(_scan, donate_argnums=(0,))
                .lower(state_sds, corpus.chunks, cv, ci, idx_k, key, beta)
                .compile()
            )
            ma = compiled.memory_analysis()
            tot = (ma.argument_size_in_bytes + ma.temp_size_in_bytes
                   + ma.output_size_in_bytes)
            print(
                f"P={Pn:6d} prod-chunk{len(spans)}: "
                f"args={ma.argument_size_in_bytes / GIB:.2f}G "
                f"temps={ma.temp_size_in_bytes / GIB:.2f}G "
                f"out={ma.output_size_in_bytes / GIB:.2f}G "
                f"total={tot / GIB:.2f}G"
            )
        except Exception as e:
            print(f"P={Pn:6d} prod: COMPILE FAILED — "
                  f"{str(e).splitlines()[0][:160]}")


if __name__ == "__main__":
    main()
