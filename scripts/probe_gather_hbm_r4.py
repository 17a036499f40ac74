"""Probe: can the K-step scan's corpus gather avoid corpus-scale temps?

Round-4 measurement: the 3-note stacked flagship at 16,384 presets OOM'd
at COMPILE (24.56G/15.75G) — XLA's layout assignment for the 4-D corpus
gather inside the K=16 `lax.scan` materializes a full-corpus layout copy
plus a corpus-shaped gather-slice temp (~2.7x the corpus argument in
steady state; scripts/run_stack3_v2_r4.py docstring).

Hypothesis: the copies come from gathering a 4-D operand whose minor
dims (257, 347) force a tiled relayout. Storing the corpus as 2-D rows
[P, C*H*W] and reshaping the gathered batch back to [B, C, H, W] makes
the gather a contiguous row dynamic-slice with an unambiguous layout.

This probe AOT-compiles the production scan step (same jit/donate/scan
structure as training/loop.py) against an ABSTRACT corpus
(jax.ShapeDtypeStruct — nothing is allocated) and prints XLA's
memory_analysis per variant:
  A: current 4-D gather  cx[idx]            (loop.py _gather)
  B: 2-D row gather      cx2[idx].reshape   (proposed)

Run on the TPU queue (compile-only; no corpus is materialized):
  python scripts/probe_gather_hbm_r4.py [P ...]
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
from preset_gen_vae_tpu.data.dexed_spec import build_dexed_preset_spec
from preset_gen_vae_tpu.data.preset import PresetIndexesHelper
from preset_gen_vae_tpu.models import build as mbuild
from preset_gen_vae_tpu.parallel import make_mesh
from preset_gen_vae_tpu.training import create_train_state, make_train_step

GIB = float(1 << 30)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [8192, 16384, 30720]

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
        dim_z=L,  # flow regression forces dim_z = L (config.py resolve_with_dataset)
    )

    _, _, _, ext = mbuild.build_extended_ae_model(model_c, train_c, helper)
    step = make_train_step(ext, model_c, train_c, helper)

    B = train_c.minibatch_size
    K = train_c.steps_per_dispatch
    C = len(model_c.midi_notes)
    H, W = model_c.spectrogram_size
    D = C * H * W

    mesh = make_mesh()
    batch_spec = NamedSharding(mesh, P("data"))

    # abstract train state: nothing allocated, shapes/dtypes only
    state_sds = jax.eval_shape(
        lambda: create_train_state(
            ext,
            mbuild.init_extended_ae(ext, 0, model_c.input_tensor_size),
            train_c,
        )
    )

    def _tail(st, idx, cv, ci, x, key, beta):
        v = jax.lax.with_sharding_constraint(
            cv[idx].astype(jnp.float32), batch_spec
        )
        info = jax.lax.with_sharding_constraint(ci[idx], batch_spec)
        return step(st, x, v, info, key, beta)

    def scan_a(state, cx, cv, ci, idx_k, key, beta):
        def body(st, idx):
            x = jax.lax.with_sharding_constraint(cx[idx], batch_spec)
            return _tail(st, idx, cv, ci, x, key, beta)

        return jax.lax.scan(body, state, idx_k)

    def scan_b(state, cx2, cv, ci, idx_k, key, beta):
        def body(st, idx):
            x = jax.lax.with_sharding_constraint(
                cx2[idx].reshape(B, C, H, W), batch_spec
            )
            return _tail(st, idx, cv, ci, x, key, beta)

        return jax.lax.scan(body, state, idx_k)

    # C: control — batches pre-gathered OUTSIDE the program; isolates the
    # train step's own temps from the gather's.
    def scan_c(state, xs, cv, ci, idx_k, key, beta):
        def body(st, xi):
            x, idx = xi
            return _tail(st, idx, cv, ci, x, key, beta)

        return jax.lax.scan(body, state, (xs, idx_k))

    # D: 4-D corpus with the lane dim pre-padded to a 128 multiple (384);
    # gather whole items, slice the pad off the batch.
    W_PAD = ((W + 127) // 128) * 128

    def scan_d(state, cxp, cv, ci, idx_k, key, beta):
        def body(st, idx):
            x = jax.lax.with_sharding_constraint(
                cxp[idx][:, :, :, :W], batch_spec
            )
            return _tail(st, idx, cv, ci, x, key, beta)

        return jax.lax.scan(body, state, idx_k)

    # E: 2-D rows padded to a 128 multiple; gather, slice, reshape.
    D_PAD = ((D + 127) // 128) * 128

    def scan_e(state, cx2p, cv, ci, idx_k, key, beta):
        def body(st, idx):
            x = jax.lax.with_sharding_constraint(
                cx2p[idx][:, :D].reshape(B, C, H, W), batch_spec
            )
            return _tail(st, idx, cv, ci, x, key, beta)

        return jax.lax.scan(body, state, idx_k)

    # F: column-chunked 2-D rows — each chunk a SEPARATE array with
    # < 2^32 elements (the int32-addressing limit that re-triggers the
    # chunked repack in E at 16k+) and 128-aligned columns; gather each
    # chunk, concat the batch.
    def _f_chunk_cols(Pn):
        n_chunks = max(1, -(-(Pn * D_PAD) // (1 << 31)))
        cols = -(-D_PAD // n_chunks)
        cols = ((cols + 127) // 128) * 128
        out = []
        left = D_PAD
        while left > 0:
            c = min(cols, left)
            out.append(c)
            left -= c
        return out

    def make_scan_f(Pn):
        cols = _f_chunk_cols(Pn)

        def scan_f(state, cxs, cv, ci, idx_k, key, beta):
            def body(st, idx):
                parts = [c[idx] for c in cxs]
                x2 = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
                x = jax.lax.with_sharding_constraint(
                    x2[:, :D].reshape(B, C, H, W), batch_spec
                )
                return _tail(st, idx, cv, ci, x, key, beta)

            return jax.lax.scan(body, state, idx_k)

        return scan_f, cols

    sds = jax.ShapeDtypeStruct
    key = sds((2,), jnp.uint32)
    beta = sds((), jnp.float32)
    idx_k = sds((K, B), jnp.int32)

    print(f"# B={B} K={K} C={C} H={H} W={W} D={D}")
    for Pn in sizes:
        cv = sds((Pn, L), jnp.float32)
        ci = sds((Pn, 3), jnp.int32)
        scan_f, f_cols = make_scan_f(Pn)
        for name, fn, cx in (
            ("A-4d      ", scan_a, sds((Pn, C, H, W), jnp.bfloat16)),
            ("B-2d      ", scan_b, sds((Pn, D), jnp.bfloat16)),
            ("C-control ", scan_c, sds((K, B, C, H, W), jnp.bfloat16)),
            ("D-4d-lane ", scan_d, sds((Pn, C, H, ((W + 127) // 128) * 128), jnp.bfloat16)),
            ("E-2d-row  ", scan_e, sds((Pn, ((D + 127) // 128) * 128), jnp.bfloat16)),
            (f"F-chunk{len(f_cols)}  ", scan_f,
             tuple(sds((Pn, c), jnp.bfloat16) for c in f_cols)),
        ):
            jit_fn = jax.jit(fn, donate_argnums=(0,))
            try:
                compiled = jit_fn.lower(
                    state_sds, cx, cv, ci, idx_k, key, beta
                ).compile()
                ma = compiled.memory_analysis()
                print(
                    f"P={Pn:6d} {name}: args={ma.argument_size_in_bytes / GIB:.2f}G "
                    f"temps={ma.temp_size_in_bytes / GIB:.2f}G "
                    f"out={ma.output_size_in_bytes / GIB:.2f}G "
                    f"total={(ma.argument_size_in_bytes + ma.temp_size_in_bytes + ma.output_size_in_bytes) / GIB:.2f}G"
                )
            except Exception as e:  # compile-time RESOURCE_EXHAUSTED
                msg = str(e).splitlines()[0][:160]
                print(f"P={Pn:6d} {name}: COMPILE FAILED — {msg}")


if __name__ == "__main__":
    main()
