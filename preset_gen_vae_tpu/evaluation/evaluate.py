"""Post-training evaluation pipeline (reference: eval.py:34-284).

For each saved run: reload its frozen config, rebuild the dataset, restore
the last checkpoint, infer synth presets over the chosen split, compute
parameter metrics (full + MIDI-key-dependent subsets), latent Spearman
correlation matrices, re-render audio from the inferred presets and score
audio similarity — then write ``eval_<split>.dataframe.pickle`` and the
``*_spearman_*.npy`` files into the run dir, exactly the reference's
artifact layout (eval.py:227-243).

TPU redesign: the reference infers with minibatch=1 and measures audio in
a process pool (eval.py:161-199); here inference runs batched on device,
audio renders through the native engine's thread pool, and all similarity
metrics are one batched jit call per minibatch.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from .. import config as cfg
from ..data import build as data_build
from ..data.pipeline import get_split_loaders
from ..logs import metrics as logmetrics
from ..logs.logger import get_run_dir, load_checkpoint
from ..losses.synth_params import (
    CategoricalParamsAccuracy,
    QuantizedNumericalParamsLoss,
)
from ..models import build as mbuild
from ..synth import dexed_params as dx
from ..training.train_step import create_train_state
from .similarity import batched_audio_errors


def _gt_audio_cached(dataset, renderer, info_cat: np.ndarray) -> np.ndarray:
    """Ground-truth audio for the eval items, from a disk cache (memmap)
    keyed by (item set, engine version, sample rate, note durations).

    First eval renders GT once through the C++ engine and stores f32;
    every later eval of the same split mmaps it — bit-identical to a fresh
    render (the engine is deterministic; engine semantic changes bump
    ``dx7_engine_version()`` which changes the key). Counterpart of the
    reference reading pre-rendered GT wavs (eval.py:257-259)."""
    import hashlib

    from ..synth.render import engine_version

    key_src = np.ascontiguousarray(info_cat, dtype=np.int64).tobytes() + (
        f"|v{engine_version()}|fs{renderer.Fs}"
        f"|nd{renderer.note_duration[0]}-{renderer.note_duration[1]}"
    ).encode()
    key = hashlib.sha1(key_src).hexdigest()[:16]
    cache_dir = dataset._corpus_cache_dir() / "gt_eval_audio"
    cache_dir.mkdir(parents=True, exist_ok=True)
    path = cache_dir / f"gt_{key}.npy"
    if path.exists():
        return np.load(path, mmap_mode="r")
    n = len(info_cat)
    out = np.empty((n, renderer.samples_per_render), dtype=np.float32)
    B = 256
    for s in range(0, n, B):
        ii = info_cat[s : s + B]
        presets = np.stack(
            [dataset.get_full_preset_params(int(u)) for u in ii[:, 0]]
        )
        out[s : s + len(ii)] = renderer.render_batch(
            presets, ii[:, 1], ii[:, 2]
        )
    tmp = path.with_suffix(".tmp.npy")
    np.save(tmp, out)
    tmp.rename(path)
    return out


def evaluate_all_models(
    eval_config: cfg.EvalConfig, saved_root="/root/repo/saved", dataset=None
) -> List[pd.DataFrame]:
    """(reference: eval.py:34-62) — iterates saved runs (+ k-fold
    expansion) and evaluates those without existing eval files."""
    out = []
    for base_name in eval_config.models_names:
        names = (
            [f"{base_name}_kf{k}" for k in range(eval_config.k_folds_count)]
            if eval_config.k_folds_count > 0
            else [base_name]
        )
        for name in names:
            model_name, run_name = name.split("/")
            run_dir = pathlib.Path(saved_root) / model_name / run_name
            pickle_path = run_dir / f"eval_{eval_config.dataset}.dataframe.pickle"
            if pickle_path.exists() and not eval_config.override_previous_eval:
                continue
            out.append(
                evaluate_model_from_dir(run_dir, eval_config, dataset=dataset)
            )
    return out


def evaluate_model_from_dir(run_dir, eval_config: cfg.EvalConfig, dataset=None):
    model_c, train_c = cfg.load_config(pathlib.Path(run_dir) / "config.json")
    return evaluate_model(model_c, train_c, eval_config, dataset=dataset)


def evaluate_model(
    model_config: cfg.ModelConfig,
    train_config: cfg.TrainConfig,
    eval_config: cfg.EvalConfig,
    dataset=None,
    render_audio: bool = True,
) -> pd.DataFrame:
    """(reference: eval.py:65-243)"""
    model_c, train_c = cfg.resolve(model_config, train_config)
    if dataset is None:
        dataset = data_build.get_dataset(model_c, train_c)
    model_c, train_c = cfg.resolve_with_dataset(model_c, train_c, dataset)
    model_c = dataclasses.replace(
        model_c,
        input_tensor_size=(
            train_c.minibatch_size,
            model_c.input_tensor_size[1],
            *dataset.get_spectrogram_tensor_size()[1:],
        ),
    )
    idx_helper = dataset.preset_indexes_helper
    loaders = get_split_loaders(dataset, train_c)
    loader = loaders[eval_config.dataset]

    # ---- model + checkpoint (eval.py:112-117)
    _, _, _, ext = mbuild.build_extended_ae_model(model_c, train_c, idx_helper)
    ckpt = load_checkpoint(model_c, eval_config.epoch)
    variables = mbuild.init_extended_ae(ext, 0, model_c.input_tensor_size)
    state = create_train_state(ext, variables, train_c)
    state = state.replace(
        params=ckpt["state_tree"]["params"],
        batch_stats=ckpt["state_tree"]["batch_stats"],
    )

    # ---- criteria (full + dynamic MIDI-key-dependent subset, eval.py:135-152)
    dynamic_vst_idx = dx.midi_key_related_param_indexes()
    num_mse = QuantizedNumericalParamsLoss(idx_helper, loss="mse")
    num_mae = QuantizedNumericalParamsLoss(idx_helper, loss="mae")
    num_mae_dyn = QuantizedNumericalParamsLoss(
        idx_helper, loss="mae", limited_vst_params_indexes=dynamic_vst_idx
    )
    acc = CategoricalParamsAccuracy(idx_helper)
    acc_dyn = CategoricalParamsAccuracy(
        idx_helper, limited_vst_params_indexes=dynamic_vst_idx
    )

    @jax.jit
    def infer(params, batch_stats, x, info):
        vs = {"params": params, "batch_stats": batch_stats}
        z0_mu_logvar, z0, zK, logdet, x_out, v_out = ext.apply(
            vs, x, info, train=False, method=ext.forward_full
        )
        return z0_mu_logvar[:, 0, :], zK, v_out

    # PGV_EVAL_TIMING=1: per-phase wall breakdown (observability for the
    # tunneled-chip round-trip analysis, BENCH.md round 3)
    import os as _os
    import time as _time
    _timing = _os.environ.get("PGV_EVAL_TIMING") == "1"
    _t_phase = _time.time()

    lat_z0 = logmetrics.LatentMetric(model_c.dim_z)
    lat_zK = logmetrics.LatentMetric(model_c.dim_z)
    rows: Dict[str, List] = {
        k: []
        for k in (
            "preset_UID", "midi_pitch", "midi_velocity", "num_eval_loss",
            "num_mae", "num_mae_dyn", "acc", "acc_dyn",
        )
    }
    v_out_all, info_all = [], []

    for x, v, info in loader.epoch_batches(0):
        out = infer(state.params, state.batch_stats, jnp.asarray(x),
                    jnp.asarray(info))
        # one round trip for all three outputs (vs three device_gets)
        mu, zK, v_out = (np.asarray(a) for a in jax.device_get(out))
        lat_z0.append(mu, mu)
        lat_zK.append(zK, zK)
        rows["preset_UID"] += list(info[:, 0])
        rows["midi_pitch"] += list(info[:, 1])
        rows["midi_velocity"] += list(info[:, 2])
        rows["num_eval_loss"] += list(np.asarray(num_mse.per_item(v_out, v)))
        rows["num_mae"] += list(np.asarray(num_mae.per_item(v_out, v)))
        rows["num_mae_dyn"] += list(np.asarray(num_mae_dyn.per_item(v_out, v)))
        rows["acc"] += list(np.asarray(acc.per_item(v_out, v)))
        rows["acc_dyn"] += list(np.asarray(acc_dyn.per_item(v_out, v)))
        v_out_all.append(v_out)
        info_all.append(info)

    df = pd.DataFrame(rows)
    # drop cyclic pad duplicates (pipeline pads the last batch)
    df = df[~df.duplicated(["preset_UID", "midi_pitch", "midi_velocity"])]
    if _timing:
        print(f"[eval] inference+param-metrics: {_time.time() - _t_phase:.1f}s",
              flush=True)
        _t_phase = _time.time()

    # ---- audio re-render + similarity (eval.py:190-203, 254-275)
    if render_audio:
        keep = ~pd.DataFrame(
            {
                "u": np.concatenate([i[:, 0] for i in info_all]),
                "p": np.concatenate([i[:, 1] for i in info_all]),
                "v": np.concatenate([i[:, 2] for i in info_all]),
            }
        ).duplicated().to_numpy()
        v_out_cat = np.concatenate(v_out_all)[keep]
        info_cat = np.concatenate(info_all)[keep]
        inferred_full = idx_helper.learnable_to_full_batch(v_out_cat)
        audio_metrics = {k: [] for k in ("spec_mae", "spec_sc",
                                         "mfcc13_mae", "mfcc40_mae")}
        # big audio batches: on tunneled accelerators each iteration pays
        # upload + dispatch + fetch round trips, so 256-item batches cut
        # the trip count 8x vs the round-2 hardcoded 32 (host RAM cost:
        # 2 x 256 x ~90k samples f32 = 180 MB, trivial)
        B = int(getattr(eval_config, "audio_batch_size", 256))
        renderer = dataset._renderer
        use_jax_render = (
            getattr(eval_config, "audio_render_backend", "cpp") == "jax"
        )
        if use_jax_render:
            # on-device batched render (synth/fm_jax.py): both GT and
            # inferred presets go through the SAME engine so the similarity
            # metrics measure preset error, not engine mismatch. Fidelity vs
            # the C++ engine depends on the feedback solve (measured by
            # tests/test_fm_jax.py): the default 'exact' matches within
            # ~2e-3 MAE / 15% max relative deviation; 'unrolled' fixed-point
            # approximation agrees with 'exact' within 0.05 MAE on
            # feedback-heavy presets (and is exact when feedback is 0).
            from ..synth import fm_jax

        feedback_mode = getattr(
            eval_config, "audio_render_feedback", "exact"
        )

        def _render(presets, pitches, vels):
            if use_jax_render:
                return fm_jax.render_batch(
                    jnp.asarray(presets), jnp.asarray(pitches),
                    jnp.asarray(vels),
                    note_on_s=float(renderer.note_duration[0]),
                    total_s=float(renderer.total_seconds),
                    sample_rate=renderer.Fs,
                    feedback=feedback_mode,
                )
            # threaded C++ batch render (reference used one VST process per
            # item in a multiprocessing.Pool, eval.py:190-199)
            return jnp.asarray(renderer.render_batch(presets, pitches, vels))

        # ---- ground-truth renders: served from a disk cache for the C++
        # backend — the engine is deterministic, so a cached render is
        # bit-identical to a fresh one, and GT was ~half of every eval's
        # render work. The reference likewise reads pre-rendered GT wavs
        # (eval.py:257-259). The 'jax' backend keeps same-engine re-render
        # so GT and inferred audio share one engine.
        gt_cache = None
        if (
            not use_jax_render
            and getattr(eval_config, "cache_gt_audio", True)
        ):
            gt_cache = _gt_audio_cached(dataset, renderer, info_cat)

        # Pipelined fetch: dispatches for batch i+1 go out BEFORE batch i's
        # metrics are fetched, so the downlink round trip overlaps the next
        # batch's device render — on tunneled chips the fetch RTT was a
        # serial per-batch cost (VERDICT r3 #6: jax-backend eval wall time).
        pending = None

        def _drain(errs):
            errs_h = jax.device_get(errs)
            for k in audio_metrics:
                audio_metrics[k] += list(np.asarray(errs_h[k]))

        for s in range(0, len(inferred_full), B):
            fi = inferred_full[s : s + B]
            ii = info_cat[s : s + B]
            if gt_cache is not None:
                gt = jnp.asarray(np.asarray(gt_cache[s : s + B]))
                est = _render(fi, ii[:, 1], ii[:, 2])
            elif use_jax_render:
                # GT + inferred in ONE render dispatch (halves the number
                # of long per-sample-scan kernels queued per batch)
                gt_presets = np.stack(
                    [dataset.get_full_preset_params(int(u)) for u in ii[:, 0]]
                )
                both = _render(
                    np.concatenate([gt_presets, fi]),
                    np.concatenate([ii[:, 1], ii[:, 1]]),
                    np.concatenate([ii[:, 2], ii[:, 2]]),
                )
                gt, est = both[: len(ii)], both[len(ii):]
            else:
                gt_presets = np.stack(
                    [dataset.get_full_preset_params(int(u)) for u in ii[:, 0]]
                )
                gt = _render(gt_presets, ii[:, 1], ii[:, 2])
                est = _render(fi, ii[:, 1], ii[:, 2])
            errs = batched_audio_errors(
                gt, est,
                model_c.stft_args[0], model_c.stft_args[1],
                model_c.sampling_rate,
            )
            # ONE fetch for all four metric vectors per batch (each
            # device_get is a full round trip on tunneled chips), deferred
            # by one batch so it overlaps the next dispatch
            if pending is not None:
                _drain(pending)
            pending = errs
        if pending is not None:
            _drain(pending)
        for k, vals in audio_metrics.items():
            df[k] = vals
        if _timing:
            print(f"[eval] render+similarity: {_time.time() - _t_phase:.1f}s",
                  flush=True)
            _t_phase = _time.time()

    # ---- multi-note per-UID aggregation (eval.py:211-224)
    df_agg = df.groupby("preset_UID", as_index=False).mean(numeric_only=True)

    # ---- artifacts (eval.py:227-243)
    run_dir = get_run_dir(model_c)
    if run_dir.exists():
        split = eval_config.dataset
        df.to_pickle(run_dir / f"eval_{split}.dataframe.pickle")
        np.save(run_dir / f"eval_{split}_z0_spearman_r.npy",
                lat_z0.get_spearman_corr())
        np.save(run_dir / f"eval_{split}_z0_spearman_p.npy",
                lat_z0.get_spearman_pvalues())
        np.save(run_dir / f"eval_{split}_zK_spearman_r.npy",
                lat_zK.get_spearman_corr())
        np.save(run_dir / f"eval_{split}_zK_spearman_p.npy",
                lat_zK.get_spearman_pvalues())
        # nanmean: spectral_convergence is NaN by convention for near-silent
        # ground truths (see similarity.py); a single silent preset must not
        # NaN the corpus-level summary. n_nan_* fields record how many items
        # were excluded per metric.
        num_cols = [k for k in df.columns
                    if k not in ("preset_UID", "midi_pitch", "midi_velocity")]
        nan_counts = {
            f"n_nan_{k}": int(df[k].isna().sum())
            for k in num_cols if df[k].isna().any()
        }
        with open(run_dir / f"eval_{split}_summary.json", "w") as f:
            json.dump(
                {
                    **{k: float(np.nanmean(df[k])) for k in num_cols},
                    **nan_counts,
                    "latent_entanglement_z0": lat_z0.get(),
                    "latent_entanglement_zK": lat_zK.get(),
                    "n_items": int(len(df)),
                },
                f, indent=2,
            )
    if _timing:
        print(f"[eval] aggregation+artifacts: {_time.time() - _t_phase:.1f}s",
              flush=True)
    return df_agg
