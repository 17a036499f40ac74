"""Preset dataset abstraction.

Role of the reference's ``PresetDataset`` torch Dataset ABC
(reference: data/abstractbasedataset.py:25-409) redesigned TPU-first:

- item = (spectrogram stack, learnable params, [UID, pitch, vel], labels) —
  same contract as reference ``__getitem__`` (abstractbasedataset.py:101-145);
- but the primary access path is the **whole-corpus tensor**: audio is
  rendered in native-threaded batches, spectrograms are computed *on device*
  in batched jit calls (the reference computes per-item torch.stft inside
  DataLoader worker processes), and the normalized corpus is cached as a
  memmap so subsequent runs map it straight into the input pipeline;
- normalization statistics are one device reduction instead of the
  reference's ~3-minute CPU pass (dexeddataset.py:341);
- multi-note handling: stacked channels vs. dataset-size multiplication
  (abstractbasedataset.py:95-119).
"""

from __future__ import annotations

import json
import pathlib
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..ops.spectrogram import SpectrogramConfig, SpectrogramProcessor
from .preset import PresetIndexesHelper


def default_data_root() -> pathlib.Path:
    import os

    return pathlib.Path(
        os.environ.get("PGV_TPU_DATA_DIR", "/root/repo/data_cache")
    )


class PresetDataset:
    """Base class; subclasses provide presets + audio rendering."""

    def __init__(
        self,
        note_duration: Tuple[float, float] = (3.0, 1.0),
        n_fft: int = 1024,
        fft_hop: int = 256,
        midi_notes: Tuple[Tuple[int, int], ...] = ((60, 85),),
        multichannel_stacked_spectrograms: bool = False,
        n_mel_bins: int = 257,
        spectrogram_min_dB: float = -120.0,
        spectrogram_normalization: Optional[str] = "min_max",
        sample_rate: int = 22050,
        data_root=None,
    ):
        self.note_duration = tuple(note_duration)
        self.midi_notes = tuple(tuple(n) for n in midi_notes)
        self._stacked = multichannel_stacked_spectrograms and len(self.midi_notes) > 1
        self.n_mel_bins = n_mel_bins
        self.spectrogram_normalization = spectrogram_normalization
        self.sample_rate = int(sample_rate)
        self.spectrogram = SpectrogramProcessor(
            SpectrogramConfig(
                n_fft=n_fft,
                fft_hop=fft_hop,
                min_dB=spectrogram_min_dB,
                n_mel_bins=n_mel_bins,
                sample_rate=sample_rate,
            )
        )
        self.data_root = pathlib.Path(data_root) if data_root else default_data_root()
        self._spec_cache: Optional[np.ndarray] = None  # (N_presets, n_notes, H, W)
        # ChunkedDeviceCorpus (corpus_device.py), corpus_cache_policy='device'
        self._spec_cache_device = None
        self.spec_stats: Optional[Dict[str, float]] = None

    # ------------------------------------------------------------------
    # Abstract surface (subclass responsibilities)
    # ------------------------------------------------------------------
    @property
    def synth_name(self) -> str:
        raise NotImplementedError

    @property
    def total_nb_presets(self) -> int:
        raise NotImplementedError

    @property
    def valid_preset_UIDs(self) -> np.ndarray:
        raise NotImplementedError

    @property
    def preset_indexes_helper(self) -> PresetIndexesHelper:
        raise NotImplementedError

    def get_full_preset_params(self, preset_UID: int) -> np.ndarray:
        """(155,) normalized preset."""
        raise NotImplementedError

    def render_audio_batch(
        self, presets: np.ndarray, midi_pitch: int, midi_velocity: int
    ) -> np.ndarray:
        """(N, 155) -> (N, samples)."""
        raise NotImplementedError

    def get_labels_tensor(self, preset_UID: int) -> np.ndarray:
        raise NotImplementedError

    # ------------------------------------------------------------------
    # Item addressing (reference: abstractbasedataset.py:95-119)
    # ------------------------------------------------------------------
    @property
    def valid_presets_count(self) -> int:
        return len(self.valid_preset_UIDs)

    @property
    def midi_notes_per_preset(self) -> int:
        return len(self.midi_notes)

    @property
    def multichannel_stacked_spectrograms(self) -> bool:
        return self._stacked

    def __len__(self):
        if self._stacked:
            return self.valid_presets_count
        return self.valid_presets_count * self.midi_notes_per_preset

    def _demux(self, i: int) -> Tuple[int, List[int]]:
        if self.midi_notes_per_preset > 1 and not self._stacked:
            return i // self.midi_notes_per_preset, [i % self.midi_notes_per_preset]
        return i, list(range(self.midi_notes_per_preset))

    # ------------------------------------------------------------------
    # Corpus-level spectrogram computation + normalization stats
    # ------------------------------------------------------------------
    @property
    def samples_per_render(self) -> int:
        # rounded up to the 512-sample render block (reference audio length
        # comes from whole RenderMan buffers: 88576 samples -> 347 frames)
        n = int(sum(self.note_duration) * self.sample_rate)
        return (n + 511) // 512 * 512

    def _corpus_cache_dir(self) -> pathlib.Path:
        d = self.data_root / self.synth_name.lower() / self._corpus_tag()
        d.mkdir(parents=True, exist_ok=True)
        return d

    def _corpus_tag(self) -> str:
        """Subclasses refine; names the render/spectrogram cache."""
        notes = "-".join(f"{p}.{v}" for p, v in self.midi_notes)
        return (
            f"sr{self.sample_rate}_nd{self.note_duration[0]}-{self.note_duration[1]}"
            f"_mel{self.n_mel_bins}_n{self.valid_presets_count}_notes{notes}"
        )

    def _compute_spec_corpus(self, chunk: int = 64) -> np.ndarray:
        """Renders + transforms the whole corpus, on device, chunked.
        Returns raw (pre-normalization) log spectrograms
        (N_presets, n_notes, H, W) — float32 for the host-render backends,
        float16 for the fully-on-device 'jax' backend (whose exact f32
        corpus stats land in ``self._device_spec_stats``)."""
        import jax
        import jax.numpy as jnp

        import os

        uids = self.valid_preset_UIDs
        presets = np.stack([self.get_full_preset_params(u) for u in uids])
        outs = []
        # Where to run the spectrogram transform:
        #   - On a TPU VM (accelerator local to the host), the fused Pallas
        #     kernel is fastest — opt in with PGV_SPEC_ON_ACCELERATOR=1.
        #   - Default: host CPU backend. The corpus pass round-trips the
        #     whole spectrogram corpus device->host for the disk cache, and
        #     on tunneled/remote-accelerator setups that readback is the
        #     bottleneck (measured ~0.3-20 MB/s vs 210 MB/s host->device
        #     here); host->device then pays only the one fast upload when
        #     the training pipeline pins the corpus into HBM.
        on_accel = (
            os.environ.get("PGV_SPEC_ON_ACCELERATOR", "0") == "1"
            and jax.devices()[0].platform == "tpu"
        )
        # 'jax' corpus render backend (DexedDataset kwarg): render AND
        # transform fused in one device program per chunk — no host audio.
        # Pads the tail chunk so one compiled shape serves the whole pass.
        # On a tunneled accelerator the pass is DOWNLINK-bound (the raw
        # corpus is ~11 GB f32 at 30k presets vs a ~0.3-20 MB/s down
        # direction), so three things keep that direction minimal:
        #   - corpus min/max/mean/std accumulate ON DEVICE in f32 (exact,
        #     pre-quantization; the padded tail rows are mask-weighted
        #     out), so stats never need the f32 tensor on the host;
        #   - the spectrogram block is fetched as fp16 (half the bytes;
        #     log-mel magnitudes ~10 keep fp16 abs error ~5e-3, far inside
        #     the jax-vs-cpp engine tolerance of tests/test_corpus_jax_render.py,
        #     and the training cache tier is fp16 anyway);
        #   - the fetch of chunk i is overlapped with the async-dispatched
        #     device compute of chunk i+1.
        jax_render = getattr(self, "corpus_render_backend", "cpp") == "jax"
        if jax_render:
            import math

            import jax.numpy as jnp

            fused = self._fused_render_spec_fn(chunk)
            stats_acc = {"mn": math.inf, "mx": -math.inf,
                         "s": 0.0, "ss": 0.0, "n": 0}
            pending = None  # (device (spec_fp16, stats4), n_real)

            def _drain(note_out):
                out, n_real = pending
                sp16, st4 = out
                note_out.append(np.asarray(sp16[:n_real]))
                st = np.asarray(st4, dtype=np.float64)
                stats_acc["mn"] = min(stats_acc["mn"], float(st[0]))
                stats_acc["mx"] = max(stats_acc["mx"], float(st[1]))
                stats_acc["s"] += float(st[2])
                stats_acc["ss"] += float(st[3])
                stats_acc["n"] += n_real * int(sp16.shape[1] * sp16.shape[2])
        elif on_accel:
            from ..ops.pallas_mel import PallasSpectrogramProcessor

            spec_fn = PallasSpectrogramProcessor(self.spectrogram.config)
            device = jax.devices()[0]
        else:
            device = jax.local_devices(backend="cpu")[0]
            # jit outputs follow the (device_put) placement of the inputs
            spec_fn = jax.jit(self.spectrogram.__call__)
        for note_i, (pitch, vel) in enumerate(self.midi_notes):
            note_specs = []
            for s in range(0, len(uids), chunk):
                if jax_render:
                    p_chunk = presets[s : s + chunk]
                    n_real = p_chunk.shape[0]
                    if n_real < chunk:  # pad tail to the compiled shape
                        p_chunk = np.concatenate(
                            [p_chunk,
                             np.tile(p_chunk[-1:], (chunk - n_real, 1))]
                        )
                    w = np.zeros((chunk,), np.float32)
                    w[:n_real] = 1.0
                    out = fused(
                        jnp.asarray(p_chunk),
                        jnp.full((chunk,), pitch, jnp.int32),
                        jnp.full((chunk,), vel, jnp.int32),
                        jnp.asarray(w),
                    )  # async dispatch: device starts on this chunk now
                    if pending is not None:
                        _drain(note_specs)  # fetch previous while it runs
                    pending = (out, n_real)
                    continue
                wav = self.render_audio_batch(
                    presets[s : s + chunk], pitch, vel
                )
                note_specs.append(
                    np.asarray(spec_fn(jax.device_put(wav, device)))
                )
            if jax_render and pending is not None:
                _drain(note_specs)
                pending = None
            outs.append(np.concatenate(note_specs, axis=0))
        if jax_render:
            mean = stats_acc["s"] / stats_acc["n"]
            var = stats_acc["ss"] / stats_acc["n"] - mean * mean
            self._device_spec_stats = {
                "min": float(stats_acc["mn"]),
                "max": float(stats_acc["mx"]),
                "mean": float(mean),
                "std": float(math.sqrt(max(var, 0.0))),
            }
        return np.stack(outs, axis=1)  # (N, n_notes, H, W)

    def _compute_stats(self, specs: np.ndarray) -> Dict[str, float]:
        """Corpus-level normalization stats (reference:
        abstractbasedataset.py:348-391 computes per-preset CSV + corpus
        JSON; the corpus-level values are what normalization consumes)."""
        return {
            "min": float(specs.min()),
            "max": float(specs.max()),
            "mean": float(specs.mean()),
            "std": float(specs.std()),
        }

    def generate_wav_files(self, out_dir=None, n_threads: int = 0) -> int:
        """Reference-parity wav-corpus export (dexeddataset.py:278-311):
        writes one 16-bit wav per (preset, MIDI note). The TPU pipeline does
        NOT need these files (audio renders in-process and spectrograms are
        cached as arrays); this exists for tooling that consumed the
        reference's pre-rendered corpus."""
        from ..utils.audio_io import write_wav

        out_dir = pathlib.Path(out_dir) if out_dir else self._corpus_cache_dir() / "wav"
        out_dir.mkdir(parents=True, exist_ok=True)
        uids = self.valid_preset_UIDs
        presets = np.stack([self.get_full_preset_params(u) for u in uids])
        count = 0
        for pitch, vel in self.midi_notes:
            wavs = self.render_audio_batch(presets, pitch, vel)
            for uid, w in zip(uids, wavs):
                write_wav(
                    out_dir / f"preset{int(uid):06d}_pitch{pitch:03d}"
                              f"_vel{vel:03d}.wav",
                    w, self.sample_rate,
                )
                count += 1
        return count

    def compute_and_store_spectrograms_stats(self) -> Dict[str, float]:
        """Reference-parity stats pass (abstractbasedataset.py:348-391):
        per-preset min/max/mean/var CSV + corpus-level JSON. The reference
        took ~3 min of CPU for 30k presets; here the corpus pass is the
        same device computation that builds the training tensors."""
        raw = np.asarray(self._compute_spec_corpus())
        self.spec_stats = (
            getattr(self, "_device_spec_stats", None)
            or self._compute_stats(raw)
        )
        d = self._corpus_cache_dir()
        per = raw.reshape(raw.shape[0], -1)
        import csv

        with open(d / "spectrograms_stats.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["UID", "min", "max", "mean", "var"])
            for uid, row in zip(self.valid_preset_UIDs, per):
                w.writerow([int(uid), row.min(), row.max(), row.mean(), row.var()])
        with open(d / "spec_stats.json", "w") as f:
            json.dump(self.spec_stats, f)
        np.save(d / "specs_raw.npy", raw)
        return self.spec_stats

    def load_spectrogram_corpus(self, force_recompute: bool = False) -> np.ndarray:
        """Memoized + disk-cached normalized spectrogram corpus
        (N_presets, n_notes, H, W) float32.

        Two cache tiers: ``specs_raw.npy`` (pre-normalization — f32 for
        the host render backends, fp16 for the 'jax' backend whose exact
        f32 stats are device-reduced before the fp16 fetch; the tier's
        dtype+stats provenance is pinned by the render-constraints
        sidecar, ``raw_tier`` key) and ``specs_norm_f16.npy``
        (normalized, fp16). Reloads read the fp16 tier: half the disk IO
        and no normalize pass — a 30k corpus reload drops from ~6 min to
        ~1.5 min on a 1-core host. fp16 carries 11 mantissa bits on the
        [-1, 1] normalized range, well beyond the bf16 the training step
        casts to anyway."""
        if self._spec_cache is not None and not force_recompute:
            return self._spec_cache
        d = self._corpus_cache_dir()
        spec_path = d / "specs_raw.npy"
        norm_path = d / "specs_norm_f16.npy"
        stats_path = d / "spec_stats.json"
        if norm_path.exists() and stats_path.exists() and not force_recompute:
            with open(stats_path) as f:
                self.spec_stats = json.load(f)
            self._spec_cache = np.load(norm_path, mmap_mode="r").astype(
                np.float32
            )
            return self._spec_cache
        if spec_path.exists() and stats_path.exists() and not force_recompute:
            raw = np.load(spec_path, mmap_mode="r")
            with open(stats_path) as f:
                self.spec_stats = json.load(f)
        else:
            raw = self._compute_spec_corpus()
            self.spec_stats = (
                getattr(self, "_device_spec_stats", None)
                or self._compute_stats(raw)
            )
            np.save(spec_path, raw)
            with open(stats_path, "w") as f:
                json.dump(self.spec_stats, f)
        self._spec_cache = self._normalize(np.asarray(raw))
        if self.spectrogram_normalization is not None:
            f16 = self._spec_cache.astype(np.float16)
            np.save(norm_path, f16)
            # serve the fp16-rounded values NOW too: training data must be
            # bit-identical whether this run computed or reloaded the cache
            self._spec_cache = f16.astype(np.float32)
        return self._spec_cache

    def load_spectrogram_corpus_device(self, dtype=None, chunk: int = 64):
        """Device-resident corpus pass (``corpus_cache_policy='device'``):
        render, stats and normalization all run on the accelerator and the
        normalized corpus is returned as a jax array in ``dtype`` (default
        float16, the disk cache tier's dtype) — the host never touches the
        spectrogram tensor and nothing is written to disk.

        Motivation (measured, BENCH.md round 4): on this tunneled TPU
        attachment the 'jax' backend's disk-cache pass is DOWNLINK-bound —
        30,720 presets took 3,792 s, almost all of it fetching the ~5.5 GB
        fp16 corpus through a ~1.5 MB/s down direction — while the training
        pipeline immediately re-uploads the same tensor into HBM. Handing
        training the device-rendered corpus directly removes the host round
        trip entirely. (The reference's offline pipeline is a host process
        pool writing per-preset wavs, dexeddataset.py:278-328.)

        Numerical contract: the value chain mirrors the disk path — raw
        log-mels round to fp16 (the cache tier's quantization), the
        normalize affine runs in f16 arithmetic (as numpy's weak promotion
        does on the f16 raw tier) from exact f32 min/max device
        reductions, then casts to ``dtype``. Cross-policy values agree to
        a few f16 ulps, not bit-for-bit: XLA may tile the render/rDFT
        reductions differently per chunk shape (the disk pass pads every
        corpus to 64-row chunks; this one clamps chunk to P and
        re-renders the last ``chunk`` presets as its tail) and may lower
        the f16 affine differently than numpy (e.g. reciprocal-multiply).
        WITHIN the policy the corpus is memoized and training is exactly
        reproducible (tests/test_corpus_device.py).

        Eval-target caveat (ADVICE r4): when training requests the corpus
        in a 2-byte ``dtype`` (default compute_dtype='bfloat16'), eval's
        spectrogram TARGETS are that same bf16 tensor, while the disk
        policy evaluates against f32 (f16-rounded) targets — bf16 keeps
        only 8 mantissa bits, so eval metrics like spec MAE shift by up to
        ~2e-3 on the [-1,1] normalized range across policies. This is a
        storage quantization (upcasting cannot undo it); BENCH.md labels
        cross-policy eval comparisons accordingly.

        Memory: the corpus is built DIRECTLY in the column-chunked 2-D
        row layout the training gather consumes (see
        ``data/corpus_device.py`` — the 4-D layout's in-scan gather cost
        corpus-scale XLA temps and OOM'd the 16k 3-note flagship at
        compile, round-4 measurement), one fp16 buffer per column chunk
        plus one render chunk in flight; the finalize pass donates each
        buffer, so a 2-byte ``dtype`` peaks near 1x corpus size — a 30k
        one-note corpus (5.5 GB) or a 16k 3-note corpus (8.8 GB) fits a
        16 GB chip with training state headroom.

        Returns a ``ChunkedDeviceCorpus`` (rows = presets, note-major
        column spans); callers needing the dense host tensor use its
        ``as_numpy_4d()``.
        """
        import jax
        import jax.numpy as jnp

        from .corpus_device import ChunkedDeviceCorpus, plan_note_chunks

        dtype = np.dtype(dtype or jnp.float16)  # ml_dtypes covers bfloat16
        if (
            self._spec_cache_device is not None
            and self._spec_cache_device.dtype == dtype
        ):
            return self._spec_cache_device
        if getattr(self, "corpus_render_backend", "cpp") != "jax":
            raise ValueError(
                "device-resident corpus requires corpus_render_backend='jax'"
            )
        uids = self.valid_preset_UIDs
        P = len(uids)
        chunk = max(1, min(chunk, P))
        presets = np.stack([self.get_full_preset_params(u) for u in uids])
        fused = self._fused_render_spec_fn(chunk)
        _, H, W = self.get_spectrogram_tensor_size()
        n_notes = len(self.midi_notes)
        hw = H * W
        hw_pad, note_spans = plan_note_chunks(P, hw)
        # one raw-f16 buffer per (note, column span), note-major — the
        # ChunkedDeviceCorpus chunk order
        bufs = [
            jnp.zeros((P, width), jnp.float16)
            for _ in range(n_notes)
            for (_off, width) in note_spans
        ]

        def _write(b, piece, s):
            # start is a traced scalar: one compile per (chunk, width)
            # shape serves every render chunk. Every write is in-bounds
            # by construction (full chunks, and a tail that starts at
            # P-chunk), so DUS clamping never fires. Pad columns beyond
            # a span's real width stay zero and are sliced off at gather.
            return jax.lax.dynamic_update_slice(b, piece, (s, jnp.int32(0)))

        # donated: each corpus buffer is updated in place chunk by chunk
        write = jax.jit(_write, donate_argnums=0)
        starts = list(range(0, P - chunk + 1, chunk))
        tail_overlap = 0
        if P % chunk:
            tail_overlap = chunk - (P % chunk)
            starts.append(P - chunk)
        stats_parts, ns = [], []
        for note_i, (pitch, vel) in enumerate(self.midi_notes):
            pitches = jnp.full((chunk,), pitch, jnp.int32)
            vels = jnp.full((chunk,), vel, jnp.int32)
            for k, s in enumerate(starts):
                w = np.ones((chunk,), np.float32)
                n_real = chunk
                if tail_overlap and k == len(starts) - 1:
                    # the overlap rows were already rendered by the previous
                    # chunk; re-rendering them is <=chunk-1 cheap device
                    # renders and keeps every buffer row real — they are
                    # masked out of the stats so nothing double-counts
                    w[:tail_overlap] = 0.0
                    n_real = chunk - tail_overlap
                sp16, st4 = fused(
                    jnp.asarray(presets[s : s + chunk]),
                    pitches, vels, jnp.asarray(w),
                )
                flat = sp16.reshape(chunk, hw)
                for j, (off, width) in enumerate(note_spans):
                    end = min(off + width, hw)
                    if off >= hw:
                        continue
                    bi = note_i * len(note_spans) + j
                    bufs[bi] = write(
                        bufs[bi], flat[:, off:end], np.int32(s)
                    )
                stats_parts.append(st4)
                ns.append(n_real)
        allst = np.asarray(jax.device_get(jnp.stack(stats_parts)), np.float64)
        n_el = float(sum(ns)) * H * W
        mean = float(allst[:, 2].sum() / n_el)
        var = float(allst[:, 3].sum() / n_el) - mean * mean
        self.spec_stats = {
            "min": float(allst[:, 0].min()),
            "max": float(allst[:, 1].max()),
            "mean": mean,
            "std": float(np.sqrt(max(var, 0.0))),
        }
        self._device_spec_stats = dict(self.spec_stats)
        st, norm = self.spec_stats, self.spectrogram_normalization

        def _finalize(b):
            # the affine runs IN FLOAT16, matching the disk path's numpy
            # arithmetic exactly: there the raw tier is f16 and NEP50 weak
            # promotion keeps `(raw - min) / c` in f16 (python-float
            # scalars don't promote), so each op rounds to f16 — jnp's
            # weak promotion does the same here, op for op
            x = b
            if norm == "min_max":  # same affine as _normalize
                x = -1.0 + (x - st["min"]) / ((st["max"] - st["min"]) / 2.0)
            elif norm == "mean_std":
                x = (x - st["mean"]) / st["std"]
            return x.astype(dtype)

        fin = jax.jit(_finalize, donate_argnums=0)
        bufs = [fin(b) for b in bufs]
        for b in bufs:
            b.block_until_ready()
        self._spec_cache_device = ChunkedDeviceCorpus(
            tuple(bufs), P, n_notes, H, W, hw_pad,
            tuple(
                (note_i, off, width)
                for note_i in range(n_notes)
                for (off, width) in note_spans
            ),
        )
        return self._spec_cache_device

    def _normalize(self, spec: np.ndarray) -> np.ndarray:
        st = self.spec_stats
        if self.spectrogram_normalization == "min_max":  # -> [-1, 1]
            return (-1.0 + (spec - st["min"]) / ((st["max"] - st["min"]) / 2.0)).astype(
                np.float32
            )
        if self.spectrogram_normalization == "mean_std":
            return ((spec - st["mean"]) / st["std"]).astype(np.float32)
        return spec.astype(np.float32)

    # ------------------------------------------------------------------
    # Reference-parity item access
    # ------------------------------------------------------------------
    def __getitem__(self, i: int):
        preset_idx, note_idxs = self._demux(int(i))
        uid = int(self.valid_preset_UIDs[preset_idx])
        specs = self.load_spectrogram_corpus()[preset_idx, note_idxs]  # (C, H, W)
        learnable = self.preset_indexes_helper.full_to_learnable_batch(
            self.get_full_preset_params(uid)[None, :]
        )[0]
        ref_pitch, ref_vel = self.midi_notes[note_idxs[0] if len(note_idxs) == 1 else 0]
        info = np.asarray([uid, ref_pitch, ref_vel], dtype=np.int32)
        return specs, learnable, info, self.get_labels_tensor(uid)

    def get_spectrogram_tensor_size(self) -> Tuple[int, int, int]:
        c = self.midi_notes_per_preset if self._stacked else 1
        H = self.n_mel_bins if self.n_mel_bins > 0 else self.spectrogram.n_fft // 2 + 1
        T = 1 + self.samples_per_render // self.spectrogram.hop
        return (c, H, T)

    # ------------------------------------------------------------------
    # Whole-corpus tensors for the TPU input pipeline
    # ------------------------------------------------------------------
    def corpus_tensors(self, dtype=None) -> Dict[str, np.ndarray]:
        """All items as dense arrays: x (N_items, C, H, W), v (N_items, L),
        info (N_items, 3). The input pipeline shuffles / shards / gathers
        from these — no per-item Python on the hot path.

        ``corpus_cache_policy='device'`` serves x as a
        ``ChunkedDeviceCorpus`` (data/corpus_device.py) straight from the
        on-device render pass (see ``load_spectrogram_corpus_device`` for
        the numerical contract vs the disk tiers), in ``dtype`` (the
        training compute dtype — built there directly so no corpus-sized
        cast buffer ever exists); host consumers (the loaders' fancy
        indexing) work unchanged through its ``__getitem__``, which
        gathers on device and returns float32. The un-stacked multi-note
        mode is a zero-copy VIEW over the same device chunks (item ->
        (preset, note) resolves inside the gather), so no (P*n, 1, H, W)
        reshape buffer ever exists in HBM."""
        uids = np.asarray(self.valid_preset_UIDs)
        presets = np.stack([self.get_full_preset_params(u) for u in uids])
        learnable = self.preset_indexes_helper.full_to_learnable_batch(presets)
        if getattr(self, "corpus_cache_policy", "disk") == "device":
            corpus = self.load_spectrogram_corpus_device(dtype=dtype)
            P, n_notes = corpus.n_rows, corpus.n_notes
            x = (
                corpus
                if self._stacked or n_notes == 1
                else corpus.as_unstacked()
            )
        else:
            specs = self.load_spectrogram_corpus()  # (P, n_notes, H, W)
            P, n_notes = specs.shape[0], specs.shape[1]
            if self._stacked or n_notes == 1:
                x = specs  # n_notes==1 already has the (P, 1, H, W) layout
            else:
                # un-stacked multi-note: items = presets x notes,
                # note-major per preset
                x = specs.reshape(
                    P * n_notes, 1, specs.shape[2], specs.shape[3]
                )
        if self._stacked or n_notes == 1:
            p0, v0 = self.midi_notes[0]
            info = np.stack(
                [uids, np.full(P, p0), np.full(P, v0)], axis=1
            ).astype(np.int32)
            return {"x": x, "v": learnable.astype(np.float32), "info": info}
        v = np.repeat(learnable, n_notes, axis=0).astype(np.float32)
        pitches = np.tile(np.asarray([n[0] for n in self.midi_notes]), P)
        vels = np.tile(np.asarray([n[1] for n in self.midi_notes]), P)
        info = np.stack(
            [np.repeat(uids, n_notes), pitches, vels], axis=1
        ).astype(np.int32)
        return {"x": x, "v": v, "info": info}
