"""Round-4 on-device corpus render timing (VERDICT r3 item 8 "Done ="):
wall time of the full offline corpus pass (render + log-mel + stats +
normalize + cache write), 'jax' fused on-device backend vs the 'cpp'
host-engine baseline (BENCH.md: 17.4 min for 30,720 presets on one idle
core), same host, same session. The jax pass is downlink-bound on this
tunneled attachment — it fetches the fp16 spectrogram corpus (~5.5 GB at
30k presets) while stats accumulate on device — so its number is also a
measurement of the tunnel's down direction that hour.

Reference anchor: the offline render pipeline being accelerated,
dexeddataset.py:278-328.

Run (TPU queue slot, idle host):
  python scripts/time_corpus_render_r4.py [n_presets] [backends]
defaults: 30720 jax,cpp. Prints one JSON line per backend. Backend
'device' times corpus_cache_policy='device' (the round-4 render-to-train
path: nothing fetched, nothing persisted — the corpus stays in HBM), the
number that matters for one-shot runs on this tunneled attachment.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from preset_gen_vae_tpu.data.dexed_dataset import DexedDataset


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30720
    backends = sys.argv[2].split(",") if len(sys.argv) > 2 else ["jax", "cpp"]
    for backend in backends:
        if backend == "device":
            ds = DexedDataset(
                n_synthetic_presets=n, corpus_render_backend="jax",
                corpus_cache_policy="device",
            )
            t0 = time.time()
            spec = ds.load_spectrogram_corpus_device()
            wall = time.time() - t0
        else:
            ds = DexedDataset(
                n_synthetic_presets=n, corpus_render_backend=backend
            )
            t0 = time.time()
            spec = ds.load_spectrogram_corpus(force_recompute=True)
            wall = time.time() - t0
        print(json.dumps({
            "metric": "corpus_build_wall_s",
            "backend": backend,
            "n_presets": n,
            "corpus_build_wall_s": round(wall, 1),
            "spec_shape": list(spec.shape),
            "stats": {k: round(float(v), 5)
                      for k, v in ds.spec_stats.items()},
        }), flush=True)


if __name__ == "__main__":
    main()
