"""Preset database: SQLite-backed corpus of Dexed presets.

Schema-compatible with the reference's ``dexed_presets.sqlite``
(reference: synth/dexed.py:59-102: ``preset`` table with ``index_preset``,
``name``, ``pickled_params_np_array`` numpy-BLOB columns), extended with a
``labels`` text column (the reference stores labels in separate exported
files, synth/dexed.py:159-190). Reads resolve to one dense float32 matrix in
a single pass — the multi-process chunked read of the reference
(synth/dexed.py:87-102) is unnecessary once presets are a (N, 155) array.

Also provides a deterministic random-corpus generator (the actual 30k-preset
DB ships via git-lfs and is not available here; the generator produces
plausible normalized DX7 presets for training and fixtures).
"""

from __future__ import annotations

import io
import pathlib
import sqlite3
from typing import List, Optional, Sequence, Tuple

import numpy as np

from . import dexed_params as dx

LABELS_VOCAB = ("harmonic", "percussive", "sfx")  # reference: synth/dexed.py:205-206


def _np_to_blob(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, np.ascontiguousarray(arr))
    return buf.getvalue()


def _blob_to_np(blob: bytes) -> np.ndarray:
    return np.load(io.BytesIO(blob), allow_pickle=False)


def create_database(
    path,
    presets: np.ndarray,
    names: Optional[Sequence[str]] = None,
    labels: Optional[Sequence[str]] = None,
) -> None:
    """Writes a (N, 155) normalized preset matrix as a reference-layout DB."""
    presets = np.asarray(presets, dtype=np.float32)
    n = presets.shape[0]
    assert presets.shape[1] == dx.N_PARAMS
    names = list(names) if names is not None else [f"preset_{i:06d}" for i in range(n)]
    labels = list(labels) if labels is not None else [""] * n
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if path.exists():
        path.unlink()
    con = sqlite3.connect(str(path))
    con.execute(
        "CREATE TABLE preset (index_preset INTEGER PRIMARY KEY, name TEXT,"
        " labels TEXT, pickled_params_np_array BLOB)"
    )
    con.execute("CREATE TABLE param (index_param INTEGER PRIMARY KEY, name TEXT)")
    con.executemany(
        "INSERT INTO param VALUES (?, ?)",
        [(i, f"dexed_param_{i}") for i in range(dx.N_PARAMS)],
    )
    con.executemany(
        "INSERT INTO preset VALUES (?, ?, ?, ?)",
        [
            (i, names[i], labels[i], _np_to_blob(presets[i]))
            for i in range(n)
        ],
    )
    con.commit()
    con.close()


class PresetDatabase:
    """Single-pass reader (reference API surface: synth/dexed.py:65-158)."""

    def __init__(self, path):
        self.path = pathlib.Path(path)
        con = sqlite3.connect(str(self.path))
        rows = con.execute(
            "SELECT index_preset, name, labels, pickled_params_np_array"
            " FROM preset ORDER BY index_preset"
        ).fetchall()
        try:
            self.param_names = [
                r[1] for r in con.execute(
                    "SELECT index_param, name FROM param ORDER BY index_param"
                )
            ]
        except sqlite3.OperationalError:
            self.param_names = [f"dexed_param_{i}" for i in range(dx.N_PARAMS)]
        con.close()
        self.preset_indexes = np.asarray([r[0] for r in rows], dtype=np.int64)
        self.names: List[str] = [r[1] for r in rows]
        self.labels: List[str] = [r[2] or "" for r in rows]
        self.presets_matrix = (
            np.stack([_blob_to_np(r[3]) for r in rows]).astype(np.float32)
            if rows
            else np.zeros((0, dx.N_PARAMS), dtype=np.float32)
        )

    def __len__(self):
        return len(self.names)

    @property
    def nb_presets(self) -> int:
        return len(self.names)

    @property
    def nb_params(self) -> int:
        return self.presets_matrix.shape[1]

    def get_preset_values(self, uid: int) -> np.ndarray:
        row = int(np.searchsorted(self.preset_indexes, uid))
        assert self.preset_indexes[row] == uid
        return self.presets_matrix[row]

    def get_preset_name(self, uid: int) -> str:
        row = int(np.searchsorted(self.preset_indexes, uid))
        return self.names[row]

    def get_preset_labels(self, uid: int) -> List[str]:
        row = int(np.searchsorted(self.preset_indexes, uid))
        s = self.labels[row]
        return [l for l in s.split(",") if l]

    def write_all_presets_to_files(self, out_dir, verbose: bool = False) -> None:
        """Reference-parity export (synth/dexed.py:159-190): one params
        .npy + name .txt + labels .txt file per preset. The TPU pipeline
        reads the dense matrix directly; this export exists for users
        migrating tooling that consumed the reference's per-preset files."""
        out_dir = pathlib.Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        for i, uid in enumerate(self.preset_indexes):
            np.save(out_dir / f"preset{int(uid):06d}_params.npy",
                    self.presets_matrix[i])
            (out_dir / f"preset{int(uid):06d}_name.txt").write_text(self.names[i])
            (out_dir / f"preset{int(uid):06d}_labels.txt").write_text(self.labels[i])
        if verbose:
            print(f"[PresetDatabase] exported {len(self)} presets to {out_dir}")


def generate_random_corpus(
    n_presets: int, seed: int = 0, algos: Optional[Sequence[int]] = None
) -> Tuple[np.ndarray, List[str], List[str]]:
    """Deterministic plausible DX7 preset corpus.

    Continuous params ~ U[0,1]; discrete params land exactly on their
    quantized grid (so one-hot round-trips are exact); operator output
    levels biased upward so most presets are audible; constraints applied as
    in the reference dataset (constant filter/tune, all ops on, no S&H LFO;
    reference: dexeddataset.py:81-95, synth/dexed.py:298-357).
    """
    rng = np.random.default_rng(seed)
    p = rng.random((n_presets, dx.N_PARAMS)).astype(np.float32)
    card = dx.param_cardinalities()
    for i in np.nonzero(card > 0)[0]:
        c = int(card[i])
        p[:, i] = rng.integers(0, c, n_presets).astype(np.float32) / max(c - 1, 1)
    if algos:
        a = np.asarray(algos, dtype=np.float32) - 1.0
        p[:, dx.IDX_ALGORITHM] = rng.choice(a, n_presets) / 31.0
    # audible bias: carrier levels high, EG sustain above silence
    vol_idx = dx.operator_volume_indexes()
    p[:, vol_idx] = 0.5 + 0.5 * rng.random((n_presets, len(vol_idx))).astype(np.float32)
    for op in range(1, 7):
        b = dx.op_param_index(op, 0)
        p[:, b + dx.OFF_EG_LEVELS[0]] = 0.7 + 0.3 * rng.random(n_presets).astype(np.float32)
        p[:, b + dx.OFF_EG_LEVELS[2]] = 0.5 + 0.5 * rng.random(n_presets).astype(np.float32)
        p[:, b + dx.OFF_EG_RATES[0]] = 0.5 + 0.5 * rng.random(n_presets).astype(np.float32)
    dx.set_default_general_filter_and_tune_params(p)
    dx.set_operators(p, [1, 2, 3, 4, 5, 6])
    dx.prevent_SH_LFO(p)
    names = [f"rnd_{seed}_{i:06d}" for i in range(n_presets)]
    labels = [LABELS_VOCAB[int(i)] for i in rng.integers(0, 3, n_presets)]
    return p, names, labels
