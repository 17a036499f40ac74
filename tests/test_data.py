"""Data layer tests: deterministic splits (disjointness, k-folds),
database round-trip, dataset constraints, corpus tensors, pipeline batches.

The split-disjointness test mirrors the reference's only real test
(reference: data/sampler.py:62-100)."""

import numpy as np
import pytest

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.data.dexed_dataset import DexedDataset
from preset_gen_vae_tpu.data.pipeline import get_split_loaders
from preset_gen_vae_tpu.data.sampler import (
    expand_to_item_indexes,
    split_preset_indexes,
)
from preset_gen_vae_tpu.synth import database as db
from preset_gen_vae_tpu.synth import dexed_params as dx
from preset_gen_vae_tpu.synth.render import engine_available


def test_split_disjoint_and_complete():
    s = split_preset_indexes(1000, k_fold=2, k_folds_count=5)
    all_idx = np.concatenate([s["train"], s["validation"], s["test"]])
    assert len(np.unique(all_idx)) == 1000  # disjoint and complete
    assert len(s["test"]) == 200  # 20% holdout
    # k-fold rotation: validation sets of different folds are disjoint
    v2 = split_preset_indexes(1000, k_fold=3, k_folds_count=5)["validation"]
    assert len(np.intersect1d(s["validation"], v2)) == 0


def test_split_deterministic():
    a = split_preset_indexes(500, k_fold=0)
    b = split_preset_indexes(500, k_fold=0)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_multinote_expansion_keeps_presets_together():
    """Un-stacked multi-note items of one preset never straddle subsets
    (the reference's core splitting invariant, sampler.py:46-55)."""
    s = split_preset_indexes(100, k_fold=0)
    items = {k: expand_to_item_indexes(v, 3, stacked=False) for k, v in s.items()}
    for k, it in items.items():
        presets = np.unique(it // 3)
        np.testing.assert_array_equal(np.sort(presets), np.sort(s[k]))
    all_items = np.concatenate(list(items.values()))
    assert len(np.unique(all_items)) == 300


def test_database_roundtrip(tmp_path):
    presets, names, labels = db.generate_random_corpus(16, seed=3)
    path = tmp_path / "t.sqlite"
    db.create_database(path, presets, names, labels)
    d = db.PresetDatabase(path)
    assert d.nb_presets == 16 and d.nb_params == dx.N_PARAMS
    np.testing.assert_allclose(d.presets_matrix, presets)
    assert d.get_preset_name(3) == names[3]
    assert d.get_preset_labels(5) == [labels[5]]


def test_random_corpus_quantized_on_grid():
    presets, _, _ = db.generate_random_corpus(64, seed=1)
    card = dx.param_cardinalities()
    for i in np.nonzero(card > 1)[0]:
        c = int(card[i])
        steps = presets[:, i] * (c - 1)
        np.testing.assert_allclose(steps, np.rint(steps), atol=1e-5)


def test_structured_corpus_properties():
    """Structured generator: deterministic, in-bounds, grid-exact discrete
    params, algorithm-aware carrier levels, label vocab."""
    p, names, labels = db.generate_structured_corpus(128, seed=7)
    p2, _, _ = db.generate_structured_corpus(128, seed=7)
    np.testing.assert_array_equal(p, p2)  # deterministic
    assert p.shape == (128, dx.N_PARAMS) and p.dtype == np.float32
    assert p.min() >= 0.0 and p.max() <= 1.0
    card = dx.param_cardinalities()
    for i in np.nonzero(card > 1)[0]:
        steps = p[:, i] * (int(card[i]) - 1)
        np.testing.assert_allclose(steps, np.rint(steps), atol=1e-5)
    assert set(labels) <= set(db.LABELS_VOCAB)
    # every preset's carriers (per its algorithm) have audible output level
    for r in range(128):
        algo = int(np.rint(p[r, dx.IDX_ALGORITHM] * 31)) + 1
        for op in dx.algorithm_carriers(algo):
            assert p[r, dx.op_param_index(op, dx.OFF_OUTPUT_LEVEL)] >= 0.85


def test_structured_v2_properties():
    """v2 generator: deterministic, grid-exact, label vocab, and the two
    correlation families it adds — depth-aware modulator levels (deep
    modulators statistically quieter than depth-1) and archetype-coherent
    envelopes (carrier sustain bimodal by percussive/sustained family)."""
    from preset_gen_vae_tpu.synth import fm_jax

    p, names, labels = db.generate_structured_corpus_v2(512, seed=7)
    p2, _, _ = db.generate_structured_corpus_v2(512, seed=7)
    np.testing.assert_array_equal(p, p2)
    assert p.shape == (512, dx.N_PARAMS) and p.min() >= 0 and p.max() <= 1
    card = dx.param_cardinalities()
    for i in np.nonzero(card > 1)[0]:
        steps = p[:, i] * (int(card[i]) - 1)
        np.testing.assert_allclose(steps, np.rint(steps), atol=1e-5)
    assert set(labels) <= set(db.LABELS_VOCAB)
    assert names[0].startswith("struct2_")

    alg = np.rint(p[:, dx.IDX_ALGORITHM] * 31).astype(int)
    depth = fm_jax.ALGO_MOD_DEPTH[alg]  # (n, 6)
    lvl = np.stack(
        [p[:, dx.op_param_index(op, dx.OFF_OUTPUT_LEVEL)] for op in range(1, 7)],
        axis=1,
    )
    # carriers loud (audibility contract, as v1)
    assert lvl[depth == 0].min() >= 0.85
    # depth-aware: mean level strictly decreasing carrier -> d1 -> d2+
    m0, m1, m2 = (lvl[depth == 0].mean(), lvl[depth == 1].mean(),
                  lvl[depth >= 2].mean())
    assert m0 > m1 > m2, (m0, m1, m2)


def test_algo_mod_depth_table():
    """Depth table sanity against hand-checked algorithms (public DX7
    topology, same table as dx7_engine.cc:155-188): alg 1 has a 4-deep
    tower (6->5->4->3), alg 32 is all carriers, alg 16 nests 6->5->1."""
    from preset_gen_vae_tpu.synth import fm_jax

    d = fm_jax.ALGO_MOD_DEPTH
    np.testing.assert_array_equal(d[0], [0, 1, 0, 1, 2, 3])   # alg 1
    np.testing.assert_array_equal(d[31], [0, 0, 0, 0, 0, 0])  # alg 32
    np.testing.assert_array_equal(d[15], [0, 1, 1, 2, 1, 2])  # alg 16
    # every op reaches a carrier in <= 5 hops on every algorithm
    assert d.max() <= 5 and d.min() == 0


def test_structured_corpus_algo_restriction():
    p, _, _ = db.generate_structured_corpus(64, seed=1, algos=(3, 21))
    algo_of = np.rint(p[:, dx.IDX_ALGORITHM] * 31.0).astype(int) + 1
    assert set(algo_of) <= {3, 21}
    p, _, _ = db.generate_structured_corpus_v2(64, seed=1, algos=(3, 21))
    algo_of = np.rint(p[:, dx.IDX_ALGORITHM] * 31.0).astype(int) + 1
    assert set(algo_of) <= {3, 21}


@pytest.mark.slow
def test_structured_corpus_renders_audible():
    """The generator's whole purpose: (almost) no near-silent ground truths
    (round-1 verdict: the uniform generator produced ~6% RMS<1e-3 renders,
    NaN-ing spectral-convergence aggregates)."""
    from preset_gen_vae_tpu.synth.render import DexedRenderer, engine_available

    if not engine_available():
        pytest.skip("libdx7.so not built")
    p, _, _ = db.generate_structured_corpus(256, seed=0)
    w = DexedRenderer().render_batch(p, [60] * 256, [85] * 256)
    rms = np.sqrt((w ** 2).mean(axis=1))
    assert (rms < 1e-3).mean() < 0.01
    p, _, _ = db.generate_structured_corpus_v2(256, seed=0)
    w = DexedRenderer().render_batch(p, [60] * 256, [85] * 256)
    rms = np.sqrt((w ** 2).mean(axis=1))
    assert (rms < 1e-3).mean() < 0.01


needs_engine = pytest.mark.skipif(
    not engine_available(), reason="libdx7.so not built"
)


@pytest.fixture(scope="module")
def small_dataset(tmp_path_factory):
    return DexedDataset(
        n_synthetic_presets=24,
        synthetic_seed=7,
        data_root=tmp_path_factory.mktemp("data"),
    )


@needs_engine
def test_dataset_geometry_and_item(small_dataset):
    ds = small_dataset
    assert ds.get_spectrogram_tensor_size() == (1, 257, 347)
    assert ds.learnable_params_count == 144
    assert ds.learnable_params_tensor_length == 610
    spec, v, info, labels = ds[0]
    assert spec.shape == (1, 257, 347)
    assert v.shape == (610,)
    assert info.tolist()[1:] == [60, 85]
    assert labels.shape == (3,)


@needs_engine
def test_dataset_constraints_applied(small_dataset):
    ds = small_dataset
    for uid in ds.valid_preset_UIDs[:5]:
        p = ds.get_full_preset_params(uid)
        assert p[dx.IDX_CUTOFF] == 1.0 and p[dx.IDX_RESO] == 0.0
        assert all(p[i] == 1.0 for i in dx.operator_switch_indexes())


@needs_engine
def test_algo_restriction(tmp_path):
    ds = DexedDataset(
        n_synthetic_presets=64, synthetic_seed=1, algos=(21,),
        data_root=tmp_path,
    )
    for uid in ds.valid_preset_UIDs:
        p = ds.get_full_preset_params(uid)
        assert int(np.rint(p[dx.IDX_ALGORITHM] * 31)) + 1 == 21
    # single-algo datasets stop learning the algorithm param
    # (reference: dexeddataset.py:101-102)
    assert ds.preset_indexes_helper.spec.learnable_model[dx.IDX_ALGORITHM] is None


@needs_engine
def test_corpus_tensors_and_loaders(small_dataset):
    ds = small_dataset
    t = ds.corpus_tensors()
    n = ds.valid_presets_count
    assert t["x"].shape == (n, 1, 257, 347)
    assert t["v"].shape == (n, 610)
    assert t["x"].min() >= -1.0 and t["x"].max() <= 1.0  # min_max normalized
    train_c = cfg.TrainConfig(minibatch_size=4)
    loaders = get_split_loaders(ds, train_c)
    xb, vb, ib = next(loaders["train"].epoch_batches(0))
    assert xb.shape == (4, 1, 257, 347) and vb.shape == (4, 610)
    # epoch shuffles deterministic and epoch-dependent
    a = next(loaders["train"].epoch_batches(1))[2]
    b = next(loaders["train"].epoch_batches(1))[2]
    c = next(loaders["train"].epoch_batches(2))[2]
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    # no train/valid/test leakage by UID
    uids = {
        k: set(
            int(u)
            for (_, _, i) in loaders[k].epoch_batches(0)
            for u in i[:, 0]
        )
        for k in loaders
    }
    assert not (uids["train"] & uids["validation"])
    assert not (uids["train"] & uids["test"])


@needs_engine
def test_spec_corpus_cache_roundtrip(tmp_path):
    ds1 = DexedDataset(
        n_synthetic_presets=8, synthetic_seed=2, data_root=tmp_path
    )
    x1 = ds1.corpus_tensors()["x"]
    ds2 = DexedDataset(
        n_synthetic_presets=8, synthetic_seed=2, data_root=tmp_path
    )
    x2 = ds2.corpus_tensors()["x"]  # loaded from cache
    np.testing.assert_array_equal(x1, x2)
    # render-constraints sidecar: a cache produced by a different engine
    # version must be refused (reference analog: dexeddataset.py:319-328)
    import json

    sidecar = ds2._corpus_cache_dir() / "render_constraints.json"
    stored = json.loads(sidecar.read_text())
    stored["engine_version"] = -999
    sidecar.write_text(json.dumps(stored))
    with pytest.raises(RuntimeError):
        DexedDataset(n_synthetic_presets=8, synthetic_seed=2, data_root=tmp_path)


@needs_engine
def test_stats_pass_and_db_export(tmp_path):
    ds = DexedDataset(
        n_synthetic_presets=6, synthetic_seed=9, data_root=tmp_path
    )
    stats = ds.compute_and_store_spectrograms_stats()
    assert set(stats) == {"min", "max", "mean", "std"}
    csv_path = ds._corpus_cache_dir() / "spectrograms_stats.csv"
    assert csv_path.exists()
    assert len(csv_path.read_text().strip().splitlines()) == 1 + 6  # header+rows
    # per-preset file export (reference: synth/dexed.py:159-190)
    presets, names, labels = db.generate_random_corpus(4, seed=2)
    db.create_database(tmp_path / "e.sqlite", presets, names, labels)
    d = db.PresetDatabase(tmp_path / "e.sqlite")
    d.write_all_presets_to_files(tmp_path / "exported")
    assert len(list((tmp_path / "exported").glob("*_params.npy"))) == 4
    loaded = np.load(tmp_path / "exported" / "preset000002_params.npy")
    np.testing.assert_allclose(loaded, presets[2])


@needs_engine
def test_generate_wav_files_and_registry(tmp_path):
    from preset_gen_vae_tpu.data.dataset import ALL_DATASETS
    from preset_gen_vae_tpu.utils.audio_io import read_wav

    assert ALL_DATASETS["dexed"] is DexedDataset
    ds = DexedDataset(n_synthetic_presets=3, synthetic_seed=4, data_root=tmp_path)
    n = ds.generate_wav_files(tmp_path / "wavs")
    assert n == 3
    files = sorted((tmp_path / "wavs").glob("*.wav"))
    assert len(files) == 3
    w, sr = read_wav(files[0])
    assert sr == 22050 and w.shape == (ds.samples_per_render,)
